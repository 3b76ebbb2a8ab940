package graft.load

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-pixel PEAK-OF-SEASON timing — the argmax of each pixel's
  * time series (peak-NDVI phenology date, flood-crest timing; the
  * odc ecosystem's "when did this place peak" map). Beyond the
  * reference surface: odc-stac stops at the loaded cube.
  *
  * Semantics per pixel: over the valid observations, `peak` is the
  * maximum value and `peak_day` the day number (since `t0Sec`,
  * snapped to whole days like the [[Trend]] axis) of the FIRST
  * observation attaining it (ties break to the earliest day — the
  * deterministic convention `arg_max` engines disagree on, so it is
  * spelled explicitly in both engines). Pixels with zero valid
  * observations emit NaN / day −1.
  *
  * Scale shape — the argmax is MERGEABLE: the running state is three
  * fixed-size planes (best value, best day, count) per pixel with
  * map-side combine, the same true-partial-aggregate plan as
  * [[Trend.PixelTrend]]; one partial buffer set per (band, ty, tx)
  * per input partition crosses the exchange — never T planes, no
  * time-depth rechunk, bounded state at ANY archive depth. The
  * merge applies the identical (value, day) ordering, so partial
  * order never changes the result (pinned by PhenologySpec's
  * partition-invariance property).
  */
object Phenology {

  final case class PeakIn(tDays: Double, data: Array[Byte], dtype: String,
                          nodata: Double, width: Int, height: Int)

  /** Running argmax planes per pixel; sized lazily from the first
    * tile. `day` is −1 where no valid observation has been seen. */
  final case class PBuf(var n: Array[Int], var best: Array[Double],
                        var day: Array[Double], var width: Int,
                        var height: Int)

  final case class PeakOut(peak: Array[Double], day: Array[Double],
                           count: Array[Int])

  class PixelPeak extends Aggregator[PeakIn, PBuf, PeakOut]
      with Serializable {

    override def zero: PBuf = PBuf(null, null, null, 0, 0)

    private def ensure(b: PBuf, w: Int, h: Int): Unit =
      if (b.n == null) {
        val m = w * h
        b.n = new Array[Int](m)
        b.best = Array.fill(m)(Double.NaN)
        b.day = Array.fill(m)(-1.0)
        b.width = w; b.height = h
      }

    /** The one ordering both engines spell: larger value wins; an
      * equal value wins only with a strictly smaller day. */
    private def better(v: Double, d: Double, bv: Double, bd: Double)
        : Boolean =
      bv.isNaN || v > bv || (v == bv && d < bd)

    override def reduce(b: PBuf, t: PeakIn): PBuf = {
      ensure(b, t.width, t.height)
      require(b.width == t.width && b.height == t.height,
        s"tile shape mismatch: ${b.width}x${b.height} vs ${t.width}x${t.height}")
      val px = Fuse.decode(t.data, t.dtype)
      var i = 0
      while (i < px.length) {
        val v = px(i)
        if (!(v.isNaN || v == t.nodata)) {
          b.n(i) += 1
          if (better(v, t.tDays, b.best(i), b.day(i))) {
            b.best(i) = v; b.day(i) = t.tDays
          }
        }
        i += 1
      }
      b
    }

    override def merge(a: PBuf, c: PBuf): PBuf = {
      if (a.n == null) return c
      if (c.n == null) return a
      require(a.width == c.width && a.height == c.height,
        s"tile shape mismatch in merge: ${a.width}x${a.height} vs ${c.width}x${c.height}")
      var i = 0
      while (i < a.n.length) {
        a.n(i) += c.n(i)
        if (!c.best(i).isNaN &&
            better(c.best(i), c.day(i), a.best(i), a.day(i))) {
          a.best(i) = c.best(i); a.day(i) = c.day(i)
        }
        i += 1
      }
      a
    }

    override def finish(b: PBuf): PeakOut = {
      if (b.n == null) return PeakOut(Array.empty, Array.empty, Array.empty)
      PeakOut(b.best, b.day, b.n)
    }

    override def bufferEncoder: Encoder[PBuf] = Encoders.product[PBuf]
    override def outputEncoder: Encoder[PeakOut] =
      Encoders.product[PeakOut]
  }

  /** Peak value + timing of a `Load` tile frame across time. Returns
    * one row per (band, ty, tx): (peak, day, count) planes. `t0Sec`
    * anchors the day axis exactly as [[Trend.trendAcrossTime]]. */
  def peakAcrossTime(spark: SparkSession, tiles: DataFrame,
                     t0Sec: Long): DataFrame = {
    import spark.implicits._
    val agg = new PixelPeak().toColumn
    tiles
      .select(col("band"), col("ty"), col("tx"),
        floor(((unix_timestamp(col("time")) - t0Sec) / 86400.0) + 0.5)
          .as("tDays"),
        col("data"), col("dtype"), col("nodata"),
        col("width"), col("height"))
      .as[(String, Int, Int, Double, Array[Byte], String, Double, Int, Int)]
      .groupByKey { case (band, ty, tx, _, _, _, _, _, _) => (band, ty, tx) }
      .mapValues { case (_, _, _, td, data, dtype, nodata, w, h) =>
        PeakIn(td, data, dtype, nodata, w, h)
      }
      .agg(agg)
      .map { case ((band, ty, tx), out) =>
        (band, ty, tx, out.peak, out.day, out.count)
      }
      .toDF("band", "ty", "tx", "peak", "day", "count")
  }
}
