package graft.load

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-pixel HARMONIC (seasonal) regression across time — fit
  * `v ≈ a + b·cos(ωt) + c·sin(ωt)` per pixel (phenology curves, snow/
  * flood seasonality, diurnal cycles). Beyond the reference surface:
  * odc-stac stops at the loaded cube.
  *
  * Scale shape — same mergeable family as [[Trend.PixelTrend]]: the
  * normal equations need only nine running sums per pixel
  * (n, Σc, Σs, Σcc, Σss, Σcs, Σv, Σvc, Σvs), so the whole fit is ONE
  * partial aggregate with map-side combine — fixed-size buffers at any
  * archive depth, no time-dimension rechunk. The 3×3 Cramer solve in
  * `finish` is spelled token-for-token like the DuckDB oracle, so on
  * integer-valued fixtures (exact sums) the coefficients match
  * bit-for-bit.
  *
  * Basis exactness: callers pass the basis QUANTIZED to integer
  * milli-units (`round(cos(ωt)·1000)`), so every cross-engine sum is
  * exact integer arithmetic; the trig itself is evaluated once
  * JVM-side and LANDED with the raw series — the oracle reads the same
  * integers instead of re-running libm (whose last-ulp may differ). */
object Harmonic {

  final case class HarmIn(cq: Double, sq: Double, data: Array[Byte],
                          dtype: String, nodata: Double,
                          width: Int, height: Int)

  /** Nine running sums per pixel; sized lazily from the first tile. */
  final case class HBuf(var n: Array[Int],
                        var sc: Array[Double], var ss: Array[Double],
                        var scc: Array[Double], var sss: Array[Double],
                        var scs: Array[Double],
                        var sv: Array[Double], var svc: Array[Double],
                        var svs: Array[Double],
                        var width: Int, var height: Int)

  final case class HarmOut(level: Array[Double], cosB: Array[Double],
                           sinB: Array[Double], count: Array[Int])

  class PixelHarmonic extends Aggregator[HarmIn, HBuf, HarmOut]
      with Serializable {

    override def zero: HBuf =
      HBuf(null, null, null, null, null, null, null, null, null, 0, 0)

    private def ensure(b: HBuf, w: Int, h: Int): Unit =
      if (b.n == null) {
        val m = w * h
        b.n = new Array[Int](m)
        b.sc = new Array[Double](m); b.ss = new Array[Double](m)
        b.scc = new Array[Double](m); b.sss = new Array[Double](m)
        b.scs = new Array[Double](m)
        b.sv = new Array[Double](m); b.svc = new Array[Double](m)
        b.svs = new Array[Double](m)
        b.width = w; b.height = h
      }

    override def reduce(b: HBuf, t: HarmIn): HBuf = {
      ensure(b, t.width, t.height)
      require(b.width == t.width && b.height == t.height,
        s"tile shape mismatch: ${b.width}x${b.height} vs ${t.width}x${t.height}")
      val px = Fuse.decode(t.data, t.dtype)
      val cq = t.cq
      val sq = t.sq
      var i = 0
      while (i < px.length) {
        val v = px(i)
        if (!(v.isNaN || v == t.nodata)) {
          b.n(i) += 1
          b.sc(i) += cq; b.ss(i) += sq
          b.scc(i) += cq * cq; b.sss(i) += sq * sq; b.scs(i) += cq * sq
          b.sv(i) += v; b.svc(i) += v * cq; b.svs(i) += v * sq
        }
        i += 1
      }
      b
    }

    override def merge(a: HBuf, c: HBuf): HBuf = {
      if (a.n == null) return c
      if (c.n == null) return a
      require(a.width == c.width && a.height == c.height,
        s"tile shape mismatch in merge: ${a.width}x${a.height} vs ${c.width}x${c.height}")
      var i = 0
      while (i < a.n.length) {
        a.n(i) += c.n(i)
        a.sc(i) += c.sc(i); a.ss(i) += c.ss(i)
        a.scc(i) += c.scc(i); a.sss(i) += c.sss(i); a.scs(i) += c.scs(i)
        a.sv(i) += c.sv(i); a.svc(i) += c.svc(i); a.svs(i) += c.svs(i)
        i += 1
      }
      a
    }

    override def finish(b: HBuf): HarmOut = {
      if (b.n == null)
        return HarmOut(Array.empty, Array.empty, Array.empty, Array.empty)
      val m = b.n.length
      val level = new Array[Double](m)
      val cosB = new Array[Double](m)
      val sinB = new Array[Double](m)
      var i = 0
      while (i < m) {
        val n = b.n(i).toDouble
        val sc = b.sc(i); val ss = b.ss(i)
        val scc = b.scc(i); val sss = b.sss(i); val scs = b.scs(i)
        val sv = b.sv(i); val svc = b.svc(i); val svs = b.svs(i)
        // Cramer's rule — THE oracle spelling (RasterAnalyticsQueries.
        // harmonicDuckSql transcribes these lines token-for-token)
        val det = n * (scc * sss - scs * scs) - sc * (sc * sss - scs * ss) +
          ss * (sc * scs - scc * ss)
        if (b.n(i) >= 3 && det != 0.0) {
          level(i) = (sv * (scc * sss - scs * scs) -
            sc * (svc * sss - scs * svs) +
            ss * (svc * scs - scc * svs)) / det
          cosB(i) = (n * (svc * sss - scs * svs) -
            sv * (sc * sss - scs * ss) +
            ss * (sc * svs - svc * ss)) / det
          sinB(i) = (n * (scc * svs - svc * scs) -
            sc * (sc * svs - svc * ss) +
            sv * (sc * scs - scc * ss)) / det
        } else {
          level(i) = Double.NaN; cosB(i) = Double.NaN; sinB(i) = Double.NaN
        }
        i += 1
      }
      HarmOut(level, cosB, sinB, b.n)
    }

    override def bufferEncoder: Encoder[HBuf] = Encoders.product[HBuf]
    override def outputEncoder: Encoder[HarmOut] = Encoders.product[HarmOut]
  }

  /** Integer milli-unit basis for day `t` at `periodDays` — JVM trig,
    * half-away-from-zero rounding (the engine-wide ROUND convention). */
  def basisOf(tDays: Double, periodDays: Double): (Double, Double) = {
    val w = 2.0 * math.Pi * tDays / periodDays
    def q(x: Double): Double = {
      val y = x * 1000.0
      if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)
    }
    (q(math.cos(w)), q(math.sin(w)))
  }

  /** `tiles` → per-(band, ty, tx) harmonic-fit planes. `basis` maps each
    * tile's epoch seconds to its landed (cq, sq) milli-unit basis — the
    * caller derives it from the SAME map it lands for the oracle. */
  def harmonicAcrossTime(spark: SparkSession, tiles: DataFrame,
                         basis: Map[Long, (Double, Double)]): DataFrame = {
    import spark.implicits._
    val agg = new PixelHarmonic().toColumn
    val bc = spark.sparkContext.broadcast(basis)
    tiles
      .select(col("band"), col("ty"), col("tx"),
        unix_timestamp(col("time")).as("tsec"),
        col("data"), col("dtype"), col("nodata"),
        col("width"), col("height"))
      .as[(String, Int, Int, Long, Array[Byte], String, Double, Int, Int)]
      .groupByKey { case (band, ty, tx, _, _, _, _, _, _) => (band, ty, tx) }
      .mapValues { case (_, _, _, tsec, data, dtype, nodata, w, h) =>
        val (cq, sq) = bc.value(tsec)
        HarmIn(cq, sq, data, dtype, nodata, w, h)
      }
      .agg(agg)
      .map { case ((band, ty, tx), out) =>
        (band, ty, tx, out.level, out.cosB, out.sinB, out.count)
      }
      .toDF("band", "ty", "tx", "level", "cosb", "sinb", "count")
  }
}
