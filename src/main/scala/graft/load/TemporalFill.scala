package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal gap-filling — per-pixel linear interpolation across the time
  * axis (cloud/SLC-off hole repair before compositing, the Landsat-7
  * workflow). Beyond the reference surface: odc-stac stops at the loaded
  * cube; this closes the gaps the mosaic can't.
  *
  * Semantics per pixel: valid observations keep their value; a missing
  * observation between two valid ones takes the time-weighted linear
  * interpolant `v_prev + (v_next − v_prev)·(t − t_prev)/(t_next −
  * t_prev)`; before the first / after the last valid observation the
  * nearest valid value carries (constant extrapolation); a pixel with no
  * valid observation at all stays NaN.
  *
  * Scale shape: identical to the median composite's rechunk — ONE
  * shuffle of tile rows keyed `(band, ty, tx)`, then a per-group
  * forward+backward sweep over the bounded time depth. Task state is
  * ≤ T decoded planes of one tile; output is again tile-shaped (one
  * filled plane per input plane), so downstream operators (composites,
  * exports) consume it unchanged.
  */
object TemporalFill {

  private final case class PlaneIn(tIdx: Int, tSec: Long, data: Array[Byte],
                                   dtype: String, nodata: Double,
                                   width: Int, height: Int)

  /** Fill a `LoadResult.tiles` frame across time. Returns one row per
    * input plane: (band, tIdx, ty, tx, filled, n_filled) where `filled`
    * is the plane as doubles (NaN = still no data). */
  def fillAcrossTime(spark: SparkSession, tiles: DataFrame): DataFrame = {
    import spark.implicits._
    tiles
      .select(col("band"), col("ty"), col("tx"), col("tIdx"),
        unix_timestamp(col("time")).as("tSec"),
        col("data"), col("dtype"), col("nodata"),
        col("width"), col("height"))
      .as[(String, Int, Int, Int, Long, Array[Byte], String, Double, Int, Int)]
      .groupByKey { case (band, ty, tx, _, _, _, _, _, _, _) => (band, ty, tx) }
      .flatMapGroups { (key, it) =>
        val (band, ty, tx) = key
        val planes = it.map { case (_, _, _, tIdx, tSec, data, dtype, nodata, w, h) =>
          PlaneIn(tIdx, tSec, data, dtype, nodata, w, h)
        }.toArray.sortBy(_.tSec)
        val t = planes.length
        val w = planes(0).width
        val h = planes(0).height
        require(planes.forall(p => p.width == w && p.height == h),
          s"tile shape mismatch at ($band,$ty,$tx)")
        val px = planes.map(p => Fuse.decode(p.data, p.dtype))
        val filled = Array.fill(t)(new Array[Double](w * h))
        val nFilled = new Array[Int](t)
        val prevIdx = new Array[Int](t)
        val nextIdx = new Array[Int](t)
        var i = 0
        while (i < w * h) {
          // forward/backward sweeps: nearest valid plane index per side
          var p = 0
          var last = -1
          while (p < t) {
            val v = px(p)(i)
            val valid = !(v.isNaN || v == planes(p).nodata)
            prevIdx(p) = if (valid) p else last
            if (valid) last = p
            p += 1
          }
          p = t - 1; last = -1
          while (p >= 0) {
            val v = px(p)(i)
            val valid = !(v.isNaN || v == planes(p).nodata)
            nextIdx(p) = if (valid) p else last
            if (valid) last = p
            p -= 1
          }
          p = 0
          while (p < t) {
            val v = px(p)(i)
            val valid = !(v.isNaN || v == planes(p).nodata)
            filled(p)(i) =
              if (valid) v
              else {
                val pi = prevIdx(p)
                val ni = nextIdx(p)
                val f =
                  if (pi >= 0 && ni >= 0) {
                    val pv = px(pi)(i); val nv = px(ni)(i)
                    val dt = planes(ni).tSec - planes(pi).tSec
                    // coincident acquisitions (dt = 0): carry the earlier
                    // valid value instead of dividing by zero
                    if (dt == 0L) pv
                    else pv + (nv - pv) *
                      (planes(p).tSec - planes(pi).tSec).toDouble / dt
                  } else if (pi >= 0) px(pi)(i)
                  else if (ni >= 0) px(ni)(i)
                  else Double.NaN
                if (!f.isNaN) nFilled(p) += 1
                f
              }
            p += 1
          }
          i += 1
        }
        planes.indices.iterator.map(p =>
          (band, planes(p).tIdx, ty, tx, filled(p), nFilled(p)))
      }
      .toDF("band", "tIdx", "ty", "tx", "filled", "n_filled")
  }
}
