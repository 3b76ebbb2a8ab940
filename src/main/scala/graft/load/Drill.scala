package graft.load

import graft.geo.GeoBox
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Point drill — sample raster values at point locations (ground-truth
  * extraction for model training, station calibration, spot checks).
  * Beyond the reference surface: the odc user does this via
  * `xr.sel(x=..., y=..., method="nearest")` after loading; here it runs
  * against the distributed tile frame without materializing planes.
  *
  * Scale shape: points broadcast (training sets are 10^3–10^6 points,
  * kilobytes to megabytes); each tile task binary-feeds only the points
  * whose pixel falls inside its own extent, so the output is
  * |points| × |bands| × |times| rows and NOTHING shuffles but those.
  * Tiles that contain no point decode nothing.
  */
object Drill {

  /** Sample every (id, x, y) point (in `geobox.crs` world coordinates)
    * from every tile plane that covers it. Returns (point_id, band,
    * tIdx, value) — `value` NaN when the covering pixel is nodata; no
    * row when no tile covers the point. */
  def drill(spark: SparkSession, tiles: DataFrame, geobox: GeoBox,
            points: Seq[(String, Double, Double)]): DataFrame = {
    import spark.implicits._
    val inv = geobox.transform.inverse
    // precompute global pixel coords once, driver-side (points are tiny)
    val px = points.map { case (id, x, y) =>
      val (cx, cy) = inv(x, y)
      (id, math.floor(cx).toInt, math.floor(cy).toInt)
    }
    val bpx = spark.sparkContext.broadcast(px)
    tiles
      .select("band", "tIdx", "x0", "y0", "width", "height",
        "data", "dtype", "nodata")
      .as[(String, Int, Int, Int, Int, Int, Array[Byte], String, Double)]
      .flatMap { case (band, tIdx, x0, y0, w, h, data, dtype, nodata) =>
        val hits = bpx.value.filter { case (_, gx, gy) =>
          gx >= x0 && gx < x0 + w && gy >= y0 && gy < y0 + h }
        if (hits.isEmpty) Iterator.empty
        else {
          val pix = Fuse.decode(data, dtype)
          hits.iterator.map { case (id, gx, gy) =>
            val v = pix((gy - y0) * w + (gx - x0))
            (id, band, tIdx,
              if (v.isNaN || v == nodata) Double.NaN else v)
          }
        }
      }
      .toDF("point_id", "band", "tIdx", "value")
  }

  /** Bilinear (sub-pixel) drill: the value at the exact world point,
    * interpolated from the 4 surrounding pixel centers. Cross-tile
    * windows need no halo: each tile emits the WEIGHTED TAPS it owns
    * (≤ 4 tiny rows per point), and a groupBy reassembles them — a
    * point has a value only when all four taps were valid (strict
    * nodata propagation; a cloudy tap NaNs the sample, it does not
    * skew it). */
  def drillBilinear(spark: SparkSession, tiles: DataFrame, geobox: GeoBox,
                    points: Seq[(String, Double, Double)]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val inv = geobox.transform.inverse
    // 4 taps per point, driver-side: (id, tap gx, tap gy, weight)
    val taps = points.flatMap { case (id, x, y) =>
      val (pxf, pyf) = inv(x, y)
      val x0 = math.floor(pxf - 0.5).toInt
      val y0 = math.floor(pyf - 0.5).toInt
      val fx = pxf - 0.5 - x0
      val fy = pyf - 0.5 - y0
      Seq(
        (id, x0, y0, (1 - fx) * (1 - fy)), (id, x0 + 1, y0, fx * (1 - fy)),
        (id, x0, y0 + 1, (1 - fx) * fy), (id, x0 + 1, y0 + 1, fx * fy))
    }
    val bt = spark.sparkContext.broadcast(taps)
    tiles
      .select("band", "tIdx", "x0", "y0", "width", "height",
        "data", "dtype", "nodata")
      .as[(String, Int, Int, Int, Int, Int, Array[Byte], String, Double)]
      .flatMap { case (band, tIdx, x0, y0, w, h, data, dtype, nodata) =>
        val own = bt.value.filter { case (_, gx, gy, _) =>
          gx >= x0 && gx < x0 + w && gy >= y0 && gy < y0 + h }
        if (own.isEmpty) Iterator.empty
        else {
          val pix = Fuse.decode(data, dtype)
          own.iterator.flatMap { case (id, gx, gy, wt) =>
            val v = pix((gy - y0) * w + (gx - x0))
            if (v.isNaN || v == nodata) None
            else Some((id, band, tIdx, wt, wt * v))
          }
        }
      }
      .toDF("point_id", "band", "tIdx", "w", "wv")
      .groupBy("point_id", "band", "tIdx")
      .agg(count(lit(1)).as("n_taps"),
        round(sum("wv"), 2).as("v"))
      .select(col("point_id"), col("band"), col("tIdx"),
        when(col("n_taps") === 4, col("v"))
          .otherwise(lit(Double.NaN)).as("value"))
  }
}
