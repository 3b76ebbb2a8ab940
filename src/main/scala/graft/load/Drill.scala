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
  * kilobytes to megabytes) PRE-BINNED into a 256-px spatial-hash grid
  * driver-side, so each tile task probes only the hash buckets
  * overlapping its own extent — per-tile work is O(own points + bucket
  * slop), never O(all points) (10^6 points × 10^6 tiles would be 10^12
  * wasted predicate evaluations with a flat scan). The output is
  * |points| × |bands| × |times| rows and NOTHING shuffles but those.
  * Tiles that contain no point decode nothing.
  */
object Drill {

  /** Spatial-hash bucket width in pixels (2^8 = 256): tiles are
    * 64–512 px, so a tile probes at most a handful of buckets. */
  private[graft] val BucketBits = 8

  /** Bin entries by (gy >> bits, gx >> bits). Arithmetic shift floors
    * negatives, so out-of-grid points bin consistently with probes. */
  private[graft] def binByBucket[A](entries: Seq[A])(
      gx: A => Int, gy: A => Int): Map[(Int, Int), Seq[A]] =
    entries.groupBy(e => (gy(e) >> BucketBits, gx(e) >> BucketBits))

  /** All entries in buckets overlapping the tile rect — a superset of
    * the tile's own entries by at most the bucket slop, to be filtered
    * exactly by the caller. */
  private[graft] def candidates[A](binned: Map[(Int, Int), Seq[A]],
      x0: Int, y0: Int, w: Int, h: Int): Iterator[A] = {
    val by0 = y0 >> BucketBits
    val by1 = (y0 + h - 1) >> BucketBits
    val bx0 = x0 >> BucketBits
    val bx1 = (x0 + w - 1) >> BucketBits
    (by0 to by1).iterator.flatMap { by =>
      (bx0 to bx1).iterator.flatMap { bx =>
        binned.getOrElse((by, bx), Nil)
      }
    }
  }

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
    val bpx = spark.sparkContext.broadcast(
      binByBucket(px)(_._2, _._3))
    tiles
      .select("band", "tIdx", "x0", "y0", "width", "height",
        "data", "dtype", "nodata")
      .as[(String, Int, Int, Int, Int, Int, Array[Byte], String, Double)]
      .flatMap { case (band, tIdx, x0, y0, w, h, data, dtype, nodata) =>
        val hits = candidates(bpx.value, x0, y0, w, h)
          .filter { case (_, gx, gy) =>
            gx >= x0 && gx < x0 + w && gy >= y0 && gy < y0 + h }
          .toArray
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
    * point has a value only when all its CONTRIBUTING taps were valid
    * (strict nodata propagation: a cloudy tap NaNs the sample, it does
    * not skew it; a zero-weight tap — point on a pixel-center gridline
    * — is dropped driver-side and cannot veto). Returns the exact
    * interpolant, unquantized: presentation rounding belongs to the
    * caller. */
  def drillBilinear(spark: SparkSession, tiles: DataFrame, geobox: GeoBox,
                    points: Seq[(String, Double, Double)]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val inv = geobox.transform.inverse
    // ≤4 taps per point, driver-side: (id, tap gx, tap gy, weight,
    // n taps expected) — zero-weight taps contribute nothing, so they
    // are dropped here and `nexp` counts only the real contributors
    val taps = points.flatMap { case (id, x, y) =>
      val (pxf, pyf) = inv(x, y)
      val x0 = math.floor(pxf - 0.5).toInt
      val y0 = math.floor(pyf - 0.5).toInt
      val fx = pxf - 0.5 - x0
      val fy = pyf - 0.5 - y0
      val four = Seq(
        (id, x0, y0, (1 - fx) * (1 - fy)), (id, x0 + 1, y0, fx * (1 - fy)),
        (id, x0, y0 + 1, (1 - fx) * fy), (id, x0 + 1, y0 + 1, fx * fy))
        .filter(_._4 != 0.0)
      four.map { case (i, gx, gy, wt) => (i, gx, gy, wt, four.length) }
    }
    val bt = spark.sparkContext.broadcast(
      binByBucket(taps)(_._2, _._3))
    tiles
      .select("band", "tIdx", "x0", "y0", "width", "height",
        "data", "dtype", "nodata")
      .as[(String, Int, Int, Int, Int, Int, Array[Byte], String, Double)]
      .flatMap { case (band, tIdx, x0, y0, w, h, data, dtype, nodata) =>
        val own = candidates(bt.value, x0, y0, w, h)
          .filter { case (_, gx, gy, _, _) =>
            gx >= x0 && gx < x0 + w && gy >= y0 && gy < y0 + h }
          .toArray
        if (own.isEmpty) Iterator.empty
        else {
          val pix = Fuse.decode(data, dtype)
          own.iterator.flatMap { case (id, gx, gy, wt, nexp) =>
            val v = pix((gy - y0) * w + (gx - x0))
            if (v.isNaN || v == nodata) None
            else Some((id, band, tIdx, wt * v, nexp))
          }
        }
      }
      .toDF("point_id", "band", "tIdx", "wv", "nexp")
      .groupBy("point_id", "band", "tIdx")
      .agg(count(lit(1)).as("n_taps"), max("nexp").as("nexp"),
        sum("wv").as("v"))
      .select(col("point_id"), col("band"), col("tIdx"),
        when(col("n_taps") === col("nexp"), col("v"))
          .otherwise(lit(Double.NaN)).as("value"))
  }
}
