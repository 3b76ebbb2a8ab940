package graft.load

import graft.geo.{BBox, GeoBox, Geom}
import graft.load.Fuse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zonal statistics — per-zone / per-band / per-time aggregates of a
  * loaded raster over a set of polygon zones (fields, admin regions,
  * sample plots). Beyond the reference surface: odc-stac hands loaded
  * pixels to xarray and zonal reductions are the canonical next step of
  * every EO analysis; here they are a first-class distributed operator.
  *
  * Scale shape: zones are a broadcast-size table (thousands, not
  * millions); each TILE task folds its own pixels into one partial
  * (zone, band, tIdx) accumulator row, so the only shuffle is
  * |zones| × |bands| × |times| partial rows — never pixels. The pixel
  * loop is bounded to the zone's bbox intersected with the tile (a zone
  * touching one tile of a 10^6-tile mosaic costs one tile's scan), and
  * zones are prefiltered per tile with the polygon-vs-box test, so
  * tiles outside every zone decode nothing. Point-in-zone uses the same
  * even-odd ray cast as spatial binning (`Geom.containsPoint`) —
  * MultiPolygons and holes work unchanged.
  */
object Zonal {

  /** One tile's contribution to one (zone, band, tIdx) cell. */
  final case class Partial(zone: String, band: String, tIdx: Int,
                           n_valid: Long, total: Double,
                           vmin: Double, vmax: Double)

  /** Per-zone stats of `tiles` (a `LoadResult.tiles` frame on `geobox`).
    * Zones must already be in the output CRS (reproject with
    * `Geom.toCrs` first). Zones with no valid pixels yield no row. */
  def zonalStats(spark: SparkSession, tiles: DataFrame, geobox: GeoBox,
                 zones: Seq[(String, Geom)]): DataFrame = {
    import spark.implicits._
    require(zones.forall(_._2.crs == geobox.crs),
      s"zones must be in the output CRS ${geobox.crs.code}")
    val bz = spark.sparkContext.broadcast(zones)
    val t = geobox.transform
    val inv = t.inverse
    tiles
      .select(col("band"), col("tIdx"), col("x0"), col("y0"),
        col("width"), col("height"), col("dtype"), col("nodata"),
        col("data"))
      .as[(String, Int, Int, Int, Int, Int, String, Double, Array[Byte])]
      .flatMap { case (band, tIdx, x0, y0, w, h, dtype, nodata, data) =>
        val (ax, ay) = t(x0.toDouble, y0.toDouble)
        val (bx, by) = t((x0 + w).toDouble, (y0 + h).toDouble)
        val ext = BBox(math.min(ax, bx), math.min(ay, by),
          math.max(ax, bx), math.max(ay, by))
        val zs = bz.value.filter(_._2.intersectsBox(ext))
        if (zs.isEmpty) Iterator.empty
        else {
          val px = Fuse.decode(data, dtype)
          zs.iterator.flatMap { case (zid, g) =>
            // pixel window of the zone's bbox within this tile — all
            // four corners, so a rotated geobox transform still yields
            // a covering window (axis-aligned grids reduce to two)
            val zb = g.bbox
            val cs = Seq(inv(zb.x0, zb.y0), inv(zb.x1, zb.y0),
              inv(zb.x0, zb.y1), inv(zb.x1, zb.y1))
            val lx0 = math.max(0, math.floor(cs.map(_._1).min).toInt - x0)
            val ly0 = math.max(0, math.floor(cs.map(_._2).min).toInt - y0)
            val lx1 = math.min(w, math.ceil(cs.map(_._1).max).toInt - x0)
            val ly1 = math.min(h, math.ceil(cs.map(_._2).max).toInt - y0)
            var n = 0L; var s = 0.0
            var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
            var y = ly0
            while (y < ly1) {
              var x = lx0
              while (x < lx1) {
                val v = px(y * w + x)
                if (!(v.isNaN || v == nodata)) {
                  val (cx, cy) = t(x0 + x + 0.5, y0 + y + 0.5)
                  if (g.containsPoint(cx, cy)) {
                    n += 1; s += v
                    if (v < mn) mn = v
                    if (v > mx) mx = v
                  }
                }
                x += 1
              }
              y += 1
            }
            if (n == 0) None else Some(Partial(zid, band, tIdx, n, s, mn, mx))
          }
        }
      }
      .groupBy("zone", "band", "tIdx")
      .agg(sum("n_valid").as("n_valid"),
        round(sum("total"), 2).as("total"),
        round(min("vmin"), 2).as("vmin"),
        round(max("vmax"), 2).as("vmax"))
  }
}
