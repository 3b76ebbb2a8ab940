package graft.load

import graft.geo.{BBox, GeoBox, Geom}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Rasterize — burn vector zones into pixel label planes (the inverse
  * of [[Zonal]]): segmentation masks for training data, category grids
  * for stratified sampling, AOI masks for downstream operators. Beyond
  * the reference surface (odc users shell out to `rasterio.features.
  * rasterize` per chunk by hand).
  *
  * Scale shape: the OUTPUT grid drives the parallelism — tile keys are
  * a `spark.range` over the tile grid (no input data at all), zones
  * broadcast WITH a driver-built tile index (zone bbox → covered tile
  * keys), so each task looks up its own zone list in O(1) and pays
  * O(own zones), never O(all zones) — a county layer over a continent
  * grid would otherwise re-test every polygon bbox on every one of
  * 10^6 tiles. Painting is the bbox-windowed even-odd ray cast
  * ([[Geom.containsPoint]] — the same predicate zonal statistics and
  * spatial binning use). Only tiles touched by at least one zone are
  * emitted: the result is the SPARSE label layer (background is
  * implicit), so a continent-sized grid with county polygons costs
  * polygons' tiles, not the grid.
  *
  * Painter's order: zones burn in sequence order, later zones
  * overwrite earlier ones where they overlap (the rasterio default).
  */
object Rasterize {

  /** Burn `zones` (id, geometry in `geobox.crs`) onto the `geobox`
    * grid tiled `chunk`×`chunk`. Returns one row per TOUCHED tile:
    * (ty, tx, x0, y0, width, height, plane: Array[Int], n_burned)
    * where plane holds zone ids and `background` elsewhere. */
  def burn(spark: SparkSession, geobox: GeoBox, chunk: Int,
           zones: Seq[(Int, Geom)], background: Int = 0): DataFrame = {
    import spark.implicits._
    require(zones.forall(_._2.crs == geobox.crs),
      s"zones must be in the output CRS ${geobox.crs.code}")
    val t = geobox.transform
    val inv = t.inverse
    val ntx = (geobox.width + chunk - 1) / chunk
    val nty = (geobox.height + chunk - 1) / chunk
    val (gw, gh) = (geobox.width, geobox.height)
    // driver-built tile index: zone seq-indices (painter's order kept)
    // per covered tile key, from the zone bbox's pixel rect — a task
    // looks up (ty, tx) in O(1) and sees only its own candidates
    val zoneArr = zones.toArray
    val tileIdx: Map[(Int, Int), Array[Int]] = {
      val m = scala.collection.mutable.LinkedHashMap
        .empty[(Int, Int), scala.collection.mutable.ArrayBuffer[Int]]
      zoneArr.iterator.zipWithIndex.foreach { case ((_, g), zi) =>
        val zb = g.bbox
        val cs = Seq(inv(zb.x0, zb.y0), inv(zb.x1, zb.y0),
          inv(zb.x0, zb.y1), inv(zb.x1, zb.y1))
        val px0 = math.max(0, math.floor(cs.map(_._1).min).toInt)
        val py0 = math.max(0, math.floor(cs.map(_._2).min).toInt)
        val px1 = math.min(gw - 1, math.ceil(cs.map(_._1).max).toInt)
        val py1 = math.min(gh - 1, math.ceil(cs.map(_._2).max).toInt)
        if (px0 <= px1 && py0 <= py1) {
          var ty = py0 / chunk
          while (ty <= py1 / chunk) {
            var tx = px0 / chunk
            while (tx <= px1 / chunk) {
              m.getOrElseUpdate((ty, tx),
                scala.collection.mutable.ArrayBuffer.empty[Int]) += zi
              tx += 1
            }
            ty += 1
          }
        }
      }
      m.iterator.map { case (k, v) => (k, v.toArray) }.toMap
    }
    val bz = spark.sparkContext.broadcast((zoneArr, tileIdx))
    spark.range(nty.toLong * ntx)
      .flatMap { idx =>
        val ty = (idx / ntx).toInt
        val tx = (idx % ntx).toInt
        val x0 = tx * chunk
        val y0 = ty * chunk
        val w = math.min(chunk, gw - x0)
        val h = math.min(chunk, gh - y0)
        val (ax, ay) = t(x0.toDouble, y0.toDouble)
        val (bx, by) = t((x0 + w).toDouble, (y0 + h).toDouble)
        val ext = BBox(math.min(ax, bx), math.min(ay, by),
          math.max(ax, bx), math.max(ay, by))
        val (zarr, tidx) = bz.value
        // O(own) exact filter over the bbox-indexed candidates
        val zs = tidx.getOrElse((ty, tx), Array.emptyIntArray)
          .map(zarr).filter(_._2.intersectsBox(ext)).toSeq
        if (zs.isEmpty) Iterator.empty
        else {
          val plane = Array.fill(w * h)(background)
          var burned = 0L
          zs.foreach { case (zid, g) =>
            val zb = g.bbox
            val cs = Seq(inv(zb.x0, zb.y0), inv(zb.x1, zb.y0),
              inv(zb.x0, zb.y1), inv(zb.x1, zb.y1))
            val lx0 = math.max(0, math.floor(cs.map(_._1).min).toInt - x0)
            val ly0 = math.max(0, math.floor(cs.map(_._2).min).toInt - y0)
            val lx1 = math.min(w, math.ceil(cs.map(_._1).max).toInt - x0)
            val ly1 = math.min(h, math.ceil(cs.map(_._2).max).toInt - y0)
            var y = ly0
            while (y < ly1) {
              var x = lx0
              while (x < lx1) {
                val (cx, cy) = t(x0 + x + 0.5, y0 + y + 0.5)
                if (g.containsPoint(cx, cy)) {
                  if (plane(y * w + x) == background) burned += 1
                  plane(y * w + x) = zid // painter: later zones win
                }
                x += 1
              }
              y += 1
            }
          }
          if (burned == 0) Iterator.empty
          else Iterator.single((ty, tx, x0, y0, w, h, plane, burned))
        }
      }
      .toDF("ty", "tx", "x0", "y0", "width", "height", "plane", "n_burned")
  }
}
