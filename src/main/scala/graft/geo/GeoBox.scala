package graft.geo

/** Grid anchor: fractional sub-pixel offset of the world origin
  * (`_mdtools.py:255-267`). EDGE = (0,0), CENTER = (0.5,0.5). */
final case class Anchor(x: Double, y: Double)
object Anchor {
  val Edge: Anchor = Anchor(0, 0)
  val Center: Anchor = Anchor(0.5, 0.5)
}

/** Output/input grid: CRS + affine (pixel->world) + size in pixels.
  * Mirrors the odc-geo GeoBox surface the reference consumes
  * (`model.py:222-240`, `_mdtools.py:270-313`).
  */
final case class GeoBox(width: Int, height: Int, transform: Affine, crs: Crs) {

  def resX: Double = transform.a
  def resY: Double = transform.e

  /** Ground sampling distance: min |resolution| (F10, `_mdtools.py:306-313`). */
  def gsd: Double = math.min(math.abs(transform.a), math.abs(transform.e))

  /** World-space bounds of the full grid. */
  lazy val extent: BBox = {
    val corners = Seq(
      transform(0, 0), transform(width, 0),
      transform(width, height), transform(0, height))
    BBox(corners.map(_._1).min, corners.map(_._2).min,
      corners.map(_._1).max, corners.map(_._2).max)
  }

  def extentGeom: Geom = Geom.box(extent, crs)

  /** Densified footprint in another CRS. */
  def footprint(to: Crs): Geom = extentGeom.toCrs(to)

  def worldToPix(x: Double, y: Double): (Double, Double) = transform.inverse(x, y)

  /** Sub-pixel anchor of the world origin (F8, `_mdtools.py:255-267`). */
  def anchor(tol: Double = 1e-3): Anchor = {
    def frac(px: Double): Double = {
      var v = px - math.round(px)
      if (v < 0) v += 1
      v = if (math.abs(v) < tol || math.abs(v - 1) < tol) 0
      else if (math.abs(v - 0.5) < tol) 0.5
      else v
      v
    }
    val (px, py) = transform.inverse(0, 0)
    Anchor(frac(px), frac(py))
  }

  /** Equality key for grid elections (A4/A8): (crs, |res|, anchor). */
  def gridKey: (String, Double, Double, Double, Double) = {
    val a = anchor()
    (crs.code, transform.a, transform.e, a.x, a.y)
  }

  /** Crop to a pixel window (x0, y0, w, h). */
  def slice(x0: Int, y0: Int, w: Int, h: Int): GeoBox = {
    val (ox, oy) = transform(x0, y0)
    GeoBox(w, h, Affine(transform.a, transform.b, ox, transform.d, transform.e, oy), crs)
  }
}

object GeoBox {

  /** Build from world bbox + resolution (+anchor), like
    * `GeoBox.from_bbox`: snap origin to the anchor lattice, round size up
    * so the bbox is covered. Y axis is north-up inverted (resY < 0). */
  def fromBBox(b: BBox, resolution: Double, crs: Crs,
               anchor: Anchor = Anchor.Edge): GeoBox =
    fromBBoxXY(b, resolution, -resolution, crs, anchor)

  /** Anisotropic variant: the full signed `(resX, resY)` pair survives
    * grid election (reference `_most_common_gbox` elects a Resolution, not
    * a scalar), so anisotropic-pixel collections keep their pixel shape
    * instead of being silently resampled to squares. */
  def fromBBoxXY(b: BBox, resX: Double, resY: Double, crs: Crs,
                 anchor: Anchor = Anchor.Edge): GeoBox = {
    val rx = math.abs(resX)
    val ry = math.abs(resY)
    val ox = (math.floor(b.x0 / rx - anchor.x) + anchor.x) * rx
    val oy = (math.ceil(b.y1 / ry + anchor.y) - anchor.y) * ry
    val w = math.max(1, math.ceil((b.x1 - ox) / rx).toInt)
    val h = math.max(1, math.ceil((oy - b.y0) / ry).toInt)
    GeoBox(w, h, Affine.grid(ox, oy, rx, -ry), crs)
  }

  /** From a geopolygon (bbox of it), reference
    * `GeoBox.from_geopolygon(geopolygon, resolution, crs, anchor)`. */
  def fromGeopolygon(g: Geom, resolution: Double, crs: Crs,
                     anchor: Anchor = Anchor.Edge): GeoBox =
    fromBBox(g.toCrs(crs).bbox, resolution, crs, anchor)

  def fromGeopolygonXY(g: Geom, resX: Double, resY: Double, crs: Crs,
                       anchor: Anchor = Anchor.Edge): GeoBox =
    fromBBoxXY(g.toCrs(crs).bbox, resX, resY, crs, anchor)

  /** 1x1 pixel geobox tightly enclosing a geometry
    * (F11, `_mdtools.py:241-252`; note inverted Y). */
  def oneByOne(g: Geom): GeoBox = {
    val b = g.bbox
    GeoBox(1, 1, Affine(b.width, 0, b.x0, 0, -b.height, b.y1), g.crs)
  }
}

/** Regular tiling of a GeoBox (the reference's GeoboxTiles: partition
  * scheme for the pixel plane, `_stac_load.py:426`). */
final case class GeoBoxTiles(base: GeoBox, tileW: Int, tileH: Int) {
  val nx: Int = (base.width + tileW - 1) / tileW
  val ny: Int = (base.height + tileH - 1) / tileH

  def tileGeobox(ty: Int, tx: Int): GeoBox = {
    val x0 = tx * tileW
    val y0 = ty * tileH
    base.slice(x0, y0, math.min(tileW, base.width - x0),
      math.min(tileH, base.height - y0))
  }

  /** Tile indices whose extent intersects the geometry (P4: spatial tile
    * predicate). Geometry must already be in `base.crs`. Candidate range
    * from the bbox, then precise polygon-box test per candidate. */
  def tilesIntersecting(g: Geom): Seq[(Int, Int)] = {
    require(g.crs == base.crs, "geometry must be in grid CRS")
    val b = g.bbox
    val inv = base.transform.inverse
    val corners = Seq(
      inv(b.x0, b.y0), inv(b.x1, b.y0), inv(b.x1, b.y1), inv(b.x0, b.y1))
    val px0 = corners.map(_._1).min
    val px1 = corners.map(_._1).max
    val py0 = corners.map(_._2).min
    val py1 = corners.map(_._2).max
    val tx0 = math.max(0, math.floor(px0 / tileW).toInt)
    val tx1 = math.min(nx - 1, math.floor((px1 - 1e-9) / tileW).toInt)
    val ty0 = math.max(0, math.floor(py0 / tileH).toInt)
    val ty1 = math.min(ny - 1, math.floor((py1 - 1e-9) / tileH).toInt)
    for {
      ty <- ty0 to ty1
      tx <- tx0 to tx1
      if g.intersectsBox(tileGeobox(ty, tx).extent)
    } yield (ty, tx)
  }
}
