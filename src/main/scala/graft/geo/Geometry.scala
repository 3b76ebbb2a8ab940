package graft.geo

/** Bounding box (x0 <= x1, y0 <= y1). */
final case class BBox(x0: Double, y0: Double, x1: Double, y1: Double) {
  def union(o: BBox): BBox =
    BBox(math.min(x0, o.x0), math.min(y0, o.y0),
      math.max(x1, o.x1), math.max(y1, o.y1))
  def intersects(o: BBox): Boolean =
    x0 <= o.x1 && o.x0 <= x1 && y0 <= o.y1 && o.y0 <= y1
  def contains(x: Double, y: Double): Boolean =
    x >= x0 && x <= x1 && y >= y0 && y <= y1
  def width: Double = x1 - x0
  def height: Double = y1 - y0
}

/** Simple polygon (outer ring only — STAC footprints are simple polys) in
  * a given CRS. Mirrors the subset of odc-geo's Geometry the reference
  * consumes: bbox, centroid, intersect tests, densified reprojection
  * (`model.py:271-299`, `_mdtools.py:768-803`).
  */
final case class Geom(ring: IndexedSeq[(Double, Double)], crs: Crs) {
  require(ring.nonEmpty, "empty ring")

  lazy val bbox: BBox = {
    var (ax0, ay0, ax1, ay1) =
      (Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)
    ring.foreach { case (x, y) =>
      if (x < ax0) ax0 = x; if (x > ax1) ax1 = x
      if (y < ay0) ay0 = y; if (y > ay1) ay1 = y
    }
    BBox(ax0, ay0, ax1, ay1)
  }

  /** Area via shoelace (abs). */
  def area: Double = {
    var s = 0.0
    var i = 0
    val n = ring.length
    while (i < n) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % n)
      s += x1 * y2 - x2 * y1
      i += 1
    }
    math.abs(s) / 2
  }

  /** Centroid of the ring vertices-weighted polygon. */
  def centroid: (Double, Double) = {
    var cx = 0.0; var cy = 0.0; var s = 0.0
    var i = 0
    val n = ring.length
    while (i < n) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % n)
      val cross = x1 * y2 - x2 * y1
      cx += (x1 + x2) * cross
      cy += (y1 + y2) * cross
      s += cross
      i += 1
    }
    if (math.abs(s) < 1e-12) {
      // degenerate: average of vertices
      (ring.map(_._1).sum / n, ring.map(_._2).sum / n)
    } else (cx / (3 * s), cy / (3 * s))
  }

  def containsPoint(px: Double, py: Double): Boolean = {
    // ray cast
    var inside = false
    var i = 0
    val n = ring.length
    var j = n - 1
    while (i < n) {
      val (xi, yi) = ring(i)
      val (xj, yj) = ring(j)
      if (((yi > py) != (yj > py)) &&
        (px < (xj - xi) * (py - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Polygon-vs-box intersection: bbox overlap, then vertex-in-box,
    * box-corner-in-polygon, or edge crossing. */
  def intersectsBox(b: BBox): Boolean = {
    if (!bbox.intersects(b)) return false
    if (ring.exists { case (x, y) => b.contains(x, y) }) return true
    val corners = Seq((b.x0, b.y0), (b.x0, b.y1), (b.x1, b.y0), (b.x1, b.y1))
    if (corners.exists { case (x, y) => containsPoint(x, y) }) return true
    val boxEdges = Seq(
      ((b.x0, b.y0), (b.x1, b.y0)), ((b.x1, b.y0), (b.x1, b.y1)),
      ((b.x1, b.y1), (b.x0, b.y1)), ((b.x0, b.y1), (b.x0, b.y0)))
    var i = 0
    val n = ring.length
    while (i < n) {
      val e1 = (ring(i), ring((i + 1) % n))
      if (boxEdges.exists(e2 => Geom.segmentsIntersect(e1._1, e1._2, e2._1, e2._2)))
        return true
      i += 1
    }
    false
  }

  /** Reproject with edge densification: sample extra vertices so curved
    * projected edges stay inside tolerance (reference densifies to >=100
    * points around the perimeter, `model.py:293-299`). */
  def toCrs(to: Crs, minPoints: Int = 100): Geom = {
    if (to == crs) return this
    val n = ring.length
    val perPoint = math.max(1, math.ceil(minPoints.toDouble / n).toInt)
    val dense = (0 until n).flatMap { i =>
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % n)
      (0 until perPoint).map { s =>
        val t = s.toDouble / perPoint
        (x1 + (x2 - x1) * t, y1 + (y2 - y1) * t)
      }
    }
    Geom(dense.map { case (x, y) => Crs.transform(crs, to, x, y) }, to)
  }
}

object Geom {
  def box(b: BBox, crs: Crs): Geom =
    Geom(IndexedSeq((b.x0, b.y0), (b.x1, b.y0), (b.x1, b.y1), (b.x0, b.y1)), crs)

  private[geo] def segmentsIntersect(p1: (Double, Double), p2: (Double, Double),
                                     p3: (Double, Double), p4: (Double, Double)): Boolean = {
    def orient(a: (Double, Double), b: (Double, Double), c: (Double, Double)): Int = {
      val v = (b._2 - a._2) * (c._1 - b._1) - (b._1 - a._1) * (c._2 - b._2)
      if (v > 1e-12) 1 else if (v < -1e-12) -1 else 0
    }
    def onSeg(a: (Double, Double), b: (Double, Double), c: (Double, Double)): Boolean =
      c._1 >= math.min(a._1, b._1) && c._1 <= math.max(a._1, b._1) &&
        c._2 >= math.min(a._2, b._2) && c._2 <= math.max(a._2, b._2)
    val (o1, o2, o3, o4) =
      (orient(p1, p2, p3), orient(p1, p2, p4), orient(p3, p4, p1), orient(p3, p4, p2))
    (o1 != o2 && o3 != o4) ||
      (o1 == 0 && onSeg(p1, p2, p3)) || (o2 == 0 && onSeg(p1, p2, p4)) ||
      (o3 == 0 && onSeg(p3, p4, p1)) || (o4 == 0 && onSeg(p3, p4, p2))
  }
}
