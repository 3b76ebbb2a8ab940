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

/** One polygon part: outer ring + interior holes (rings stored open —
  * no repeated closing point). */
final case class Poly(outer: IndexedSeq[(Double, Double)],
                      holes: IndexedSeq[IndexedSeq[(Double, Double)]] =
                        IndexedSeq.empty) {
  require(outer.nonEmpty, "empty outer ring")
  def rings: IndexedSeq[IndexedSeq[(Double, Double)]] = outer +: holes
}

/** Polygon / MultiPolygon (with holes) in a given CRS. Mirrors the subset
  * of odc-geo's Geometry the reference consumes: bbox, centroid, intersect
  * tests, densified reprojection (`model.py:271-299`,
  * `_mdtools.py:768-803`). Point-in-polygon uses the even-odd rule over
  * ALL rings, so holes and disjoint parts fall out of one ray cast —
  * MultiPolygon footprints (e.g. antimeridian-split Landsat/Sentinel
  * scenes) participate in spatial binning like any simple polygon.
  */
final case class Geom(parts: IndexedSeq[Poly], crs: Crs) {
  require(parts.nonEmpty, "empty geometry")

  /** Primary outer ring (compat accessor for single-polygon consumers). */
  def ring: IndexedSeq[(Double, Double)] = parts.head.outer

  private def allRings: IndexedSeq[IndexedSeq[(Double, Double)]] =
    parts.flatMap(_.rings)

  lazy val bbox: BBox = {
    var (ax0, ay0, ax1, ay1) =
      (Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)
    parts.foreach(_.outer.foreach { case (x, y) =>
      if (x < ax0) ax0 = x; if (x > ax1) ax1 = x
      if (y < ay0) ay0 = y; if (y > ay1) ay1 = y
    })
    BBox(ax0, ay0, ax1, ay1)
  }

  /** Signed shoelace area of one ring (positive = CCW). */
  private def shoelace(r: IndexedSeq[(Double, Double)]): Double = {
    var s = 0.0
    var i = 0
    val n = r.length
    while (i < n) {
      val (x1, y1) = r(i)
      val (x2, y2) = r((i + 1) % n)
      s += x1 * y2 - x2 * y1
      i += 1
    }
    s / 2
  }

  /** Area: outer parts minus holes, summed across parts. */
  def area: Double =
    parts.map(p => math.abs(shoelace(p.outer)) -
      p.holes.map(h => math.abs(shoelace(h))).sum).sum

  /** Area-weighted centroid across parts, holes subtracted: rings are
    * oriented (outer CCW, holes CW) and their shoelace moments summed. */
  def centroid: (Double, Double) = {
    var cx = 0.0; var cy = 0.0; var s = 0.0
    parts.foreach { p =>
      p.rings.zipWithIndex.foreach { case (r0, ri) =>
        val sign = shoelace(r0)
        // orient: outer positive, holes negative
        val flip = if (ri == 0) sign < 0 else sign > 0
        val r = if (flip) r0.reverse else r0
        var i = 0
        val n = r.length
        while (i < n) {
          val (x1, y1) = r(i)
          val (x2, y2) = r((i + 1) % n)
          val cross = x1 * y2 - x2 * y1
          cx += (x1 + x2) * cross
          cy += (y1 + y2) * cross
          s += cross
          i += 1
        }
      }
    }
    if (math.abs(s) < 1e-12) {
      // degenerate: average of outer vertices
      val pts = parts.flatMap(_.outer)
      (pts.map(_._1).sum / pts.length, pts.map(_._2).sum / pts.length)
    } else (cx / (3 * s), cy / (3 * s))
  }

  /** Even-odd ray cast over every ring: handles holes and multiple
    * disjoint parts in one pass. */
  def containsPoint(px: Double, py: Double): Boolean = {
    var inside = false
    allRings.foreach { r =>
      var i = 0
      val n = r.length
      var j = n - 1
      while (i < n) {
        val (xi, yi) = r(i)
        val (xj, yj) = r(j)
        if (((yi > py) != (yj > py)) &&
          (px < (xj - xi) * (py - yi) / (yj - yi) + xi)) inside = !inside
        j = i
        i += 1
      }
    }
    inside
  }

  /** Polygon-vs-box intersection: bbox overlap, then vertex-in-box,
    * box-corner-in-polygon, or edge crossing — over all rings (a box
    * entirely inside a hole correctly reports no intersection). */
  def intersectsBox(b: BBox): Boolean = {
    if (!bbox.intersects(b)) return false
    val rings = allRings
    // any ring vertex (outer or hole boundary) inside the box
    if (rings.exists(_.exists { case (x, y) => b.contains(x, y) })) return true
    val corners = Seq((b.x0, b.y0), (b.x0, b.y1), (b.x1, b.y0), (b.x1, b.y1))
    if (corners.exists { case (x, y) => containsPoint(x, y) }) return true
    val boxEdges = Seq(
      ((b.x0, b.y0), (b.x1, b.y0)), ((b.x1, b.y0), (b.x1, b.y1)),
      ((b.x1, b.y1), (b.x0, b.y1)), ((b.x0, b.y1), (b.x0, b.y0)))
    rings.exists { r =>
      var i = 0
      val n = r.length
      var hit = false
      while (i < n && !hit) {
        val e1 = (r(i), r((i + 1) % n))
        hit = boxEdges.exists(e2 =>
          Geom.segmentsIntersect(e1._1, e1._2, e2._1, e2._2))
        i += 1
      }
      hit
    }
  }

  /** Reproject with edge densification: sample extra vertices so curved
    * projected edges stay inside tolerance (reference densifies to >=100
    * points around the perimeter, `model.py:293-299`). Applied per ring. */
  def toCrs(to: Crs, minPoints: Int = 100): Geom = {
    if (to == crs) return this
    def dense(r: IndexedSeq[(Double, Double)]): IndexedSeq[(Double, Double)] = {
      val n = r.length
      val perPoint = math.max(1, math.ceil(minPoints.toDouble / n).toInt)
      (0 until n).flatMap { i =>
        val (x1, y1) = r(i)
        val (x2, y2) = r((i + 1) % n)
        (0 until perPoint).map { s =>
          val t = s.toDouble / perPoint
          (x1 + (x2 - x1) * t, y1 + (y2 - y1) * t)
        }
      }.map { case (x, y) => Crs.transform(crs, to, x, y) }
    }
    Geom(parts.map(p => Poly(dense(p.outer), p.holes.map(dense))), to)
  }
}

object Geom {
  /** Single simple polygon (outer ring only) — the common case. */
  def apply(ring: IndexedSeq[(Double, Double)], crs: Crs)
           (implicit d: DummyImplicit): Geom =
    Geom(IndexedSeq(Poly(ring)), crs)

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
