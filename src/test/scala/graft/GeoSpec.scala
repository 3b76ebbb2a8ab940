package graft

import graft.geo._
import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {

  /** deterministic pseudo-random samples (scalatestplus not available
    * offline; same spirit as ScalaCheck forAll) */
  private def samples(n: Int, lo: Double, hi: Double, seed: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(lo + r.nextDouble() * (hi - lo))
  }

  test("UTM forward matches known anchor point (zone central meridian)") {
    // On the central meridian at the equator: easting=500000, northing=0
    val (e, n) = Crs.Utm(33, south = false).forward(15.0, 0.0)
    assert(math.abs(e - 500000.0) < 0.01)
    assert(math.abs(n) < 0.01)
    // southern hemisphere false northing
    val (_, ns) = Crs.Utm(33, south = true).forward(15.0, -0.0001)
    assert(ns < 10000000.0 && ns > 9999980.0)
  }

  test("UTM forward/inverse roundtrip is sub-millimeter in-zone") {
    for ((lon, lat) <- samples(200, 12.0, 18.0, 1).zip(samples(200, -60.0, 60.0, 2))) {
      val crs = Crs.Utm(33, south = lat < 0)
      val (x, y) = crs.forward(lon, lat)
      val (lon2, lat2) = crs.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-8, s"lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-8, s"lat $lat -> $lat2")
    }
  }

  test("web mercator known point + roundtrip") {
    val (x, y) = Crs.WebMercator.forward(0, 0)
    assert(math.abs(x) < 1e-6 && math.abs(y) < 1e-6)
    val (x1, _) = Crs.WebMercator.forward(180, 0)
    assert(math.abs(x1 - 20037508.34) < 0.01)
    val (lon, lat) = Crs.WebMercator.inverse(
      Crs.WebMercator.forward(12.34, 56.78)._1,
      Crs.WebMercator.forward(12.34, 56.78)._2)
    assert(math.abs(lon - 12.34) < 1e-9 && math.abs(lat - 56.78) < 1e-9)
  }

  test("CRS parse registry") {
    assert(Crs.parse("EPSG:32735") == Crs.Utm(35, south = true))
    assert(Crs.parse("epsg:32606") == Crs.Utm(6, south = false))
    assert(Crs.parse("EPSG:4326") == Crs.LonLat)
    assertThrows[IllegalArgumentException](Crs.parse("EPSG:9999"))
  }

  test("affine inverse and compose") {
    for ((x, y) <- samples(100, -100, 100, 3).zip(samples(100, -100, 100, 4))) {
      val a = Affine(10, 0, 500, 0, -10, 8000)
      val (wx, wy) = a(x, y)
      val (px, py) = a.inverse(wx, wy)
      assert(math.abs(px - x) < 1e-9 && math.abs(py - y) < 1e-9)
      val id = a.compose(a.inverse)
      assert(math.abs(id.a - 1) < 1e-9 && math.abs(id.c) < 1e-6)
    }
  }

  test("GeoBox.fromBBox snaps origin to edge anchor and covers bbox") {
    val b = BBox(12.3, 45.6, 101.7, 88.2)
    val g = GeoBox.fromBBox(b, 10.0, Crs.WebMercator)
    assert(g.transform.c <= b.x0 && g.transform.c % 10.0 == 0.0)
    assert(g.transform.f >= b.y1 && g.transform.f % 10.0 == 0.0)
    val e = g.extent
    assert(e.x0 <= b.x0 && e.x1 >= b.x1 && e.y0 <= b.y0 && e.y1 >= b.y1)
  }

  test("anchor detection: edge, center, custom (F8)") {
    assert(GeoBox(4, 4, Affine.grid(100, 200, 10, -10), Crs.WebMercator)
      .anchor() == Anchor.Edge)
    assert(GeoBox(4, 4, Affine.grid(105, 205, 10, -10), Crs.WebMercator)
      .anchor() == Anchor.Center)
    val a = GeoBox(4, 4, Affine.grid(102, 200, 10, -10), Crs.WebMercator).anchor()
    assert(math.abs(a.x - 0.8) < 1e-6 && a.y == 0.0)
  }

  test("geobox gsd and 1x1 geobox (F10/F11)") {
    val g = GeoBox(4, 8, Affine.grid(0, 0, 10, -20), Crs.WebMercator)
    assert(g.gsd == 10.0)
    val one = GeoBox.oneByOne(Geom.box(BBox(1, 2, 5, 9), Crs.WebMercator))
    assert(one.width == 1 && one.height == 1)
    assert(one.extent == BBox(1, 2, 5, 9))
  }

  test("polygon intersectsBox: inside, overlapping, disjoint, surrounding") {
    val poly = Geom.box(BBox(10, 10, 20, 20), Crs.WebMercator)
    assert(poly.intersectsBox(BBox(12, 12, 15, 15))) // box inside poly
    assert(poly.intersectsBox(BBox(15, 15, 30, 30))) // overlap
    assert(poly.intersectsBox(BBox(0, 0, 100, 100))) // poly inside box
    assert(!poly.intersectsBox(BBox(30, 30, 40, 40))) // disjoint
  }

  test("multipolygon: bbox, area, centroid, containsPoint over parts") {
    val twoSquares = Geom(IndexedSeq(
      Poly(IndexedSeq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))),
      Poly(IndexedSeq((20.0, 0.0), (30.0, 0.0), (30.0, 10.0), (20.0, 10.0)))),
      Crs.WebMercator)
    assert(twoSquares.bbox == BBox(0, 0, 30, 10))
    assert(twoSquares.area == 200.0)
    assert(twoSquares.centroid == (15.0, 5.0)) // mean of equal-area parts
    assert(twoSquares.containsPoint(5, 5))
    assert(twoSquares.containsPoint(25, 5))
    assert(!twoSquares.containsPoint(15, 5)) // gap between parts
    assert(twoSquares.intersectsBox(BBox(22, 2, 28, 8)))
    assert(!twoSquares.intersectsBox(BBox(12, 2, 18, 8))) // box in the gap
  }

  test("polygon with hole: area subtracts, hole interior is outside") {
    val holed = Geom(IndexedSeq(Poly(
      IndexedSeq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)),
      IndexedSeq(IndexedSeq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0))))),
      Crs.WebMercator)
    assert(holed.area == 100.0 - 4.0)
    assert(holed.containsPoint(1, 1))
    assert(!holed.containsPoint(5, 5)) // inside the hole = outside the poly
    assert(holed.centroid == (5.0, 5.0)) // symmetric hole keeps the centroid
    // box strictly inside the hole does NOT intersect
    assert(!holed.intersectsBox(BBox(4.5, 4.5, 5.5, 5.5)))
    // box straddling the hole boundary DOES
    assert(holed.intersectsBox(BBox(3.0, 3.0, 5.0, 5.0)))
    // densified reprojection keeps the hole a hole
    val ll = holed.toCrs(Crs.LonLat)
    assert(ll.parts.head.holes.nonEmpty)
  }

  test("GeomData roundtrips multipolygon + holes through the Spark encoding") {
    val g = Geom(IndexedSeq(
      Poly(IndexedSeq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)),
        IndexedSeq(IndexedSeq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0)))),
      Poly(IndexedSeq((20.0, 0.0), (30.0, 0.0), (30.0, 10.0), (20.0, 10.0)))),
      Crs.LonLat)
    val rt = graft.model.GeomData.from(g).toGeom
    assert(rt == g)
    // single-ring compat encoding (no ring metadata) still reads
    val legacy = graft.model.GeomData(
      Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0), "EPSG:4326")
    assert(legacy.toGeom == Geom.box(BBox(0, 0, 10, 10), Crs.LonLat))
  }

  test("GeoBoxTiles covers the grid and finds intersecting tiles") {
    val base = GeoBox(100, 90, Affine.grid(0, 900, 10, -10), Crs.WebMercator)
    val gbt = GeoBoxTiles(base, 32, 32)
    assert(gbt.nx == 4 && gbt.ny == 3)
    val last = gbt.tileGeobox(2, 3)
    assert(last.width == 4 && last.height == 26)
    // footprint covering pixel box x:[0,350) y:[0,320) -> tiles tx 0..1, ty 0
    val fp = Geom.box(BBox(5, 900 - 315, 345, 895), Crs.WebMercator)
    val tiles = gbt.tilesIntersecting(fp).toSet
    assert(tiles == Set((0, 0), (0, 1)))
  }

  test("densified reprojection keeps bbox approximately right") {
    val utm = Crs.Utm(35, south = true)
    val g = Geom.box(BBox(500000, 8000000, 510000, 8010000), utm).toCrs(Crs.LonLat)
    // back-project the bbox corners: should contain the original box center
    val back = g.toCrs(utm)
    val c = back.centroid
    assert(math.abs(c._1 - 505000) < 50 && math.abs(c._2 - 8005000) < 50)
    assert(back.ring.length >= 100) // densified
  }
}
