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
    assert(Crs.parse("EPSG:6933") == Crs.CylindricalEqualArea("EPSG:6933", 30.0))
    assert(Crs.parse("EPSG:5070") ==
      Crs.AlbersEqualArea("EPSG:5070", 23.0, -96.0, 29.5, 45.5))
    assert(Crs.parse("epsg:6931") == Crs.LambertAzimuthalEqualArea(6931, south = false))
    assert(Crs.parse("epsg:6932") == Crs.LambertAzimuthalEqualArea(6932, south = true))
    // parameterized registry rows (round-5): families already implemented,
    // the codes are one parameter line each
    assert(Crs.parse("EPSG:3577") ==
      Crs.AlbersEqualArea("EPSG:3577", 0.0, 132.0, -18.0, -36.0))
    assert(Crs.parse("epsg:9473") ==
      Crs.AlbersEqualArea("EPSG:9473", 0.0, 132.0, -18.0, -36.0))
    assert(Crs.parse("ESRI:54034") ==
      Crs.CylindricalEqualArea("ESRI:54034", 0.0))
    assertThrows[IllegalArgumentException](Crs.parse("EPSG:9999"))
  }

  test("EPSG:6933 known extents (EASE-Grid 2.0 Global published corners)") {
    val crs = Crs.parse("EPSG:6933")
    // x at the antimeridian: a*k0*pi = 17367530.45 m (NSIDC EASE-2 spec)
    val (xMax, _) = crs.forward(180.0, 0.0)
    assert(math.abs(xMax - 17367530.45) < 0.5, s"xMax=$xMax")
    // full-pole y: a*qp/(2 k0) = 7342230.14 m
    val (_, yPole) = crs.forward(0.0, 90.0)
    assert(math.abs(yPole - 7342230.14) < 0.5, s"yPole=$yPole")
    // equator + prime meridian is the origin
    val (x0, y0) = crs.forward(0.0, 0.0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6)
  }

  test("EPSG:5070 projection origin and standard-parallel scale") {
    val crs = Crs.parse("EPSG:5070")
    // (lon0, lat0) = (-96, 23) must map exactly to (0, 0)
    val (x0, y0) = crs.forward(-96.0, 23.0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6)
    // along a standard parallel the scale is true: 0.1 deg of longitude
    // at 29.5N spans 0.1/360 of that parallel's circumference
    val (xa, ya) = crs.forward(-96.05, 29.5)
    val (xb, yb) = crs.forward(-95.95, 29.5)
    val sin = math.sin(math.toRadians(29.5))
    val radius = 6378137.0 * math.cos(math.toRadians(29.5)) /
      math.sqrt(1 - 0.00669437999014132 * sin * sin)
    val expected = math.toRadians(0.1) * radius
    val got = math.hypot(xb - xa, yb - ya)
    assert(math.abs(got - expected) / expected < 1e-6, s"$got vs $expected")
  }

  test("EPSG:3577 projection origin and standard-parallel scale") {
    val crs = Crs.parse("EPSG:3577")
    // (lon0, lat0) = (132, 0) must map exactly to (0, 0)
    val (x0, y0) = crs.forward(132.0, 0.0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6, s"origin ($x0,$y0)")
    // along a standard parallel the scale is true (same check as 5070)
    val (xa, ya) = crs.forward(131.95, -18.0)
    val (xb, yb) = crs.forward(132.05, -18.0)
    val sin = math.sin(math.toRadians(-18.0))
    val radius = 6378137.0 * math.cos(math.toRadians(-18.0)) /
      math.sqrt(1 - 0.00669437999014132 * sin * sin)
    val expected = math.toRadians(0.1) * radius
    val got = math.hypot(xb - xa, yb - ya)
    assert(math.abs(got - expected) / expected < 1e-6, s"$got vs $expected")
    // Australia lands at plausible Albers coordinates: Sydney west-southwest
    // quadrant sanity (x > 0 east of lon0, y < 0 south of the equator)
    val (xs, ys) = crs.forward(151.2, -33.9)
    assert(xs > 0 && ys < 0)
  }

  test("EPSG:3083 false easting/northing: origin maps to (FE, FN)") {
    val crs = Crs.parse("EPSG:3083")
    // Texas Centric Albers: (lon0, lat0) = (-100, 18) -> (1500000, 5000000)
    val (x0, y0) = crs.forward(-100.0, 18.0)
    assert(math.abs(x0 - 1500000.0) < 1e-6 && math.abs(y0 - 5000000.0) < 1e-6,
      s"origin ($x0,$y0)")
    // roundtrip through the offset plane
    for ((lon, lat) <- Seq((-106.0, 31.8), (-94.0, 29.7), (-100.0, 27.5))) {
      val (x, y) = crs.forward(lon, lat)
      val (lon2, lat2) = crs.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("CEA central meridian wraps across the antimeridian") {
    // constructor-level (no registry row ships a non-zero CEA lon0 yet):
    // with lon0 = 132, lon = -180 sits 48 degrees EAST of the meridian,
    // not 312 degrees west off the map
    val crs = Crs.CylindricalEqualArea("TEST:CEA132", latTs = 0.0,
      lon0Deg = 132.0)
    val (xw, _) = crs.forward(-180.0, 0.0)
    val (xe, _) = crs.forward(180.0, 0.0) // same physical meridian
    assert(math.abs(xw - xe) < 1e-6)
    assert(xw > 0 && xw < 6378137.0 * math.Pi / 2, s"xw=$xw") // ~48 deg east
    val (lon2, _) = crs.inverse(xw, 0.0)
    assert(math.abs(lon2 - 180.0) < 1e-9 || math.abs(lon2 + 180.0) < 1e-9)
    // in-range identity: lon0 = 0 codes keep published +-180 behavior
    val cea0 = Crs.parse("ESRI:54034")
    assert(cea0.forward(180.0, 0.0)._1 > 0 && cea0.forward(-180.0, 0.0)._1 < 0)
  }

  test("ESRI:54034 known extents (World Cylindrical Equal Area)") {
    val crs = Crs.parse("ESRI:54034")
    // lat_ts = 0: x at the antimeridian is a*pi
    val (xMax, _) = crs.forward(180.0, 0.0)
    assert(math.abs(xMax - 20037508.342789244) < 1e-6, s"xMax=$xMax")
    // full-pole y: a*qp/2
    val (_, yPole) = crs.forward(0.0, 90.0)
    assert(math.abs(yPole - 6363885.33) < 0.5, s"yPole=$yPole")
    val (x0, y0) = crs.forward(0.0, 0.0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6)
  }

  test("equal-area CRSs: random-point roundtrip sweep over validity domains") {
    val cases = Seq(
      ("EPSG:6933", -180.0, 180.0, -85.0, 85.0),
      ("EPSG:5070", -125.0, -65.0, 22.0, 52.0), // CONUS
      ("EPSG:3577", 110.0, 155.0, -45.0, -9.0), // Australia
      ("ESRI:54034", -180.0, 180.0, -85.0, 85.0), // world CEA
      ("EPSG:6931", -180.0, 180.0, 30.0, 89.9), // north polar
      ("EPSG:6932", -180.0, 180.0, -89.9, -30.0)) // south polar
    for ((code, lo1, hi1, lo2, hi2) <- cases) {
      val crs = Crs.parse(code)
      val lons = samples(200, lo1, hi1, code.hashCode)
      val lats = samples(200, lo2, hi2, code.hashCode + 1)
      for ((lon, lat) <- lons.zip(lats)) {
        val (x, y) = crs.forward(lon, lat)
        assert(!x.isNaN && !y.isNaN, s"$code NaN at ($lon,$lat)")
        val (lon2, lat2) = crs.inverse(x, y)
        assert(math.abs(lon2 - lon) < 1e-6, s"$code lon $lon -> $lon2")
        assert(math.abs(lat2 - lat) < 1e-6, s"$code lat $lat -> $lat2")
      }
    }
  }

  test("equal-area CRSs roundtrip and preserve the ellipsoidal area element") {
    // |Jacobian d(x,y)/d(lon,lat)| must equal the WGS84 area element
    // a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2 — THE defining property
    // of an equal-area projection; checked by central differences.
    val a = 6378137.0; val e2 = 0.00669437999014132
    def areaElement(latDeg: Double): Double = {
      val phi = math.toRadians(latDeg); val s = math.sin(phi)
      a * a * (1 - e2) * math.cos(phi) / math.pow(1 - e2 * s * s, 2)
    }
    val cases: Seq[(String, Seq[(Double, Double)])] = Seq(
      "EPSG:6933" -> Seq((0.0, 0.0), (140.0, -35.0), (-96.0, 52.0), (30.0, 75.0)),
      "EPSG:5070" -> Seq((-96.0, 23.0), (-120.0, 49.0), (-75.0, 35.0), (-96.0, 29.5)),
      "EPSG:3577" -> Seq((132.0, 0.0), (115.0, -32.0), (151.0, -34.0), (132.0, -18.0)),
      "ESRI:54034" -> Seq((0.0, 0.0), (140.0, -35.0), (-96.0, 52.0)),
      "EPSG:6931" -> Seq((0.0, 85.0), (120.0, 60.0), (-45.0, 75.0)),
      "EPSG:6932" -> Seq((0.0, -85.0), (120.0, -60.0), (-45.0, -75.0)))
    for ((code, pts) <- cases; (lon, lat) <- pts) {
      val crs = Crs.parse(code)
      // roundtrip
      val (x, y) = crs.forward(lon, lat)
      val (lon2, lat2) = crs.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-7, s"$code lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-7, s"$code lat $lat -> $lat2")
      // area element via central differences (radians step)
      val h = 1e-6 // degrees
      val (xe1, ye1) = crs.forward(lon + h, lat); val (xe0, ye0) = crs.forward(lon - h, lat)
      val (xn1, yn1) = crs.forward(lon, lat + h); val (xn0, yn0) = crs.forward(lon, lat - h)
      val dLon = math.toRadians(2 * h); val dLat = math.toRadians(2 * h)
      val j = math.abs(((xe1 - xe0) / dLon) * ((yn1 - yn0) / dLat)
        - ((xn1 - xn0) / dLon) * ((ye1 - ye0) / dLat))
      val want = areaElement(lat)
      assert(math.abs(j - want) / want < 1e-4,
        s"$code at ($lon,$lat): |J|=$j want $want")
    }
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
