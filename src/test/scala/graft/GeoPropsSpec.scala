package graft

import graft.geo._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property tests for the pure geo/time math (SURVEY §5.2):
  * affine inverse, CRS forward/inverse roundtrips, tiling invariants,
  * anchor snapping, solar-time truncation semantics
  * (reference: `model.py:454-458`, `_mdtools.py:255-267`,
  * GeoboxTiles usage `_stac_load.py:426`). */
class GeoPropsSpec extends AnyFunSuite {

  /** Run a ScalaCheck property under this suite (no scalatest bridge in
    * the offline cache). */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    check(Prop.forAll(ga, gb) { (a, b) => f(a, b); true })

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    check(Prop.forAll(ga, gb, gc) { (a, b, c) => f(a, b, c); true })

  private def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(f: (A, B, C, D) => Unit): Unit =
    check(Prop.forAll(ga, gb, gc, gd) { (a, b, c, d) => f(a, b, c, d); true })

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    check(Prop.forAll(ga) { a => f(a); true })

  private val coordGen = for {
    x <- Gen.chooseNum(-1e7, 1e7)
    y <- Gen.chooseNum(-1e7, 1e7)
  } yield (x, y)

  private val affineGen = for {
    a <- Gen.chooseNum(0.1, 1000.0)
    e <- Gen.chooseNum(-1000.0, -0.1)
    c <- Gen.chooseNum(-1e7, 1e7)
    f <- Gen.chooseNum(-1e7, 1e7)
    b <- Gen.oneOf(Gen.const(0.0), Gen.chooseNum(-10.0, 10.0))
    d <- Gen.oneOf(Gen.const(0.0), Gen.chooseNum(-10.0, 10.0))
  } yield Affine(a, b, c, d, e, f)

  test("affine inverse roundtrips world<->pixel") {
    forAll(affineGen, coordGen) { (t, p) =>
      if (math.abs(t.det) > 1e-6) {
        val (wx, wy) = t(p._1, p._2)
        val (bx, by) = t.inverse(wx, wy)
        // roundtrip error bound must track the CONDITIONING, not just
        // the input magnitude: the inverse amplifies the forward's
        // rounding (~eps*|world|) by ~||A^-1|| — a 0.1-scale/10-shear
        // transform at 1e7 offsets legitimately loses ~1e-6 pixels
        val condInv = (math.abs(t.a) + math.abs(t.b) + math.abs(t.d) +
          math.abs(t.e)) / math.abs(t.det)
        val scale = math.max(1.0,
          (math.abs(wx) + math.abs(wy)) * math.max(1.0, condInv))
        assert(math.abs(bx - p._1) / scale < 1e-12)
        assert(math.abs(by - p._2) / scale < 1e-12)
      }
    }
  }

  test("UTM forward/inverse roundtrips within the zone") {
    val zoneGen = Gen.chooseNum(1, 60)
    forAll(zoneGen, Gen.chooseNum(-3.0, 3.0), Gen.chooseNum(-75.0, 75.0),
      Gen.oneOf(true, false)) { (zone, dLon, lat, south) =>
      val lon = (zone - 31) * 6 + 3 + dLon // within-zone longitude
      val crs = Crs.Utm(zone, south)
      val (x, y) = crs.forward(lon, lat)
      val (lon2, lat2) = crs.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-6, s"lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-6, s"lat $lat -> $lat2")
    }
  }

  test("WebMercator forward/inverse roundtrips") {
    forAll(Gen.chooseNum(-179.9, 179.9), Gen.chooseNum(-84.0, 84.0)) { (lon, lat) =>
      val (x, y) = Crs.WebMercator.forward(lon, lat)
      val (lon2, lat2) = Crs.WebMercator.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
  }

  test("tiling covers every pixel exactly once") {
    val dims = for {
      w <- Gen.chooseNum(1, 500)
      h <- Gen.chooseNum(1, 500)
      tw <- Gen.chooseNum(1, 128)
      th <- Gen.chooseNum(1, 128)
    } yield (w, h, tw, th)
    forAll(dims) { case (w, h, tw, th) =>
      val g = GeoBox(w, h, Affine.grid(0, 0, 10, -10), Crs.LonLat)
      val tiles = GeoBoxTiles(g, tw, th)
      val total = (for {
        ty <- 0 until tiles.ny
        tx <- 0 until tiles.nx
        tg = tiles.tileGeobox(ty, tx)
      } yield {
        assert(tg.width <= tw && tg.height <= th)
        assert(tg.width > 0 && tg.height > 0)
        tg.width.toLong * tg.height
      }).sum
      assert(total == w.toLong * h, s"tiles cover $total of ${w.toLong * h} px")
    }
  }

  test("tile geoboxes inherit the parent grid (paste-aligned)") {
    forAll(Gen.chooseNum(1, 300), Gen.chooseNum(1, 300),
      Gen.chooseNum(16, 64)) { (w, h, t) =>
      val g = GeoBox(w, h, Affine.grid(500000, 8000000, 10, -10),
        Crs.Utm(35, south = true))
      val tiles = GeoBoxTiles(g, t, t)
      for (ty <- 0 until tiles.ny; tx <- 0 until tiles.nx) {
        val tg = tiles.tileGeobox(ty, tx)
        // same resolution, origin on the parent pixel lattice
        assert(tg.resX == g.resX && tg.resY == g.resY)
        val (px, py) = g.worldToPix(tg.transform.c, tg.transform.f)
        assert(math.abs(px - math.round(px)) < 1e-9)
        assert(math.abs(py - math.round(py)) < 1e-9)
      }
    }
  }

  test("anchor snapping: anchored grids report the snapped anchor") {
    // EDGE-anchored grid -> Anchor(0,0); CENTER-anchored -> Anchor(0.5,0.5)
    forAll(Gen.chooseNum(-1000, 1000), Gen.chooseNum(-1000, 1000),
      Gen.chooseNum(1.0, 100.0)) { (ox, oy, res) =>
      val edge = GeoBox(10, 10, Affine.grid(ox * res, oy * res, res, -res), Crs.LonLat)
      assert(edge.anchor() == Anchor.Edge)
      val center = GeoBox(10, 10,
        Affine.grid((ox + 0.5) * res, (oy + 0.5) * res, res, -res), Crs.LonLat)
      assert(center.anchor() == Anchor.Center)
    }
  }

  test("solar-time shift truncates toward zero in whole hours (F1)") {
    // reference semantics (model.py:454-458): utc + int(lon/15) hours
    forAll(Gen.chooseNum(-180.0, 180.0), Gen.chooseNum(0L, 4102444800L)) { (lon, epochSec) =>
      val ts = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(epochSec))
      val item = graft.model.ParsedItem(
        id = "p", collection = "c", bands = Map.empty,
        geometry = None, datetime = Some(ts))
      val shifted = item.solarDatetimeAt(lon)
      val expectHours = (lon / 15.0).toInt // toward zero, like Python int()
      assert(shifted.getTime - ts.getTime == expectHours * 3600000L)
    }
  }
}
