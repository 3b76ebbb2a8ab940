package graft

import graft.geo.{Affine, Crs, GeoBox, Geom}
import graft.load.Rasterize
import org.scalatest.funsuite.AnyFunSuite

/** Rasterize: painter's order on overlap, sparse tile emission. */
class RasterizeSpec extends AnyFunSuite {
  import GraftSpark.spark

  test("later zones overwrite; untouched tiles are not emitted") {
    // 4x4 grid at res 10 (origin 0,40), chunk 2 -> 2x2 tile grid.
    // zone 1 covers the WEST half; zone 2 covers the NW quarter, painted
    // later -> NW quarter reads 2, SW quarter reads 1, east tiles absent
    val gbox = GeoBox(4, 4, Affine.grid(0, 40, 10, -10),
      Crs.Utm(35, south = true))
    val zones = Seq(
      1 -> Geom(IndexedSeq((0.0, 0.0), (20.0, 0.0), (20.0, 40.0),
        (0.0, 40.0)), gbox.crs),
      2 -> Geom(IndexedSeq((0.0, 20.0), (20.0, 20.0), (20.0, 40.0),
        (0.0, 40.0)), gbox.crs))
    val out = Rasterize.burn(spark, gbox, 2, zones)
      .orderBy("ty", "tx").collect()
    assert(out.length == 2) // only the two west tiles
    assert(out.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((0, 0), (1, 0)))
    val nw = out(0).getAs[scala.collection.Seq[Int]]("plane").toSeq
    val sw = out(1).getAs[scala.collection.Seq[Int]]("plane").toSeq
    assert(nw == Seq(2, 2, 2, 2))
    assert(sw == Seq(1, 1, 1, 1))
    assert(out.forall(_.getAs[Long]("n_burned") == 4L))
  }

  test("zone hole stays background") {
    val gbox = GeoBox(4, 4, Affine.grid(0, 40, 10, -10),
      Crs.Utm(35, south = true))
    val zones = Seq(7 -> Geom(IndexedSeq(graft.geo.Poly(
      IndexedSeq((0.0, 0.0), (40.0, 0.0), (40.0, 40.0), (0.0, 40.0)),
      IndexedSeq(IndexedSeq((10.0, 10.0), (30.0, 10.0), (30.0, 30.0),
        (10.0, 30.0))))), gbox.crs))
    val out = Rasterize.burn(spark, gbox, 4, zones).collect()
    assert(out.length == 1)
    val p = out.head.getAs[scala.collection.Seq[Int]]("plane").toSeq
    // 4x4 ring of 7s with a 2x2 background hole in the middle
    assert(p.count(_ == 7) == 12 && p.count(_ == 0) == 4)
    assert(p(5) == 0 && p(6) == 0 && p(9) == 0 && p(10) == 0)
  }
}
