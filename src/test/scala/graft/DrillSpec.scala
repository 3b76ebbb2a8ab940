package graft

import graft.geo.{Affine, Crs, GeoBox}
import graft.load.{Drill, Fuse}
import org.scalatest.funsuite.AnyFunSuite

/** Point drill: world→pixel addressing, nodata as NaN, misses dropped. */
class DrillSpec extends AnyFunSuite {
  import GraftSpark.spark

  test("samples the covering pixel; nodata NaN; outside points drop") {
    import spark.implicits._
    // 4x2 tile at origin (1000, 2000), res 10/-10:
    //   row 0: 11 12 13 0     row 1: 21 22 23 24
    val gbox = GeoBox(4, 2, Affine.grid(1000, 2000, 10, -10),
      Crs.Utm(35, south = true))
    val rows = Seq(
      ("b", 0, 0, 0, 0, 0, Fuse.encode(
        Array(11.0, 12.0, 13.0, 0.0, 21.0, 22.0, 23.0, 24.0), "uint16"),
        "uint16", 0.0, 4, 2)
    ).toDF("band", "tIdx", "ty", "tx", "x0", "y0", "data", "dtype",
      "nodata", "width", "height")
    val points = Seq(
      ("a", 1005.0, 1995.0),  // pixel (0,0) -> 11
      ("b", 1039.9, 1990.1),  // pixel (3,0) -> nodata -> NaN
      ("c", 1025.0, 1985.0),  // pixel (2,1) -> 23
      ("d", 900.0, 1995.0))   // west of the tile -> no row
    val out = Drill.drill(spark, rows, gbox, points)
      .orderBy("point_id").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(out(0).getDouble(3) == 11.0)
    assert(out(1).getDouble(3).isNaN)
    assert(out(2).getDouble(3) == 23.0)
  }
}
