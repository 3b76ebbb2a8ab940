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

  test("bilinear drill: exact weights at the quarter point; nodata taps NaN") {
    import spark.implicits._
    val gbox = GeoBox(4, 2, Affine.grid(1000, 2000, 10, -10),
      Crs.Utm(35, south = true))
    val rows = Seq(
      ("b", 0, 0, 0, 0, 0, Fuse.encode(
        Array(10.0, 20.0, 0.0, 40.0, 30.0, 40.0, 50.0, 60.0), "uint16"),
        "uint16", 0.0, 4, 2)
    ).toDF("band", "tIdx", "ty", "tx", "x0", "y0", "data", "dtype",
      "nodata", "width", "height")
    val points = Seq(
      // pixel coords (0.75, 0.75): taps (0,0),(1,0),(0,1),(1,1) with
      // fx=fy=0.25 -> 10*0.5625 + 20*0.1875 + 30*0.1875 + 40*0.0625
      ("q", 1007.5, 1992.5),
      // window includes the nodata pixel (2,0) -> strict NaN
      ("n", 1025.0, 1992.5))
    val out = Drill.drillBilinear(spark, rows, gbox, points)
      .orderBy("point_id").collect()
    assert(out.length == 2)
    assert(out(1).getString(0) == "q" &&
      out(1).getDouble(3) == 10 * 0.5625 + 20 * 0.1875 + 30 * 0.1875 + 40 * 0.0625)
    assert(out(0).getString(0) == "n" && out(0).getDouble(3).isNaN)
  }

  /** The broadcast side is pre-binned into 256-px hash buckets: a tile
    * probes only its overlapping buckets, so per-tile candidate work is
    * O(own + bucket slop), not O(all points) — here 10^5 points spread
    * over a 4096² grid, and a 64² tile sees ≤ the points of its four
    * covering buckets (~400), never the full hundred thousand. */
  test("spatial-hash binning bounds per-tile candidates at 1e5 points") {
    val n = 100000
    val rnd = new scala.util.Random(42)
    val pts = (0 until n).map { i =>
      (s"p$i", rnd.nextInt(4096), rnd.nextInt(4096))
    }
    val binned = Drill.binByBucket(pts)(_._2, _._3)
    // every point lands in exactly one bucket
    assert(binned.valuesIterator.map(_.size).sum == n)
    // probe every 64px tile of a 1024² corner: candidates ≤ 4 buckets'
    // worth (~6e-3 of the points), and the exact filter recovers
    // precisely the brute-force hits
    for (ty <- 0 until 16; tx <- 0 until 16) {
      val (x0, y0) = (tx * 64, ty * 64)
      val cand = Drill.candidates(binned, x0, y0, 64, 64).toSeq
      assert(cand.size <= 4 * (n / (16 * 16)) * 2,
        s"tile ($ty,$tx) candidate set too large: ${cand.size}")
      val exact = cand.filter { case (_, gx, gy) =>
        gx >= x0 && gx < x0 + 64 && gy >= y0 && gy < y0 + 64 }.toSet
      val brute = pts.filter { case (_, gx, gy) =>
        gx >= x0 && gx < x0 + 64 && gy >= y0 && gy < y0 + 64 }.toSet
      assert(exact == brute)
    }
  }
}
