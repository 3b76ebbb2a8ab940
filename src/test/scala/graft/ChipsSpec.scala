package graft

import graft.load.{Chips, Fuse}
import org.scalatest.funsuite.AnyFunSuite

/** Chip extraction semantics: cross-tile fragment assembly, NaN padding
  * outside coverage, nodata mapping, per-(band, tIdx) independence. */
class ChipsSpec extends AnyFunSuite {
  import GraftSpark.spark

  /** One 4×4 tile row at tile grid (ty, tx): values v0 + local index,
    * with pixel (0,0) of the tile set to nodata (=0). */
  private def tile(band: String, tIdx: Int, ty: Int, tx: Int, v0: Double) = {
    val px = Array.tabulate(16)(i => if (i == 0) 0.0 else v0 + i)
    (band, tIdx, ty, tx, java.sql.Timestamp.valueOf("2020-06-06 08:00:00"),
      tx * 4, ty * 4, 4, 4, "float64", 0.0, 15L,
      Fuse.encode(px, "float64"))
  }

  private def tilesDf(rows: Seq[(String, Int, Int, Int, java.sql.Timestamp,
      Int, Int, Int, Int, String, Double, Long, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("band", "tIdx", "ty", "tx", "time", "x0", "y0",
      "width", "height", "dtype", "nodata", "validCount", "data")
  }

  test("chip straddling four tiles assembles from four fragments") {
    val rows = Seq(
      tile("red", 0, 0, 0, 100), tile("red", 0, 0, 1, 200),
      tile("red", 0, 1, 0, 300), tile("red", 0, 1, 1, 400))
    // chip corner (gy0, gx0) = (2, 2): rows 2..5 × cols 2..5 spans all
    // four tiles
    val out = Chips.chips(spark, tilesDf(rows), Seq(("x", 2, 2)), 4)
      .collect()
    assert(out.length == 1)
    val chip = out.head.getAs[scala.collection.Seq[Double]]("chip")
    // row 2 of the grid = tile row 2 of (0,0)/(0,1): locals 8..11
    assert(chip.take(4) == Seq(110.0, 111.0, 208.0, 209.0))
    // row 4 of the grid = tile row 0 of (1,0)/(1,1): tile (1,1)'s
    // local (0,0) nodata pixel lands at chip index 10 and maps to NaN
    assert(chip(8) == 302.0 && chip(9) == 303.0 &&
      chip(10).isNaN && chip(11) == 401.0)
    assert(out.head.getAs[Int]("n_valid") == 15)
  }

  test("chip clipped at coverage edge pads with NaN") {
    val rows = Seq(tile("red", 0, 0, 0, 100))
    // corner (2, 2) over a single 4×4 tile: only rows/cols 2..3 covered
    val out = Chips.chips(spark, tilesDf(rows), Seq(("e", 2, 2)), 4)
      .collect()
    val chip = out.head.getAs[scala.collection.Seq[Double]]("chip")
    assert(chip(0) == 110.0 && chip(1) == 111.0 &&
      chip(2).isNaN && chip(3).isNaN)
    assert(chip.drop(8).forall(_.isNaN))
    assert(out.head.getAs[Int]("n_valid") == 4)
  }

  test("a point overlapping no tile still emits an all-NaN row") {
    val rows = Seq(tile("red", 0, 0, 0, 100))
    val out = Chips.chips(spark, tilesDf(rows),
      Seq(("off", 500, 500), ("on", 0, 0)), 4).collect()
      .map(r => r.getAs[String]("point_id") -> r).toMap
    assert(out.keySet == Set("off", "on"))
    val off = out("off")
    assert(off.getAs[Int]("n_valid") == 0)
    assert(off.getAs[scala.collection.Seq[Double]]("chip").forall(_.isNaN))
    assert(out("on").getAs[Int]("n_valid") == 15)
  }

  test("bands and time indices produce independent chips") {
    val rows = Seq(
      tile("red", 0, 0, 0, 100), tile("nir", 0, 0, 0, 500),
      tile("red", 1, 0, 0, 900))
    val out = Chips.chips(spark, tilesDf(rows), Seq(("m", 0, 0)), 4)
      .collect()
      .map(r => (r.getAs[String]("band"), r.getAs[Int]("tIdx")) ->
        r.getAs[scala.collection.Seq[Double]]("chip")(5)).toMap
    assert(out(("red", 0)) == 105.0)
    assert(out(("nir", 0)) == 505.0)
    assert(out(("red", 1)) == 905.0)
  }

  test("a combos domain that omits a present (band, tIdx) errors loudly") {
    val rows = Seq(tile("red", 0, 0, 0, 100), tile("nir", 0, 0, 0, 500))
    // declared domain misses nir/0, which IS present in tiles: the
    // computed nir chip must not be silently dropped by the domain join
    val ex = intercept[Exception] {
      Chips.chips(spark, tilesDf(rows), Seq(("m", 0, 0)), 4,
        combos = Seq(("red", 0))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("undeclared") ||
      m != null && m.contains("absent from the supplied combos")),
      s"expected a domain-validation error, got: ${ex.getMessage}")
    // a COMPLETE declared domain still works and bounds the output
    val ok = Chips.chips(spark, tilesDf(rows), Seq(("m", 0, 0)), 4,
      combos = Seq(("red", 0), ("nir", 0))).collect()
    assert(ok.length == 2)
  }
}
