package graft

import graft.load.{Fuse, Pyramid}
import org.scalatest.funsuite.AnyFunSuite

/** Pyramid build: local decimation then level-grid assembly. */
class PyramidSpec extends AnyFunSuite {
  import GraftSpark.spark

  test("two base tiles assemble into one level-2 tile; nodata -> NaN") {
    import spark.implicits._
    // chunk=2: base tiles (0,0)=[1 2; 3 4] and (0,1)=[5 0; 7 8]
    val rows = Seq(
      ("b", 0, 0, 0, 0, 0, Fuse.encode(Array(1.0, 2.0, 3.0, 4.0), "uint16"),
        "uint16", 0.0, 2, 2),
      ("b", 0, 0, 1, 2, 0, Fuse.encode(Array(5.0, 0.0, 7.0, 8.0), "uint16"),
        "uint16", 0.0, 2, 2)
    ).toDF("band", "tIdx", "ty", "tx", "x0", "y0", "data", "dtype",
      "nodata", "width", "height")
    val out = Pyramid.buildLevel(spark, rows, s = 2, chunk = 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[Int]("ty"), r.getAs[Int]("tx")) == (0, 0))
    assert((r.getAs[Int]("width"), r.getAs[Int]("height")) == (2, 1))
    // level pixels = base (0,0) of each tile: 1 and 5
    assert(r.getAs[scala.collection.Seq[Double]]("plane").toSeq ==
      Seq(1.0, 5.0))
    assert(r.getAs[Long]("n_valid") == 2L)
  }

  test("nodata base pixel decimates to NaN and drops from n_valid") {
    import spark.implicits._
    val rows = Seq(
      ("b", 0, 0, 0, 0, 0, Fuse.encode(Array(0.0, 2.0, 3.0, 4.0), "uint16"),
        "uint16", 0.0, 2, 2)
    ).toDF("band", "tIdx", "ty", "tx", "x0", "y0", "data", "dtype",
      "nodata", "width", "height")
    val r = Pyramid.buildLevel(spark, rows, s = 2, chunk = 2).collect().head
    val p = r.getAs[scala.collection.Seq[Double]]("plane").toSeq
    assert(p.length == 1 && p.head.isNaN)
    assert(r.getAs[Long]("n_valid") == 0L)
  }
}
