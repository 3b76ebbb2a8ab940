package graft

import graft.load.{BandMath, Fuse}
import org.scalatest.funsuite.AnyFunSuite

/** Band math: zip_with pixel arithmetic, nodata propagation. */
class BandMathSpec extends AnyFunSuite {
  import GraftSpark.spark

  test("normalized difference with nodata on either side") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(0L)
    // nir: (30, 0, 10, 6) / red: (10, 5, 0, 2), nodata=0:
    //   p0 -> 20/40 = 0.5, p1/p2 -> NaN (one side nodata), p3 -> 0.5
    val rows = Seq(
      ("nir", 0, 0, 0, ts, 0, 0, Fuse.encode(Array(30.0, 0.0, 10.0, 6.0),
        "uint16"), "uint16", 0.0, 4, 1),
      ("red", 0, 0, 0, ts, 0, 0, Fuse.encode(Array(10.0, 5.0, 0.0, 2.0),
        "uint16"), "uint16", 0.0, 4, 1)
    ).toDF("band", "tIdx", "ty", "tx", "time", "x0", "y0", "data", "dtype",
      "nodata", "width", "height")
    val out = BandMath.normalizedDifference(spark, rows, "nir", "red", "ndvi")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("band") == "ndvi")
    val v = r.getAs[scala.collection.Seq[Double]]("values").toSeq
    assert(v(0) == 0.5 && v(1).isNaN && v(2).isNaN && v(3) == 0.5)
    assert(r.getAs[Long]("n_valid") == 2L)
  }

  test("change across time: late minus early, one-sided pixels NaN") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(0L)
    // t0: (10, 20, 0), t1: (13, 0, 7): only p0 is valid both times
    val rows = Seq(
      ("b", 0, 0, 0, ts, 0, 0, Fuse.encode(Array(10.0, 20.0, 0.0), "uint16"),
        "uint16", 0.0, 3, 1),
      ("b", 1, 0, 0, ts, 0, 0, Fuse.encode(Array(13.0, 0.0, 7.0), "uint16"),
        "uint16", 0.0, 3, 1)
    ).toDF("band", "tIdx", "ty", "tx", "time", "x0", "y0", "data", "dtype",
      "nodata", "width", "height")
    val out = BandMath.changeAcrossTime(spark, rows, 0, 1)().collect()
    assert(out.length == 1)
    val v = out.head.getAs[scala.collection.Seq[Double]]("change").toSeq
    assert(v(0) == 3.0 && v(1).isNaN && v(2).isNaN)
    assert(out.head.getAs[Long]("n_both") == 1L)
  }

  test("arbitrary two-band expression via map2") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(0L)
    val rows = Seq(
      ("a", 0, 0, 0, ts, 0, 0, Fuse.encode(Array(7.0, 9.0), "uint16"),
        "uint16", 0.0, 2, 1),
      ("b", 0, 0, 0, ts, 0, 0, Fuse.encode(Array(3.0, 4.0), "uint16"),
        "uint16", 0.0, 2, 1)
    ).toDF("band", "tIdx", "ty", "tx", "time", "x0", "y0", "data", "dtype",
      "nodata", "width", "height")
    val out = BandMath.map2(spark, rows, "a", "b", "diff")(_ - _).collect()
    assert(out.head.getAs[scala.collection.Seq[Double]]("values").toSeq ==
      Seq(4.0, 5.0))
  }
}
