package graft

import graft.load.{Focal, Fuse}
import org.scalatest.funsuite.AnyFunSuite

/** Focal mean: halo exchange across tile boundaries, nodata-aware taps. */
class FocalSpec extends AnyFunSuite {
  import GraftSpark.spark

  private def tile(ty: Int, tx: Int, x0: Int, y0: Int,
                   vals: Array[Double]) =
    ("b", 0, ty, tx, x0, y0, Fuse.encode(vals, "uint16"), "uint16", 0.0, 2, 2)

  test("window straddling a tile boundary uses the neighbor's strip") {
    import spark.implicits._
    // two 2x2 tiles side by side:
    //   t(0,0) = [1 2; 3 4]   t(0,1) = [5 6; 7 8]
    val rows = Seq(
      tile(0, 0, 0, 0, Array(1.0, 2.0, 3.0, 4.0)),
      tile(0, 1, 2, 0, Array(5.0, 6.0, 7.0, 8.0))
    ).toDF("band", "tIdx", "ty", "tx", "x0", "y0", "data", "dtype",
      "nodata", "width", "height")
    val out = Focal.focalMean(spark, rows).orderBy("tx").collect()
    assert(out.length == 2)
    val f0 = out(0).getAs[scala.collection.Seq[Double]]("focal").toSeq
    val f1 = out(1).getAs[scala.collection.Seq[Double]]("focal").toSeq
    // t01 pixel (0,0): taps {2,4} from t00 + {5,6,7,8} = 32/6
    assert(f1(0) == 32.0 / 6)
    // t00 pixel (0,1): taps {1,2,3,4} + {5,7} = 22/6
    assert(f0(1) == 22.0 / 6)
    // interior corner away from the seam: t00 (0,0) = (1+2+3+4)/4
    assert(f0(0) == 10.0 / 4)
    assert(out.forall(_.getAs[Long]("n_valid") == 4L))
  }

  test("nodata taps drop out of the window mean") {
    import spark.implicits._
    // t00 has a nodata hole at (0,1)
    val rows = Seq(
      tile(0, 0, 0, 0, Array(1.0, 0.0, 3.0, 4.0)),
      tile(0, 1, 2, 0, Array(5.0, 6.0, 7.0, 8.0))
    ).toDF("band", "tIdx", "ty", "tx", "x0", "y0", "data", "dtype",
      "nodata", "width", "height")
    val out = Focal.focalMean(spark, rows).orderBy("tx").collect()
    val f1 = out(1).getAs[scala.collection.Seq[Double]]("focal").toSeq
    // t01 (0,0): {4} from t00 (0 dropped) + {5,6,7,8} = 30/5
    assert(f1(0) == 30.0 / 5)
    // the hole pixel itself still gets a mean from its valid neighbors
    val f0 = out(0).getAs[scala.collection.Seq[Double]]("focal").toSeq
    assert(f0(1) == (1.0 + 3 + 4 + 5 + 7) / 5)
  }

  test("radius 2: window spans a full neighbor strip across the seam") {
    import spark.implicits._
    // two 2x2 tiles; r=2 windows cover BOTH tiles entirely from any
    // center -> every focal value = mean of all eight pixels
    val rows = Seq(
      tile(0, 0, 0, 0, Array(1.0, 2.0, 3.0, 4.0)),
      tile(0, 1, 2, 0, Array(5.0, 6.0, 7.0, 8.0))
    ).toDF("band", "tIdx", "ty", "tx", "x0", "y0", "data", "dtype",
      "nodata", "width", "height")
    val out = Focal.focalMean(spark, rows, radius = 2).orderBy("tx").collect()
    val all = (1 to 8).sum / 8.0
    val f0 = out(0).getAs[scala.collection.Seq[Double]]("focal").toSeq
    val f1 = out(1).getAs[scala.collection.Seq[Double]]("focal").toSeq
    // seam-adjacent centers reach every pixel of both tiles
    assert(f0(1) == all && f0(3) == all && f1(0) == all && f1(2) == all)
    // the far-west corner's window stops at global x=2: misses (6, 8)
    assert(f0(0) == (1 + 2 + 3 + 4 + 5 + 7) / 6.0)
  }

  test("isolated tile: mosaic edges contribute nothing") {
    import spark.implicits._
    val rows = Seq(tile(3, 7, 6, 6, Array(2.0, 4.0, 6.0, 8.0)))
      .toDF("band", "tIdx", "ty", "tx", "x0", "y0", "data", "dtype",
        "nodata", "width", "height")
    val out = Focal.focalMean(spark, rows).collect()
    assert(out.length == 1)
    val f = out.head.getAs[scala.collection.Seq[Double]]("focal").toSeq
    assert(f == Seq(5.0, 5.0, 5.0, 5.0)) // every window = all four pixels
  }

  test("standing layout: same results, only strips cross a new exchange") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // 3x3 grid of 2x2 tiles with a nodata hole — seams in both axes
    val rows = (for { ty <- 0 to 2; tx <- 0 to 2 } yield
      tile(ty, tx, tx * 2, ty * 2,
        Array(1.0 + ty * 6 + tx * 2, 2.0 + ty * 6 + tx * 2,
          if (ty == 1 && tx == 1) 0.0 else 4.0, 5.0)))
      .toDF("band", "tIdx", "ty", "tx", "x0", "y0", "data", "dtype",
        "nodata", "width", "height")
    val standing = rows.repartition($"band", $"tIdx", $"ty", $"tx")
    val viaStanding = Focal.focalMeanStanding(spark, standing)
    viaStanding.collect() // materialize THIS plan (AQE finalizes lazily)
    val got = viaStanding.orderBy("ty", "tx").collect()
    val want = Focal.focalMean(spark, rows).orderBy("ty", "tx").collect()
    assert(got.length == 9 && want.length == 9)
    got.zip(want).foreach { case (g, e) =>
      val gf = g.getAs[scala.collection.Seq[Double]]("focal").toSeq
      val ef = e.getAs[scala.collection.Seq[Double]]("focal").toSeq
      assert(gf == ef, s"tile ${e.getInt(2)},${e.getInt(3)}")
      assert(g.getAs[Long]("n_valid") == e.getAs[Long]("n_valid"))
    }
    // Plan: the ONLY exchange carrying the raw tile plane (`data`) is
    // the caller's standing repartition — executed once and
    // ReusedExchange'd into the strip branch; the operator itself
    // re-keys strips only. On a real standing layout (bucketed write,
    // done once) even that one disappears from the per-query cost.
    // AQE wraps materialized stages in leaf QueryStageExec nodes, so
    // walk into them explicitly (ReusedExchange stays a leaf — a
    // reused stage must not double-count).
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val into = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: into.flatMap(allNodes)
    }
    val exchanges = allNodes(viaStanding.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike => e }
    val planeExchanges =
      exchanges.filter(_.schema.fieldNames.contains("data"))
    assert(planeExchanges.size == 1,
      s"expected only the standing repartition to carry planes, got " +
        s"${planeExchanges.size}:\n${planeExchanges.mkString("\n")}")
    assert(exchanges.exists(!_.schema.fieldNames.contains("data")),
      "strip exchange missing — halo must still be re-keyed")
  }

  test("hillshade: constant-slope ramp pins the Lambertian shade; " +
    "incomplete windows contribute nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // 4x4 single tile, v = 10·x: Horn gx = 10, gy = 0 on the 2x2
    // interior; all edge pixels have incomplete windows (NaN)
    val vals = Array.tabulate(16)(i => 10.0 * (i % 4 + 1))
    val rows = Seq(("b", 0, 0, 0, 0, 0, Fuse.encode(vals, "uint16"),
      "uint16", 0.0, 4, 4))
      .toDF("band", "tIdx", "ty", "tx", "x0", "y0", "data", "dtype",
        "nodata", "width", "height")
    val out = Focal.horn(spark, rows)
      .select(expr("n_valid"),
        expr(rasterops.RasterQueries.hillshadeAggExpr).as("shade_q"))
      .head()
    val expected = math.round(255.0 * math.max(
      (0.7071067811865476 + 0.5 * 10.0 - 0.5 * 0.0) /
        math.sqrt(10.0 * 10.0 + 0.0 * 0.0 + 1.0), 0.0))
    assert(out.getLong(0) == 4L)
    assert(out.getLong(1) == 4L * expected, s"got ${out.getLong(1)}")
  }
}
