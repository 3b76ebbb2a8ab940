package graft

import graft.functions.ZOrderKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** zorder64 kernel + physical layout behavior. */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark

  /** Naive reference interleave on bias-flipped coords. */
  private def naive(x: Int, y: Int): Long = {
    val bx = x ^ 0x80000000
    val by = y ^ 0x80000000
    var z = 0L
    for (bit <- 0 until 32) {
      if (((bx >>> bit) & 1) == 1) z |= 1L << (2 * bit)
      if (((by >>> bit) & 1) == 1) z |= 1L << (2 * bit + 1)
    }
    z ^ java.lang.Long.MIN_VALUE
  }

  test("kernel matches bit-by-bit reference incl. negatives and extremes") {
    val rnd = new scala.util.Random(5)
    val cases = Seq((0, 0), (1, 0), (0, 1), (-1, -1), (Int.MaxValue, Int.MinValue),
      (Int.MinValue, Int.MaxValue), (63, 63)) ++
      Seq.fill(500)((rnd.nextInt(), rnd.nextInt()))
    cases.foreach { case (x, y) =>
      assert(ZOrderKernel.compute(x, y) == naive(x, y), s"($x,$y)")
    }
  }

  test("signed z order equals unsigned morton order; negatives sort first") {
    val coords = for (x <- -4 to 4; y <- -4 to 4) yield (x, y)
    val byKernel = coords.sortBy { case (x, y) => ZOrderKernel.compute(x, y) }
    // reference order: UNSIGNED comparison of the raw (unflipped)
    // interleave — the top-bit flip exists exactly to make signed
    // comparison reproduce this
    val byRef = coords.sortWith { case ((x1, y1), (x2, y2)) =>
      java.lang.Long.compareUnsigned(
        naive(x1, y1) ^ java.lang.Long.MIN_VALUE,
        naive(x2, y2) ^ java.lang.Long.MIN_VALUE) < 0
    }
    assert(byKernel == byRef)
    // all-negative quadrant precedes all-positive quadrant
    val firstPos = byKernel.indexWhere { case (x, y) => x >= 0 && y >= 0 }
    val lastNeg = byKernel.lastIndexWhere { case (x, y) => x < 0 && y < 0 }
    assert(lastNeg < firstPos)
  }

  test("SQL expression agrees with the kernel through codegen") {
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(2000)((rnd.nextInt(), rnd.nextInt()))
    val got = rows.toDF("x", "y")
      .selectExpr("x", "y", "zorder64(x, y) AS z").collect()
    got.foreach { r =>
      assert(r.getLong(2) == ZOrderKernel.compute(r.getInt(0), r.getInt(1)))
    }
  }

  test("ZOrderRangePruning adds a pushdown-able z range, result unchanged") {
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zprune").toString
    (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
      .toDF("tx", "ty")
      .withColumn("z", expr("zorder64(tx, ty)"))
      .repartitionByRange(16, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(dir)

    def roi(df: org.apache.spark.sql.DataFrame) =
      df.where(col("tx").between(8, 23) && col("ty").between(40, 55))

    val before = roi(spark.read.parquet(dir)).collect().toSet
    graft.plans.ZOrderPruning.install(spark)
    try {
      val pruned = roi(spark.read.parquet(dir))
      val optimized = pruned.queryExecution.optimizedPlan.toString
      assert(optimized.contains("z#") || optimized.toLowerCase.contains("z >="),
        s"no z bound injected:\n$optimized")
      // the z range must reach the parquet scan as a data filter
      // (plan toString truncates PushedFilters — inspect the node)
      val scan = pruned.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.get
      assert(scan.dataFilters.exists(_.references.exists(_.name == "z")),
        s"z bound not in scan data filters: ${scan.dataFilters}")
      assert(pruned.collect().toSet == before)
      // idempotent: re-install + re-plan doesn't stack duplicate bounds
      graft.plans.ZOrderPruning.install(spark)
      assert(roi(spark.read.parquet(dir)).collect().toSet == before)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[graft.plans.ZOrderRangePruning])
    }
  }

  test("compaction shrinks file count, preserves content and z clustering") {
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val frag = java.nio.file.Files.createTempDirectory("graft_fragspec").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compspec").toString
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
      .toDF("tx", "ty").selectExpr("tx", "ty", "zorder64(tx, ty) AS z")
    grid.repartition(64).write.mode("overwrite").parquet(frag)
    val (nb, na) = graft.layout.Layout.compact(
      spark, frag, out, targetBytes = 64 * 1024, orderCols = Seq("z"))
    info(s"compacted $nb files -> $na")
    assert(nb == 64 && na < nb)
    val before = spark.read.parquet(frag).collect().toSet
    val after = spark.read.parquet(out).collect().toSet
    assert(after == before)
    // clustering preserved: per-file z ranges are disjoint
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "overlapping z ranges")
      case _ =>
    }
  }

  test("z-clustered files localize a square ROI; x-major stripes do not") {
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
      .toDF("tx", "ty")
      .withColumn("z", expr("zorder64(tx, ty)"))

    def roiFiles(clusterCols: Seq[String]): Long = {
      val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
      grid.repartitionByRange(16, clusterCols.map(col): _*)
        .write.mode("overwrite").parquet(dir)
      // files that contain any ROI row = files an ROI scan cannot prune
      spark.read.parquet(dir)
        .where(col("tx").between(8, 23) && col("ty").between(40, 55))
        .select(input_file_name()).distinct().count()
    }

    val zFiles = roiFiles(Seq("z"))
    val stripeFiles = roiFiles(Seq("tx", "ty"))
    info(s"ROI files: zorder=$zFiles of 16, x-major=$stripeFiles of 16")
    // 16x16 ROI = 1/16 of the grid: z-order confines it to a few files,
    // x-major spreads every x-run across the ROI's full y extent
    assert(zFiles <= 4, s"z-order layout touched $zFiles files")
    assert(stripeFiles >= zFiles,
      s"x-major ($stripeFiles) should not beat z-order ($zFiles)")
  }
}
