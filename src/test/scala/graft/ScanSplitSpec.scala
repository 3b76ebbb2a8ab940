package graft

import org.scalatest.funsuite.AnyFunSuite

/** Split-starvation guard ([[Tables.rebalance]]): a 1-row-group parquet
  * file is read by exactly one task regardless of `maxPartitionBytes`,
  * so CPU-heavy per-row kernels serialize on the accident of how the
  * input was written. The guard repartitions such tables when each
  * row group carries more than `spark.graft.scan.minSplitMB`.
  */
class ScanSplitSpec extends AnyFunSuite {
  import GraftSpark.{spark, sf}

  private def withThreshold[A](mb: String)(f: => A): A = {
    val key = "spark.graft.scan.minSplitMB"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, mb)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("default threshold leaves small single-group files alone") {
    // sf0.001 documents: 1 row group, ~0.1 MB — far under 24 MB/group,
    // the guard must not add an exchange at gating scale factors
    val df = Tables.load(spark, sf, "documents")
    assert(df.rdd.getNumPartitions == 1)
  }

  test("starved layout is rebalanced to defaultParallelism") {
    withThreshold("0.00001") {
      val df = Tables.load(spark, sf, "documents")
      assert(df.rdd.getNumPartitions ==
        spark.sparkContext.defaultParallelism)
      // rebalancing must not change the relation's contents
      assert(df.count() ==
        spark.read.parquet(Tables.path(sf, "documents")).count())
    }
  }

  test("threshold <= 0 disables the guard") {
    withThreshold("0") {
      assert(Tables.load(spark, sf, "documents").rdd.getNumPartitions == 1)
    }
  }

  test("well-chunked inputs never trigger (groups >= cores)") {
    withThreshold("0.00001") {
      // a table written with >= cores row groups keeps its native splits
      val tmp = java.nio.file.Files.createTempDirectory("scansplit").toString
      val n = spark.sparkContext.defaultParallelism
      import spark.implicits._
      (0 until 1000).toDF("v").repartition(n)
        .write.mode("overwrite").parquet(s"$tmp/t.parquet")
      val before = Tables.load(spark, tmp, "t")
      assert(before.rdd.getNumPartitions >= n)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator
        .asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
    }
  }

  test("column pruning still reaches the scan through the repartition") {
    withThreshold("0.00001") {
      val executed = Tables.load(spark, sf, "documents").select("doc_id")
        .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scan = executed.collectLeaves()
        .collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.get
      // the file scan must read only doc_id, not the text column
      val cols = scan.output.map(_.name)
      assert(cols == Seq("doc_id"), s"scan not pruned: $cols")
    }
  }
}
