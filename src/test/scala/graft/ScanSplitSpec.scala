package graft

import org.apache.spark.sql.catalyst.plans.logical.Repartition
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Split-starvation rebalance ([[graft.plans.ScanRebalanceRule]]): a
  * 1-row-group parquet file is read by exactly one task regardless of
  * `maxPartitionBytes`, so CPU-heavy per-row kernels serialize on the
  * accident of how the input was written. The rule repartitions such
  * scans — but ONLY when expensive per-row work (regex, UDFs, HOFs,
  * natives, explodes) runs in the scan stage; scan-bound aggregates keep
  * their map-side combine (an injected exchange below a partial
  * aggregate measurably regressed sketch queries 1.5-3x at sf10).
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

  /** An expensive projection (regex) over the docs table. */
  private def heavy =
    Tables.load(spark, sf, "documents")
      .select(regexp_extract(col("text"), "([a-z]+)", 1).as("w"))

  private def injected(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan
      .collect { case r: Repartition if r.shuffle => r }.nonEmpty

  test("default threshold leaves small single-group files alone") {
    // sf0.001 documents: 1 row group, ~0.1 MB — far under 24 MB/group,
    // the rule must not add an exchange at gating scale factors
    assert(!injected(heavy))
    assert(heavy.rdd.getNumPartitions == 1)
  }

  test("starved scan under expensive work is rebalanced to cores") {
    withThreshold("0.00001") {
      assert(injected(heavy))
      assert(heavy.rdd.getNumPartitions ==
        spark.sparkContext.defaultParallelism)
      // rebalancing must not change the relation's contents
      assert(heavy.count() ==
        spark.read.parquet(Tables.path(sf, "documents")).count())
    }
  }

  test("scan-bound aggregate keeps map-side combine (no injection)") {
    withThreshold("0.00001") {
      // cheap projection into a partial aggregate: an exchange below it
      // would shuffle full rows instead of tiny partial states
      val agg = Tables.load(spark, sf, "documents")
        .agg(sum(length(col("text"))).as("b"))
      assert(!injected(agg))
      // expensive work ABOVE the aggregate boundary doesn't fire either:
      // it runs post-exchange, not in the scan task
      val above = Tables.load(spark, sf, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .select(md5(concat_ws("|", col("lang"), col("n"))).as("h"))
      assert(!injected(above))
    }
  }

  test("expensive map-side aggregate expressions do fire") {
    withThreshold("0.00001") {
      // grouping by a crypto hash evaluates it in the scan-stage partial
      val agg = Tables.load(spark, sf, "documents")
        .groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("n"))
      assert(injected(agg))
    }
  }

  test("injection lands above pushed-down cheap filters") {
    withThreshold("0.00001") {
      val df = Tables.load(spark, sf, "documents")
        .filter(col("lang") === "en")
        .select(regexp_extract(col("text"), "([a-z]+)", 1).as("w"))
      assert(injected(df))
      // the repartition must sit ABOVE the filter so the parquet scan
      // keeps its predicate pushdown (PhysicalOperation cannot collect
      // filters through a Repartition)
      val opt = df.queryExecution.optimizedPlan
      val rep = opt.collect {
        case r: Repartition if r.shuffle => r
      }.head
      assert(rep.child.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
      }.nonEmpty, s"filter not below the injected repartition:\n$opt")
      val executed = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scan = executed.collectLeaves()
        .collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.get
      assert(scan.dataFilters.nonEmpty, "lang filter lost from the scan")
    }
  }

  test("aggregate FILTER clauses count as map-side work") {
    withThreshold("0.00001") {
      // the FILTER predicate evaluates in the partial (scan-stage) agg
      Tables.load(spark, sf, "documents")
        .createOrReplaceTempView("docs_scansplit")
      val df = spark.sql(
        "SELECT count(*) FILTER (WHERE text RLIKE '[0-9]{3}') AS n " +
          "FROM docs_scansplit")
      assert(injected(df))
    }
  }

  test("an explicit repartition below already rebalances (no double)") {
    withThreshold("0.00001") {
      val df = Tables.load(spark, sf, "documents")
        .repartition(4, col("doc_id"))
        .select(regexp_extract(col("text"), "([a-z]+)", 1).as("w"))
      val reps = df.queryExecution.optimizedPlan.collect {
        case r: Repartition if r.shuffle => r
        case r: org.apache.spark.sql.catalyst.plans.logical
          .RepartitionByExpression => r
      }
      assert(reps.size == 1, s"expected exactly one exchange, got $reps")
    }
  }

  test("threshold <= 0 disables the rule") {
    withThreshold("0") {
      assert(!injected(heavy))
      assert(heavy.rdd.getNumPartitions == 1)
    }
  }

  test("well-chunked inputs never trigger (files >= cores)") {
    withThreshold("0.00001") {
      val tmp = java.nio.file.Files.createTempDirectory("scansplit").toString
      val n = spark.sparkContext.defaultParallelism
      import spark.implicits._
      (0 until 1000).map(_.toString).toDF("text").repartition(n)
        .write.mode("overwrite").parquet(s"$tmp/t.parquet")
      val df = Tables.load(spark, tmp, "t")
        .select(regexp_extract(col("text"), "(\\d+)", 1).as("w"))
      assert(!injected(df))
      assert(df.rdd.getNumPartitions >= n)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator
        .asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
    }
  }

  test("column pruning still reaches the scan through the repartition") {
    withThreshold("0.00001") {
      val df = Tables.load(spark, sf, "documents")
        .select(md5(col("text")).as("h"))
      assert(injected(df))
      val executed = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scan = executed.collectLeaves()
        .collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.get
      // the file scan must read only text, not doc_id/lang/...
      val cols = scan.output.map(_.name)
      assert(cols == Seq("text"), s"scan not pruned: $cols")
    }
  }

  test("a broadcast-hinted build side gets no useless exchange") {
    withThreshold("0.00001") {
      // expensive work above a broadcast join runs only in the STREAMED
      // side's scan stage; an injected exchange on the build side would
      // be a wasted shuffle feeding the BroadcastExchange
      val dim = Tables.load(spark, sf, "documents")
        .select(col("doc_id"), col("lang"))
      val fact = Tables.load(spark, sf, "documents")
        .select(col("doc_id"), col("text"))
      val df = fact.join(broadcast(dim), Seq("doc_id"))
        .select(regexp_extract(col("text"), "([a-z]+)", 1).as("w"),
          col("lang"))
      val reps = df.queryExecution.optimizedPlan.collect {
        case r: Repartition if r.shuffle => r
      }
      assert(reps.size == 1,
        s"expected exactly one injected exchange (streamed side only):\n" +
          df.queryExecution.optimizedPlan)
      // and it must sit on the fact lineage: the build subtree below
      // the broadcast hint stays exchange-free
      val hintSides = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
      assert(hintSides.nonEmpty)
      val opt = df.queryExecution.optimizedPlan
      val join = opt.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.head
      val buildSide =
        if (join.hint.rightHint.exists(_.strategy.nonEmpty)) join.right
        else join.left
      assert(buildSide.collect {
        case r: Repartition if r.shuffle => r
      }.isEmpty, s"useless exchange under the broadcast build side:\n$opt")
    }
  }
}
