package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the 100 TB scale path of the new round-4 stats/text operators
  * to their exact (oracle-checked) counterparts:
  *
  *  - `stats_quantiles` ships exact `percentile` for the oracle; at
  *    scale the same plan runs `approx_percentile` (Greenwald-Khanna,
  *    one pass, mergeable partials). The sketch must stay within its
  *    accuracy bound of the exact answer.
  *  - `text_heavy_hitters` must plan as top-k (TakeOrderedAndProject),
  *    never a global sort of the token table.
  *  - `text_tfidf`'s document-frequency side is vocabulary-sized and
  *    must broadcast — no shuffle of the TF table for the join.
  */
class StatsSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("approx_percentile tracks exact percentile within sketch accuracy") {
    Tables.register(spark, sf)
    val cols = Seq("o_totalprice")
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    for (c <- cols; p <- ps) {
      val exact = spark.sql(s"SELECT percentile($c, $p) FROM orders")
        .head().getDouble(0)
      // accuracy 10000 → rank error ≤ n/10000; at sf0.001 n≈1500 so the
      // sketch is effectively exact — assert the returned value's rank
      // neighborhood by value tolerance instead of equality
      val approx = spark.sql(
        s"SELECT approx_percentile($c, $p, 10000) FROM orders")
        .head().getDouble(0)
      val span = spark.sql(s"SELECT max($c) - min($c) FROM orders")
        .head().getDouble(0)
      assert(math.abs(approx - exact) <= span * 0.01,
        s"$c p$p: approx=$approx exact=$exact")
    }
  }

  test("heavy hitters plans as TakeOrderedAndProject, not global sort") {
    Tables.register(spark, sf)
    val df = spark.sql(text.TextAnalysis.heavyHittersSparkSql)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("tfidf broadcasts the document-frequency side") {
    Tables.register(spark, sf)
    val df = spark.sql(text.TextAnalysis.tfidfSparkSql)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("repetition fractions are in [0,1] and detect a repeated doc") {
    Tables.register(spark, sf)
    val rows = spark.sql(text.TextAnalysis.repetitionSparkSql).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d2 = r.getDouble(1); val d3 = r.getDouble(2)
      assert(d2 >= 0.0 && d2 <= 1.0 && d3 >= 0.0 && d3 <= 1.0)
      // duplicate 3-grams imply duplicate 2-grams on this corpus shape:
      // a repeated trigram contains two repeated bigrams
      if (d3 > 0) assert(d2 > 0)
    }
  }
}
