package graft

import graft.relational.TemporalJoins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of + interval joins: equivalence against brute-force formulations
  * on generated data, direction/tolerance semantics, and — the scale
  * contract — plan shape: no nested-loop/cartesian join, bounded
  * shuffles. */
class TemporalJoinsSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark

  // deterministic two-sided event set: 40 users, ragged timelines,
  // including exact-tie timestamps and users missing on either side
  private lazy val (quotes, trades) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val qs = (1 to 800).map { i =>
      val u = rnd.nextInt(40).toLong
      (i.toLong, u, 1700000000000000L + rnd.nextInt(1000000) * 1000L)
    }
    val ts = (1 to 300).map { i =>
      val u = rnd.nextInt(44).toLong // some users have no quotes
      val base = 1700000000000000L + rnd.nextInt(1000000) * 1000L
      // every 10th trade collides exactly with some quote timestamp
      val t = if (i % 10 == 0) qs(rnd.nextInt(qs.size))._3 else base
      (1000L + i.toLong, u, t)
    }
    (qs.toDF("q_id", "user", "q_us")
       .select(col("q_id"), col("user"), timestamp_micros(col("q_us")).as("q_ts")),
     ts.toDF("t_id", "user", "t_us")
       .select(col("t_id"), col("user"), timestamp_micros(col("t_us")).as("t_ts")))
  }

  /** Brute-force backward as-of via join + rank (the formulation the
    * operator must agree with, not the one it may use). */
  private def bruteBackward(tol: Option[Long]): DataFrame = {
    val cand = trades.join(quotes,
      trades("user") === quotes("user") && quotes("q_ts") <= trades("t_ts") &&
        tol.map(t => unix_micros(trades("t_ts")) - unix_micros(quotes("q_ts")) <= t)
          .getOrElse(lit(true)),
      "left")
      .select(trades("t_id"), trades("user"), trades("t_ts"),
        quotes("q_id"), quotes("q_ts"))
    val w = Window.partitionBy(col("t_id"))
      .orderBy(col("q_ts").desc_nulls_last, col("q_id").desc_nulls_last)
    cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("t_id"), col("q_id"))
  }

  private def asofResult(direction: String, tol: Option[Long] = None): DataFrame =
    TemporalJoins.asofJoin(trades, quotes,
      Seq("user"), "t_ts", "q_ts", direction, tol)
      .select(col("t_id"), col("q_id"))

  test("backward as-of matches brute-force join+rank (incl. exact ties)") {
    val got = asofResult("backward")
    val want = bruteBackward(None)
    assert(got.count() == 300)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("tolerance drops far matches without substituting next-nearest") {
    val tol = 50000L * 1000L // 50k ms window
    val got = asofResult("backward", Some(tol))
    val want = bruteBackward(Some(tol))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // tolerance must strictly reduce or keep the match count
    val full = asofResult("backward").where(col("q_id").isNotNull).count()
    val bounded = got.where(col("q_id").isNotNull).count()
    assert(bounded < full, s"tolerance had no effect ($bounded vs $full)")
  }

  test("forward as-of picks the earliest at-or-after right row") {
    val got = asofResult("forward")
    val cand = trades.join(quotes,
      trades("user") === quotes("user") && quotes("q_ts") >= trades("t_ts"), "left")
      .select(trades("t_id"), quotes("q_id"), quotes("q_ts"))
    val w = Window.partitionBy(col("t_id"))
      .orderBy(col("q_ts").asc_nulls_last, col("q_id").desc_nulls_last)
    val want = cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("t_id"), col("q_id"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("as-of plan is shuffle+window — no join operator at all") {
    val plan = asofResult("backward").queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"))
    assert(plan.contains("Window"))
  }

  test("interval join matches the naive range join, both bounds honored") {
    val lo = 10000L * 1000L; val hi = 200000L * 1000L
    val got = TemporalJoins.intervalJoin(
      trades.select(col("t_id"), col("t_ts")),
      quotes.select(col("q_id"), col("q_ts")),
      "t_ts", "q_ts", lo, hi, minOpen = true)
      .select(col("t_id"), col("q_id"))
    val want = trades.join(quotes,
      unix_micros(quotes("q_ts")) - unix_micros(trades("t_ts")) > lo &&
        unix_micros(quotes("q_ts")) - unix_micros(trades("t_ts")) <= hi)
      .select(trades("t_id"), quotes("q_id"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("interval join with equi keys restricts to matching keys") {
    val hi = 500000L * 1000L
    val got = TemporalJoins.intervalJoin(
      trades.select(col("t_id"), col("user"), col("t_ts")),
      quotes.select(col("q_id"), col("user").as("q_user"), col("q_ts"))
        .withColumnRenamed("q_user", "user_r"),
      "t_ts", "q_ts", 0L, hi, keys = Nil)
      .where(col("user") === col("user_r"))
      .select(col("t_id"), col("q_id"))
    val keyed = TemporalJoins.intervalJoin(
      trades.select(col("t_id"), col("user"), col("t_ts")),
      quotes.select(col("q_id"), col("user"), col("q_ts")),
      "t_ts", "q_ts", 0L, hi, keys = Seq("user"))
      .select(col("t_id"), col("q_id"))
    assert(keyed.exceptAll(got).isEmpty && got.exceptAll(keyed).isEmpty)
  }

  test("interval join plans as an equi hash/merge join, never nested-loop") {
    val got = TemporalJoins.intervalJoin(
      trades.select(col("t_id"), col("t_ts")),
      quotes.select(col("q_id"), col("q_ts")),
      "t_ts", "q_ts", 0L, 3600L * 1000000L)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }
}
