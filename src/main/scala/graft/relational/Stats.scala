package graft.relational

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ANALYZE-style table statistics — the numbers a cost-based optimizer
  * and a pipeline health dashboard both read: per-column row count,
  * distinct count, min/max.
  *
  * Exact COUNT(DISTINCT) here so the result is DuckDB-oracle checkable;
  * at 100 TB the same query ships with `approx_count_distinct` (HLL,
  * one pass, mergeable partials) — the plan shape is identical, the
  * aggregation buffers shrink from hash sets to sketches. Numeric
  * min/max round-trip through DECIMAL(18,4) so both engines print the
  * same canonical string. */
object Stats {

  private def perCol(engineCast: String => String): String = {
    def num(c: String) =
      s"""SELECT '$c' AS col, COUNT(*) AS n, COUNT(DISTINCT $c) AS ndv,
         |  ${engineCast(s"MIN($c)")} AS min_v,
         |  ${engineCast(s"MAX($c)")} AS max_v FROM events""".stripMargin
    def str(c: String) =
      s"""SELECT '$c' AS col, COUNT(*) AS n, COUNT(DISTINCT $c) AS ndv,
         |  MIN($c) AS min_v, MAX($c) AS max_v FROM events""".stripMargin
    Seq(num("event_id"), num("user_id"), str("event_type"), num("value"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col")
  }

  val statsSparkSql: String =
    perCol(e => s"CAST(CAST($e AS DECIMAL(18,4)) AS STRING)")

  val statsDuckSql: String =
    perCol(e => s"CAST(CAST($e AS DECIMAL(18,4)) AS VARCHAR)")

  /** Column quantiles — the other half of ANALYZE: per-column p25/p50/
    * p75/p95 with linear interpolation (Spark `percentile` ≡ DuckDB
    * `quantile_cont`). Exact here so the oracle can hash-check it; at
    * 100 TB the same query ships with `approx_percentile` (Greenwald-
    * Khanna sketch: one pass, mergeable partials, bounded memory) —
    * `StatsSpec` pins the sketch within its error bound of this exact
    * plan. */
  private def quantiles(fn: (String, String) => String): String = {
    def one(tbl: String, c: String) =
      s"""SELECT '$tbl.$c' AS col,
         |  ${fn(c, "0.25")} AS p25, ${fn(c, "0.5")} AS p50,
         |  ${fn(c, "0.75")} AS p75, ${fn(c, "0.95")} AS p95
         |FROM $tbl""".stripMargin
    Seq(one("orders", "o_totalprice"), one("lineitem", "l_quantity"),
      one("lineitem", "l_extendedprice"), one("events", "value"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col")
  }

  /** Spark side: ONE `percentile(c, array(...))` buffer per column, not
    * four independent aggregates each re-buffering the column (4× the
    * aggregation work and memory — the difference between 9 s and ~2 s
    * at sf0.1, and between one sort-buffer and four at 100 TB). Columns
    * of the SAME table share one scan+aggregate (both buffers fill in
    * one pass), unpacked via explode — `lineitem` is read once, not
    * per-column. */
  private def tableSpark(tbl: String, cols: Seq[String]) = {
    val aggs = cols.zipWithIndex.map { case (c, i) =>
      s"percentile($c, array(0.25D, 0.5D, 0.75D, 0.95D)) AS q$i"
    }.mkString(", ")
    val structs = cols.zipWithIndex.map { case (c, i) =>
      s"struct('$tbl.$c' AS col, q$i AS q)"
    }.mkString(", ")
    s"""SELECT e.col AS col,
       |  ROUND(e.q[0], 2) AS p25, ROUND(e.q[1], 2) AS p50,
       |  ROUND(e.q[2], 2) AS p75, ROUND(e.q[3], 2) AS p95
       |FROM (SELECT explode(array($structs)) AS e
       |      FROM (SELECT $aggs FROM $tbl))""".stripMargin
  }

  val quantilesSparkSql: String =
    Seq(tableSpark("orders", Seq("o_totalprice")),
      tableSpark("lineitem", Seq("l_quantity", "l_extendedprice")),
      tableSpark("events", Seq("value")))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col")

  val quantilesDuckSql: String =
    quantiles((c, p) => s"ROUND(quantile_cont($c, $p), 2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_table" -> Tables.sql(statsSparkSql),
    "stats_quantiles" -> Tables.sql(quantilesSparkSql))

  val oracleSql: Map[String, String] = Map(
    "stats_table" -> statsDuckSql,
    "stats_quantiles" -> quantilesDuckSql)
}
