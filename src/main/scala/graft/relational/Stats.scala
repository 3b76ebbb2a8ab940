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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_table" -> Tables.sql(statsSparkSql))

  val oracleSql: Map[String, String] = Map(
    "stats_table" -> statsDuckSql)
}
