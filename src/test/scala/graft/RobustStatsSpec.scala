package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Semantics pins for the round-12 session additions — each runs the
  * REGISTERED SQL against a handcrafted temp view with a hand-computed
  * answer, so the operator's business rule (session gap boundary, MAD
  * outlier threshold, corr normalization) is pinned independently of
  * the DuckDB oracle (which only proves cross-engine agreement, not
  * that both engines agree on the WRONG thing).
  *
  * Crafted views shadow the real table names; every test restores the
  * real view in a finally so the shared session stays clean for later
  * specs (Tables.register memoizes the dir and would not re-register).
  */
class RobustStatsSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private def restore(name: String): Unit =
    Tables.load(spark, sf, name).createOrReplaceTempView(name)

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def eventsView(rows: Seq[Row]): Unit =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventsSchema)
      .createOrReplaceTempView("events")

  private def ntz(micros: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      micros / 1000000L, (micros % 1000000L).toInt * 1000,
      java.time.ZoneOffset.UTC)

  test("q41_sessionize: gap strictly over 12h opens a session, ties " +
    "break on event_id, span is per-session") {
    Tables.register(spark, sf)
    val h12us = 43200000000L
    try {
      eventsView(Seq(
        // user 1: two events 100s apart, then a gap of exactly 12h
        // (NOT a new session: rule is strictly greater), then 12h+1us
        Row(1L, ntz(0L), 1L, "view", 0.0, ""),
        Row(2L, ntz(100000000L), 1L, "view", 0.0, ""),
        Row(3L, ntz(100000000L + h12us), 1L, "view", 0.0, ""),
        Row(4L, ntz(100000000L + h12us + h12us + 1L), 1L, "view", 0.0, ""),
        // user 2: one event
        Row(5L, ntz(7L), 2L, "view", 0.0, "")))
      val out = spark.sql(relational.Relational.sessionizeSparkSql)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      // user 1: sessions {e1,e2,e3} (span 100s+12h) and {e4} (span 0)
      assert(out(1L) == ((2L, 4L, 3L, 100000000L + h12us)), out(1L))
      assert(out(2L) == ((1L, 1L, 1L, 0L)), out(2L))
    } finally restore("events")
  }

  test("stats_mad_outliers: robust threshold flags exactly the planted " +
    "outlier; zero-MAD group flags any deviation") {
    Tables.register(spark, sf)
    try {
      val a = (1 to 9).map(i =>
        Row(i.toLong, ntz(i * 1000000L), 1L, "a", i.toDouble, "")) :+
        Row(10L, ntz(10000000L), 1L, "a", 1000.0, "")
      val b = (11 to 14).map(i =>
        Row(i.toLong, ntz(i * 1000000L), 1L, "b", 5.0, "")) :+
        Row(15L, ntz(15000000L), 1L, "b", 5.5, "")
      eventsView(a ++ b)
      val out = spark.sql(relational.Stats.madOutliersSparkSql)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getString(2), r.getString(3), r.getLong(4))))
        .toMap
      // a: med=5.5, devs {0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5},
      //    mad=2.5; threshold 3*1.4826*2.5≈11.12 → only the 1000 flags
      assert(out("a") == ((10L, "5.5000", "2.5000", 1L)), out("a"))
      // b: med=5, mad=0 → any nonzero deviation flags (1 of 5)
      assert(out("b") == ((5L, "5.0000", "0.0000", 1L)), out("b"))
    } finally restore("events")
  }

  test("stats_corr_matrix: perfectly colinear columns pin ±1, constant " +
    "column pins NULL") {
    Tables.register(spark, sf)
    try {
      val schema = StructType(Seq(
        StructField("l_quantity", DoubleType),
        StructField("l_extendedprice", DoubleType),
        StructField("l_discount", DoubleType),
        StructField("l_tax", DoubleType)))
      val rows = (1 to 20).map(i =>
        Row(i.toDouble, 2.0 * i + 3.0, -1.0 * i, 0.05))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
        .createOrReplaceTempView("lineitem")
      val r = spark.sql(relational.Stats.corrMatrixSparkSql).head()
      assert(r.getLong(r.fieldIndex("n")) == 20L)
      assert(r.getString(r.fieldIndex("c_quant_exten")) == "1.000000")
      assert(r.getString(r.fieldIndex("c_quant_disco")) == "-1.000000")
      // corr against a zero-variance column is undefined → NULL
      assert(r.isNullAt(r.fieldIndex("c_quant_tax")))
    } finally restore("lineitem")
  }
}
