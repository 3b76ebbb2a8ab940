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

  test("stats_ttest: hand-computed Welch t and df on a planted two-arm " +
    "split") {
    Tables.register(spark, sf)
    try {
      // arm = user_id % 2: arm0 = {10,12,14}, arm1 = {20,22,24,26}
      val a0 = Seq(10.0, 12.0, 14.0).zipWithIndex.map { case (v, i) =>
        Row(i.toLong, ntz(i * 1000000L), 2L * i, "a", v, "") }
      val a1 = Seq(20.0, 22.0, 24.0, 26.0).zipWithIndex.map { case (v, i) =>
        Row(10L + i, ntz(i * 1000000L), 2L * i + 1, "a", v, "") }
      eventsView(a0 ++ a1)
      val r = spark.sql(relational.Stats.ttestSparkSql).head()
      assert(r.getLong(r.fieldIndex("n_a")) == 3L)
      assert(r.getLong(r.fieldIndex("n_b")) == 4L)
      assert(r.getString(r.fieldIndex("mean_a")) == "12.000000")
      assert(r.getString(r.fieldIndex("mean_b")) == "23.000000")
      // va=4, vb=20/3; t = -11/sqrt(4/3 + 5/3) = -11/sqrt(3)
      val t = r.getString(r.fieldIndex("t_stat")).toDouble
      assert(math.abs(t - (-11.0 / math.sqrt(3.0))) < 1e-5, t)
      val se2a = 4.0 / 3
      val se2b = (20.0 / 3) / 4
      val df = math.pow(se2a + se2b, 2) /
        (se2a * se2a / 2 + se2b * se2b / 3)
      val gotDf = r.getString(r.fieldIndex("welch_df")).toDouble
      assert(math.abs(gotDf - df) < 1e-5, s"$gotDf vs $df")
    } finally restore("events")
  }

  test("q42_pivot: per-day per-type counts land in their columns with " +
    "absent combos as 0") {
    Tables.register(spark, sf)
    try {
      eventsView(Seq(
        Row(1L, ntz(0L), 1L, "view", 0.0, ""),
        Row(2L, ntz(1000L), 1L, "view", 0.0, ""),
        Row(3L, ntz(2000L), 2L, "click", 0.0, ""),
        // next day: one purchase only
        Row(4L, ntz(86400L * 1000000L), 2L, "purchase", 0.0, "")))
      val out = relational.Relational.queries("q42_pivot")(spark, sf)
        .collect().map(r => r.getDate(0).toString ->
          (r.getLong(r.fieldIndex("view")), r.getLong(r.fieldIndex("click")),
           r.getLong(r.fieldIndex("purchase")),
           r.getLong(r.fieldIndex("error")),
           r.getLong(r.fieldIndex("signup")))).toMap
      assert(out("1970-01-01") == ((2L, 1L, 0L, 0L, 0L)), out)
      assert(out("1970-01-02") == ((0L, 0L, 1L, 0L, 0L)), out)
    } finally restore("events")
  }

  test("stats_chisq: hand-computed expected counts and chi2 parts on a " +
    "planted contingency table") {
    Tables.register(spark, sf)
    try {
      // type a: arm0=3, arm1=1; type b: arm0=1, arm1=3 → e = 2 each,
      // chi2_part = (3-2)²/2 + (1-2)²/2 = 1 for both types
      def mk(id: Long, uid: Long, t: String) =
        Row(id, ntz(id * 1000L), uid, t, 1.0, "")
      eventsView(
        (1 to 3).map(i => mk(i.toLong, 2L * i, "a")) ++
          Seq(mk(4L, 1L, "a")) ++
          Seq(mk(5L, 2L, "b")) ++
          (6 to 8).map(i => mk(i.toLong, 2L * i + 1, "b")))
      val out = spark.sql(relational.Stats.chisqSparkSql)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4),
            r.getString(5)))).toMap
      assert(out("a") ==
        ((3L, 1L, "2.000000", "2.000000", "1.000000")), out("a"))
      assert(out("b") ==
        ((1L, 3L, "2.000000", "2.000000", "1.000000")), out("b"))
    } finally restore("events")
  }

  test("stats_anova: hand-computed between/within decomposition and F " +
    "on two planted groups") {
    Tables.register(spark, sf)
    try {
      // click = {1,2,3}, view = {4,5,6}: means 2 and 5, grand mean 3.5
      // SSB = 3·(2−3.5)² + 3·(5−3.5)² = 13.5; SSW = 2 + 2 = 4
      // F = (13.5/1) / (4/4) = 13.5; absent types contribute nothing.
      // SS emit as exact integer milli²: 13.5 unit² = 13_500_000
      val rows = Seq(1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
        Row(i.toLong, ntz(i * 1000000L), 1L, "click", v, "") } ++
        Seq(4.0, 5.0, 6.0).zipWithIndex.map { case (v, i) =>
          Row(10L + i, ntz(i * 1000000L), 2L, "view", v, "") }
      eventsView(rows)
      val r = spark.sql(relational.Stats.anovaSparkSql).head()
      assert(r.getLong(r.fieldIndex("n_groups")) == 2L)
      assert(r.getLong(r.fieldIndex("n_obs")) == 6L)
      assert(r.getLong(r.fieldIndex("ssb_milli2")) == 13500000L)
      assert(r.getLong(r.fieldIndex("ssw_milli2")) == 4000000L)
      assert(r.getLong(r.fieldIndex("df_between")) == 1L)
      assert(r.getLong(r.fieldIndex("df_within")) == 4L)
      assert(r.getString(r.fieldIndex("f_stat")) == "13.500000")
    } finally restore("events")
  }

  test("stats_linreg: noiseless planted plane recovers exact " +
    "coefficients and R² = 1") {
    Tables.register(spark, sf)
    try {
      val schema = StructType(Seq(
        StructField("l_quantity", DoubleType),
        StructField("l_discount", DoubleType),
        StructField("l_extendedprice", DoubleType)))
      // y = 3 + 2·q + 5·(100·discount), exactly on the plane
      val pts = Seq((1, 3), (2, 1), (3, 0), (4, 2))
      val rows = pts.map { case (q, d) =>
        Row(q.toDouble, d / 100.0, (3 + 2 * q + 5 * d).toDouble) }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
        .createOrReplaceTempView("lineitem")
      val r = spark.sql(relational.Stats.linregSparkSql).head()
      assert(r.getLong(r.fieldIndex("n")) == 4L)
      assert(r.getString(r.fieldIndex("intercept")) == "3.000000")
      assert(r.getString(r.fieldIndex("b_quantity")) == "2.000000")
      assert(r.getString(r.fieldIndex("b_discount")) == "5.000000")
      assert(r.getString(r.fieldIndex("r2")) == "1.000000")
    } finally restore("lineitem")
  }

  test("stats_gini: hand-computed rank-sum concentration; equal values " +
    "pin zero") {
    Tables.register(spark, sf)
    try {
      // click = {1,1,2,4}: sorted ranks 1..4, Σi·v = 1+2+6+16 = 25,
      // G = 2·25/(4·8) − 5/4 = 0.3125; view = {3,3,3}: G = 0 exactly
      val rows = Seq(1.0, 1.0, 2.0, 4.0).zipWithIndex.map { case (v, i) =>
        Row(i.toLong, ntz(i * 1000000L), 1L, "click", v, "") } ++
        Seq(3.0, 3.0, 3.0).zipWithIndex.map { case (v, i) =>
          Row(10L + i, ntz(i * 1000000L), 2L, "view", v, "") }
      eventsView(rows)
      val out = spark.sql(relational.Stats.giniSparkSql)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(out("click") == ((4L, 8000L, "0.312500")), out("click"))
      assert(out("view") == ((3L, 9000L, "0.000000")), out("view"))
    } finally restore("events")
  }

  test("stats_auc: tied scores earn half-wins via integer midranks") {
    Tables.register(spark, sf)
    try {
      // negatives (arm 0): {1, 2}; positives (arm 1): {2, 3}
      // pairs: (2>1)=1, (2=2)=0.5, (3>1)=1, (3>2)=1 → AUC 3.5/4 = 0.875
      val neg = Seq(1.0, 2.0).zipWithIndex.map { case (v, i) =>
        Row(i.toLong, ntz(i * 1000000L), 2L * i, "a", v, "") }
      val pos = Seq(2.0, 3.0).zipWithIndex.map { case (v, i) =>
        Row(10L + i, ntz(i * 1000000L), 2L * i + 1, "a", v, "") }
      eventsView(neg ++ pos)
      val r = spark.sql(relational.Stats.aucSparkSql).head()
      assert(r.getLong(r.fieldIndex("n_pos")) == 2L)
      assert(r.getLong(r.fieldIndex("n_neg")) == 2L)
      assert(r.getString(r.fieldIndex("auc")) == "0.875000")
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

  test("stats_cusum: hand-computed closed form C_t - min prefix; a " +
    "planted level shift alarms once, a flat series never does") {
    Tables.register(spark, sf)
    try {
      // click: 0,0,0,3000,3000 → mu=1.2e6 milli, drift v-1200250;
      // C: -1200250,-2400500,-3600750,-1801000,-1250; S clamps to
      // 0,0,0,1799750,3599500 → one alarm row (>2e6) at rn=5, one
      // below→above episode. view: constant 10.0 → S identically 0.
      val rows = Seq(0.0, 0.0, 0.0, 3000.0, 3000.0).zipWithIndex.map {
        case (v, i) => Row(i.toLong, ntz(i * 1000000L), 1L, "click", v, "")
      } ++ (0 until 3).map(i =>
        Row(10L + i, ntz(i * 1000000L), 2L, "view", 10.0, ""))
      eventsView(rows)
      val out = spark.sql(relational.Stats.cusumSparkSql).collect()
        .map(r => r.getString(0) -> r).toMap
      val c = out("click")
      assert(c.getLong(1) == 5L && c.getLong(2) == 1200000L)
      assert(c.getLong(3) == 3599500L, "max_s")
      assert(c.getLong(4) == 1L && c.getLong(5) == 1L)
      assert(c.getLong(6) == 5L, "first alarm row")
      val v = out("view")
      assert(v.getLong(3) == 0L && v.getLong(4) == 0L)
      assert(v.isNullAt(6), "flat series never alarms")
    } finally restore("events")
  }

  test("stats_kanon: hand-built QI classes band correctly, NULL values " +
    "form their own class, the coarse level rolls up the fine") {
    Tables.register(spark, sf)
    try {
      // day 1 'click': bucket 0 ×5 (k=5), bucket 1 ×1 (singleton),
      // NULL ×1 (singleton); day 2 'view': bucket 0 ×2 (k=2). 9 rows.
      val d2 = 86400L * 1000000L
      val rows =
        (0 until 5).map(i => Row(i.toLong, ntz(i * 1000000L), 1L,
          "click", 10.0, "")) ++
        Seq(Row(5L, ntz(5000000L), 1L, "click", 60.0, ""),
          Row(6L, ntz(6000000L), 1L, "click", null, ""),
          Row(7L, ntz(d2), 2L, "view", 10.0, ""),
          Row(8L, ntz(d2 + 1000000L), 2L, "view", 20.0, ""))
      eventsView(rows)
      val out = spark.sql(relational.Stats.kanonSparkSql).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getString(6)))).toMap
      // coarse: (click,d1) k=7, (view,d2) k=2
      assert(out(("type_day", "2_k_lt_5")) ==
        ((1L, 2L, 2L, 2L, "22.222222")))
      assert(out(("type_day", "3_k_lt_25")) ==
        ((1L, 7L, 7L, 7L, "77.777778")))
      // fine: two singletons (incl. the NULL-bucket class)
      assert(out(("type_day_bucket", "1_singleton")) ==
        ((2L, 2L, 1L, 1L, "22.222222")))
      assert(out(("type_day_bucket", "2_k_lt_5")) ==
        ((1L, 2L, 2L, 2L, "22.222222")))
      assert(out(("type_day_bucket", "3_k_lt_25")) ==
        ((1L, 5L, 5L, 5L, "55.555556")))
      assert(out.size == 5)
    } finally restore("events")
  }
}
