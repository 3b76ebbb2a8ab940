package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Testdata-schema drift guard (round-6 regression: the driver regenerated
  * `events.parquet` with ts as TIMESTAMP(MICROS) where earlier rounds wrote
  * TIMESTAMP(NANOS), and every streaming consumer hard-coded the nanos
  * arithmetic). Pins BOTH staging paths — batch [[Tables.load]] and
  * streaming [[graft.streaming.StreamingOps]] — against fixtures of each
  * physical type, so a future regeneration can't silently half-break one
  * path again.
  */
class SchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  // one instant, expressed both ways: 2023-11-14T22:13:20.123456Z
  private val NanoTs = 1700000000123456789L // raw nanos (floor → .123456)
  private val MicroTs = 1700000000123456L

  /** Write a one-file events.parquet under a fresh dir, `ts` typed per
    * `nanosAsLong`: LongType raw nanos (what TIMESTAMP(NANOS) resolves to
    * under the legacy flag) or TIMESTAMP_NTZ micros (the current driver
    * output). Returns the table dir usable as an SF dir. */
  private def writeFixture(nanosAsLong: Boolean): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    val rows = Seq(
      (NanoTs, 1L, 101L, "view", 1.5),
      (NanoTs + 3600L * 1000000000L, 1L, 102L, "view", 2.5), // +1 h, same pair
      (NanoTs + 7200L * 1000000000L, 2L, 103L, "purchase", 9.0))
    val base = rows.toDF("ts_n", "user_id", "event_id", "event_type", "value")
    val ts = // UTC session → TimestampType→NTZ cast is exact
      if (nanosAsLong) col("ts_n")
      else expr("CAST(timestamp_micros(ts_n div 1000) AS TIMESTAMP_NTZ)")
    val staged = java.nio.file.Files.createTempDirectory("graft_drift_w")
    base.select(ts.as("ts"), col("user_id"), col("event_id"),
        col("event_type"), col("value"))
      .coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val part = new java.io.File(staged.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"))
    dir
  }

  private def assertNormalized(dirLong: String, dirNtz: String): Unit = {
    for ((d, label) <- Seq((dirLong, "long-nanos"), (dirNtz, "ntz-micros"))) {
      val loaded = Tables.load(spark, d, "events")
      val t = loaded.schema("ts").dataType
      assert(t == TimestampType || t == TimestampNTZType,
        s"$label: Tables.load must yield a timestamp-typed ts, got $t")
      val micros = loaded
        .select(unix_micros(col("ts").cast(TimestampType)).as("us"))
        .orderBy("us").collect().map(_.getLong(0))
      assert(micros.head == MicroTs, s"$label: wrong instant ${micros.head}")
    }
  }

  test("Tables.load normalizes ts for both physical types") {
    val (a, b) = (writeFixture(nanosAsLong = true), writeFixture(nanosAsLong = false))
    // sanity: the fixtures really are the two physical shapes
    assert(spark.read.parquet(s"$a/events.parquet").schema("ts").dataType == LongType)
    val ntz = spark.read.parquet(s"$b/events.parquet").schema("ts").dataType
    assert(ntz == TimestampNTZType || ntz == TimestampType, s"got $ntz")
    assertNormalized(a, b)
  }

  test("streaming tsNormalizer yields identical TimestampType instants for both") {
    for (nal <- Seq(true, false)) {
      val d = writeFixture(nal)
      val raw = spark.read.parquet(s"$d/events.parquet")
      val norm = raw.withColumn("ts",
        graft.streaming.StreamingOps.tsNormalizer(raw.schema))
      assert(norm.schema("ts").dataType == TimestampType)
      val got = norm.select(unix_micros(col("ts")).as("us"))
        .orderBy("us").collect().map(_.getLong(0)).toSeq
      assert(got == Seq(MicroTs, MicroTs + 3600L * 1000000L,
        MicroTs + 7200L * 1000000L), s"nanosAsLong=$nal: $got")
    }
  }

  test("streamDedup end-to-end agrees across both physical types") {
    val expected = Seq((1L, "view"), (2L, "purchase")).sorted
    for (nal <- Seq(true, false)) {
      val d = writeFixture(nal)
      val got = graft.streaming.StreamingOps.streamDedup(spark, d)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(got == expected, s"nanosAsLong=$nal: $got")
    }
    // the legacy-nanos flag must not leak out of the streaming run
    // (getOption reports the registered default "false" when unset)
    assert(!spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false").toBoolean)
  }
}
