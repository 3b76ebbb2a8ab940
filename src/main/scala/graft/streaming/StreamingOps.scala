package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface (SURVEY §2.10): the reference has no
  * streaming, but its solar_day grouping is event-time bucketing — here
  * expressed as a streaming tumbling window over the `events` table, run
  * with Trigger.AvailableNow so batch and streaming answers coincide and
  * the result is DuckDB-oracle checkable (same SQL as the batch analog).
  *
  * At scale this is the standard incremental-ingest shape: file-source
  * stream, event-time window + watermark, stateful agg. Complete mode is
  * used here so the finite run emits closed and open windows alike; a
  * production append-mode sink would rely on the watermark shown below.
  */
object StreamingOps {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  def tumblingDaily(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // FileStreamSource needs a directory; expose the single-file table
    // through a symlink dir (what a real ingest landing zone looks like).
    val src = java.nio.file.Paths.get(Tables.path(dir, "events"))
    val streamDir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_stream_src_${src.hashCode & 0x7fffffff}")
    java.nio.file.Files.createDirectories(streamDir)
    val link = streamDir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(link, src)
    val path = streamDir.toString
    val rawSchema = spark.read.parquet(path).schema // ts arrives as raw nanos
    val name = s"graft_stream_${counter.incrementAndGet()}"
    val stream = spark.readStream.schema(rawSchema).parquet(path)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
    val q = stream.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(col("window.start").cast("date").as("d"), col("event_type"),
        col("n"), col("v"))
      .orderBy("d", "event_type")
  }

  /** Same answer, batch SQL — the oracle for the streaming run. */
  val tumblingDailyOracle: String =
    """SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n,
      |       ROUND(SUM(value), 2) AS v
      |FROM events GROUP BY CAST(ts AS DATE), event_type
      |ORDER BY d, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling_daily" -> ((s, d) => tumblingDaily(s, d))
  )

  val oracleSql: Map[String, String] = Map(
    "stream_tumbling_daily" -> tumblingDailyOracle
  )
}
