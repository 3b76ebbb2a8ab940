package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table catalog: registers the driver-generated parquet tables
  * (TESTDATA.md) as temp views so queries can be expressed in Spark SQL
  * with the same table names the DuckDB oracle sees.
  *
  * Scale note: at 100 TB these would be catalog tables partitioned on
  * their natural keys; temp-view registration here is metadata-only
  * (one parquet footer read per table) and does not materialize data.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read it as raw nanos (legacy long mode)
    * and floor-convert to a microsecond TimestampType column — matching
    * what the DuckDB oracle sees after `CAST(ts AS TIMESTAMP)`.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, name))
    if (name == "events" &&
        raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Register every table that exists in `dir` as a temp view. */
  def register(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      if (new java.io.File(path(dir, n)).exists())
        load(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Lift a SQL string into the driver's query signature. */
  def sql(q: String): (SparkSession, String) => DataFrame =
    (spark, dir) => { register(spark, dir); spark.sql(q) }
}
