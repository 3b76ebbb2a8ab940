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
  /** (rowGroups, compressedBytes) of a parquet file or directory of part
    * files — footer metadata only, cached per path. Parquet scan
    * parallelism is bounded by row groups, not by `maxPartitionBytes`
    * splits: a split only yields rows when a row-group midpoint falls in
    * it, so a 1-row-group file is read by exactly ONE task no matter how
    * it is sliced. */
  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  private def footerStats(spark: SparkSession, p: String): (Long, Long) =
    footerCache.computeIfAbsent(p, { _ =>
      val f = new java.io.File(p)
      val parts: Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
            .filter(_.getName.endsWith(".parquet"))
        else Seq(f)
      val conf = spark.sessionState.newHadoopConf()
      var groups = 0L
      var bytes = 0L
      parts.foreach { part =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(part.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try groups += r.getRowGroups.size() finally r.close()
        bytes += part.length()
      }
      (groups, bytes)
    })

  /** Split-starvation guard: when a table's parquet layout yields far
    * fewer effective splits (row groups) than cores AND each split
    * carries a large slab of data, rebalance with an explicit
    * round-robin repartition so downstream CPU work is not serialized
    * on the accident of how the file was written.
    *
    * At 100 TB inputs routinely arrive as `coalesce(1)` exports or
    * single-row-group files from upstream writers; Spark's scan
    * parallelism is row-group-bound and AQE cannot re-plan a stage
    * that has no exchange. The guard is the source-side analog: pay
    * one pruned-column shuffle (~seconds) to unlock N-way CPU
    * parallelism on per-byte kernels (measured 10×+ on regex/token
    * scans over a 1-row-group corpus). Column pruning and predicate
    * pushdown still reach the scan — Catalyst pushes both through
    * `Repartition`. Threshold `spark.graft.scan.minSplitMB` (default
    * 24; <=0 disables) is chosen so the guard never fires on
    * well-chunked or small inputs where the exchange could only lose.
    */
  private def rebalance(spark: SparkSession, p: String, df: DataFrame): DataFrame = {
    val minSplitMB = spark.conf.getOption("spark.graft.scan.minSplitMB")
      .map(_.toDouble).getOrElse(24.0)
    if (minSplitMB <= 0) return df
    val cores = spark.sparkContext.defaultParallelism
    val (groups, bytes) = footerStats(spark, p)
    val starved = groups > 0 && groups < cores &&
      bytes.toDouble / groups > minSplitMB * 1024 * 1024
    if (starved) df.repartition(cores) else df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    rebalance(spark, path(dir, name), loadRaw(spark, dir, name))

  private def loadRaw(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // scope the legacy-nanos flag to this read: leaking it session-wide
      // would make OTHER tables' nanos columns arrive silently as longs
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        val raw = spark.read.parquet(path(dir, name))
        // (read is lazy, but the schema — where the flag matters — is
        // resolved eagerly by spark.read.parquet)
        if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          raw.withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestamp_micros(ts div 1000)"))
        else raw
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    } else spark.read.parquet(path(dir, name))
  }

  private val lastDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register every table that exists in `dir` as a temp view. Skipped
    * when this session's views already point at `dir` (temp views are
    * session-global, so only the LAST dir registered counts) — repeated
    * query invocations then skip the ten footer reads + view creations. */
  def register(spark: SparkSession, dir: String): Unit =
    if (lastDir.put(spark, dir) != dir) {
      names.foreach { n =>
        if (new java.io.File(path(dir, n)).exists())
          load(spark, dir, n).createOrReplaceTempView(n)
      }
    }

  /** Lift a SQL string into the driver's query signature. */
  def sql(q: String): (SparkSession, String) => DataFrame =
    (spark, dir) => { register(spark, dir); spark.sql(q) }
}
