package graft.layout

import graft.functions.VecFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: write-time spatial clustering via the native
  * `zorder64` Morton expression.
  *
  * At 100 TB a tile table's dominant query is a square ROI predicate
  * (`tx BETWEEN a AND b AND ty BETWEEN c AND d`). Files written in
  * x-major order stripe each x-run across the full y extent, so every
  * file intersects every ROI and parquet min/max stats prune nothing.
  * Z-order clustering bounds both coordinates per file, so an ROI query
  * touches O(area/file_size) files — the difference between reading a
  * few files and scanning the table.
  *
  * The contract query compares the two layouts analytically on a 64×64
  * grid with deterministic NTILE file assignment (DuckDB-oracle
  * checked, bit-for-bit against a pure-SQL Morton pipeline); the
  * physical `repartitionByRange` write path is pinned by `ZOrderSpec`.
  */
object Layout {

  /** 64×64 grid, 16 files per layout, 16×16 ROI. Per (layout, file):
    * row count, bounding box, and whether the file touches the ROI —
    * the analytic form of "how many files would an ROI scan read". */
  private val zorderLayoutSparkSql: String =
    """WITH grid AS (
      |  SELECT t1.id AS x, t2.id AS y FROM range(64) t1 CROSS JOIN range(64) t2),
      |z AS (
      |  SELECT x, y, zorder64(CAST(x AS INT), CAST(y AS INT)) AS z FROM grid),
      |lay AS (
      |  SELECT 'zorder' AS layout, x, y, NTILE(16) OVER (ORDER BY z) AS f FROM z
      |  UNION ALL
      |  SELECT 'xmajor' AS layout, x, y, NTILE(16) OVER (ORDER BY x, y) AS f FROM z)
      |SELECT layout, CAST(f AS BIGINT) AS file, COUNT(*) AS n,
      |       MIN(x) AS xmin, MAX(x) AS xmax, MIN(y) AS ymin, MAX(y) AS ymax,
      |       CAST(MAX(CASE WHEN x BETWEEN 8 AND 23 AND y BETWEEN 40 AND 55
      |                THEN 1 ELSE 0 END) AS BIGINT) AS roi_touch
      |FROM lay GROUP BY layout, f ORDER BY layout, file""".stripMargin

  /** DuckDB spelling: `zorder64` inlined as the standard Morton bit
    * spread. The kernel's sign-bias + top-bit flip is order-equivalent
    * to the plain interleave for non-negative coordinates (all grid
    * coords here), and only the ORDER matters to NTILE. */
  private val zorderLayoutDuckSql: String =
    """WITH grid AS (
      |  SELECT CAST(t1.range AS BIGINT) AS x, CAST(t2.range AS BIGINT) AS y
      |  FROM range(64) t1, range(64) t2),
      |a AS (SELECT x, y, (x|(x<<8))&16711935 AS sx, (y|(y<<8))&16711935 AS sy
      |      FROM grid),
      |b AS (SELECT x, y, (sx|(sx<<4))&252645135 AS sx, (sy|(sy<<4))&252645135 AS sy
      |      FROM a),
      |c AS (SELECT x, y, (sx|(sx<<2))&858993459 AS sx, (sy|(sy<<2))&858993459 AS sy
      |      FROM b),
      |d AS (SELECT x, y, (sx|(sx<<1))&1431655765 AS sx, (sy|(sy<<1))&1431655765 AS sy
      |      FROM c),
      |z AS (SELECT x, y, sx + 2*sy AS z FROM d),
      |lay AS (
      |  SELECT 'zorder' AS layout, x, y, NTILE(16) OVER (ORDER BY z) AS f FROM z
      |  UNION ALL
      |  SELECT 'xmajor' AS layout, x, y, NTILE(16) OVER (ORDER BY x, y) AS f FROM z)
      |SELECT layout, CAST(f AS BIGINT) AS file, COUNT(*) AS n,
      |       MIN(x) AS xmin, MAX(x) AS xmax, MIN(y) AS ymin, MAX(y) AS ymax,
      |       CAST(MAX(CASE WHEN x BETWEEN 8 AND 23 AND y BETWEEN 40 AND 55
      |                THEN 1 ELSE 0 END) AS BIGINT) AS roi_touch
      |FROM lay GROUP BY layout, f ORDER BY layout, file""".stripMargin

  def zorderLayout(spark: SparkSession): DataFrame = {
    VecFunctions.register(spark)
    spark.sql(zorderLayoutSparkSql)
  }

  /** Small-file compaction — the other half of the layout lifecycle.
    * Streaming sinks and per-task writers fragment a table into files
    * far below the row-group sweet spot; at 100 TB that turns every scan
    * into millions of opens and footer reads. Compaction rewrites the
    * table into ~targetBytes files while PRESERVING the clustering key
    * order (`repartitionByRange` + sort on the given columns), so the
    * rewrite keeps — not destroys — min/max pruning. Returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long, orderCols: Seq[String]): (Long, Long) = {
    def files(d: String): Array[java.io.File] =
      new java.io.File(d).listFiles().filter(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    val before = files(inDir)
    val totalBytes = before.map(_.length()).sum
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .write.mode("overwrite").parquet(outDir)
    (before.length.toLong, files(outDir).length.toLong)
  }

  /** Contract query: fragment a z-ordered grid into 64 shard files,
    * compact, report the shape. Deterministic counts; content equality
    * and per-file ordering are pinned by `ZOrderSpec`. */
  def compactQuery(spark: SparkSession): DataFrame = {
    VecFunctions.register(spark)
    import spark.implicits._
    val frag = java.nio.file.Files.createTempDirectory("graft_frag").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
      .toDF("tx", "ty")
      .selectExpr("tx", "ty", "zorder64(tx, ty) AS z")
    grid.repartition(64).write.mode("overwrite").parquet(frag)
    val (nBefore, nAfter) = compact(spark, frag, out, 64 * 1024, Seq("z"))
    // bit_xor as content checksum: z codes sit near 2^62, a SUM overflows
    val check = spark.read.parquet(out)
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(z)").as("z_xor"))
      .withColumn("files_before", lit(nBefore))
      .withColumn("files_after", lit(nAfter))
    check.select("files_before", "files_after", "n_rows", "z_xor")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> ((s, _) => zorderLayout(s)),
    "layout_compact" -> ((s, _) => compactQuery(s)))

  val oracleSql: Map[String, String] = Map(
    "layout_zorder" -> zorderLayoutDuckSql)
}
