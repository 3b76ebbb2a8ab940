package graft.rasterops
import graft.eo3.Eo3
import graft.geo.{BBox, Geom}
import graft.load.{Fuse, Load}
import graft.planner.Planner
import graft.raster.Fixtures
import graft.stac.{StacParse, StacSearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-streaming raster surfaces: microbatch scene ingest and
  * incremental zonal statistics.
  *
  * One family of [[RasterQueries]]' driver-contract entries (pure
  * code move — the registry and all member semantics live unchanged
  * through the aggregator object, whose self-type gives every family
  * access to the shared fixtures/paths).
  */
private[rasterops] trait RasterStreamQueries {
  this: RasterQueries.type =>

  /** Streaming pixel ingest — the incremental-mosaic shape: STAC items
    * land one per microbatch; each batch runs the SAME distributed
    * read+fuse as the batch path (`Load.load`, groupby=id) and APPENDS
    * its tile rows to a standing parquet table. With per-id grouping,
    * batches are independent, so the standing table after the stream
    * equals the one-shot batch load — pinned by RasterIngestSpec
    * against `loadGroupById`'s tiles, and summarized here per tile.
    * At 100 TB/day this is the ingest topology: metadata-sized item
    * batches drive pixel work that lands append-only, partitioned by
    * band; no state store is involved because the group key (item id)
    * never spans batches. */
  def streamRasterIngest(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val jsons = Fixtures.writeScenes(NScenes).map(_.replaceAll("\n", " "))
    // incremental ingest lands on a STANDING grid declared up front
    // (the MGRS-tile analog) — per-batch auto-planning would re-anchor
    // tile indices to each batch's extent and the standing table would
    // never line up with itself, let alone the batch load
    val (allItems, allSchemas) = parsed(spark)
    val grid = Planner.outputGeobox(allItems, allSchemas).get
    val landing = java.nio.file.Files.createTempDirectory("graft_ring_land")
    jsons.zipWithIndex.foreach { case (j, i) =>
      java.nio.file.Files.write(landing.resolve(f"item_$i%03d.json"),
        j.getBytes("UTF-8"))
    }
    val out = java.nio.file.Files.createTempDirectory("graft_ring_out")
      .toString + "/tiles"
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", "1")
      .text(landing.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val js = batch.select("value").as[String](
          org.apache.spark.sql.Encoders.STRING).collect().toSeq
        if (js.nonEmpty) {
          val (ds, schemas) = StacParse.parseItems(spark,
            spark.createDataset(js))
          val items = ds.collect().toSeq.sortBy(_.id)
          val res = Load.load(spark, items, schemas,
            bands = Seq("red", "nir"), groupby = "id", chunks = 64,
            geobox = Some(grid))
          res.tiles.write.mode("append").partitionBy("band").parquet(out)
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // cross-engine anchor: the standing table's pixels land as plain
    // pixel-row parquet and BOTH engines aggregate the same file — the
    // incremental-mosaic analog of [[mosaicCells]] (a batch dropped or
    // double-appended by the stream shifts a checksum DuckDB recomputes)
    pixelsByTime(spark.read.parquet(out))
      .write.mode("overwrite").parquet(StreamCellsPath)
    quantizedSummaryByTime(spark.read.parquet(StreamCellsPath))
  }

  private[rasterops] val streamIngestDuckSql: String =
    s"""SELECT band, t, ty, tx, COUNT(*) AS n_px,
       |       CAST(SUM(CASE WHEN isnan(value) THEN 0
       |                ELSE CAST(ROUND(value * 100) AS BIGINT) END)
       |            AS BIGINT) AS sum_q,
       |       ROUND(MIN(CASE WHEN isnan(value) THEN NULL ELSE value END), 2) AS vmin,
       |       ROUND(MAX(CASE WHEN isnan(value) THEN NULL ELSE value END), 2) AS vmax
       |FROM read_parquet('$StreamCellsPath/*.parquet')
       |GROUP BY band, t, ty, tx
       |ORDER BY band, t, ty, tx""".stripMargin

  /** Streaming zonal statistics (beyond the reference): scenes arrive
    * one per microbatch and each batch appends only its |zones|×|bands|
    * PARTIAL rows to a standing partials table — O(zones) incremental
    * maintenance per batch, never a recompute over history; the final
    * answer is a re-aggregation of partials. The zones are the zonal
    * trio, so DuckDB recomputes the same per-zone totals from the
    * per-item pixel planes (`CompositeCellsPath`, identical fixture
    * items) with the ray cast from the landed zone edges — a batch
    * dropped, double-counted, or mis-painted shifts the totals. */
  def streamZonal(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val jsons = Fixtures.writeScenes(NScenes).map(_.replaceAll("\n", " "))
    val (allItems, allSchemas) = parsed(spark)
    val grid = Planner.outputGeobox(allItems, allSchemas).get
    // the zonal trio under the NAMES the landed zone-edge table uses
    val zones = demoZones(grid.crs).take(3)
      .zip(Seq("rect", "tri", "holed"))
      .map { case ((_, g), n) => (n, g) }
    val landing = java.nio.file.Files.createTempDirectory("graft_szonal_land")
    jsons.zipWithIndex.foreach { case (j, i) =>
      java.nio.file.Files.write(landing.resolve(f"item_$i%03d.json"),
        j.getBytes("UTF-8"))
    }
    val partialsOut = java.nio.file.Files
      .createTempDirectory("graft_szonal_out").toString + "/partials"
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", "1")
      .text(landing.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val js = batch.select("value").as[String](
          org.apache.spark.sql.Encoders.STRING).collect().toSeq
        if (js.nonEmpty) {
          val (ds, schemas) = StacParse.parseItems(spark,
            spark.createDataset(js))
          val items = ds.collect().toSeq.sortBy(_.id)
          val res = Load.load(spark, items, schemas,
            bands = Seq("red", "nir"), groupby = "id", chunks = 64,
            geobox = Some(grid))
          graft.load.Zonal.zonalStats(spark, res.tiles, grid, zones)
            .write.mode("append").parquet(partialsOut)
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(partialsOut)
      .groupBy("zone", "band")
      .agg(sum("n_valid").as("n_valid"),
        round(sum("total"), 2).as("total"),
        round(min("vmin"), 2).as("vmin"),
        round(max("vmax"), 2).as("vmax"))
      .orderBy("zone", "band")
  }

  private[rasterops] val streamZonalDuckSql: String =
    s"""WITH e AS (
       |  SELECT zone, x1, y1, x2, y2
       |  FROM read_parquet('$ZoneEdgesPath/*.parquet')),
       |p AS (
       |  -- per-ITEM observations: an overlap pixel seen by two scenes
       |  -- is two in-zone observations, exactly as the per-batch
       |  -- partials count it
       |  SELECT band, tidx, value,
       |         500000 + (tx * 64 + px + 0.5) * 10 AS cx,
       |         8000000 - (ty * 64 + py + 0.5) * 10 AS cy
       |  FROM read_parquet('$CompositeCellsPath/*.parquet')
       |  WHERE NOT isnan(value)),
       |hit AS (
       |  SELECT e.zone, p.band, p.tidx, p.cx, p.cy, MIN(p.value) AS value,
       |         SUM(CASE WHEN (e.y1 > p.cy) <> (e.y2 > p.cy)
       |                   AND p.cx < (e.x2 - e.x1) * (p.cy - e.y1)
       |                              / (e.y2 - e.y1) + e.x1
       |              THEN 1 ELSE 0 END) AS cr
       |  FROM p CROSS JOIN e
       |  GROUP BY e.zone, p.band, p.tidx, p.cx, p.cy)
       |SELECT zone, band, COUNT(*) AS n_valid,
       |       ROUND(SUM(value), 2) AS total,
       |       ROUND(MIN(value), 2) AS vmin, ROUND(MAX(value), 2) AS vmax
       |FROM hit WHERE cr % 2 = 1
       |GROUP BY zone, band ORDER BY zone, band""".stripMargin
}
