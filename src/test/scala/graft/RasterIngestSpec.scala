package graft

import org.scalatest.funsuite.AnyFunSuite

/** Streaming pixel ingest must equal the one-shot batch load: items
  * arrive one per microbatch, each batch fuses and appends its tiles to
  * a standing table; with per-id grouping the result set is identical
  * to `Load.load(groupby = "id")` over all items at once. */
class RasterIngestSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  test("incremental ingest equals the batch load, tile for tile") {
    val streamed = rasterops.RasterQueries.streamRasterIngest(spark)
      .collect().map(_.toSeq).toSeq
    val batch = rasterops.RasterQueries.groupByIdSummaryByTime(spark)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
