package graft

import graft.streaming.StacIngest
import org.scalatest.funsuite.AnyFunSuite

/** Streaming STAC ingest: multi-batch run, incremental schema widening
  * across batches (`_CMDAssembler.update` analog). */
class StacIngestSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark

  test("multi-batch ingest parses all items and widens the schema") {
    val jsons = raster.Fixtures.writeScenes(4).map(_.replaceAll("\n", " "))
    // item 3 reveals an extra asset the bootstrap items don't have
    val widened = jsons.updated(3, jsons(3).replace(
      """"assets": {""",
      """"assets": {"swir": {"href": "/tmp/none.grb",
        | "type": "image/tiff; application=geotiff", "roles": ["data"],
        | "proj:shape": [64, 64],
        | "proj:transform": [20.0, 0.0, 500000.0, 0.0, -20.0, 8000000.0],
        | "raster:bands": [{"nodata": 0, "data_type": "uint16"}]},""".stripMargin
        .replaceAll("\n", " ")))
    val landing = java.nio.file.Files.createTempDirectory("graft_ingest_land")
    widened.zipWithIndex.foreach { case (j, i) =>
      java.nio.file.Files.write(landing.resolve(f"item_$i%03d.json"),
        j.getBytes("UTF-8"))
    }
    val out = java.nio.file.Files.createTempDirectory("graft_ingest_out").toString

    val res = StacIngest.ingest(spark, landing.toString, out,
      maxFilesPerTrigger = 1)

    assert(res.nBatches >= 4, s"expected one batch per file, got ${res.nBatches}")
    val rows = res.items.orderBy("id").collect()
    assert(rows.length == 4)
    val md = res.schemas(raster.Fixtures.CollectionId)
    // widened: the late 'swir' asset joined the collection schema
    assert(md.allBands.contains("swir"), s"bands: ${md.allBands}")
    // bootstrap bands are still present
    assert(md.allBands.contains("red") && md.allBands.contains("nir"))
  }
}
