package graft

import graft.raster.Fixtures
import graft.stac.StacParse
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r16 microbatch optimization's correctness contract: the
  * driver-side [[StacParse.parseItemsLocal]] (used by the foreachBatch
  * raster streams against the standing schemas, replacing two
  * distributed jobs per metadata-sized batch) must produce EXACTLY the
  * items the distributed [[StacParse.parseItems]] path produces — same
  * parse, same schema map, so the streamed landings stay byte-identical
  * to the batch twins the oracles recompute from. */
class StacParseLocalSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  // ParsedItem carries Arrays (affine, geometry rings), so case-class
  // equality is reference equality — compare by-value through the
  // Dataset encoder's JSON rendering instead
  private def canon(items: Seq[graft.model.ParsedItem]): Seq[String] =
    spark.createDataset(items).toJSON.collect().toSeq.sorted

  test("parseItemsLocal equals the distributed parse on the scene fixture") {
    val jsons = Fixtures.writeScenes(4).map(_.replaceAll("\n", " "))
    val (ds, schemas) = StacParse.parseItems(spark, spark.createDataset(jsons))
    val distributed = canon(ds.collect().toSeq)
    val local = canon(StacParse.parseItemsLocal(jsons, schemas))
    assert(local == distributed)
  }

  test("parseItemsLocal parses per-batch slices identically (the stream shape)") {
    val jsons = Fixtures.writeScenes(4).map(_.replaceAll("\n", " "))
    val (ds, schemas) = StacParse.parseItems(spark, spark.createDataset(jsons))
    val distributed = canon(ds.collect().toSeq)
    // one item per "microbatch", as maxFilesPerTrigger=1 delivers them
    val perBatch = canon(jsons.flatMap(j =>
      StacParse.parseItemsLocal(Seq(j), schemas)))
    assert(perBatch == distributed)
  }
}
