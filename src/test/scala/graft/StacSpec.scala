package graft

import graft.model.{BandKey, RasterBandMetadata}
import graft.raster.Fixtures
import graft.stac.StacParse
import graft.stac.StacParse.{ParseConfig, StacCfg}
import org.scalatest.funsuite.AnyFunSuite

/** stac_cfg overrides (MDParseConfig semantics), URL patching, and the
  * FeatureCollection bench source. */
class StacSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  private lazy val jsons = Fixtures.writeScenes(2)

  test("stac_cfg band override + user alias takes first priority") {
    val cfg = StacCfg(Map(Fixtures.CollectionId -> ParseConfig(
      bandCfg = Map("red" -> RasterBandMetadata(Some("float32"), Some(-1.0))),
      aliases = Map("crimson" -> BandKey("red", 1)))))
    val (ds, schemas) = StacParse.parseItems(spark,
      spark.createDataset(jsons), cfg)
    val md = schemas(Fixtures.CollectionId)
    assert(md.bands(BandKey("red", 1)) ==
      RasterBandMetadata(Some("float32"), Some(-1.0)))
    assert(md.bands(BandKey("nir", 1)).dataType.contains("uint16")) // untouched
    assert(md.bandKey("crimson") == BandKey("red", 1))
    assert(ds.count() == 2)
  }

  test("stac_cfg wildcard merges under collection-specific config") {
    val cfg = StacCfg(Map(
      "*" -> ParseConfig(bandDefaults = RasterBandMetadata(nodata = Some(9.0))),
      Fixtures.CollectionId -> ParseConfig(ignoreProj = true)))
    val c = cfg.forCollection(Fixtures.CollectionId)
    assert(c.ignoreProj && c.bandDefaults.nodata.contains(9.0))
    val md = StacParse.extractCollectionMetadata(jsons.head, c)
    assert(!md.hasProj)
    // falls back to gsd-based grid grouping (band2grid_from_gsd)
    assert(md.band2grid.values.toSet == Set("default"))
  }

  test("patch_urls rewrites only the selected bands (P5)") {
    val (ds, _) = StacParse.parseItems(spark, spark.createDataset(jsons))
    val patched = StacParse.patchUrls(spark, ds,
      uri => uri + "?signed=1", bands = Some(Set("red"))).collect()
    patched.foreach { item =>
      assert(item.bands("red").uri.endsWith("?signed=1"))
      assert(!item.bands("nir").uri.contains("signed"))
    }
    val all = StacParse.patchUrls(spark, ds, _ + "#x", None).collect()
    assert(all.forall(_.bands.values.forall(_.uri.endsWith("#x"))))
  }

  test("FeatureCollection source yields the same parsed items (S15)") {
    val fc = s"""{"type": "FeatureCollection",
                 |"features": [${jsons.mkString(",")}]}""".stripMargin
    val items = StacParse.featureCollectionItems(fc)
    assert(items.length == 2)
    val (ds, _) = StacParse.parseItems(spark, spark.createDataset(items))
    assert(ds.collect().map(_.id).sorted.toSeq == Seq("scene-0", "scene-1"))
    assertThrows[IllegalArgumentException] {
      StacParse.featureCollectionItems("""{"type": "Feature"}""")
    }
  }
}
