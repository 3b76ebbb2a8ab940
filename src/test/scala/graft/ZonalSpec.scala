package graft

import graft.geo.{Geom, Poly}
import graft.load.{Load, Zonal}
import graft.raster.Fixtures
import graft.stac.StacParse
import org.scalatest.funsuite.AnyFunSuite

/** Zonal statistics: per-zone tile-partial aggregation vs
  * first-principles expectations on the fixture ramp (`scenePixels`:
  * value = 1000(k+1) + (y%50)·10 + (x%50), valid x < 96 of 128). */
class ZonalSpec extends AnyFunSuite {
  import GraftSpark.spark

  private lazy val res = {
    import spark.implicits._
    val jsons = Fixtures.writeScenes(4)
    val (ds, schemas) = StacParse.parseItems(spark, spark.createDataset(jsons))
    val items = ds.collect().toSeq.sortBy(_.id)
    Load.load(spark, items, schemas, bands = Seq("red"),
      groupby = "solar_day", chunks = 64)
  }

  test("rectangle zone: exact count and value range") {
    // world rect [500200,500800]x[7999600,7999900] = pixels
    // gx in [20,80), gy in [10,40) — inside scene0's valid region, day 0
    val zones = Seq("r" -> Geom(IndexedSeq(
      (500200.0, 7999600.0), (500800.0, 7999600.0),
      (500800.0, 7999900.0), (500200.0, 7999900.0)), res.geobox.crs))
    val rows = Zonal.zonalStats(spark, res.tiles, res.geobox, zones)
      .orderBy("tIdx").collect()
    assert(rows.map(_.getAs[Int]("tIdx")).toSeq == Seq(0))
    val r = rows.head
    assert(r.getAs[Long]("n_valid") == 60L * 30)
    // ramp over x%50 in {20..49,0..29}, y%50 in {10..39}
    assert(r.getAs[Double]("vmin") == 1000 + 10 * 10 + 0)
    assert(r.getAs[Double]("vmax") == 1000 + 39 * 10 + 49)
  }

  test("zone with hole: even-odd rule excludes the interior ring") {
    // outer 80x60 px minus 20x20 hole, over day-1 scenes only
    val zones = Seq("h" -> Geom(IndexedSeq(Poly(
      IndexedSeq((502000.0, 7999200.0), (502800.0, 7999200.0),
        (502800.0, 7999800.0), (502000.0, 7999800.0)),
      IndexedSeq(IndexedSeq((502300.0, 7999400.0), (502500.0, 7999400.0),
        (502500.0, 7999600.0), (502300.0, 7999600.0))))), res.geobox.crs))
    val rows = Zonal.zonalStats(spark, res.tiles, res.geobox, zones).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Int]("tIdx") == 1)
    assert(r.getAs[Long]("n_valid") == 80L * 60 - 20L * 20)
  }

  test("LonLat zone reprojects onto the UTM grid and matches native") {
    // the same rectangle expressed in LonLat, run through Geom.toCrs —
    // must select the identical pixel set as the native-CRS spelling
    val native = Geom(IndexedSeq(
      (500200.0, 7999600.0), (500800.0, 7999600.0),
      (500800.0, 7999900.0), (500200.0, 7999900.0)), res.geobox.crs)
    val lonlat = native.toCrs(graft.geo.Crs.LonLat).toCrs(res.geobox.crs)
    val a = Zonal.zonalStats(spark, res.tiles, res.geobox,
      Seq("z" -> native)).collect().head
    val b = Zonal.zonalStats(spark, res.tiles, res.geobox,
      Seq("z" -> lonlat)).collect().head
    assert(a.getAs[Long]("n_valid") == b.getAs[Long]("n_valid"))
    assert(a.getAs[Double]("total") == b.getAs[Double]("total"))
  }

  test("zone outside every tile yields no rows and decodes nothing") {
    val zones = Seq("far" -> Geom(IndexedSeq(
      (900000.0, 7000000.0), (900100.0, 7000000.0),
      (900100.0, 7000100.0), (900000.0, 7000100.0)), res.geobox.crs))
    assert(Zonal.zonalStats(spark, res.tiles, res.geobox, zones).count() == 0)
  }

  test("partials sum: zone spanning tiles equals whole-plane filter") {
    import org.apache.spark.sql.functions._
    // triangle spanning several tiles and both days
    val zones = Seq("t" -> Geom(IndexedSeq(
      (501000.0, 7999950.0), (502000.0, 7999950.0),
      (501500.0, 7999200.0)), res.geobox.crs))
    val byZonal = Zonal.zonalStats(spark, res.tiles, res.geobox, zones)
      .agg(sum("n_valid")).collect().head.getLong(0)
    // independent recomputation: explode the fused planes and apply
    // containsPoint per pixel (no tile partials, no bbox windowing)
    val g = zones.head._2
    val t = res.geobox.transform
    val decode = udf { (data: Array[Byte], dtype: String) =>
      graft.load.Fuse.decode(data, dtype) }
    import spark.implicits._
    val flat = res.tiles
      .select(col("x0"), col("y0"), col("width"), col("nodata"),
        posexplode(decode(col("data"), col("dtype"))))
      .select(col("x0"), col("y0"), col("width"), col("nodata"),
        col("pos"), col("col"))
      .as[(Int, Int, Int, Double, Int, Double)]
      .filter { case (x0, y0, w, nodata, pos, v) =>
        !(v.isNaN || v == nodata) && {
          val (cx, cy) = t(x0 + pos % w + 0.5, y0 + pos / w + 0.5)
          g.containsPoint(cx, cy)
        }
      }.count()
    assert(byZonal == flat)
  }
}
