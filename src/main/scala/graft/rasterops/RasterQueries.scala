package graft.rasterops

import graft.eo3.Eo3
import graft.geo.{BBox, Geom}
import graft.load.{Fuse, Load}
import graft.planner.Planner
import graft.raster.Fixtures
import graft.stac.{StacParse, StacSearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract entries for the raster surface (SURVEY §2 operators
  * S1-S14, P1-P8, J1-J3, A1-A8, F1-F16): each query drives the real
  * pipeline over the deterministic synthetic scene fixtures and returns a
  * hashable summary (per-tile checksums / plan facts). Not expressible in
  * DuckDB SQL -> rows-only driver checks; pixel-exactness is pinned by
  * LoadSpec/RasterSpec golden tests instead.
  */
object RasterQueries {

  private val NScenes = 4

  private def parsed(spark: SparkSession) = {
    import spark.implicits._
    val jsons = Fixtures.writeScenes(NScenes)
    val (ds, schemas) = StacParse.parseItems(spark, spark.createDataset(jsons))
    (ds.collect().toSeq.sortBy(_.id), schemas)
  }

  /** Tile-row DataFrame -> deterministic per-tile summary. */
  private def summarize(df: DataFrame): DataFrame = {
    val toDoubles = udf { (data: Array[Byte], dtype: String) =>
      val px = Fuse.decode(data, dtype)
      px.sum
    }
    df.select(col("band"), col("tIdx"), col("ty"), col("tx"),
        col("width"), col("height"), col("validCount"),
        round(toDoubles(col("data"), col("dtype")), 2).as("checksum"))
      .orderBy("band", "tIdx", "ty", "tx")
  }

  def loadMosaic(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    summarize(Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64).tiles)
  }

  def loadGroupById(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    summarize(Load.load(spark, items, schemas, bands = Seq("red"),
      groupby = "id", chunks = 64).tiles)
  }

  /** Cross-CRS warp (F15/F16): UTM scenes -> web mercator, an equal-area
    * grid (EPSG:6933, EASE-Grid 2.0 Global — the kind of CRS real
    * land/soil products publish on), and a parameter-registry row
    * (ESRI:54034, World CEA) — reference accepts any proj CRS via
    * rasterio, `_mdtools.py:63`. */
  def loadReproject(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    Seq("EPSG:3857" -> 20.0, "EPSG:6933" -> 20.0, "ESRI:54034" -> 20.0)
      .map { case (crs, res) =>
      summarize(Load.load(spark, items, schemas, bands = Seq("red"),
        groupby = "solar_day", chunks = 64,
        crs = Some(crs), resolution = Some(res)).tiles)
        .withColumn("crs", lit(crs))
    }.reduce(_ unionAll _)
      .select(col("crs"), col("band"), col("tIdx"), col("ty"), col("tx"),
        col("width"), col("height"), col("validCount"), col("checksum"))
      .orderBy("crs", "band", "tIdx", "ty", "tx")
  }

  /** Overview path (S8): 4x coarser output reads the .ovr4 level. */
  def loadOverview(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    summarize(Load.load(spark, items, schemas, bands = Seq("red"),
      groupby = "solar_day", chunks = 64, resolution = Some(40.0)).tiles)
  }

  /** F16 resampling surface: the cross-CRS warp run under every kernel
    * (nearest/bilinear/average/mode/sum/cubic/lanczos) — per-mode
    * per-tile checksums. `mode` serves categorical rasters, `sum` flux
    * totals, `cubic`/`lanczos` continuous imagery
    * (`loader/types.py:113-114`). */
  def loadResampling(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    Seq("nearest", "bilinear", "average", "mode", "sum", "cubic", "lanczos").map { m =>
      summarize(Load.load(spark, items, schemas, bands = Seq("red"),
        groupby = "solar_day", chunks = 64,
        crs = Some("EPSG:3857"), resolution = Some(30.0),
        resampling = Map("*" -> m)).tiles)
        .withColumn("mode", lit(m))
    }.reduce(_ unionAll _)
      .select(col("mode"), col("band"), col("tIdx"), col("ty"), col("tx"),
        col("validCount"), col("checksum"))
      .orderBy("mode", "band", "tIdx", "ty", "tx")
  }

  /** GeoTIFF end-to-end (S7 on real TIFF containers): the same mosaic
    * workload as `raster_load_mosaic` but reading tiled GeoTIFFs with
    * overview subimages through TiffReader — per-tile checksums must
    * equal the GRB container's (pinned by LoadSpec parity too). */
  def loadTiff(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val jsons = Fixtures.writeScenesTiff(NScenes)
    val (ds, schemas) = StacParse.parseItems(spark, spark.createDataset(jsons))
    val items = ds.collect().toSeq.sortBy(_.id)
    val single = summarize(
      Load.load(spark, items, schemas, bands = Seq("red", "nir"),
        groupby = "solar_day", chunks = 64).tiles)
      .withColumn("layout", lit("per_band_files"))
    // packed multi-band asset: red/green/nir are planes 1..3 of ONE tif,
    // exercising RasterSource.band addressing end-to-end (S7 multi-band)
    val mJsons = Fixtures.writeScenesMultiband(NScenes)
    val (mDs, mSchemas) = StacParse.parseItems(spark, spark.createDataset(mJsons))
    val mItems = mDs.collect().toSeq.sortBy(_.id)
    val packed = summarize(
      Load.load(spark, mItems, mSchemas, bands = Seq("red", "green", "nir"),
        groupby = "solar_day", chunks = 64).tiles)
      .withColumn("layout", lit("packed_bands"))
    // multi-image container: red/nir are NAMED subdatasets of ONE tif,
    // addressed via RasterSource.subdataset (S7 subdataset addressing);
    // checksums must equal the per-band-files layout's
    val sJsons = Fixtures.writeScenesSubdatasets(NScenes)
    val (sDs, sSchemas) = StacParse.parseItems(spark, spark.createDataset(sJsons))
    val sItems = sDs.collect().toSeq.sortBy(_.id)
    val subds = summarize(
      Load.load(spark, sItems, sSchemas, bands = Seq("red", "nir"),
        groupby = "solar_day", chunks = 64).tiles)
      .withColumn("layout", lit("subdatasets"))
    single.unionAll(packed).unionAll(subds)
      .select(col("layout"), col("band"), col("tIdx"), col("ty"), col("tx"),
        col("width"), col("height"), col("validCount"), col("checksum"))
      .orderBy("layout", "band", "tIdx", "ty", "tx")
  }

  /** Zarr store end-to-end (S7 on the chunked-directory container;
    * variables = subdatasets): the same mosaic workload as
    * `raster_load_mosaic` reading `store.zarr#var` sources through
    * ZarrReader — per-tile checksums must equal the GRB container's
    * (pinned by LoadSpec parity too), plus the overview path reading the
    * `red.ovr2` sidecar variable at 4x output resolution. */
  def loadZarr(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val jsons = Fixtures.writeScenesZarr(NScenes)
    val (ds, schemas) = StacParse.parseItems(spark, spark.createDataset(jsons))
    val items = ds.collect().toSeq.sortBy(_.id)
    val full = summarize(
      Load.load(spark, items, schemas, bands = Seq("red", "nir"),
        groupby = "solar_day", chunks = 64).tiles)
      .withColumn("res", lit("base"))
    val ovr = summarize(
      Load.load(spark, items, schemas, bands = Seq("red"),
        groupby = "solar_day", chunks = 64, resolution = Some(40.0)).tiles)
      .withColumn("res", lit("ovr"))
    full.unionAll(ovr)
      .select(col("res"), col("band"), col("tIdx"), col("ty"), col("tx"),
        col("width"), col("height"), col("validCount"), col("checksum"))
      .orderBy("res", "band", "tIdx", "ty", "tx")
  }

  /** netCDF classic container end-to-end (S7 on the legacy multi-variable
    * container; variables = subdatasets): the same mosaic workload as
    * `raster_load_mosaic` reading `file.nc#var` sources through
    * NetCdfReader — per-tile checksums must equal the GRB container's
    * (pinned by LoadSpec parity too). */
  def loadNetcdf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val jsons = Fixtures.writeScenesNc(NScenes)
    val (ds, schemas) = StacParse.parseItems(spark, spark.createDataset(jsons))
    val items = ds.collect().toSeq.sortBy(_.id)
    summarize(
      Load.load(spark, items, schemas, bands = Seq("red", "nir"),
        groupby = "solar_day", chunks = 64).tiles)
      .select(col("band"), col("tIdx"), col("ty"), col("tx"),
        col("width"), col("height"), col("validCount"), col("checksum"))
      .orderBy("band", "tIdx", "ty", "tx")
  }

  /** Shared path for the parse anchor (see [[parseItemsDuckSql]]). */
  private val ParseItemsPath =
    s"${sys.props("java.io.tmpdir")}/graft_parse_items_parquet"

  /** S1 parse summary — cross-engine anchored: the RAW item JSON lands
    * as parquet and DuckDB re-derives every output column from the raw
    * bytes with its own JSON parser (id/collection extraction, the
    * image/&data asset classification behind n_bands, geometry
    * presence, the sorted band list, the ISO datetime, and the F1
    * solar-date truncate-toward-zero lon/15 offset). A parse bug that
    * drops an asset, shifts the datetime, or mis-truncates the solar
    * offset breaks the hash. */
  def parseItems(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Fixtures.writeScenes(NScenes).toDF("json")
      .coalesce(1).write.mode("overwrite").parquet(ParseItemsPath)
    val (items, schemas) = parsed(spark)
    val md = schemas(Fixtures.CollectionId)
    items.map { i =>
      (i.id, i.collection, i.bands.size,
        i.nominalDatetime.toInstant.toString,
        i.geometry.isDefined,
        md.allBands.mkString(","),
        i.solarDate(Some(27.0)).toString)
    }.toDF("id", "collection", "n_bands", "datetime", "has_geom",
      "bands", "solar_date").orderBy("id")
  }

  private val parseItemsDuckSql: String =
    s"""WITH raw AS (
       |  SELECT json FROM read_parquet('$ParseItemsPath/*.parquet')),
       |a AS (
       |  SELECT json, unnest(json_keys(json, '$$.assets')) AS ak FROM raw),
       |cnt AS (
       |  SELECT json_extract_string(json, '$$.id') AS id,
       |         CAST(COUNT(*) FILTER (WHERE
       |           json_extract_string(json, '$$.assets.' || ak || '.type')
       |             LIKE 'image/%'
       |           AND list_contains(CAST(json_extract(json,
       |             '$$.assets.' || ak || '.roles') AS VARCHAR[]), 'data'))
       |           AS INT) AS n_bands
       |  FROM a GROUP BY 1),
       |j AS (
       |  SELECT json_extract_string(json, '$$.id') AS id,
       |         json_extract_string(json, '$$.collection') AS collection,
       |         json_extract_string(json, '$$.properties.datetime') AS datetime,
       |         json_extract(json, '$$.geometry') IS NOT NULL AS has_geom,
       |         list_aggregate(list_sort(json_keys(json, '$$.assets')),
       |           'string_agg', ',') AS bands,
       |         CAST(CAST(strptime(
       |             json_extract_string(json, '$$.properties.datetime'),
       |             '%Y-%m-%dT%H:%M:%SZ')
       |           + to_hours(CAST(trunc(27.0 / 15) AS BIGINT)) AS DATE)
       |           AS VARCHAR) AS solar_date
       |  FROM raw)
       |SELECT j.id, j.collection, cnt.n_bands, j.datetime, j.has_geom,
       |       j.bands, j.solar_date
       |FROM j JOIN cnt ON cnt.id = j.id
       |ORDER BY j.id""".stripMargin

  /** In-process STAC API stub serving `items` in pages — the sandbox
    * stand-in for a live endpoint (zero egress). `POST /search` returns
    * page k (continuation body `{"page": k}`) with a rel=next POST link
    * while pages remain — the POST-pagination form of the STAC API
    * spec. Records request bodies so the spec can assert what the
    * client actually sent. */
  private[graft] def withStacApi[T](items: Seq[String], pageSize: Int)
      (f: String => T): (T, Seq[String]) = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val bodies = scala.collection.mutable.ArrayBuffer.empty[String]
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    server.createContext("/search",
      (exchange: com.sun.net.httpserver.HttpExchange) => {
        val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
        bodies.synchronized { bodies += body }
        val node = mapper.readTree(if (body.isEmpty) "{}" else body)
        val page = Option(node.get("page")).map(_.asInt).getOrElse(0)
        val start = page * pageSize
        val slice = items.slice(start, start + pageSize)
        val port = server.getAddress.getPort
        val sb = new StringBuilder("""{"type":"FeatureCollection","features":[""")
        sb.append(slice.mkString(","))
        sb.append("]")
        if (start + pageSize < items.size)
          // token-only continuation body with merge:true — the client
          // must deep-merge it over the original request or page 2+
          // silently loses collections/bbox/datetime/limit
          sb.append(s""","links":[{"rel":"next","method":"POST",""" +
            s""""href":"http://127.0.0.1:$port/search",""" +
            s""""merge":true,"body":{"page":${page + 1}}}]""")
        sb.append("}")
        val bytes = sb.toString.getBytes("UTF-8")
        exchange.getResponseHeaders.set("Content-Type", "application/geo+json")
        exchange.sendResponseHeaders(200, bytes.length)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      })
    server.start()
    try (f(s"http://127.0.0.1:${server.getAddress.getPort}"), bodies.toSeq)
    finally server.stop(0)
  }

  /** S16 end-to-end: paginated STAC API search → GeoJSON snapshot dump →
    * snapshot re-read → the normal parse path. The API is the in-process
    * stub above (protocol-faithful POST pagination); on a cluster the
    * same client hits a live endpoint. Summary row per item + the dump's
    * item count, so a pagination bug (dropped/duplicated page) is a row
    * diff, not a silent skew. */
  def stacSearchDump(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val jsons = graft.raster.Fixtures.writeScenes(6).map(_.replaceAll("\n", " "))
    val out = java.nio.file.Files.createTempFile("graft_stac_dump", ".geojson")
    val (n, _) = withStacApi(jsons, pageSize = 2) { endpoint =>
      StacSearch.dump(endpoint, StacSearch.SearchParams(
        collections = Seq(Fixtures.CollectionId), limit = 2), out)
    }
    val items = StacSearch.readDump(out)
    // land the dumped snapshot's raw item JSON so DuckDB re-derives the
    // summary from the dump itself (see [[stacSearchDuckSql]])
    items.toDF("json")
      .coalesce(1).write.mode("overwrite").parquet(StacSearchPath)
    val (ds, _) = StacParse.parseItems(spark, spark.createDataset(items))
    ds.map(i => (i.id, i.collection, i.bands.size))
      .toDF("id", "collection", "n_bands")
      .withColumn("n_dumped", lit(n.toLong))
      .orderBy("id")
  }

  /** Shared path for the search-dump anchor. */
  private val StacSearchPath =
    s"${sys.props("java.io.tmpdir")}/graft_stac_search_parquet"

  /** The dumped snapshot re-read by ANOTHER engine: DuckDB parses the
    * landed raw feature JSON and re-derives the per-item summary plus
    * the dump count — a dump that drops, duplicates, or mangles items
    * across the paginated fetch breaks the hash (the HTTP protocol
    * itself is pinned by StacSearchSpec against the in-process
    * server). */
  private val stacSearchDuckSql: String =
    s"""WITH raw AS (
       |  SELECT json FROM read_parquet('$StacSearchPath/*.parquet')),
       |a AS (
       |  SELECT json, unnest(json_keys(json, '$$.assets')) AS ak FROM raw),
       |cnt AS (
       |  SELECT json_extract_string(json, '$$.id') AS id,
       |         json_extract_string(json, '$$.collection') AS collection,
       |         CAST(COUNT(*) FILTER (WHERE
       |           json_extract_string(json, '$$.assets.' || ak || '.type')
       |             LIKE 'image/%'
       |           AND list_contains(CAST(json_extract(json,
       |             '$$.assets.' || ak || '.roles') AS VARCHAR[]), 'data'))
       |           AS INT) AS n_bands
       |  FROM a GROUP BY 1, 2),
       |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dumped FROM raw)
       |SELECT id, collection, n_bands, n_dumped
       |FROM cnt CROSS JOIN t ORDER BY id""".stripMargin

  /** Landed inputs for the output-geobox oracle replay. */
  private val GeoboxPlanPath =
    s"${sys.props("java.io.tmpdir")}/graft_geobox_plan_parquet"

  /** Output-geobox planning table across parameter shapes (A4/A5/P8),
    * DuckDB-replayed end to end: the per-item grid keys (for the
    * identical fast path and the majority election), the footprint /
    * ROI bboxes ALREADY in each case's target CRS (the CRS transform
    * itself is hash-checked by `raster_reproject_cells`; here the
    * election + bbox-union + anchor-snap arithmetic is what's on
    * trial), and the case parameters all land as parquet, and the
    * oracle re-runs the whole decision procedure: all-identical fast
    * path, mode election with the (count desc, key-string desc)
    * tie-break, the ≤10% anchor-ignoring retry, min/max bbox union,
    * and the floor/ceil anchor-lattice snap of `GeoBox.fromBBoxXY`.
    * Three synthetic election cases (`elect_majority`, `elect_tie`,
    * `elect_retry`) exercise the A4 paths the identical-grid fixture
    * items cannot. */
  def outputGeoboxPlans(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import graft.geo.{Affine, Crs, GeoBox}
    val (items, schemas) = parsed(spark)

    // ---- landed replay inputs ----------------------------------------
    def gridRow(cse: String, idx: Int, g: GeoBox) = {
      val a = g.anchor()
      (cse, "grid", idx, g.crs.code, g.resX, g.resY, a.x, a.y,
        g.width, g.height, g.transform.c, g.transform.f,
        0.0, 0.0, 0.0, 0.0,
        (g.crs.code, (g.resX, g.resY), a).toString,
        (g.crs.code, (g.resX, g.resY)).toString)
    }
    def paramRow(cse: String, crs: Crs, rx: Double, ry: Double) =
      (cse, "param", 0, crs.code, rx, ry, 0.0, 0.0, 0, 0, 0.0, 0.0,
        0.0, 0.0, 0.0, 0.0, "", "")
    def extRow(cse: String, idx: Int, b: BBox) =
      (cse, "ext", idx, "", 0.0, 0.0, 0.0, 0.0, 0, 0, 0.0, 0.0,
        b.x0, b.y0, b.x1, b.y1, "", "")
    def itemExts(cse: String, its: Seq[graft.model.ParsedItem], crs: Crs) =
      its.flatMap(i => i.safeGeometry(Some(crs), schemas(i.collection))
        .map(_.bbox)).zipWithIndex.map { case (b, i) => extRow(cse, i, b) }

    val itemGboxes = items.flatMap(i =>
      i.geoboxes(Nil, schemas(i.collection)).headOption)
    val crs3857 = Crs.parse("EPSG:3857")
    val crs32735 = Crs.parse("EPSG:32735")
    // "utm" auto-resolution: same reference geometry the planner uses
    val utmCrs = {
      val ref = items.head.geometry.map(_.toGeom).get
      val (cx, cy) = ref.toCrs(Crs.LonLat).centroid
      Crs.utmFor(cx, cy)
    }
    val roiBBox = graft.geo.Geom.box(
      BBox(26.9, -18.2, 27.1, -18.0), Crs.LonLat).toCrs(crs32735).bbox
    val roiPoly = graft.geo.Geom(IndexedSeq(
      (26.9, -18.2), (27.1, -18.2), (27.0, -18.0)), Crs.LonLat)

    // synthetic grid lists for the election paths
    def sgb(code: String, ox: Double, oy: Double, rx: Double, ry: Double) =
      GeoBox(100, 100, Affine.grid(ox, oy, rx, ry), Crs.parse(code))
    val electMajority = Seq.fill(3)(
      sgb("EPSG:32735", 500000, 8000000, 10, -10)) ++ Seq(
      sgb("EPSG:3857", 0, 0, 100, -100),
      sgb("EPSG:32736", 600000, 8100000, 20, -20))
    val electTie = Seq(
      sgb("EPSG:32735", 500000, 8000000, 10, -10),
      sgb("EPSG:32735", 500000, 8000000, 10, -10),
      sgb("EPSG:32736", 600000, 8100000, 10, -10),
      sgb("EPSG:32736", 600000, 8100000, 10, -10),
      sgb("EPSG:3857", 0, 0, 100, -100))
    // 20 distinct (crs,res,anchor) keys -> stage-1 share 1/20 <= 10%,
    // so the anchor-ignoring retry elects the 12-strong (crs,res)
    val electRetry =
      (0 until 12).map(i => sgb("EPSG:32735", 500000 + 0.7 * i, 8000000, 10, -10)) ++
        (0 until 8).map(j => sgb("EPSG:3857", 7.0 * j, 0, 100, -100))

    // the auto case's union happens in its ELECTED crs; landing the
    // footprints there reuses the planner's own election (the election
    // itself is re-derived by the oracle from the landed grid keys)
    val electedCrs = Planner.mostCommonGbox(itemGboxes)._1
    val landed =
      itemGboxes.zipWithIndex.map { case (g, i) => gridRow("auto", i, g) } ++
        itemExts("auto", items, electedCrs) ++
        itemGboxes.take(1).map(gridRow("single_item", 0, _)) ++
        Seq(paramRow("crs_res", crs3857, 100.0, -100.0)) ++
        itemExts("crs_res", items, crs3857) ++
        Seq(paramRow("bbox", crs32735, 10.0, -10.0),
          extRow("bbox", 0, roiBBox),
          paramRow("utm_auto", utmCrs, 10.0, -10.0)) ++
        itemExts("utm_auto", items, utmCrs) ++
        Seq(paramRow("geopolygon", crs32735, 10.0, -10.0),
          extRow("geopolygon", 0, roiPoly.toCrs(crs32735).bbox)) ++
        electMajority.zipWithIndex.map { case (g, i) => gridRow("elect_majority", i, g) } ++
        electTie.zipWithIndex.map { case (g, i) => gridRow("elect_tie", i, g) } ++
        electRetry.zipWithIndex.map { case (g, i) => gridRow("elect_retry", i, g) }
    landed.toDF("case", "kind", "idx", "crs", "rx", "ry", "ax", "ay",
      "gw", "gh", "gox", "goy", "bx0", "by0", "bx1", "by1", "key", "key2")
      .coalesce(1).write.mode("overwrite").parquet(GeoboxPlanPath)

    // ---- the planner's own answers -----------------------------------
    def plan(name: String)(g: Option[GeoBox]) = g match {
      case Some(gb) =>
        val a = gb.anchor()
        (name, gb.crs.code, gb.width, gb.height,
          gb.transform.c, gb.transform.f, gb.gsd, gb.resX, gb.resY, a.x, a.y)
      case None => (name, "none", 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    }
    def elect(name: String)(r: (Crs, (Double, Double), graft.geo.Anchor, Option[GeoBox])) =
      (name, r._1.code, 0, 0, 0.0, 0.0, 0.0, r._2._1, r._2._2, r._3.x, r._3.y)
    Seq(
      plan("auto")(Planner.outputGeobox(items, schemas)),
      plan("single_item")(Planner.outputGeobox(items.take(1), schemas)),
      plan("crs_res")(Planner.outputGeobox(items, schemas,
        crs = Some("EPSG:3857"), resolution = Some(100.0))),
      plan("bbox")(Planner.outputGeobox(items, schemas,
        crs = Some("EPSG:32735"), resolution = Some(10.0),
        bbox = Some(BBox(26.9, -18.2, 27.1, -18.0)))),
      plan("utm_auto")(Planner.outputGeobox(items, schemas,
        crs = Some("utm"), resolution = Some(10.0))),
      plan("geopolygon")(Planner.outputGeobox(items, schemas,
        crs = Some("EPSG:32735"), resolution = Some(10.0),
        geopolygon = Some(roiPoly))),
      elect("elect_majority")(Planner.mostCommonGbox(electMajority)),
      elect("elect_tie")(Planner.mostCommonGbox(electTie)),
      elect("elect_retry")(Planner.mostCommonGbox(electRetry))
    ).toDF("case", "crs", "width", "height", "x0", "y0", "gsd",
      "resx", "resy", "ax", "ay")
      .orderBy("case")
  }

  /** DuckDB replay of the whole geobox decision procedure from the
    * landed inputs: identical fast path, A4 election (mode, string
    * tie-break, ≤10% retry without anchor), A5 bbox union, and the
    * `fromBBoxXY` anchor-lattice snap. */
  private val outputGeoboxDuckSql: String =
    s"""WITH L AS (SELECT * FROM read_parquet('$GeoboxPlanPath/*.parquet')),
       |ident AS (
       |  SELECT "case" FROM L WHERE kind = 'grid' GROUP BY "case"
       |  HAVING COUNT(DISTINCT (crs, rx, ry, ax, ay, gw, gh, gox, goy)) = 1
       |     AND "case" NOT LIKE 'elect_%'),
       |fast AS (
       |  SELECT "case", MAX(crs) AS crs, MAX(gw) AS width, MAX(gh) AS height,
       |         MAX(gox) AS x0, MAX(goy) AS y0,
       |         LEAST(ABS(MAX(rx)), ABS(MAX(ry))) AS gsd,
       |         MAX(rx) AS resx, MAX(ry) AS resy,
       |         MAX(ax) AS ax, MAX(ay) AS ay
       |  FROM L WHERE kind = 'grid' AND "case" IN (SELECT "case" FROM ident)
       |  GROUP BY "case"),
       |g AS (SELECT "case", crs, rx, ry, ax, ay, key, key2
       |      FROM L WHERE kind = 'grid'
       |        AND "case" NOT IN (SELECT "case" FROM ident)),
       |tot AS (SELECT "case", COUNT(*) AS n FROM g GROUP BY 1),
       |k1 AS (SELECT "case", key, COUNT(*) AS c FROM g GROUP BY 1, 2),
       |w1 AS (SELECT "case", key, c FROM k1
       |       QUALIFY ROW_NUMBER() OVER (PARTITION BY "case"
       |                                  ORDER BY c DESC, key DESC) = 1),
       |s1 AS (
       |  SELECT w1."case", MAX(g.crs) AS crs, MAX(g.rx) AS resx,
       |         MAX(g.ry) AS resy, MAX(g.ax) AS ax, MAX(g.ay) AS ay
       |  FROM w1 JOIN tot ON w1."case" = tot."case"
       |       JOIN g ON g."case" = w1."case" AND g.key = w1.key
       |  WHERE CAST(w1.c AS DOUBLE) / tot.n > 0.1
       |  GROUP BY w1."case"),
       |k2 AS (
       |  SELECT "case", key2, COUNT(*) AS c FROM g
       |  WHERE "case" NOT IN (SELECT "case" FROM s1) GROUP BY 1, 2),
       |w2 AS (SELECT "case", key2 FROM k2
       |       QUALIFY ROW_NUMBER() OVER (PARTITION BY "case"
       |                                  ORDER BY c DESC, key2 DESC) = 1),
       |s2 AS (
       |  SELECT w2."case", MAX(g.crs) AS crs, MAX(g.rx) AS resx,
       |         MAX(g.ry) AS resy, 0.0 AS ax, 0.0 AS ay
       |  FROM w2 JOIN g ON g."case" = w2."case" AND g.key2 = w2.key2
       |  GROUP BY w2."case"),
       |elected AS (
       |  SELECT "case", crs, resx, resy, ax, ay FROM s1
       |  UNION ALL SELECT "case", crs, resx, resy, ax, ay FROM s2),
       |withext AS (SELECT DISTINCT "case" FROM L WHERE kind = 'ext'),
       |p AS (SELECT "case", crs, rx, ry, ax, ay,
       |             ABS(rx) AS arx, ABS(ry) AS ary
       |      FROM L WHERE kind = 'param'
       |      UNION ALL
       |      SELECT "case", crs, resx, resy, ax, ay,
       |             ABS(resx), ABS(resy)
       |      FROM elected WHERE "case" IN (SELECT "case" FROM withext)),
       |u AS (SELECT "case", MIN(bx0) AS bx0, MIN(by0) AS by0,
       |             MAX(bx1) AS bx1, MAX(by1) AS by1
       |      FROM L WHERE kind = 'ext' GROUP BY "case"),
       |sn AS (
       |  SELECT p."case", p.crs, p.arx, p.ary, p.rx, p.ry, p.ax, p.ay,
       |         u.bx1, u.by0,
       |         (FLOOR(u.bx0 / p.arx - p.ax) + p.ax) * p.arx AS ox,
       |         (CEIL(u.by1 / p.ary + p.ay) - p.ay) * p.ary AS oy
       |  FROM p JOIN u ON p."case" = u."case"),
       |snap AS (
       |  SELECT "case", crs,
       |         CAST(GREATEST(1, CEIL((bx1 - ox) / arx)) AS INT) AS width,
       |         CAST(GREATEST(1, CEIL((oy - by0) / ary)) AS INT) AS height,
       |         ox AS x0, oy AS y0, LEAST(arx, ary) AS gsd,
       |         rx AS resx, ry AS resy, ax, ay
       |  FROM sn),
       |el AS (
       |  SELECT "case", crs, 0 AS width, 0 AS height, 0.0 AS x0, 0.0 AS y0,
       |         0.0 AS gsd, resx, resy, ax, ay FROM elected
       |  WHERE "case" NOT IN (SELECT "case" FROM withext))
       |SELECT * FROM fast UNION ALL SELECT * FROM snap
       |UNION ALL SELECT * FROM el
       |ORDER BY "case"""".stripMargin

  /** J1 spatial binning summary: items per (t, ty, tx) bin. */
  def tyxBins(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (items, schemas) = parsed(spark)
    val outGbox = Planner.outputGeobox(items, schemas).get
    val gbt = graft.geo.GeoBoxTiles(outGbox, 64, 64)
    val groups = Planner.groupItems(items, Planner.BySolarDay(Some(27.0)))
    val rows = for {
      (group, tIdx) <- groups.zipWithIndex
      itemIdx <- group
      fp <- items(itemIdx).safeGeometry(Some(outGbox.crs),
        schemas(items(itemIdx).collection)).toSeq
      (ty, tx) <- gbt.tilesIntersecting(fp)
    } yield (tIdx, ty, tx, itemIdx)
    rows.toDF("tIdx", "ty", "tx", "itemIdx")
      .groupBy("tIdx", "ty", "tx")
      .agg(count(lit(1)).as("n_items"),
        sort_array(collect_list(col("itemIdx"))).as("items"))
      .select(col("tIdx"), col("ty"), col("tx"), col("n_items"),
        concat_ws(",", col("items")).as("item_list"))
      .orderBy("tIdx", "ty", "tx")
  }

  /** Landed raw item JSON for the EO3 oracle replay. */
  private val Eo3ExportPath =
    s"${sys.props("java.io.tmpdir")}/graft_eo3_export_parquet"

  /** S13 STAC→EO3 conversion, cross-engine anchored: the raw item JSON
    * lands as parquet and every emitted column is extracted by
    * RE-PARSING the generated EO3 document (so the serialized doc is
    * what's summarized, not the in-memory objects), while DuckDB
    * re-derives the same fields from the raw STAC JSON — grid
    * shape/transform projection, measurement paths, and the
    * STAC→EO3 property renames. The uuid5 dataset id is the one field
    * DuckDB cannot re-derive (no SHA-1 there); it stays pinned by
    * `Eo3Spec` against RFC 4122 known values. */
  def eo3Export(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Fixtures.writeScenes(NScenes).toDF("json")
      .coalesce(1).write.mode("overwrite").parquet(Eo3ExportPath)
    val (items, schemas) = parsed(spark)
    val ds = spark.createDataset(items)
    Eo3.stac2ds(spark, ds, schemas).as[(String, String)]
      .map { case (id, doc) =>
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        val n = m.readTree(doc)
        def fields(o: com.fasterxml.jackson.databind.JsonNode): Seq[String] = {
          val it = o.fieldNames()
          val b = Seq.newBuilder[String]
          while (it.hasNext) b += it.next()
          b.result()
        }
        val grids = fields(n.get("grids")).sorted.map { gn =>
          val g = n.get("grids").get(gn)
          val shape = g.get("shape")
          val t = g.get("transform")
          val ts = (0 until t.size()).map(t.get(_).asText()).mkString(",")
          s"$gn:${shape.get(0).asInt()}x${shape.get(1).asInt()}:$ts"
        }.mkString(";")
        val meas = fields(n.get("measurements")).sorted.map { mn =>
          val mm = n.get("measurements").get(mn)
          val band = Option(mm.get("band")).map(b => s":band=${b.asInt()}")
            .getOrElse("")
          val grid = Option(mm.get("grid")).map(g => s":grid=${g.asText()}")
            .getOrElse("")
          s"$mn=${mm.get("path").asText()}$band$grid"
        }.mkString(";")
        val props = fields(n.get("properties")).sorted.mkString(",")
        (id, n.get("crs").asText(), grids, meas, props)
      }
      .toDF("item_id", "crs", "grids", "measurements", "props")
      .orderBy("item_id")
  }

  /** DSv2 GRB table (SURVEY §4 "COG table"): SQL over raw pixels with an
    * ROI predicate pushed into the windowed scan. */
  def grbSourceSql(spark: SparkSession): DataFrame = {
    Fixtures.writeScenes(NScenes)
    // pin to the NScenes contract scenes: the fixture dir is shared with
    // specs that write more, and a deterministic row set is what lets
    // the DuckDB oracle re-derive this from the landed native planes
    spark.read.format("grb").load(Fixtures.dir.toString)
      .where(col("uri").rlike("/scene[0-3]-(red|nir)\\.grb$"))
      .where(col("x") < 48 && col("y") >= 8 && col("value") =!= 0)
      .groupBy("uri")
      .agg(count(lit(1)).as("n_valid"),
        round(avg(col("value")), 2).as("mean"),
        round(sum(col("value")), 2).as("total"))
      .withColumn("uri", regexp_extract(col("uri"), "([^/]+)$", 1))
      .orderBy("uri")
  }

  /** GeoTIFF DSv2 sibling of grbSourceSql: SQL over the packed 3-band
    * MSI scenes with a band predicate — plan-time band pruning means the
    * non-addressed planes of the stack are never decoded. */
  def gtiffSourceSql(spark: SparkSession): DataFrame = {
    Fixtures.writeScenesMultiband(NScenes)
    spark.read.format("gtiff").load(Fixtures.dir.toString)
      .where(col("uri").rlike("/scene[0-3]-msi\\.tif$") && col("band") === 2 &&
        col("x") < 48 && col("y") >= 8 && col("value") =!= 0)
      .groupBy("uri", "band")
      .agg(count(lit(1)).as("n_valid"),
        round(avg(col("value")), 2).as("mean"),
        round(sum(col("value")), 2).as("total"))
      .withColumn("uri", regexp_extract(col("uri"), "([^/]+)$", 1))
      .orderBy("uri")
  }

  /** Unified `raster` DSv2 table over a MIXED container directory (GRB +
    * tiled GeoTIFF + zarr store + netCDF of the same scenes): per-format
    * per-band totals over an ROI must agree format-to-format — one SQL
    * surface, four container encodings, same pixels. */
  def anySourceSql(spark: SparkSession): DataFrame = {
    val mix = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_mix_src").toString
    new java.io.File(mix).mkdirs()
    // one scene, all four container faces, written once (idempotent)
    val g = Fixtures.sceneGeobox(0)
    val red = Fixtures.scenePixels(0)
    val nir = red.map(v => if (v != 0.0) v + 5000 else v)
    if (!new java.io.File(s"$mix/scene0.nc").exists()) {
      graft.raster.Grb.writeWithOverviews(s"$mix/scene0-red.grb", red, g,
        "uint16", Some(0.0))
      graft.raster.Tiff.write(s"$mix/scene0-red.tif", red, g,
        "uint16", Some(0.0), tileSize = Some(64))
      graft.raster.Zarr.write(s"$mix/scene0.zarr", "red", red, g,
        "uint16", Some(0.0))
      graft.raster.Zarr.write(s"$mix/scene0.zarr", "nir", nir, g,
        "uint16", Some(0.0), zlib = true)
      graft.raster.NetCdf.write(s"$mix/scene0.nc",
        Seq("red" -> red, "nir" -> nir), g, "int16", Some(0.0))
    }
    spark.read.format("raster").load(mix)
      .where(col("x") < 96 && col("y") >= 8 && col("value") =!= 0)
      .groupBy("uri")
      .agg(count(lit(1)).as("n_valid"),
        round(avg(col("value")), 2).as("mean"),
        round(sum(col("value")), 2).as("total"))
      .withColumn("uri", regexp_extract(col("uri"), "([^/]+)$", 1))
      .orderBy("uri")
  }

  /** S10 sink analog at scale: the fused cube exported as per-tile
    * georeferenced COGs (executor-side, zero-shuffle, no driver
    * assembly), then read BACK through the gtiff DSv2 table — the full
    * write-then-SQL raster lifecycle. */
  def cogExport(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    val out = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_cog_export").toString
    res.exportCogTiles(out)
    spark.read.format("gtiff").load(out)
      .where(col("value") =!= coalesce(col("nodata"), lit(Double.NaN)))
      .withColumn("band", regexp_extract(col("uri"), "([a-z]+)_t\\d", 1))
      .groupBy("band")
      .agg(countDistinct(col("uri")).as("n_tiles"),
        count(lit(1)).as("n_valid"),
        round(sum(col("value")), 2).as("total"))
      .orderBy("band")
  }

  /** S10 sink, zarr face: distributed chunk export of the loaded cube
    * (driver writes only store metadata; every chunk file is written by
    * the task holding that tile), then a distributed read-back through
    * the Zarr module — per-variable valid counts and totals must match
    * the COG export's per-band totals (same cube, different container). */
  def zarrExport(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    val store = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_zarr_export.zarr").toString
    res.exportZarr(store, chunk = 64)
    val vars = graft.raster.Zarr.variables(store)
    spark.createDataset(vars).repartition(vars.size).map { v =>
      val hdr = graft.raster.Zarr.readHeader(s"$store#$v")
      val px = graft.raster.Zarr.readWindow(s"$store#$v",
        0, 0, hdr.width, hdr.height)
      val nd = hdr.nodata.getOrElse(Double.NaN)
      var valid = 0L; var total = 0.0
      var i = 0
      while (i < px.length) {
        val x = px(i)
        if (!x.isNaN && x != nd) { valid += 1; total += x }
        i += 1
      }
      val nChunks = Option(new java.io.File(s"$store/$v").listFiles())
        .getOrElse(Array.empty[java.io.File])
        .count(f => f.getName.matches("\\d+\\.\\d+"))
      (v, nChunks, valid, math.rint(total * 100) / 100)
    }.toDF("variable", "n_chunks", "n_valid", "total").orderBy("variable")
  }

  /** S14 product inference, cross-engine anchored like [[eo3Export]]:
    * the summary columns are extracted by re-parsing the generated
    * product doc, and DuckDB re-derives them from the landed raw item
    * JSON (name dash→underscore rule, per-band dtype/nodata/units from
    * the raster extension). */
  def eo3Product(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Fixtures.writeScenes(NScenes).toDF("json")
      .coalesce(1).write.mode("overwrite").parquet(Eo3ExportPath)
    val (_, schemas) = parsed(spark)
    schemas.toSeq.sortBy(_._1).map { case (cid, md) =>
      val doc = Eo3.toProductDoc(md)
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = m.readTree(doc)
      val ms = n.get("measurements")
      val meas = (0 until ms.size()).map { i =>
        val b = ms.get(i)
        val nodata = Option(b.get("nodata")).map(_.asText()).getOrElse("")
        s"${b.get("name").asText()}:${b.get("dtype").asText()}:" +
          s"$nodata:${b.get("units").asText()}"
      }.sorted.mkString(";")
      (cid, n.get("name").asText(),
        n.get("metadata").get("product").get("name").asText(),
        ms.size(), meas)
    }.toDF("collection", "name", "meta_name", "n_measurements", "measurements")
      .orderBy("collection")
  }

  /** DuckDB replay of the EO3 dataset-doc summary from the raw STAC
    * JSON: grid projection fields, measurement paths, CRS from
    * proj:epsg, and the STAC→EO3 property renames (generated from
    * [[Eo3.StacToEo3Renames]] so the two engines share one table). */
  private def eo3RenameCase: String =
    "CASE k " + Eo3.StacToEo3Renames.toSeq.sortBy(_._1)
      .map { case (f, t) => s"WHEN '$f' THEN '$t'" }
      .mkString(" ") + " ELSE k END"

  private def eo3ExportDuckSql: String =
    s"""WITH raw AS (SELECT json FROM read_parquet('$Eo3ExportPath/*.parquet')),
       |i AS (SELECT json, json_extract_string(json, '$$.id') AS item_id
       |      FROM raw),
       |a AS (SELECT item_id, json, unnest(json_keys(json, '$$.assets')) AS ak
       |      FROM i),
       |m AS (
       |  SELECT item_id,
       |         string_agg(ak || '=' ||
       |           json_extract_string(json, '$$.assets.' || ak || '.href'),
       |           ';' ORDER BY ak) AS measurements,
       |         COUNT(DISTINCT CAST(json_extract(json,
       |           '$$.assets.' || ak || '."proj:transform"') AS VARCHAR))
       |           AS nproj
       |  FROM a GROUP BY item_id),
       |g AS (
       |  SELECT item_id,
       |         'default:' ||
       |         CAST(json_extract(json, '$$.assets.red."proj:shape"[0]') AS INT)
       |         || 'x' ||
       |         CAST(json_extract(json, '$$.assets.red."proj:shape"[1]') AS INT)
       |         || ':' ||
       |         array_to_string(list_transform(
       |           CAST(json_extract(json, '$$.assets.red."proj:transform"')
       |             AS DOUBLE[]),
       |           x -> CAST(x AS VARCHAR)), ',') AS grids,
       |         'EPSG:' ||
       |           json_extract_string(json, '$$.properties."proj:epsg"') AS crs
       |  FROM i),
       |p AS (
       |  SELECT item_id, string_agg(rk, ',' ORDER BY rk) AS props
       |  FROM (SELECT item_id, $eo3RenameCase AS rk
       |        FROM (SELECT item_id,
       |                unnest(json_keys(json, '$$.properties')) AS k FROM i))
       |  GROUP BY item_id)
       |SELECT i.item_id, g.crs, g.grids, m.measurements, p.props
       |FROM i JOIN g USING (item_id) JOIN m USING (item_id)
       |     JOIN p USING (item_id)
       |WHERE m.nproj = 1
       |ORDER BY item_id""".stripMargin

  /** DuckDB replay of the product-doc summary: one row per collection,
    * measurements re-derived from the raster-extension band metadata. */
  private def eo3ProductDuckSql: String =
    s"""WITH raw AS (SELECT json FROM read_parquet('$Eo3ExportPath/*.parquet')),
       |i AS (SELECT json,
       |        json_extract_string(json, '$$.collection') AS collection
       |      FROM raw),
       |a AS (SELECT collection, json,
       |        unnest(json_keys(json, '$$.assets')) AS ak FROM i),
       |b AS (
       |  SELECT DISTINCT collection, ak,
       |    json_extract_string(json,
       |      '$$.assets.' || ak || '."raster:bands"[0].data_type') AS dtype,
       |    CAST(CAST(json_extract(json,
       |      '$$.assets.' || ak || '."raster:bands"[0].nodata') AS DOUBLE)
       |      AS VARCHAR) AS nodata
       |  FROM a)
       |SELECT collection, replace(collection, '-', '_') AS name,
       |       replace(collection, '-', '_') AS meta_name,
       |       CAST(COUNT(*) AS INT) AS n_measurements,
       |       string_agg(ak || ':' || dtype || ':' || nodata || ':1',
       |         ';' ORDER BY ak) AS measurements
       |FROM b GROUP BY collection
       |ORDER BY collection""".stripMargin

  /** S10/S12 sink: tile rows -> parquet -> reload (the distributed
    * persistence path — at 100 TB the fused cube lives as parquet tile
    * rows, partitioned by band, re-loadable without re-reading sources). */
  def tilesRoundtrip(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    val out = java.nio.file.Files.createTempDirectory("graft_tiles_rt").toString
    // persist z-clustered: within each band partition, files carry
    // Morton-contiguous (ty, tx) ranges, so ROI reads prune row groups
    // (graft.layout; ZOrderRangePruning exploits the z column)
    graft.functions.VecFunctions.register(spark)
    res.tiles
      .withColumn("z", call_function("zorder64", col("tx"), col("ty")))
      .repartitionByRange(col("band"), col("z"))
      .sortWithinPartitions("band", "z")
      .write.mode("overwrite").partitionBy("band").parquet(out)
    summarize(spark.read.parquet(out))
  }

  /** Pixel-row explode keyed by the group TIMESTAMP instead of the group
    * ordinal: incremental ingest assigns tIdx per batch, so
    * batch-vs-streaming comparisons key on (band, time, ty, tx). Shared
    * by the streaming-ingest anchor and its batch twin. */
  private def pixelsByTime(df: DataFrame): DataFrame = {
    val decode = udf { (data: Array[Byte], dtype: String) =>
      Fuse.decode(data, dtype) }
    df.select(col("band"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("t"),
        col("ty"), col("tx"), col("width"),
        posexplode(decode(col("data"), col("dtype"))))
      .select(col("band"), col("t"), col("ty"), col("tx"),
        (col("pos") / col("width")).cast("int").as("py"),
        (col("pos") % col("width")).cast("int").as("px"),
        col("col").as("value"))
  }

  /** Deterministic per-tile summary over pixel rows, integer-quantized
    * (×100 → BIGINT) so it is aggregation-order-exact across engines —
    * the same convention as [[mosaicCells]]. */
  private def quantizedSummaryByTime(px: DataFrame): DataFrame =
    px.groupBy("band", "t", "ty", "tx")
      .agg(count(lit(1)).as("n_px"),
        sum(when(isnan(col("value")), 0L)
          .otherwise(round(col("value") * 100).cast("long"))).as("sum_q"),
        round(min(when(!isnan(col("value")), col("value"))), 2).as("vmin"),
        round(max(when(!isnan(col("value")), col("value"))), 2).as("vmax"))
      .orderBy("band", "t", "ty", "tx")

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

  /** Shared path for the streaming-ingest anchor (see
    * [[streamRasterIngest]]). */
  private val StreamCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_stream_cells_parquet"

  private val streamIngestDuckSql: String =
    s"""SELECT band, t, ty, tx, COUNT(*) AS n_px,
       |       CAST(SUM(CASE WHEN isnan(value) THEN 0
       |                ELSE CAST(ROUND(value * 100) AS BIGINT) END)
       |            AS BIGINT) AS sum_q,
       |       ROUND(MIN(CASE WHEN isnan(value) THEN NULL ELSE value END), 2) AS vmin,
       |       ROUND(MAX(CASE WHEN isnan(value) THEN NULL ELSE value END), 2) AS vmax
       |FROM read_parquet('$StreamCellsPath/*.parquet')
       |GROUP BY band, t, ty, tx
       |ORDER BY band, t, ty, tx""".stripMargin

  /** Batch twin of the streaming ingest, for the spec. */
  def groupByIdSummaryByTime(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    quantizedSummaryByTime(pixelsByTime(Load.load(spark, items, schemas,
      bands = Seq("red", "nir"), groupby = "id", chunks = 64).tiles))
  }

  /** Path shared between the Spark query and its DuckDB oracle: the
    * mosaic's pixels land here as plain pixel-row parquet, and both
    * engines aggregate the SAME file. */
  private val CellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_mosaic_cells_parquet"

  /** The raster family's cross-engine anchor (the one hash-checked
    * raster row): the fused solar-day mosaic — the same cube as
    * `raster_load_mosaic` — exploded to (band, tile, y, x, value) pixel
    * rows, written as parquet, then aggregated per tile by Spark AND
    * recomputed by DuckDB from the same file. A pixel decoded or fused
    * wrongly shifts a quantized per-tile checksum an engine sharing none
    * of our raster code verifies — the distributed analog of the
    * reference's golden pixel checks (`loader/test_reader.py:72-125`).
    * Sum is integer-quantized (×100 → BIGINT) so it is
    * aggregation-order-exact across engines. */
  def mosaicCells(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    val decode = udf { (data: Array[Byte], dtype: String) =>
      Fuse.decode(data, dtype) }
    res.tiles
      .select(col("band"), col("tIdx"), col("ty"), col("tx"), col("width"),
        posexplode(decode(col("data"), col("dtype"))))
      .select(col("band"), col("tIdx").as("tidx"), col("ty"), col("tx"),
        (col("pos") / col("width")).cast("int").as("py"),
        (col("pos") % col("width")).cast("int").as("px"),
        col("col").as("value"))
      .write.mode("overwrite").parquet(CellsPath)
    spark.read.parquet(CellsPath)
      .groupBy("band", "tidx", "ty", "tx")
      .agg(count(lit(1)).as("n_px"),
        sum(when(isnan(col("value")), 0L)
          .otherwise(round(col("value") * 100).cast("long"))).as("sum_q"),
        round(min(when(!isnan(col("value")), col("value"))), 2).as("vmin"),
        round(max(when(!isnan(col("value")), col("value"))), 2).as("vmax"))
      .orderBy("band", "tidx", "ty", "tx")
  }

  private val mosaicCellsDuckSql: String =
    s"""SELECT band, tidx, ty, tx, COUNT(*) AS n_px,
       |       CAST(SUM(CASE WHEN isnan(value) THEN 0
       |                ELSE CAST(ROUND(value * 100) AS BIGINT) END)
       |            AS BIGINT) AS sum_q,
       |       ROUND(MIN(CASE WHEN isnan(value) THEN NULL ELSE value END), 2) AS vmin,
       |       ROUND(MAX(CASE WHEN isnan(value) THEN NULL ELSE value END), 2) AS vmax
       |FROM read_parquet('$CellsPath/*.parquet')
       |GROUP BY band, tidx, ty, tx
       |ORDER BY band, tidx, ty, tx""".stripMargin

  /** Shared path for the composite anchor (see [[compositeCells]]). */
  private val CompositeCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_composite_cells_parquet"

  /** Second cross-engine raster anchor, one level deeper than
    * [[mosaicCells]]: the PER-TIME pixel planes (the median composite's
    * INPUT, nodata already mapped to NaN) land as parquet, Spark runs
    * the real `Composite.medianAcrossTime` operator over the tiles, and
    * DuckDB recomputes the per-pixel across-time median FROM THE RAW
    * PLANES with its own `median` — verifying the custom mapGroups
    * composite's semantics (valid-set selection, odd/even interpolation)
    * against an engine sharing none of the code, not merely re-adding
    * its output. Interpolated-median convention matches DuckDB's;
    * per-pixel medians are integer-quantized (×100 → BIGINT) before the
    * per-tile sum so the check is aggregation-order-exact. */
  def compositeCells(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "id", chunks = 64)
    val decode = udf { (data: Array[Byte], dtype: String) =>
      Fuse.decode(data, dtype) }
    res.tiles
      .select(col("band"), col("tIdx"), col("ty"), col("tx"), col("width"),
        col("nodata"), posexplode(decode(col("data"), col("dtype"))))
      .select(col("band"), col("tIdx").as("tidx"), col("ty"), col("tx"),
        (col("pos") / col("width")).cast("int").as("py"),
        (col("pos") % col("width")).cast("int").as("px"),
        when(isnan(col("col")) || col("col") === col("nodata"),
          lit(Double.NaN)).otherwise(col("col")).as("value"))
      .write.mode("overwrite").parquet(CompositeCellsPath)
    graft.load.Composite.medianAcrossTime(spark, res.tiles)
      .select(col("band"), col("ty"), col("tx"),
        expr("aggregate(median, 0L, (s, v) -> s + " +
          "if(isnan(v), 0L, CAST(round(v * 100) AS BIGINT)))").as("med_q"),
        expr("CAST(aggregate(count, 0, (s, v) -> s + v) AS BIGINT)")
          .as("n_valid"))
      .orderBy("band", "ty", "tx")
  }

  private val compositeCellsDuckSql: String =
    s"""WITH px AS (
       |  SELECT band, ty, tx, py, px, value
       |  FROM read_parquet('$CompositeCellsPath/*.parquet')
       |  WHERE NOT isnan(value)),
       |m AS (
       |  SELECT band, ty, tx, py, px,
       |         median(value) AS med, COUNT(*) AS c
       |  FROM px GROUP BY band, ty, tx, py, px)
       |SELECT band, ty, tx,
       |       CAST(SUM(CAST(ROUND(med * 100) AS BIGINT)) AS BIGINT) AS med_q,
       |       CAST(SUM(c) AS BIGINT) AS n_valid
       |FROM m GROUP BY band, ty, tx
       |ORDER BY band, ty, tx""".stripMargin

  /** Shared path for the warp anchor (see [[reprojectCells]]). */
  private val ReprojectCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_reproject_cells_parquet"

  /** Third cross-engine raster anchor — the WARP path (the hardest
    * numerics in the repo: `raster/Reader.scala` reproject kernels +
    * `geo/Crs.scala` projection inverses). The warped planes of the
    * same three cross-CRS loads as `raster_load_reproject` (web
    * mercator, EASE-Grid 2.0, World CEA) land as (crs, band, tile, y,
    * x, value) pixel rows; Spark aggregates per tile and DuckDB
    * recomputes the same quantized checksums from the same file. A
    * mis-projected inverse, a wrong kernel weight, or a nodata leak in
    * the warp shifts a per-tile sum an engine sharing none of the warp
    * code verifies — graduating the reproject family from spec-pinned
    * to hash-checked. */
  def reprojectCells(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val decode = udf { (data: Array[Byte], dtype: String) =>
      Fuse.decode(data, dtype) }
    Seq("EPSG:3857" -> 20.0, "EPSG:6933" -> 20.0, "ESRI:54034" -> 20.0)
      .map { case (crs, res) =>
        Load.load(spark, items, schemas, bands = Seq("red"),
          groupby = "solar_day", chunks = 64,
          crs = Some(crs), resolution = Some(res)).tiles
          .withColumn("crs", lit(crs))
      }.reduce(_ unionAll _)
      .select(col("crs"), col("band"), col("tIdx"), col("ty"), col("tx"),
        col("width"), posexplode(decode(col("data"), col("dtype"))))
      .select(col("crs"), col("band"), col("tIdx").as("tidx"), col("ty"),
        col("tx"),
        (col("pos") / col("width")).cast("int").as("py"),
        (col("pos") % col("width")).cast("int").as("px"),
        col("col").as("value"))
      .write.mode("overwrite").parquet(ReprojectCellsPath)
    spark.read.parquet(ReprojectCellsPath)
      .groupBy("crs", "band", "tidx", "ty", "tx")
      .agg(count(lit(1)).as("n_px"),
        sum(when(isnan(col("value")), 0L)
          .otherwise(round(col("value") * 100).cast("long"))).as("sum_q"),
        round(min(when(!isnan(col("value")), col("value"))), 2).as("vmin"),
        round(max(when(!isnan(col("value")), col("value"))), 2).as("vmax"))
      .orderBy("crs", "band", "tidx", "ty", "tx")
  }

  private val reprojectCellsDuckSql: String =
    s"""SELECT crs, band, tidx, ty, tx, COUNT(*) AS n_px,
       |       CAST(SUM(CASE WHEN isnan(value) THEN 0
       |                ELSE CAST(ROUND(value * 100) AS BIGINT) END)
       |            AS BIGINT) AS sum_q,
       |       ROUND(MIN(CASE WHEN isnan(value) THEN NULL ELSE value END), 2) AS vmin,
       |       ROUND(MAX(CASE WHEN isnan(value) THEN NULL ELSE value END), 2) AS vmax
       |FROM read_parquet('$ReprojectCellsPath/*.parquet')
       |GROUP BY crs, band, tidx, ty, tx
       |ORDER BY crs, band, tidx, ty, tx""".stripMargin

  /** Shared paths for the resampling anchor (see [[resampleCells]]). */
  private val ResampleNativePath =
    s"${sys.props("java.io.tmpdir")}/graft_resample_native_parquet"
  private val ResampleCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_resample_cells_parquet"

  /** The block-expressible subset of the F16 kernel matrix (the four
    * conv kernels — cubic/lanczos/cubic_spline/gauss — stay
    * golden-pinned: their windows span blocks and their weights are
    * transcendental) — except CUBIC: at the aligned 2× case its
    * Catmull-Rom taps hit offsets ±0.5/±1.5 whose weights (9/16, −1/16)
    * are exact binary fractions, so the 4×4 weighted sum is exact
    * rational math DuckDB can recompute order-free. */
  private val ResampleModes = Seq("nearest", "bilinear", "average", "sum",
    "min", "max", "mode", "med", "q1", "q3", "rms", "cubic")

  /** Fourth cross-engine raster anchor — the RESAMPLING KERNELS
    * themselves (F16, `loader/types.py:113-114`'s rasterio mode
    * strings). A same-CRS 2× shrink with overviews disabled makes every
    * pooled kernel an exact 2×2-block operation on the native grid: dst
    * pixel (PY, PX) pools native rows 2PY..2PY+1 × cols 2PX..2PX+1, and
    * `nearest` reads the block's odd-odd corner (floor((PX+0.5)·2)).
    * The NATIVE planes land as absolute-grid pixel rows (scene offsets
    * are multiples of the shrink, so no per-item offsets exist), the
    * resampled planes land per mode, and DuckDB RECOMPUTES each dst
    * pixel from the native block — avg/sum/min/max/rms as SQL
    * aggregates, med/q1/q3 via the kernel's round((cnt−1)·p) order
    * statistic, mode via max-count-then-smallest — then re-aggregates
    * per tile. Unlike the mosaic/warp anchors (which re-aggregate
    * landed values), this one derives the values themselves in SQL, so
    * a wrong window origin, a nodata leak into a pool, or a tie-break
    * flip in `Reader.sample` breaks the hash. All math is exact
    * (uint16 sources, float64 output, quarter-step averages), and the
    * only divisions/sqrt are single IEEE ops on identical operands. */
  def resampleCells(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val decode = udf { (data: Array[Byte], dtype: String) =>
      Fuse.decode(data, dtype) }
    // native 10 m per-item planes in absolute grid coords; float64 output
    // => invalid pixels land as NaN directly
    Load.load(spark, items, schemas, bands = Seq("red"), groupby = "id",
      chunks = 64, dtype = Some("float64")).tiles
      .select(col("band"), col("tIdx"), col("ty"), col("tx"), col("width"),
        col("nodata"), posexplode(decode(col("data"), col("dtype"))))
      .select(col("band"), col("tIdx").as("tidx"),
        (col("ty") * 64 + (col("pos") / col("width")).cast("int")).as("gy"),
        (col("tx") * 64 + (col("pos") % col("width")).cast("int")).as("gx"),
        when(isnan(col("col")) || col("col") === col("nodata"),
          lit(Double.NaN)).otherwise(col("col")).as("value"))
      .write.mode("overwrite").parquet(ResampleNativePath)
    // 20 m per-mode planes (overviews off: pooling must hit base pixels)
    ResampleModes.map { m =>
      Load.load(spark, items, schemas, bands = Seq("red"), groupby = "id",
        chunks = 64, resolution = Some(20.0), resampling = Map("*" -> m),
        useOverviews = false, dtype = Some("float64")).tiles
        .withColumn("mode", lit(m))
    }.reduce(_ unionAll _)
      .select(col("mode"), col("band"), col("tIdx"), col("ty"), col("tx"),
        col("width"), col("nodata"), posexplode(decode(col("data"), col("dtype"))))
      .select(col("mode"), col("band"), col("tIdx").as("tidx"), col("ty"),
        col("tx"),
        (col("pos") / col("width")).cast("int").as("py"),
        (col("pos") % col("width")).cast("int").as("px"),
        when(isnan(col("col")) || col("col") === col("nodata"),
          lit(Double.NaN)).otherwise(col("col")).as("value"))
      .write.mode("overwrite").parquet(ResampleCellsPath)
    spark.read.parquet(ResampleCellsPath)
      .groupBy("mode", "band", "tidx", "ty", "tx")
      .agg(count(lit(1)).as("n_px"),
        count(when(!isnan(col("value")), 1)).as("n_valid"),
        sum(when(isnan(col("value")), 0L)
          .otherwise(round(col("value") * 100).cast("long"))).as("sum_q"),
        round(min(when(!isnan(col("value")), col("value"))), 2).as("vmin"),
        round(max(when(!isnan(col("value")), col("value"))), 2).as("vmax"))
      .orderBy("mode", "band", "tidx", "ty", "tx")
  }

  private val resampleCellsDuckSql: String =
    s"""WITH natall AS (
       |  -- scene COVERAGE (NaN rows included): the loader clips each
       |  -- item's dst ROI to the scene's projected bbox, so a dst pixel
       |  -- whose CENTER native cell was never landed is never sampled —
       |  -- even when cubic's 4-tap window reaches into the scene
       |  SELECT band, tidx, gy, gx
       |  FROM read_parquet('$ResampleNativePath/*.parquet')),
       |nat AS (
       |  SELECT band, tidx, gy, gx, value
       |  FROM read_parquet('$ResampleNativePath/*.parquet')
       |  WHERE NOT isnan(value)),
       |bs AS (
       |  SELECT band, tidx, gy // 2 AS by, gx // 2 AS bx,
       |         COUNT(*) AS cnt,
       |         AVG(value) AS avg_v,
       |         SUM(value) AS sum_v,
       |         MIN(value) AS min_v,
       |         MAX(value) AS max_v,
       |         sqrt(SUM(value * value) / COUNT(*)) AS rms_v,
       |         MAX(CASE WHEN gy % 2 = 1 AND gx % 2 = 1 THEN value END)
       |           AS near_v,
       |         list(value ORDER BY value) AS vals
       |  FROM nat GROUP BY band, tidx, by, bx),
       |md AS (
       |  SELECT band, tidx, by, bx, value AS mode_v FROM (
       |    SELECT band, tidx, by, bx, value, c,
       |           ROW_NUMBER() OVER (PARTITION BY band, tidx, by, bx
       |                              ORDER BY c DESC, value) AS rn
       |    FROM (SELECT band, tidx, gy // 2 AS by, gx // 2 AS bx, value,
       |                 COUNT(*) AS c
       |          FROM nat GROUP BY band, tidx, by, bx, value) g) t
       |  WHERE rn = 1),
       |cbx AS (
       |  -- NB: DuckDB's // truncates toward zero; FLOOR keeps the gy=0
       |  -- candidate row at PY=-1 (harmlessly out of domain) instead of
       |  -- leaking a spurious out-of-range tap into PY=1
       |  SELECT band, tidx, value,
       |         CAST(FLOOR((gy - 1) / 2.0) AS BIGINT) + ky.k AS py,
       |         gy - 2 * (CAST(FLOOR((gy - 1) / 2.0) AS BIGINT) + ky.k) + 1 AS dy,
       |         CAST(FLOOR((gx - 1) / 2.0) AS BIGINT) + kx.k AS px,
       |         gx - 2 * (CAST(FLOOR((gx - 1) / 2.0) AS BIGINT) + kx.k) + 1 AS dx
       |  FROM nat,
       |       (SELECT unnest([0, 1]) AS k) ky(k),
       |       (SELECT unnest([0, 1]) AS k) kx(k)),
       |cb AS (
       |  SELECT band, tidx, py, px,
       |         SUM(value * wdy * wdx) AS acc, SUM(wdy * wdx) AS wsum
       |  FROM (SELECT band, tidx, py, px, value,
       |          CASE WHEN dy IN (0, 3) THEN -0.0625
       |               WHEN dy IN (1, 2) THEN 0.5625 ELSE 0 END AS wdy,
       |          CASE WHEN dx IN (0, 3) THEN -0.0625
       |               WHEN dx IN (1, 2) THEN 0.5625 ELSE 0 END AS wdx
       |        FROM cbx)
       |  GROUP BY band, tidx, py, px),
       |dom AS (
       |  SELECT mode, band, tidx, ty, tx,
       |         ty * 64 + py AS gpy, tx * 64 + px AS gpx
       |  FROM read_parquet('$ResampleCellsPath/*.parquet')),
       |ex AS (
       |  SELECT d.mode, d.band, d.tidx, d.ty, d.tx,
       |         CASE d.mode
       |           WHEN 'nearest' THEN b.near_v
       |           WHEN 'bilinear' THEN b.avg_v
       |           WHEN 'average' THEN b.avg_v
       |           WHEN 'sum' THEN b.sum_v
       |           WHEN 'min' THEN b.min_v
       |           WHEN 'max' THEN b.max_v
       |           WHEN 'rms' THEN b.rms_v
       |           WHEN 'mode' THEN m.mode_v
       |           WHEN 'med' THEN
       |             b.vals[CAST(FLOOR((b.cnt - 1) * 0.5 + 0.5) AS INT) + 1]
       |           WHEN 'q1' THEN
       |             b.vals[CAST(FLOOR((b.cnt - 1) * 0.25 + 0.5) AS INT) + 1]
       |           WHEN 'q3' THEN
       |             b.vals[CAST(FLOOR((b.cnt - 1) * 0.75 + 0.5) AS INT) + 1]
       |           WHEN 'cubic' THEN
       |             CASE WHEN ctr.gy IS NULL THEN NULL
       |                  WHEN ABS(cc.wsum) < 1e-12 THEN NULL
       |                  ELSE cc.acc / cc.wsum END
       |         END AS val
       |  FROM dom d
       |  LEFT JOIN bs b ON b.band = d.band AND b.tidx = d.tidx
       |                AND b.by = d.gpy AND b.bx = d.gpx
       |  LEFT JOIN md m ON m.band = d.band AND m.tidx = d.tidx
       |                AND m.by = d.gpy AND m.bx = d.gpx
       |  LEFT JOIN cb cc ON cc.band = d.band AND cc.tidx = d.tidx
       |                AND cc.py = d.gpy AND cc.px = d.gpx
       |  LEFT JOIN natall ctr ON ctr.band = d.band AND ctr.tidx = d.tidx
       |                AND ctr.gy = 2 * d.gpy + 1 AND ctr.gx = 2 * d.gpx + 1)
       |SELECT mode, band, tidx, ty, tx, COUNT(*) AS n_px,
       |       COUNT(val) AS n_valid,
       |       CAST(SUM(COALESCE(CAST(ROUND(val * 100) AS BIGINT), 0))
       |            AS BIGINT) AS sum_q,
       |       ROUND(MIN(val), 2) AS vmin, ROUND(MAX(val), 2) AS vmax
       |FROM ex GROUP BY mode, band, tidx, ty, tx
       |ORDER BY mode, band, tidx, ty, tx""".stripMargin

  /** Shared paths for the convolution-kernel anchor ([[resampleConv]]). */
  private val ConvNativePath =
    s"${sys.props("java.io.tmpdir")}/graft_conv_native_parquet"
  private val ConvCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_conv_cells_parquet"
  private val ConvWeightsPath =
    s"${sys.props("java.io.tmpdir")}/graft_conv_weights_parquet"

  /** The last three resampling kernels (lanczos / cubic_spline / gauss
    * — golden-pinned only until now: transcendental weights). At the
    * aligned 2× shrink every dst pixel sees the SAME tap geometry
    * (fx=fy=1/2), so the per-tap weights are a tiny constant table —
    * landed from [[graft.raster.Kernels]], the exact functions the warp
    * multiplies with, so both engines share bit-identical weights — and
    * DuckDB re-applies them: join native taps at (2·P+o), fold
    * value·w and w in the engine's (dy,dx) loop order (`list_reduce`
    * over an ordered list — float addition is order-sensitive),
    * renormalize over the valid taps, NaN on empty/tiny wsum, domain
    * gated on the landed center-cell coverage. This checks kernel
    * APPLICATION — window origin, nodata renormalization, tap
    * clipping — complementing the weight DERIVATION the golden pins
    * hold. `chunks=256` puts each whole scene in ONE dst tile so the
    * per-task source window is the full scene and window truncation
    * coincides with the landed-coverage truncation; the native landing
    * stays at 64 (scene bboxes are 64-aligned, so tile coverage equals
    * the exact scene clip). */
  def resampleConv(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import graft.raster.Kernels
    val (items, schemas) = parsed(spark)
    val decode = udf { (data: Array[Byte], dtype: String) =>
      Fuse.decode(data, dtype) }
    Load.load(spark, items, schemas, bands = Seq("red"), groupby = "id",
      chunks = 64, dtype = Some("float64")).tiles
      .select(col("band"), col("tIdx"), col("ty"), col("tx"), col("width"),
        col("nodata"), posexplode(decode(col("data"), col("dtype"))))
      .select(col("band"), col("tIdx").as("tidx"),
        (col("ty") * 64 + (col("pos") / col("width")).cast("int")).as("gy"),
        (col("tx") * 64 + (col("pos") % col("width")).cast("int")).as("gx"),
        when(isnan(col("col")) || col("col") === col("nodata"),
          lit(Double.NaN)).otherwise(col("col")).as("value"))
      .write.mode("overwrite").parquet(ConvNativePath)
    // per-tap weights at the aligned geometry: native cell 2P+o, kernel
    // argument o-1/2; 2-D weight = wx*wy in the engine's multiply order
    val wrows =
      (for { dy <- 0 until 6; dx <- 0 until 6 } yield
        ("lanczos", dy - 2, dx - 2,
          Kernels.lanczos((dx - 2) - 0.5) * Kernels.lanczos((dy - 2) - 0.5))) ++
        (for { dy <- 0 until 4; dx <- 0 until 4 } yield
          ("cubic_spline", dy - 1, dx - 1,
            Kernels.bspline((dx - 1) - 0.5) * Kernels.bspline((dy - 1) - 0.5))) ++
        (for { dy <- 0 until 2; dx <- 0 until 2 } yield
          ("gauss", dy, dx, Kernels.gauss(0.5, 2)))
    wrows.toDF("mode", "oy", "ox", "w")
      .coalesce(1).write.mode("overwrite").parquet(ConvWeightsPath)
    Seq("lanczos", "cubic_spline", "gauss").map { m =>
      Load.load(spark, items, schemas, bands = Seq("red"), groupby = "id",
        chunks = 256, resolution = Some(20.0), resampling = Map("*" -> m),
        useOverviews = false, dtype = Some("float64")).tiles
        .withColumn("mode", lit(m))
    }.reduce(_ unionAll _)
      .select(col("mode"), col("band"), col("tIdx"), col("ty"), col("tx"),
        col("width"), col("nodata"), posexplode(decode(col("data"), col("dtype"))))
      .select(col("mode"), col("band"), col("tIdx").as("tidx"),
        (col("ty") * 256 + (col("pos") / col("width")).cast("int")).as("gpy"),
        (col("tx") * 256 + (col("pos") % col("width")).cast("int")).as("gpx"),
        when(isnan(col("col")) || col("col") === col("nodata"),
          lit(Double.NaN)).otherwise(col("col")).as("value"))
      .write.mode("overwrite").parquet(ConvCellsPath)
    spark.read.parquet(ConvCellsPath)
      .groupBy("mode", "band", "tidx", "gpy")
      .agg(count(lit(1)).as("n_px"),
        count(when(!isnan(col("value")), 1)).as("n_valid"),
        sum(when(isnan(col("value")), 0L)
          .otherwise(round(col("value") * 100).cast("long"))).as("sum_q"),
        round(min(when(!isnan(col("value")), col("value"))), 2).as("vmin"),
        round(max(when(!isnan(col("value")), col("value"))), 2).as("vmax"))
      .orderBy("mode", "band", "tidx", "gpy")
  }

  private val resampleConvDuckSql: String =
    s"""WITH natall AS (
       |  SELECT band, tidx, gy, gx
       |  FROM read_parquet('$ConvNativePath/*.parquet')),
       |nat AS (
       |  SELECT band, tidx, gy, gx, value
       |  FROM read_parquet('$ConvNativePath/*.parquet')
       |  WHERE NOT isnan(value)),
       |wt AS (SELECT mode, oy, ox, w
       |       FROM read_parquet('$ConvWeightsPath/*.parquet')),
       |dom AS (SELECT DISTINCT mode, band, tidx, gpy, gpx
       |        FROM read_parquet('$ConvCellsPath/*.parquet')),
       |tap AS (
       |  SELECT d.mode, d.band, d.tidx, d.gpy, d.gpx,
       |         n.value, t.w, t.oy, t.ox
       |  FROM dom d
       |  JOIN wt t ON t.mode = d.mode
       |  LEFT JOIN nat n ON n.band = d.band AND n.tidx = d.tidx
       |       AND n.gy = 2 * d.gpy + t.oy AND n.gx = 2 * d.gpx + t.ox),
       |acc AS (
       |  SELECT mode, band, tidx, gpy, gpx,
       |    CASE WHEN COUNT(value) = 0 THEN NULL
       |         ELSE list_reduce(list(value * w ORDER BY oy, ox)
       |                FILTER (WHERE value IS NOT NULL), (a, b) -> a + b)
       |    END AS acc,
       |    CASE WHEN COUNT(value) = 0 THEN NULL
       |         ELSE list_reduce(list(w ORDER BY oy, ox)
       |                FILTER (WHERE value IS NOT NULL), (a, b) -> a + b)
       |    END AS wsum
       |  FROM tap GROUP BY 1, 2, 3, 4, 5),
       |ex AS (
       |  SELECT a.mode, a.band, a.tidx, a.gpy, a.gpx,
       |    CASE WHEN c.gy IS NULL THEN NULL
       |         WHEN a.wsum IS NULL OR ABS(a.wsum) < 1e-12 THEN NULL
       |         ELSE a.acc / a.wsum END AS val
       |  FROM acc a
       |  LEFT JOIN natall c ON c.band = a.band AND c.tidx = a.tidx
       |       AND c.gy = 2 * a.gpy + 1 AND c.gx = 2 * a.gpx + 1)
       |SELECT mode, band, tidx, gpy, COUNT(*) AS n_px,
       |       COUNT(val) AS n_valid,
       |       CAST(SUM(COALESCE(CAST(ROUND(val * 100) AS BIGINT), 0))
       |            AS BIGINT) AS sum_q,
       |       ROUND(MIN(val), 2) AS vmin, ROUND(MAX(val), 2) AS vmax
       |FROM ex GROUP BY mode, band, tidx, gpy
       |ORDER BY mode, band, tidx, gpy""".stripMargin

  /** Shared paths for the overview anchor (see [[overviewCells]]). */
  private val OverviewNativePath =
    s"${sys.props("java.io.tmpdir")}/graft_overview_native_parquet"
  private val OverviewCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_overview_cells_parquet"

  /** Fifth cross-engine raster anchor — OVERVIEW SELECTION (S8,
    * `loader/_reader.py:104-114`). The fixture pyramids are decimations
    * of the base plane (`Grb.writeWithOverviews`: level-s pixel (j,i) =
    * base (s·j, s·i)), and scene offsets are multiples of every level
    * stride, so a dst pixel read through level s equals the base plane
    * at the absolute even grid point (s·PY, s·PX). A 20 m read must
    * pick `.ovr2` (expected = base(2PY, 2PX) — the block's EVEN-even
    * corner, distinguishing the decimation path from
    * `raster_resample_cells`' overviews-off nearest kernel, which reads
    * the ODD-odd corner), and a 40 m read must pick `.ovr4`
    * (base(4PY, 4PX)). DuckDB recomputes both from the landed native
    * plane — selecting the wrong level, an off-by-one in the decimation
    * origin, or a broken `pickOverview` shifts every expected value. */
  def overviewCells(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val decode = udf { (data: Array[Byte], dtype: String) =>
      Fuse.decode(data, dtype) }
    Load.load(spark, items, schemas, bands = Seq("red"), groupby = "id",
      chunks = 64, dtype = Some("float64")).tiles
      .select(col("band"), col("tIdx"), col("ty"), col("tx"), col("width"),
        col("nodata"), posexplode(decode(col("data"), col("dtype"))))
      .select(col("band"), col("tIdx").as("tidx"),
        (col("ty") * 64 + (col("pos") / col("width")).cast("int")).as("gy"),
        (col("tx") * 64 + (col("pos") % col("width")).cast("int")).as("gx"),
        when(isnan(col("col")) || col("col") === col("nodata"),
          lit(Double.NaN)).otherwise(col("col")).as("value"))
      .write.mode("overwrite").parquet(OverviewNativePath)
    Seq(20.0 -> 2, 40.0 -> 4).map { case (res, lvl) =>
      Load.load(spark, items, schemas, bands = Seq("red"), groupby = "id",
        chunks = 64, resolution = Some(res), dtype = Some("float64")).tiles
        .withColumn("lvl", lit(lvl))
    }.reduce(_ unionAll _)
      .select(col("lvl"), col("band"), col("tIdx"), col("ty"), col("tx"),
        col("width"), col("nodata"), posexplode(decode(col("data"), col("dtype"))))
      .select(col("lvl"), col("band"), col("tIdx").as("tidx"), col("ty"),
        col("tx"),
        (col("pos") / col("width")).cast("int").as("py"),
        (col("pos") % col("width")).cast("int").as("px"),
        when(isnan(col("col")) || col("col") === col("nodata"),
          lit(Double.NaN)).otherwise(col("col")).as("value"))
      .write.mode("overwrite").parquet(OverviewCellsPath)
    spark.read.parquet(OverviewCellsPath)
      .groupBy("lvl", "band", "tidx", "ty", "tx")
      .agg(count(lit(1)).as("n_px"),
        count(when(!isnan(col("value")), 1)).as("n_valid"),
        sum(when(isnan(col("value")), 0L)
          .otherwise(round(col("value") * 100).cast("long"))).as("sum_q"),
        round(min(when(!isnan(col("value")), col("value"))), 2).as("vmin"),
        round(max(when(!isnan(col("value")), col("value"))), 2).as("vmax"))
      .orderBy("lvl", "band", "tidx", "ty", "tx")
  }

  private val overviewCellsDuckSql: String =
    s"""WITH nat AS (
       |  SELECT band, tidx, gy, gx, value
       |  FROM read_parquet('$OverviewNativePath/*.parquet')
       |  WHERE NOT isnan(value)),
       |dom AS (
       |  SELECT lvl, band, tidx, ty, tx,
       |         lvl * (ty * 64 + py) AS sgy, lvl * (tx * 64 + px) AS sgx
       |  FROM read_parquet('$OverviewCellsPath/*.parquet')),
       |ex AS (
       |  SELECT d.lvl, d.band, d.tidx, d.ty, d.tx, n.value AS val
       |  FROM dom d
       |  LEFT JOIN nat n ON n.band = d.band AND n.tidx = d.tidx
       |                 AND n.gy = d.sgy AND n.gx = d.sgx)
       |SELECT lvl, band, tidx, ty, tx, COUNT(*) AS n_px,
       |       COUNT(val) AS n_valid,
       |       CAST(SUM(COALESCE(CAST(ROUND(val * 100) AS BIGINT), 0))
       |            AS BIGINT) AS sum_q,
       |       ROUND(MIN(val), 2) AS vmin, ROUND(MAX(val), 2) AS vmax
       |FROM ex GROUP BY lvl, band, tidx, ty, tx
       |ORDER BY lvl, band, tidx, ty, tx""".stripMargin

  /** The eager-load SUMMARY queries re-derived from the landed pixel
    * planes the cells anchors already write (same Verify run; content
    * is fixture-driven, so identical at every SF — no cross-SF clobber
    * hazard). `raster_load_mosaic`'s per-tile width/height/validCount/
    * checksum recompute from the fused plane (`CellsPath`),
    * `raster_load_groupby_id`'s from the per-item planes
    * (`CompositeCellsPath`, red band), and `raster_load_overview`'s
    * from the NATIVE per-item planes — DuckDB re-applies BOTH the
    * `.ovr4` decimation identity (base(4PY, 4PX)) and the solar-day
    * first-valid fuse rule (items in ascending order within the day)
    * before summarizing, so overview selection and mosaic fusing are
    * jointly rechecked. */
  private val loadMosaicDuckSql: String =
    s"""SELECT band, tidx AS "tIdx", ty, tx,
       |       CAST(MAX(px) + 1 AS INT) AS width,
       |       CAST(MAX(py) + 1 AS INT) AS height,
       |       CAST(SUM(CASE WHEN value <> 0 THEN 1 ELSE 0 END) AS INT)
       |         AS validCount,
       |       ROUND(SUM(value), 2) AS checksum
       |FROM read_parquet('$CellsPath/*.parquet')
       |GROUP BY band, tidx, ty, tx
       |ORDER BY band, "tIdx", ty, tx""".stripMargin

  private val loadGroupByIdDuckSql: String =
    s"""SELECT band, tidx AS "tIdx", ty, tx,
       |       CAST(MAX(px) + 1 AS INT) AS width,
       |       CAST(MAX(py) + 1 AS INT) AS height,
       |       CAST(SUM(CASE WHEN isnan(value) THEN 0 ELSE 1 END) AS INT)
       |         AS validCount,
       |       ROUND(SUM(CASE WHEN isnan(value) THEN 0 ELSE value END), 2)
       |         AS checksum
       |FROM read_parquet('$CompositeCellsPath/*.parquet')
       |WHERE band = 'red'
       |GROUP BY band, tidx, ty, tx
       |ORDER BY band, "tIdx", ty, tx""".stripMargin

  private val loadOverviewDuckSql: String =
    s"""WITH nat AS (
       |  SELECT tidx, gy, gx, value
       |  FROM read_parquet('$OverviewNativePath/*.parquet')
       |  WHERE NOT isnan(value)),
       |dom AS (
       |  SELECT DISTINCT band, tidx // 2 AS day, ty, tx, py, px,
       |         4 * (ty * 64 + py) AS sgy, 4 * (tx * 64 + px) AS sgx
       |  FROM read_parquet('$OverviewCellsPath/*.parquet')
       |  WHERE lvl = 4),
       |f AS (
       |  SELECT d.band, d.day, d.ty, d.tx, d.py, d.px,
       |         COALESCE(n0.value, n1.value, 0) AS fused
       |  FROM dom d
       |  LEFT JOIN nat n0 ON n0.tidx = d.day * 2
       |                  AND n0.gy = d.sgy AND n0.gx = d.sgx
       |  LEFT JOIN nat n1 ON n1.tidx = d.day * 2 + 1
       |                  AND n1.gy = d.sgy AND n1.gx = d.sgx)
       |SELECT band, day AS "tIdx", ty, tx,
       |       CAST(MAX(px) + 1 AS INT) AS width,
       |       CAST(MAX(py) + 1 AS INT) AS height,
       |       CAST(SUM(CASE WHEN fused <> 0 THEN 1 ELSE 0 END) AS INT)
       |         AS validCount,
       |       ROUND(SUM(fused), 2) AS checksum
       |FROM f GROUP BY band, day, ty, tx
       |ORDER BY band, "tIdx", ty, tx""".stripMargin

  /** Cross-CONTAINER checks via the same landed planes: the netCDF and
    * zarr loads must reproduce the GRB-derived expectations, so a
    * decode bug in either container reddens its row. netCDF is the
    * mosaic expectation verbatim (same scenes, int16 storage). Zarr's
    * `ovr` rows check that the store's `red.ovr2`/`red.ovr4` sidecar
    * variables carry the same decimation pyramid as the GRB `.ovrN`
    * files: a 40 m read must pick `red.ovr4` and paste it directly, so
    * every fused overview pixel equals base(4P) under the solar-day
    * first-valid rule — the identical expectation the GRB
    * `raster_load_overview` oracle computes, now re-proven through the
    * zarr chunk decoder. */
  private val loadNetcdfDuckSql: String = loadMosaicDuckSql

  private val loadZarrDuckSql: String =
    s"""WITH nat AS (
       |  SELECT tidx, gy, gx, value
       |  FROM read_parquet('$OverviewNativePath/*.parquet')
       |  WHERE NOT isnan(value)),
       |base AS (
       |  SELECT 'base' AS res, band, tidx AS day, ty, tx,
       |         CAST(MAX(px) + 1 AS INT) AS width,
       |         CAST(MAX(py) + 1 AS INT) AS height,
       |         CAST(SUM(CASE WHEN value <> 0 THEN 1 ELSE 0 END) AS INT)
       |           AS validCount,
       |         ROUND(SUM(value), 2) AS checksum
       |  FROM read_parquet('$CellsPath/*.parquet')
       |  GROUP BY band, tidx, ty, tx),
       |dom AS (
       |  SELECT DISTINCT band, tidx // 2 AS day, ty, tx, py, px,
       |         4 * (ty * 64 + py) AS sgy, 4 * (tx * 64 + px) AS sgx
       |  FROM read_parquet('$OverviewCellsPath/*.parquet')
       |  WHERE lvl = 4),
       |f AS (
       |  SELECT d.band, d.day, d.ty, d.tx, d.py, d.px,
       |         COALESCE(n0.value, n1.value, 0) AS fused
       |  FROM dom d
       |  LEFT JOIN nat n0 ON n0.tidx = d.day * 2
       |                  AND n0.gy = d.sgy AND n0.gx = d.sgx
       |  LEFT JOIN nat n1 ON n1.tidx = d.day * 2 + 1
       |                  AND n1.gy = d.sgy AND n1.gx = d.sgx),
       |ovr AS (
       |  SELECT 'ovr' AS res, band, day, ty, tx,
       |         CAST(MAX(px) + 1 AS INT) AS width,
       |         CAST(MAX(py) + 1 AS INT) AS height,
       |         CAST(SUM(CASE WHEN fused <> 0 THEN 1 ELSE 0 END) AS INT)
       |           AS validCount,
       |         ROUND(SUM(fused), 2) AS checksum
       |  FROM f GROUP BY band, day, ty, tx)
       |SELECT res, band, day AS "tIdx", ty, tx, width, height,
       |       validCount, checksum
       |FROM (SELECT * FROM base UNION ALL SELECT * FROM ovr)
       |ORDER BY res, band, "tIdx", ty, tx""".stripMargin

  /** Summary oracles re-derived from landed planes, round 2 — the
    * remaining eager-load summaries graduate from rows-only to
    * hash-checked. `raster_load_reproject` re-aggregates the warped
    * planes `reprojectCells` lands (same three cross-CRS loads, so the
    * summary and the cells anchor must agree on every fused pixel).
    * The composite summaries re-derive per-pixel mean/max/median from
    * the per-item time planes (`CompositeCellsPath`) with DuckDB's own
    * AVG/MAX/median — an independent recomputation of the custom
    * `Composite` Aggregator, not a re-add of its output.
    * `raster_load_tiff`'s three container layouts all re-derive from
    * the GRB mosaic plane (`CellsPath`): per-band-files and named
    * subdatasets must reproduce it verbatim, and the packed 3-band
    * asset's planes are the fixture's algebraic shifts of red
    * (`Fixtures.bandPixels`: +{0,10000,20000} on valid pixels), so
    * `checksum = red + shift·validCount` — a band-addressing bug
    * (plane 1 read as plane 3) misses the shift and reddens the row. */
  private val loadReprojectDuckSql: String =
    s"""SELECT crs, band, tidx AS "tIdx", ty, tx,
       |       CAST(MAX(px) + 1 AS INT) AS width,
       |       CAST(MAX(py) + 1 AS INT) AS height,
       |       CAST(SUM(CASE WHEN value <> 0 THEN 1 ELSE 0 END) AS INT)
       |         AS validCount,
       |       ROUND(SUM(value), 2) AS checksum
       |FROM read_parquet('$ReprojectCellsPath/*.parquet')
       |GROUP BY crs, band, tidx, ty, tx
       |ORDER BY crs, band, "tIdx", ty, tx""".stripMargin

  private val compositeMeanDuckSql: String =
    s"""WITH px AS (
       |  SELECT band, ty, tx, py, px, value
       |  FROM read_parquet('$CompositeCellsPath/*.parquet')
       |  WHERE NOT isnan(value)),
       |m AS (
       |  SELECT band, ty, tx, py, px, AVG(value) AS mean,
       |         MAX(value) AS vmax, COUNT(*) AS c
       |  FROM px GROUP BY band, ty, tx, py, px)
       |SELECT band, ty, tx, ROUND(SUM(mean), 2) AS mean_sum,
       |       CAST(SUM(c) AS INT) AS n_valid,
       |       ROUND(SUM(vmax), 2) AS max_sum
       |FROM m GROUP BY band, ty, tx
       |ORDER BY band, ty, tx""".stripMargin

  private val compositeMedianDuckSql: String =
    s"""WITH px AS (
       |  SELECT band, ty, tx, py, px, value
       |  FROM read_parquet('$CompositeCellsPath/*.parquet')
       |  WHERE NOT isnan(value)),
       |m AS (
       |  SELECT band, ty, tx, py, px, median(value) AS med, COUNT(*) AS c
       |  FROM px GROUP BY band, ty, tx, py, px)
       |SELECT band, ty, tx, ROUND(SUM(med), 2) AS med_sum,
       |       CAST(SUM(c) AS INT) AS n_valid
       |FROM m GROUP BY band, ty, tx
       |ORDER BY band, ty, tx""".stripMargin

  private val loadTiffDuckSql: String =
    s"""WITH c AS (
       |  SELECT band, tidx, ty, tx,
       |         CAST(MAX(px) + 1 AS INT) AS width,
       |         CAST(MAX(py) + 1 AS INT) AS height,
       |         CAST(SUM(CASE WHEN value <> 0 THEN 1 ELSE 0 END) AS INT)
       |           AS validCount,
       |         SUM(value) AS cs
       |  FROM read_parquet('$CellsPath/*.parquet')
       |  GROUP BY band, tidx, ty, tx),
       |shifted AS (
       |  SELECT s.band, c.tidx, c.ty, c.tx, c.width, c.height,
       |         c.validCount, c.cs + s.shift * c.validCount AS cs
       |  FROM c, (VALUES ('red', 0), ('green', 10000), ('nir', 20000))
       |            AS s(band, shift)
       |  WHERE c.band = 'red'),
       |rows_ AS (
       |  SELECT 'per_band_files' AS layout, * FROM c
       |  UNION ALL SELECT 'subdatasets', * FROM c
       |  UNION ALL SELECT 'packed_bands', * FROM shifted)
       |SELECT layout, band, tidx AS "tIdx", ty, tx, width, height,
       |       validCount, ROUND(cs, 2) AS checksum
       |FROM rows_
       |ORDER BY layout, band, "tIdx", ty, tx""".stripMargin

  /** Oracles for the DSv2 SQL sources and the export/roundtrip sinks,
    * all re-derived from landed planes. The source-SQL queries scan raw
    * scene files per-pixel through `spark.read.format(...)`; DuckDB
    * recomputes the same windowed stats from the per-item native planes
    * (`OverviewNativePath`, red band, global grid coords — scene k's
    * local x is `gx - 64k` because consecutive scenes step east by half
    * a 128-px scene), then shifts for the other bands via the fixture
    * algebra (`nir = red + 5000`, msi band 2 = green = red + 10000 on
    * valid pixels). The export oracles re-aggregate the fused mosaic
    * plane (`CellsPath`): COG export writes one file per (band, time,
    * ty, tx) tile and zarr one `band_t{t}` variable with one chunk per
    * tile, so tile/chunk counts are DISTINCT tile keys and
    * valid/total are the plane's sums — a lossy codec, a broken shift
    * origin, or a dropped chunk reddens the row. The tiles-roundtrip
    * summary must reproduce the mosaic summary verbatim (parquet
    * persistence is exact), hence it shares `loadMosaicDuckSql`. */
  private val grbSourceDuckSql: String =
    s"""WITH reg AS (
       |  SELECT tidx, value
       |  FROM read_parquet('$OverviewNativePath/*.parquet')
       |  WHERE NOT isnan(value) AND gx - 64 * tidx < 48 AND gy >= 8),
       |per AS (
       |  SELECT tidx, COUNT(*) AS n, AVG(value) AS m, SUM(value) AS t
       |  FROM reg GROUP BY tidx)
       |SELECT 'scene' || tidx || '-' || b.band || '.grb' AS uri,
       |       n AS n_valid,
       |       ROUND(m + b.shift, 2) AS mean,
       |       ROUND(t + b.shift * n, 2) AS total
       |FROM per, (VALUES ('red', 0), ('nir', 5000)) AS b(band, shift)
       |ORDER BY uri""".stripMargin

  private val gtiffSourceDuckSql: String =
    s"""WITH reg AS (
       |  SELECT tidx, value
       |  FROM read_parquet('$OverviewNativePath/*.parquet')
       |  WHERE NOT isnan(value) AND gx - 64 * tidx < 48 AND gy >= 8),
       |per AS (
       |  SELECT tidx, COUNT(*) AS n, AVG(value) AS m, SUM(value) AS t
       |  FROM reg GROUP BY tidx)
       |SELECT 'scene' || tidx || '-msi.tif' AS uri, 2 AS band,
       |       n AS n_valid,
       |       ROUND(m + 10000, 2) AS mean,
       |       ROUND(t + 10000 * n, 2) AS total
       |FROM per ORDER BY uri""".stripMargin

  private val anySourceDuckSql: String =
    s"""WITH reg AS (
       |  SELECT value
       |  FROM read_parquet('$OverviewNativePath/*.parquet')
       |  WHERE NOT isnan(value) AND tidx = 0 AND gx < 96 AND gy >= 8),
       |per AS (
       |  SELECT COUNT(*) AS n, AVG(value) AS m, SUM(value) AS t FROM reg)
       |SELECT b.uri, n AS n_valid,
       |       ROUND(m + b.shift, 2) AS mean,
       |       ROUND(t + b.shift * n, 2) AS total
       |FROM per, (VALUES ('scene0-red.grb', 0), ('scene0-red.tif', 0),
       |                  ('scene0.nc#red', 0), ('scene0.nc#nir', 5000),
       |                  ('scene0.zarr#red', 0), ('scene0.zarr#nir', 5000))
       |            AS b(uri, shift)
       |ORDER BY uri""".stripMargin

  private val cogExportDuckSql: String =
    s"""SELECT band, COUNT(DISTINCT (tidx, ty, tx)) AS n_tiles,
       |       CAST(SUM(CASE WHEN value <> 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_valid,
       |       ROUND(SUM(value), 2) AS total
       |FROM read_parquet('$CellsPath/*.parquet')
       |GROUP BY band ORDER BY band""".stripMargin

  private val zarrExportDuckSql: String =
    s"""SELECT band || '_t' || tidx AS variable,
       |       CAST(COUNT(DISTINCT (ty, tx)) AS INT) AS n_chunks,
       |       CAST(SUM(CASE WHEN value <> 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_valid,
       |       ROUND(SUM(value), 2) AS total
       |FROM read_parquet('$CellsPath/*.parquet')
       |GROUP BY band, tidx ORDER BY variable""".stripMargin

  /** `raster_tyx_bins` oracle: the P4 spatial binning (footprint ×
    * tile-grid intersection, driver-side planning) must agree with
    * where the per-item pixel planes ACTUALLY landed — the distinct
    * (item, ty, tx) keys of `CompositeCellsPath` (groupby=id, so tidx
    * is the item index; planes include nodata-as-NaN pixels, i.e. the
    * full task footprint). Solar-day index is the fixture's `tidx // 2`
    * (two scenes per day). A binning bug that plans a task for a
    * non-intersecting tile, or misses an intersecting one, breaks the
    * domain equality. */
  private val tyxBinsDuckSql: String =
    s"""WITH d AS (
       |  SELECT DISTINCT tidx, ty, tx
       |  FROM read_parquet('$CompositeCellsPath/*.parquet'))
       |SELECT tidx // 2 AS "tIdx", ty, tx, COUNT(*) AS n_items,
       |       string_agg(tidx::VARCHAR, ',' ORDER BY tidx) AS item_list
       |FROM d GROUP BY tidx // 2, ty, tx
       |ORDER BY "tIdx", ty, tx""".stripMargin

  /** Shared path for the zonal-stats oracle: zone ring edges land as a
    * tiny parquet table so DuckDB can run the SAME even-odd ray cast. */
  private val ZoneEdgesPath =
    s"${sys.props("java.io.tmpdir")}/graft_zone_edges_parquet"

  /** Zonal statistics (graft.load.Zonal — beyond the reference): three
    * zones over the demo mosaic — an axis-aligned rectangle, a triangle
    * (non-trivial ray-cast geometry), and a rectangle with a hole
    * (even-odd rule) — aggregated per band and solar day. The oracle
    * recomputes zone membership from the landed mosaic plane
    * (`CellsPath`) and the landed zone edges with the identical ray
    * cast (`(y1 > py) != (y2 > py) AND px < (x2-x1)(py-y1)/(y2-y1)+x1`,
    * odd crossing count = inside), then re-aggregates — so the
    * distributed tile-partial pipeline is checked against a flat
    * per-pixel recomputation in another engine. Zone vertices sit on
    * 10 m grid lines while pixel centers sit at 5 m offsets, so no
    * center lies exactly on an edge and the decision is tie-free. */
  def zonalStats(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    val crs = res.geobox.crs
    val zones = Seq(
      "rect" -> Geom(IndexedSeq(
        (500200.0, 7999600.0), (500800.0, 7999600.0),
        (500800.0, 7999900.0), (500200.0, 7999900.0)), crs),
      "tri" -> Geom(IndexedSeq(
        (501000.0, 7999950.0), (502000.0, 7999950.0),
        (501500.0, 7999200.0)), crs),
      "holed" -> Geom(IndexedSeq(graft.geo.Poly(
        IndexedSeq((502000.0, 7999200.0), (502800.0, 7999200.0),
          (502800.0, 7999800.0), (502000.0, 7999800.0)),
        IndexedSeq(IndexedSeq((502300.0, 7999400.0), (502500.0, 7999400.0),
          (502500.0, 7999600.0), (502300.0, 7999600.0))))), crs))
    zones.flatMap { case (zid, g) =>
      g.parts.flatMap(_.rings).flatMap { r =>
        r.indices.map { i =>
          val (x1, y1) = r(i)
          val (x2, y2) = r((i + 1) % r.length)
          (zid, x1, y1, x2, y2)
        }
      }
    }.toDF("zone", "x1", "y1", "x2", "y2")
      .coalesce(1).write.mode("overwrite").parquet(ZoneEdgesPath)
    graft.load.Zonal.zonalStats(spark, res.tiles, res.geobox, zones)
      .orderBy("zone", "band", "tIdx")
  }

  private val zonalStatsDuckSql: String =
    s"""WITH e AS (
       |  SELECT zone, x1, y1, x2, y2
       |  FROM read_parquet('$ZoneEdgesPath/*.parquet')),
       |p AS (
       |  SELECT band, tidx, value,
       |         500000 + (tx * 64 + px + 0.5) * 10 AS cx,
       |         8000000 - (ty * 64 + py + 0.5) * 10 AS cy
       |  FROM read_parquet('$CellsPath/*.parquet')
       |  WHERE value <> 0),
       |hit AS (
       |  SELECT e.zone, p.band, p.tidx, p.cx, p.cy, MIN(p.value) AS value,
       |         SUM(CASE WHEN (e.y1 > p.cy) <> (e.y2 > p.cy)
       |                   AND p.cx < (e.x2 - e.x1) * (p.cy - e.y1)
       |                              / (e.y2 - e.y1) + e.x1
       |              THEN 1 ELSE 0 END) AS cr
       |  FROM p CROSS JOIN e
       |  GROUP BY e.zone, p.band, p.tidx, p.cx, p.cy)
       |SELECT zone, band, tidx AS "tIdx",
       |       COUNT(*) AS n_valid, ROUND(SUM(value), 2) AS total,
       |       ROUND(MIN(value), 2) AS vmin, ROUND(MAX(value), 2) AS vmax
       |FROM hit WHERE cr % 2 = 1
       |GROUP BY zone, band, tidx
       |ORDER BY zone, band, "tIdx"""".stripMargin

  /** Shared path for the gap-fill oracle's input planes. */
  private val GapCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_gap_cells_parquet"

  /** Temporal gap-fill (graft.load.TemporalFill — beyond the
    * reference): three same-footprint scenes on consecutive days, the
    * middle one holed with a 32×32 nodata square, loaded per-item and
    * gap-filled along time. The per-time input planes land WITH their
    * epoch seconds and DuckDB replays the whole fill rule — interior
    * gaps by time-weighted linear interpolation between the
    * IGNORE-NULLS window neighbors, edges by nearest-valid carry —
    * then re-aggregates the filled planes. The hole pixels are valid
    * at t0/t2 with a uniform step, so their fill is exactly
    * `base + 100` (the t1 ramp value): interpolation correctness is
    * visible in the checksum, not just the fill count. */
  def temporalFill(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val jsons = Fixtures.writeScenesGap(3)
    val (ds, schemas) = StacParse.parseItems(spark, spark.createDataset(jsons))
    val items = ds.collect().toSeq.sortBy(_.id)
    val res = Load.load(spark, items, schemas, bands = Seq("red"),
      groupby = "id", chunks = 64, dtype = Some("float64"))
    val decode = udf { (data: Array[Byte], dtype: String) =>
      Fuse.decode(data, dtype) }
    res.tiles
      .select(col("band"), col("tIdx"), col("ty"), col("tx"), col("width"),
        col("nodata"), unix_timestamp(col("time")).as("tsec"),
        posexplode(decode(col("data"), col("dtype"))))
      .select(col("band"), col("tIdx").as("tidx"), col("tsec"), col("ty"),
        col("tx"),
        (col("pos") / col("width")).cast("int").as("py"),
        (col("pos") % col("width")).cast("int").as("px"),
        when(isnan(col("col")) || col("col") === col("nodata"),
          lit(Double.NaN)).otherwise(col("col")).as("value"))
      .write.mode("overwrite").parquet(GapCellsPath)
    graft.load.TemporalFill.fillAcrossTime(spark, res.tiles)
      .select(col("band"), col("tIdx"), col("ty"), col("tx"),
        col("n_filled"),
        expr("aggregate(filled, 0L, (s, v) -> s + " +
          "if(isnan(v), 0L, CAST(round(v * 100) AS BIGINT)))").as("fill_q"),
        expr("aggregate(filled, 0, (s, v) -> s + if(isnan(v), 0, 1))")
          .as("n_data"))
      .orderBy("band", "tIdx", "ty", "tx")
  }

  private val temporalFillDuckSql: String =
    s"""WITH w AS (
       |  SELECT band, tidx, ty, tx, py, px, tsec, value,
       |         last_value(CASE WHEN NOT isnan(value) THEN value END
       |             IGNORE NULLS) OVER wp AS pv,
       |         last_value(CASE WHEN NOT isnan(value) THEN tsec END
       |             IGNORE NULLS) OVER wp AS pt,
       |         first_value(CASE WHEN NOT isnan(value) THEN value END
       |             IGNORE NULLS) OVER wn AS nv,
       |         first_value(CASE WHEN NOT isnan(value) THEN tsec END
       |             IGNORE NULLS) OVER wn AS nt
       |  FROM read_parquet('$GapCellsPath/*.parquet')
       |  WINDOW
       |    wp AS (PARTITION BY band, ty, tx, py, px ORDER BY tsec
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |    wn AS (PARTITION BY band, ty, tx, py, px ORDER BY tsec
       |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
       |f AS (
       |  SELECT band, tidx, ty, tx,
       |         CASE WHEN NOT isnan(value) THEN value
       |              WHEN pv IS NOT NULL AND nv IS NOT NULL
       |                THEN pv + (nv - pv) * (tsec - pt) / (nt - pt)
       |              WHEN pv IS NOT NULL THEN pv
       |              WHEN nv IS NOT NULL THEN nv
       |              ELSE NULL END AS fv,
       |         CASE WHEN isnan(value)
       |               AND (pv IS NOT NULL OR nv IS NOT NULL)
       |              THEN 1 ELSE 0 END AS isf
       |  FROM w)
       |SELECT band, tidx AS "tIdx", ty, tx,
       |       CAST(SUM(isf) AS INT) AS n_filled,
       |       CAST(SUM(COALESCE(CAST(ROUND(fv * 100) AS BIGINT), 0))
       |            AS BIGINT) AS fill_q,
       |       CAST(COUNT(fv) AS INT) AS n_data
       |FROM f GROUP BY band, tidx, ty, tx
       |ORDER BY band, "tIdx", ty, tx""".stripMargin

  /** NDVI band math (graft.load.BandMath — beyond the reference): the
    * fused red/nir mosaic planes combine per pixel as (nir−red)/
    * (nir+red) through a codegen'd `zip_with` (no UDF in the
    * arithmetic). DuckDB recomputes the index by JOINING the landed
    * red and nir planes (`CellsPath`) on pixel position — same single
    * IEEE division, so the ×1e6 quantization is bit-agreeing. */
  def bandMathNdvi(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    graft.load.BandMath
      .normalizedDifference(spark, res.tiles, "nir", "red", "ndvi")
      .select(col("band"), col("tIdx"), col("ty"), col("tx"), col("n_valid"),
        expr("aggregate(values, 0L, (s, v) -> s + " +
          "if(isnan(v), 0L, CAST(round(v * 1e6) AS BIGINT)))").as("ndvi_q"))
      .orderBy("band", "tIdx", "ty", "tx")
  }

  private val bandMathNdviDuckSql: String =
    s"""WITH r AS (
       |  SELECT tidx, ty, tx, py, px, value
       |  FROM read_parquet('$CellsPath/*.parquet') WHERE band = 'red'),
       |n AS (
       |  SELECT tidx, ty, tx, py, px, value
       |  FROM read_parquet('$CellsPath/*.parquet') WHERE band = 'nir'),
       |j AS (
       |  SELECT r.tidx, r.ty, r.tx,
       |         CASE WHEN r.value <> 0 AND n.value <> 0
       |              THEN (n.value - r.value) / (n.value + r.value)
       |              END AS v
       |  FROM r JOIN n USING (tidx, ty, tx, py, px))
       |SELECT 'ndvi' AS band, tidx AS "tIdx", ty, tx,
       |       CAST(COUNT(v) AS BIGINT) AS n_valid,
       |       CAST(SUM(COALESCE(CAST(ROUND(v * 1e6) AS BIGINT), 0))
       |            AS BIGINT) AS ndvi_q
       |FROM j GROUP BY tidx, ty, tx
       |ORDER BY band, "tIdx", ty, tx""".stripMargin

  /** Focal 3×3 mean (graft.load.Focal — halo-exchange stencil): windows
    * crossing tile boundaries are the whole point, so the oracle must
    * not respect tiles: DuckDB recomputes every pixel's windowed mean
    * GLOBALLY from the landed mosaic plane (9 shifted copies of the
    * valid pixels, equi-joined back onto the full pixel domain), then
    * re-aggregates per tile. A wrong or missing halo strip shifts every
    * boundary pixel's mean and breaks the checksum. */
  def focalMean(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    graft.load.Focal.focalMean(spark, res.tiles, radius = 1)
      .select(col("band"), col("tIdx"), col("ty"), col("tx"), col("n_valid"),
        expr("aggregate(focal, 0L, (s, v) -> s + " +
          "if(isnan(v), 0L, CAST(round(v * 100) AS BIGINT)))").as("focal_q"))
      .orderBy("band", "tIdx", "ty", "tx")
  }

  /** Same focal mean through [[graft.load.Focal.focalMeanStanding]] —
    * the strips-only exchange over a standing (pre-clustered) tile
    * layout. Shares [[focalMeanDuckSql]]: identical results are the
    * contract; `FocalSpec` pins the plan shape (one plane exchange —
    * the standing repartition itself — with the strip re-key the only
    * operator-added shuffle). */
  def focalMeanStanding(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    val standing = res.tiles.repartition(
      col("band"), col("tIdx"), col("ty"), col("tx"))
    graft.load.Focal.focalMeanStanding(spark, standing, radius = 1)
      .select(col("band"), col("tIdx"), col("ty"), col("tx"), col("n_valid"),
        expr("aggregate(focal, 0L, (s, v) -> s + " +
          "if(isnan(v), 0L, CAST(round(v * 100) AS BIGINT)))").as("focal_q"))
      .orderBy("band", "tIdx", "ty", "tx")
  }

  private val focalMeanDuckSql: String =
    s"""WITH dom AS (
       |  SELECT band, tidx, ty, tx,
       |         ty * 64 + py AS gy, tx * 64 + px AS gx
       |  FROM read_parquet('$CellsPath/*.parquet')),
       |v AS (
       |  SELECT band, tidx, ty * 64 + py AS gy, tx * 64 + px AS gx, value
       |  FROM read_parquet('$CellsPath/*.parquet') WHERE value <> 0),
       |vs AS (
       |  SELECT band, tidx, gy + o.dy AS gy, gx + o.dx AS gx, value
       |  FROM v CROSS JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
       |                            (0,1),(1,-1),(1,0),(1,1)) o(dy, dx)),
       |f AS (
       |  SELECT d.band, d.tidx, d.ty, d.tx, d.gy, d.gx,
       |         AVG(s.value) AS fv, COUNT(s.value) AS c
       |  FROM dom d LEFT JOIN vs s
       |    ON s.band = d.band AND s.tidx = d.tidx
       |   AND s.gy = d.gy AND s.gx = d.gx
       |  GROUP BY d.band, d.tidx, d.ty, d.tx, d.gy, d.gx)
       |SELECT band, tidx AS "tIdx", ty, tx,
       |       CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_valid,
       |       CAST(SUM(CASE WHEN c > 0
       |                THEN CAST(ROUND(fv * 100) AS BIGINT) ELSE 0 END)
       |            AS BIGINT) AS focal_q
       |FROM f GROUP BY band, tidx, ty, tx
       |ORDER BY band, "tIdx", ty, tx""".stripMargin

  /** Point drill (graft.load.Drill — beyond the reference): sample the
    * fused mosaic at world-coordinate points. The fixture points tell
    * three stories — a plainly valid pixel, a pixel valid on one solar
    * day and fused-nodata on the other (the drill returns NaN, not a
    * dropped row), and a point outside every tile (no rows at all).
    * DuckDB re-samples the landed mosaic plane at the same global pixel
    * coords (floor((x−x0)/res) on both sides). */
  def drillPoints(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    val points = Seq(
      ("p_valid", 500234.7, 7999812.3),   // gx 23, gy 18 — valid day 0
      ("p_margin", 501700.0, 7999500.0),  // gx 170 — day-0 fused nodata,
                                          // day-1 scene2 value
      ("p_edge", 501507.2, 7999045.8),    // gy 95 — last row of the grid
      ("p_outside", 499000.0, 7999500.0)) // west of every scene: no rows
    graft.load.Drill.drill(spark, res.tiles, res.geobox, points)
      .orderBy("point_id", "band", "tIdx")
  }

  private val drillPointsDuckSql: String =
    s"""WITH pts(pid, gx, gy) AS (
       |  VALUES ('p_valid', 23, 18), ('p_margin', 170, 50),
       |         ('p_edge', 150, 95)),
       |c AS (SELECT * FROM read_parquet('$CellsPath/*.parquet'))
       |SELECT p.pid AS point_id, c.band, c.tidx AS "tIdx",
       |       CASE WHEN c.value <> 0 THEN c.value
       |            ELSE CAST('NaN' AS DOUBLE) END AS value
       |FROM pts p JOIN c
       |  ON c.ty = p.gy // 64 AND c.tx = p.gx // 64
       | AND c.py = p.gy % 64 AND c.px = p.gx % 64
       |ORDER BY point_id, band, "tIdx"""".stripMargin

  /** Change detection day 0 → day 1 (BandMath.changeAcrossTime): the
    * overlap columns of the marching scenes are the ground both days
    * saw; every such pixel steps by exactly the fixture's inter-scene
    * offset, which the checksum verifies. DuckDB recomputes the change
    * plane by joining the landed mosaic's two time slices per pixel. */
  def changeDetect(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    graft.load.BandMath.changeAcrossTime(spark, res.tiles, 0, 1)()
      .select(col("band"), col("ty"), col("tx"), col("n_both"),
        expr("aggregate(change, 0L, (s, v) -> s + " +
          "if(isnan(v), 0L, CAST(round(v * 100) AS BIGINT)))").as("diff_q"),
        expr("aggregate(change, 0L, (s, v) -> s + " +
          "if(isnan(v) OR v = 0D, 0L, 1L))").as("n_changed"))
      .orderBy("band", "ty", "tx")
  }

  private val changeDetectDuckSql: String =
    s"""WITH a AS (
       |  SELECT band, ty, tx, py, px, value
       |  FROM read_parquet('$CellsPath/*.parquet')
       |  WHERE tidx = 0 AND value <> 0),
       |b AS (
       |  SELECT band, ty, tx, py, px, value
       |  FROM read_parquet('$CellsPath/*.parquet')
       |  WHERE tidx = 1 AND value <> 0),
       |j AS (
       |  SELECT a.band, a.ty, a.tx, b.value - a.value AS d
       |  FROM a JOIN b USING (band, ty, tx, py, px))
       |SELECT band, ty, tx, CAST(COUNT(*) AS BIGINT) AS n_both,
       |       CAST(SUM(CAST(ROUND(d * 100) AS BIGINT)) AS BIGINT)
       |         AS diff_q,
       |       CAST(SUM(CASE WHEN d <> 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_changed
       |FROM j GROUP BY band, ty, tx
       |ORDER BY band, ty, tx""".stripMargin

  /** Distributed pyramid build (graft.load.Pyramid — beyond the
    * reference, which consumes overviews but delegates building them to
    * gdaladdo): levels 2 and 4 of the fused mosaic, decimated locally
    * per base tile and assembled on the level grid in one shuffle.
    * DuckDB recomputes both levels from the landed base plane via the
    * decimation identity (level-s pixel = base(s·gy, s·gx)) — the same
    * identity `raster_overview_cells` pins on the READ side, now
    * re-proven for the build side. */
  def pyramidBuild(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    Seq(2, 4).map { s =>
      graft.load.Pyramid.buildLevel(spark, res.tiles, s)
        .withColumn("level", lit(s))
    }.reduce(_ unionAll _)
      .select(col("level"), col("band"), col("tIdx"), col("ty"), col("tx"),
        col("n_valid"),
        expr("aggregate(plane, 0L, (s, v) -> s + " +
          "if(isnan(v), 0L, CAST(round(v * 100) AS BIGINT)))").as("sum_q"))
      .orderBy("level", "band", "tIdx", "ty", "tx")
  }

  private val pyramidBuildDuckSql: String =
    s"""WITH base AS (
       |  SELECT band, tidx, ty * 64 + py AS gy, tx * 64 + px AS gx, value
       |  FROM read_parquet('$CellsPath/*.parquet')),
       |lv AS (
       |  SELECT l.s, b.band, b.tidx,
       |         (b.gy // l.s) // 64 AS ty, (b.gx // l.s) // 64 AS tx,
       |         b.value
       |  FROM base b JOIN (VALUES (2), (4)) l(s)
       |    ON b.gy % l.s = 0 AND b.gx % l.s = 0)
       |SELECT s AS level, band, tidx AS "tIdx", ty, tx,
       |       CAST(SUM(CASE WHEN value <> 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_valid,
       |       CAST(SUM(CASE WHEN value <> 0
       |                THEN CAST(ROUND(value * 100) AS BIGINT)
       |                ELSE 0 END) AS BIGINT) AS sum_q
       |FROM lv GROUP BY s, band, tidx, ty, tx
       |ORDER BY level, band, "tIdx", ty, tx""".stripMargin

  /** Shared path for the masked-composite oracle's input planes. */
  private val MaskCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_mask_cells_parquet"

  /** Cloud-masked median composite
    * (Composite.maskedMedianAcrossTime — beyond the reference): three
    * same-footprint days with a `qa` band; the middle day's qa flags a
    * cloud square whose red stays VALID, and the per-day value steps
    * are non-uniform, so excluding the cloudy observation changes the
    * median value, not just the count. Both bands' per-time planes land
    * and DuckDB recomputes the masked median (join red to qa per
    * (time, pixel), keep qa = 1, `median` per pixel). */
  def maskedComposite(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val jsons = Fixtures.writeScenesQa(3)
    val (ds, schemas) = StacParse.parseItems(spark, spark.createDataset(jsons))
    val items = ds.collect().toSeq.sortBy(_.id)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "qa"),
      groupby = "id", chunks = 64)
    val decode = udf { (data: Array[Byte], dtype: String) =>
      Fuse.decode(data, dtype) }
    res.tiles
      .select(col("band"), col("tIdx"), col("ty"), col("tx"), col("width"),
        col("nodata"), posexplode(decode(col("data"), col("dtype"))))
      .select(col("band"), col("tIdx").as("tidx"), col("ty"), col("tx"),
        (col("pos") / col("width")).cast("int").as("py"),
        (col("pos") % col("width")).cast("int").as("px"),
        when(isnan(col("col")) || col("col") === col("nodata"),
          lit(Double.NaN)).otherwise(col("col")).as("value"))
      .write.mode("overwrite").parquet(MaskCellsPath)
    graft.load.Composite
      .maskedMedianAcrossTime(spark, res.tiles, "red", "qa", _ == 1.0)
      .select(col("band"), col("ty"), col("tx"),
        expr("aggregate(median, 0L, (s, v) -> s + " +
          "if(isnan(v), 0L, CAST(round(v * 100) AS BIGINT)))").as("med_q"),
        expr("CAST(aggregate(count, 0, (s, v) -> s + v) AS BIGINT)")
          .as("n_used"))
      .orderBy("band", "ty", "tx")
  }

  private val maskedCompositeDuckSql: String =
    s"""WITH r AS (
       |  SELECT tidx, ty, tx, py, px, value
       |  FROM read_parquet('$MaskCellsPath/*.parquet')
       |  WHERE band = 'red' AND NOT isnan(value)),
       |q AS (
       |  -- NaN (mask nodata) rows KEPT: NaN = 1 is false, so a nodata
       |  -- mask pixel masks OUT (matches the operator); only a truly
       |  -- ABSENT mask plane falls to the COALESCE keep-branch
       |  SELECT tidx, ty, tx, py, px, value AS qa
       |  FROM read_parquet('$MaskCellsPath/*.parquet')
       |  WHERE band = 'qa'),
       |clear AS (
       |  SELECT r.* FROM r
       |  LEFT JOIN q USING (tidx, ty, tx, py, px)
       |  WHERE COALESCE(q.qa = 1, TRUE)),
       |m AS (
       |  SELECT ty, tx, py, px, median(value) AS med, COUNT(*) AS c
       |  FROM clear GROUP BY ty, tx, py, px)
       |SELECT 'red' AS band, ty, tx,
       |       CAST(SUM(CAST(ROUND(med * 100) AS BIGINT)) AS BIGINT)
       |         AS med_q,
       |       CAST(SUM(c) AS BIGINT) AS n_used
       |FROM m GROUP BY ty, tx
       |ORDER BY band, ty, tx""".stripMargin

  /** Per-band/day equi-width histogram of the fused mosaic (the
    * `gdalinfo -hist` analog, distributed): a purely declarative plan —
    * decode+posexplode is narrow, and the groupBy's hash aggregate
    * computes map-side partials, so the shuffle carries only
    * (band × time × 16 bins) partial counts, never pixels. DuckDB
    * re-bins the landed plane with the same floor arithmetic. */
  def histogram(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    val decode = udf { (data: Array[Byte], dtype: String) =>
      Fuse.decode(data, dtype) }
    res.tiles
      .select(col("band"), col("tIdx"), col("nodata"),
        posexplode(decode(col("data"), col("dtype"))))
      .where(!isnan(col("col")) && col("col") =!= col("nodata"))
      .select(col("band"), col("tIdx"),
        least(lit(15), floor(col("col") / 2000).cast("int")).as("bin"))
      .groupBy("band", "tIdx", "bin")
      .agg(count(lit(1)).as("n"))
      .orderBy("band", "tIdx", "bin")
  }

  private val histogramDuckSql: String =
    s"""SELECT band, tidx AS "tIdx",
       |       CAST(LEAST(15, CAST(FLOOR(value / 2000) AS INT)) AS INT)
       |         AS bin,
       |       COUNT(*) AS n
       |FROM read_parquet('$CellsPath/*.parquet')
       |WHERE value <> 0
       |GROUP BY band, tidx, bin
       |ORDER BY band, "tIdx", bin""".stripMargin

  /** Shared path for the rasterize oracle's zone edges. */
  private val RasterizeEdgesPath =
    s"${sys.props("java.io.tmpdir")}/graft_rasterize_edges_parquet"

  /** Rasterize (graft.load.Rasterize — beyond the reference): burn four
    * zones onto the mosaic grid — the zonal trio plus an overlay
    * rectangle that overlaps the triangle, so PAINTER'S ORDER (later
    * zones overwrite) is visible in the per-zone pixel counts, not just
    * membership. DuckDB regenerates the whole grid with `range`,
    * re-runs the identical even-odd ray cast from the landed edges, and
    * resolves overlaps with `arg_max(zone, paint_order)`. */
  /** The demo label zones (shared by rasterize and sample-drill). */
  private def demoZones(crs: graft.geo.Crs): Seq[(Int, Geom)] = Seq(
    1 -> Geom(IndexedSeq(
      (500200.0, 7999600.0), (500800.0, 7999600.0),
      (500800.0, 7999900.0), (500200.0, 7999900.0)), crs),
    2 -> Geom(IndexedSeq(
      (501000.0, 7999950.0), (502000.0, 7999950.0),
      (501500.0, 7999200.0)), crs),
    3 -> Geom(IndexedSeq(graft.geo.Poly(
      IndexedSeq((502000.0, 7999200.0), (502800.0, 7999200.0),
        (502800.0, 7999800.0), (502000.0, 7999800.0)),
      IndexedSeq(IndexedSeq((502300.0, 7999400.0), (502500.0, 7999400.0),
        (502500.0, 7999600.0), (502300.0, 7999600.0))))), crs),
    4 -> Geom(IndexedSeq(
      (501300.0, 7999500.0), (501600.0, 7999500.0),
      (501600.0, 7999700.0), (501300.0, 7999700.0)), crs))

  def rasterizeZones(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (items, schemas) = parsed(spark)
    val gbox = Planner.outputGeobox(items, schemas).get
    val zones = demoZones(gbox.crs)
    zones.zipWithIndex.flatMap { case ((zid, g), zidx) =>
      g.parts.flatMap(_.rings).flatMap { r =>
        r.indices.map { i =>
          val (x1, y1) = r(i)
          val (x2, y2) = r((i + 1) % r.length)
          (zidx, zid, x1, y1, x2, y2)
        }
      }
    }.toDF("zidx", "zone", "x1", "y1", "x2", "y2")
      .coalesce(1).write.mode("overwrite").parquet(RasterizeEdgesPath)
    graft.load.Rasterize.burn(spark, gbox, 64, zones)
      .select(col("ty"), col("tx"), posexplode(col("plane")))
      .where(col("col") =!= 0)
      .groupBy(col("ty"), col("tx"), col("col").as("zone"))
      .agg(count(lit(1)).as("n_px"))
      .orderBy("ty", "tx", "zone")
  }

  private val rasterizeDuckSql: String =
    s"""WITH px AS (
       |  SELECT r1.range AS gy, r2.range AS gx,
       |         500000 + (r2.range + 0.5) * 10 AS cx,
       |         8000000 - (r1.range + 0.5) * 10 AS cy
       |  FROM range(96) r1 CROSS JOIN range(320) r2),
       |e AS (
       |  SELECT zidx, zone, x1, y1, x2, y2
       |  FROM read_parquet('$RasterizeEdgesPath/*.parquet')),
       |hit AS (
       |  SELECT p.gy, p.gx, e.zidx, e.zone,
       |         SUM(CASE WHEN (e.y1 > p.cy) <> (e.y2 > p.cy)
       |                   AND p.cx < (e.x2 - e.x1) * (p.cy - e.y1)
       |                              / (e.y2 - e.y1) + e.x1
       |              THEN 1 ELSE 0 END) AS cr
       |  FROM px p CROSS JOIN e
       |  GROUP BY p.gy, p.gx, e.zidx, e.zone),
       |painted AS (
       |  SELECT gy, gx, arg_max(zone, zidx) AS zone
       |  FROM hit WHERE cr % 2 = 1 GROUP BY gy, gx)
       |SELECT CAST(gy // 64 AS INT) AS ty, CAST(gx // 64 AS INT) AS tx,
       |       CAST(zone AS INT) AS zone, COUNT(*) AS n_px
       |FROM painted GROUP BY ty, tx, zone
       |ORDER BY ty, tx, zone""".stripMargin

  /** The training-data loop closed end to end (beyond the reference):
    * rasterize the label zones → stratified deterministic sample of 20
    * locations per class (`Sampling.stratifiedLocations` — portable
    * md5(gy,gx) key, map-side hash-threshold prefilter, bounded exact
    * rank) → drill the mosaic at those locations. DuckDB replays every
    * stage: the ray-cast paint, the same md5 ranking, and the pixel
    * lookup against the landed mosaic plane — a divergence anywhere in
    * the chain (mask, sample set, OR values) reddens the row. */
  def sampleDrill(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    val gbox = res.geobox
    val labels = graft.load.Rasterize.burn(spark, gbox, 64,
      demoZones(gbox.crs))
    // ≤ 4 classes × 20 rows — a constant-bounded collect by construction
    val locs = graft.load.Sampling.stratifiedLocations(spark, labels, 20)
      .collect()
    val t = gbox.transform
    val points = locs.toSeq.map { r =>
      val (zone, gy, gx) = (r.getInt(0), r.getInt(1), r.getInt(2))
      val (wx, wy) = t(gx + 0.5, gy + 0.5)
      (s"z${zone}_${gy}_$gx", wx, wy)
    }
    graft.load.Drill.drill(spark, res.tiles, gbox, points)
      .orderBy("point_id", "band", "tIdx")
  }

  private val sampleDrillDuckSql: String =
    s"""WITH px AS (
       |  SELECT r1.range AS gy, r2.range AS gx,
       |         500000 + (r2.range + 0.5) * 10 AS cx,
       |         8000000 - (r1.range + 0.5) * 10 AS cy
       |  FROM range(96) r1 CROSS JOIN range(320) r2),
       |e AS (
       |  SELECT zidx, zone, x1, y1, x2, y2
       |  FROM read_parquet('$RasterizeEdgesPath/*.parquet')),
       |hit AS (
       |  SELECT p.gy, p.gx, e.zidx, e.zone,
       |         SUM(CASE WHEN (e.y1 > p.cy) <> (e.y2 > p.cy)
       |                   AND p.cx < (e.x2 - e.x1) * (p.cy - e.y1)
       |                              / (e.y2 - e.y1) + e.x1
       |              THEN 1 ELSE 0 END) AS cr
       |  FROM px p CROSS JOIN e
       |  GROUP BY p.gy, p.gx, e.zidx, e.zone),
       |painted AS (
       |  SELECT gy, gx, arg_max(zone, zidx) AS zone
       |  FROM hit WHERE cr % 2 = 1 GROUP BY gy, gx),
       |keyed AS (
       |  SELECT zone, gy, gx, md5(gy || ',' || gx) AS key
       |  FROM painted
       |  WHERE substr(md5(gy || ',' || gx), 1, 1) IN ('0','1','2','3')),
       |pts AS (
       |  SELECT zone, gy, gx FROM (
       |    SELECT zone, gy, gx,
       |           row_number() OVER (PARTITION BY zone ORDER BY key) AS rn
       |    FROM keyed) WHERE rn <= 20),
       |c AS (
       |  SELECT band, tidx, ty * 64 + py AS gy, tx * 64 + px AS gx, value
       |  FROM read_parquet('$CellsPath/*.parquet'))
       |SELECT 'z' || p.zone || '_' || p.gy || '_' || p.gx AS point_id,
       |       c.band, c.tidx AS "tIdx",
       |       CASE WHEN c.value <> 0 THEN c.value
       |            ELSE CAST('NaN' AS DOUBLE) END AS value
       |FROM pts p JOIN c ON c.gy = p.gy AND c.gx = p.gx
       |ORDER BY point_id, band, "tIdx"""".stripMargin

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

  private val streamZonalDuckSql: String =
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

  /** Bilinear point drill (Drill.drillBilinear): sub-pixel sampling at
    * world points. Three stories — a plainly interior point, a point
    * whose 2×2 tap window STRADDLES a tile boundary (the cross-tile
    * reassembly: each tile ships only the weighted taps it owns), and
    * a point whose taps are all fused-nodata on day 0 (no row) but
    * valid on day 1. DuckDB recomputes the same 4-tap weighted sum
    * from the landed mosaic plane with the same floor/fraction
    * arithmetic. */
  def drillBilinearPoints(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "solar_day", chunks = 64)
    val points = Seq(
      ("b_valid", 500234.7, 7999812.3), // px 23.47, py 18.77 — interior
      ("b_seam", 500642.0, 7999500.0),  // px 64.2 — taps straddle tx 0/1
      ("b_nodata", 501704.0, 7999500.0)) // px 170.4 — day-0 margin
    // the operator returns the exact interpolant; quantization to the
    // oracle's 2-dp convention is this harness's concern, not the API's
    graft.load.Drill.drillBilinear(spark, res.tiles, res.geobox, points)
      .withColumn("value", round(col("value"), 2))
      .orderBy("point_id", "band", "tIdx")
  }

  private val drillBilinearDuckSql: String =
    s"""WITH pts AS (
       |  SELECT pid, (x - 500000) / 10 AS pxf, (8000000 - y) / 10 AS pyf
       |  FROM (VALUES ('b_valid', 500234.7, 7999812.3),
       |               ('b_seam', 500642.0, 7999500.0),
       |               ('b_nodata', 501704.0, 7999500.0)) v(pid, x, y)),
       |g AS (
       |  SELECT pid, CAST(FLOOR(pxf - 0.5) AS INT) AS x0,
       |         CAST(FLOOR(pyf - 0.5) AS INT) AS y0,
       |         pxf - 0.5 - FLOOR(pxf - 0.5) AS fx,
       |         pyf - 0.5 - FLOOR(pyf - 0.5) AS fy
       |  FROM pts),
       |taps AS (
       |  SELECT g.pid, g.x0 + o.dx AS gx, g.y0 + o.dy AS gy,
       |         (CASE o.dx WHEN 0 THEN 1 - g.fx ELSE g.fx END) *
       |         (CASE o.dy WHEN 0 THEN 1 - g.fy ELSE g.fy END) AS w
       |  FROM g CROSS JOIN (VALUES (0, 0), (1, 0), (0, 1), (1, 1))
       |                      o(dx, dy)),
       |c AS (
       |  SELECT band, tidx, ty * 64 + py AS gy, tx * 64 + px AS gx, value
       |  FROM read_parquet('$CellsPath/*.parquet') WHERE value <> 0)
       |SELECT t.pid AS point_id, c.band, c.tidx AS "tIdx",
       |       CASE WHEN COUNT(*) = 4 THEN ROUND(SUM(t.w * c.value), 2)
       |            ELSE CAST('NaN' AS DOUBLE) END AS value
       |FROM taps t JOIN c ON c.gx = t.gx AND c.gy = t.gy
       |GROUP BY t.pid, c.band, c.tidx
       |ORDER BY point_id, band, "tIdx"""".stripMargin

  /** Across-time composite (custom Aggregator with map-side partials):
    * per-pixel mean/min/max/count over the per-item time planes. */
  def compositeMean(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "id", chunks = 64)
    graft.load.Composite.acrossTime(spark, res.tiles)
      .selectExpr("band", "ty", "tx",
        "round(aggregate(mean, 0D, (s, v) -> s + if(isnan(v), 0D, v)), 2) AS mean_sum",
        "aggregate(count, 0, (s, v) -> s + v) AS n_valid",
        "round(aggregate(max, 0D, (s, v) -> s + if(isnan(v), 0D, v)), 2) AS max_sum")
      .orderBy("band", "ty", "tx")
  }

  /** Median composite (per-pixel across-time median): the robust
    * geomedian-family statistic. One tile-row shuffle, per-group
    * selection over the bounded time depth — see
    * [[graft.load.Composite.medianAcrossTime]]. */
  /** Percentile composite (p25/p75 across time): per-pixel interpolated
    * quantiles quantized ×100 and summed per tile. DuckDB re-derives
    * from the per-time planes with its own `quantile_cont` — same
    * convention (position q·(m−1), linear interpolation), shared code
    * zero. Quartile interpolands of integer-valued fixtures are exact
    * binary fractions, so the ×100 quantization is tie-free. */
  def compositeQuantile(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "id", chunks = 64)
    Seq(0.25, 0.75).map { q =>
      graft.load.Composite.quantileAcrossTime(spark, res.tiles, q)
        .selectExpr(s"'p${(q * 100).toInt}' AS p", "band", "ty", "tx",
          "aggregate(quantile, 0L, (s, v) -> s + " +
            "if(isnan(v), 0L, CAST(round(v * 100) AS BIGINT))) AS q_sum",
          "CAST(aggregate(count, 0, (s, v) -> s + v) AS BIGINT) AS n_valid")
    }.reduce(_ unionAll _)
      .orderBy("p", "band", "ty", "tx")
  }

  private val compositeQuantileDuckSql: String =
    s"""WITH px AS (
       |  SELECT band, ty, tx, py, px, value
       |  FROM read_parquet('$CompositeCellsPath/*.parquet')
       |  WHERE NOT isnan(value)),
       |m AS (
       |  SELECT band, ty, tx, py, px,
       |         quantile_cont(value, 0.25) AS q25,
       |         quantile_cont(value, 0.75) AS q75,
       |         COUNT(*) AS c
       |  FROM px GROUP BY band, ty, tx, py, px),
       |t AS (
       |  SELECT band, ty, tx,
       |         CAST(SUM(CAST(ROUND(q25 * 100) AS BIGINT)) AS BIGINT)
       |           AS s25,
       |         CAST(SUM(CAST(ROUND(q75 * 100) AS BIGINT)) AS BIGINT)
       |           AS s75,
       |         CAST(SUM(c) AS BIGINT) AS n_valid
       |  FROM m GROUP BY band, ty, tx)
       |SELECT 'p25' AS p, band, ty, tx, s25 AS q_sum, n_valid FROM t
       |UNION ALL
       |SELECT 'p75', band, ty, tx, s75, n_valid FROM t
       |ORDER BY p, band, ty, tx""".stripMargin

  def compositeMedian(spark: SparkSession): DataFrame = {
    val (items, schemas) = parsed(spark)
    val res = Load.load(spark, items, schemas, bands = Seq("red", "nir"),
      groupby = "id", chunks = 64)
    graft.load.Composite.medianAcrossTime(spark, res.tiles)
      .selectExpr("band", "ty", "tx",
        "round(aggregate(median, 0D, (s, v) -> s + if(isnan(v), 0D, v)), 2) AS med_sum",
        "aggregate(count, 0, (s, v) -> s + v) AS n_valid")
      .orderBy("band", "ty", "tx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "raster_composite_mean" -> ((s, _) => compositeMean(s)),
    "raster_composite_median" -> ((s, _) => compositeMedian(s)),
    "raster_composite_quantile" -> ((s, _) => compositeQuantile(s)),
    "raster_tiles_roundtrip" -> ((s, _) => tilesRoundtrip(s)),
    "raster_eo3_product" -> ((s, _) => eo3Product(s)),
    "raster_grb_source_sql" -> ((s, _) => grbSourceSql(s)),
    "raster_gtiff_source_sql" -> ((s, _) => gtiffSourceSql(s)),
    "raster_any_source_sql" -> ((s, _) => anySourceSql(s)),
    "raster_cog_export" -> ((s, _) => cogExport(s)),
    "raster_zarr_export" -> ((s, _) => zarrExport(s)),
    "raster_load_mosaic" -> ((s, _) => loadMosaic(s)),
    "raster_mosaic_cells" -> ((s, _) => mosaicCells(s)),
    "raster_composite_cells" -> ((s, _) => compositeCells(s)),
    "raster_reproject_cells" -> ((s, _) => reprojectCells(s)),
    "raster_resample_cells" -> ((s, _) => resampleCells(s)),
    "raster_resample_conv" -> ((s, _) => resampleConv(s)),
    "raster_overview_cells" -> ((s, _) => overviewCells(s)),
    "stream_raster_ingest" -> ((s, _) => streamRasterIngest(s)),
    "raster_load_tiff" -> ((s, _) => loadTiff(s)),
    "raster_load_zarr" -> ((s, _) => loadZarr(s)),
    "raster_load_netcdf" -> ((s, _) => loadNetcdf(s)),
    "raster_load_resampling" -> ((s, _) => loadResampling(s)),
    "raster_load_groupby_id" -> ((s, _) => loadGroupById(s)),
    "raster_load_reproject" -> ((s, _) => loadReproject(s)),
    "raster_load_overview" -> ((s, _) => loadOverview(s)),
    "raster_parse_items" -> ((s, _) => parseItems(s)),
    "raster_stac_search" -> ((s, _) => stacSearchDump(s)),
    "raster_output_geobox" -> ((s, _) => outputGeoboxPlans(s)),
    "raster_tyx_bins" -> ((s, _) => tyxBins(s)),
    "raster_zonal_stats" -> ((s, _) => zonalStats(s)),
    "raster_temporal_fill" -> ((s, _) => temporalFill(s)),
    "raster_band_math" -> ((s, _) => bandMathNdvi(s)),
    "raster_focal_mean" -> ((s, _) => focalMean(s)),
    "raster_focal_standing" -> ((s, _) => focalMeanStanding(s)),
    "raster_drill" -> ((s, _) => drillPoints(s)),
    "raster_change_detect" -> ((s, _) => changeDetect(s)),
    "raster_pyramid_build" -> ((s, _) => pyramidBuild(s)),
    "raster_masked_composite" -> ((s, _) => maskedComposite(s)),
    "raster_histogram" -> ((s, _) => histogram(s)),
    "raster_rasterize" -> ((s, _) => rasterizeZones(s)),
    "raster_sample_drill" -> ((s, _) => sampleDrill(s)),
    "stream_zonal" -> ((s, _) => streamZonal(s)),
    "raster_drill_bilinear" -> ((s, _) => drillBilinearPoints(s)),
    "raster_eo3_export" -> ((s, _) => eo3Export(s))
  )

  val oracleSql: Map[String, String] = Map(
    "raster_mosaic_cells" -> mosaicCellsDuckSql,
    "raster_composite_cells" -> compositeCellsDuckSql,
    "raster_reproject_cells" -> reprojectCellsDuckSql,
    "raster_resample_cells" -> resampleCellsDuckSql,
    "raster_overview_cells" -> overviewCellsDuckSql,
    "stream_raster_ingest" -> streamIngestDuckSql,
    "raster_parse_items" -> parseItemsDuckSql,
    "raster_stac_search" -> stacSearchDuckSql,
    "raster_load_mosaic" -> loadMosaicDuckSql,
    "raster_load_groupby_id" -> loadGroupByIdDuckSql,
    "raster_load_overview" -> loadOverviewDuckSql,
    "raster_load_netcdf" -> loadNetcdfDuckSql,
    "raster_load_zarr" -> loadZarrDuckSql,
    "raster_load_reproject" -> loadReprojectDuckSql,
    "raster_composite_mean" -> compositeMeanDuckSql,
    "raster_composite_median" -> compositeMedianDuckSql,
    "raster_load_tiff" -> loadTiffDuckSql,
    "raster_grb_source_sql" -> grbSourceDuckSql,
    "raster_gtiff_source_sql" -> gtiffSourceDuckSql,
    "raster_any_source_sql" -> anySourceDuckSql,
    "raster_cog_export" -> cogExportDuckSql,
    "raster_zarr_export" -> zarrExportDuckSql,
    "raster_tiles_roundtrip" -> loadMosaicDuckSql,
    "raster_tyx_bins" -> tyxBinsDuckSql,
    "raster_zonal_stats" -> zonalStatsDuckSql,
    "raster_composite_quantile" -> compositeQuantileDuckSql,
    "raster_temporal_fill" -> temporalFillDuckSql,
    "raster_band_math" -> bandMathNdviDuckSql,
    "raster_focal_mean" -> focalMeanDuckSql,
    "raster_focal_standing" -> focalMeanDuckSql,
    "raster_drill" -> drillPointsDuckSql,
    "raster_change_detect" -> changeDetectDuckSql,
    "raster_pyramid_build" -> pyramidBuildDuckSql,
    "raster_masked_composite" -> maskedCompositeDuckSql,
    "raster_histogram" -> histogramDuckSql,
    "raster_rasterize" -> rasterizeDuckSql,
    "raster_sample_drill" -> sampleDrillDuckSql,
    "stream_zonal" -> streamZonalDuckSql,
    "raster_drill_bilinear" -> drillBilinearDuckSql,
    "raster_output_geobox" -> outputGeoboxDuckSql,
    "raster_eo3_export" -> eo3ExportDuckSql,
    "raster_eo3_product" -> eo3ProductDuckSql,
    "raster_resample_conv" -> resampleConvDuckSql)
}
