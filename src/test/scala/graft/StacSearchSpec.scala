package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.stac.StacSearch
import graft.stac.StacSearch.SearchParams

/** Pins the STAC API search client (S16) against an in-process server:
  * request serialization, POST-continuation pagination, the loud
  * maxItems cap, and the dump/readDump snapshot round trip. */
class StacSearchSpec extends AnyFunSuite {
  import GraftSpark.spark

  private def fixtureItems(n: Int): Seq[String] =
    raster.Fixtures.writeScenes(n).map(_.replaceAll("\n", " "))

  test("request body serializes collections, bbox, datetime, limit") {
    val body = StacSearch.requestBody(SearchParams(
      collections = Seq("c1", "c2"),
      bbox = Some((10.0, -5.0, 20.0, 5.0)),
      datetime = Some("2020-06-01/2020-06-30"),
      limit = 7))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    assert(node.get("limit").asInt() == 7)
    assert(node.get("collections").toString == """["c1","c2"]""")
    assert(node.get("bbox").toString == "[10.0,-5.0,20.0,5.0]")
    assert(node.get("datetime").asText() == "2020-06-01/2020-06-30")
  }

  test("pagination: all pages fetched via POST continuations, in order") {
    val items = fixtureItems(7) // 4 pages at size 2 (last page short)
    val (got, bodies) = rasterops.RasterQueries.withStacApi(items, 2) { ep =>
      StacSearch.search(ep, SearchParams(limit = 2))
    }
    assert(got.size == items.size)
    // item identity AND order survive pagination
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    def ids(js: Seq[String]) = js.map(mapper.readTree(_).get("id").asText())
    assert(ids(got) == ids(items))
    // 4 requests: the original search + three {"page": k} continuations
    assert(bodies.size == 4, bodies.mkString(" | "))
    assert((1 to 3).forall(k => bodies.exists(_.contains(s""""page":$k"""))))
    // merge:true continuations must KEEP the original request params —
    // a token-only body that replaced the request would drop the limit
    // (and any collections/bbox/datetime filters) from page 2 on
    assert(bodies.count(_.contains(""""limit":2""")) == 4,
      s"continuation bodies lost original params: ${bodies.mkString(" | ")}")
  }

  test("merge:false continuation bodies replace the request verbatim") {
    // spec-faithful replacement semantics: without merge, the link body
    // IS the next request
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      """{"type":"FeatureCollection","features":[],
        |"links":[{"rel":"next","method":"POST","href":"http://x/search",
        |"body":{"token":"abc"}}]}""".stripMargin)
    val page = StacSearch.parsePage(node)
    assert(page.next.exists(n => n.post && !n.merge &&
      n.body.exists(_.get("token").asText() == "abc")))
  }

  test("a persistent rel=next with empty pages cannot loop the client forever") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/search",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        hits.incrementAndGet()
        val port = server.getAddress.getPort
        val resp = (s"""{"type":"FeatureCollection","features":[],"links":""" +
          s"""[{"rel":"next","method":"POST","href":""" +
          s""""http://127.0.0.1:$port/search","body":{}}]}""").getBytes("UTF-8")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      })
    server.start()
    try {
      val e = intercept[IllegalArgumentException] {
        StacSearch.search(s"http://127.0.0.1:${server.getAddress.getPort}",
          SearchParams(limit = 2, maxItems = 10))
      }
      assert(e.getMessage.contains("pages"), e.getMessage)
      assert(hits.get() <= 10 / 2 + 8 + 1, s"client made ${hits.get()} requests")
    } finally server.stop(0)
  }

  test("maxItems is a loud cap, not silent truncation") {
    val items = fixtureItems(6)
    val e = intercept[IllegalArgumentException] {
      rasterops.RasterQueries.withStacApi(items, 2) { ep =>
        StacSearch.search(ep, SearchParams(limit = 2, maxItems = 3))
      }
    }
    assert(e.getMessage.contains("maxItems"))
  }

  test("dump snapshot round-trips through readDump and the parse path") {
    val items = fixtureItems(5)
    val out = java.nio.file.Files.createTempFile("graft_dump_spec", ".geojson")
    val (n, _) = rasterops.RasterQueries.withStacApi(items, 2) { ep =>
      StacSearch.dump(ep, SearchParams(limit = 2), out)
    }
    assert(n == 5)
    val back = StacSearch.readDump(out)
    assert(back.size == 5)
    // the snapshot parses through the SAME path as direct fixtures
    import spark.implicits._
    val (ds, _) = stac.StacParse.parseItems(spark, spark.createDataset(back))
    val (ref, _) = stac.StacParse.parseItems(spark, spark.createDataset(items))
    assert(ds.collect().map(_.id).sorted.toSeq ==
      ref.collect().map(_.id).sorted.toSeq)
  }

  test("raster_stac_search contract query: one row per dumped item") {
    val df = SparkEntry.queries("raster_stac_search")(spark, GraftSpark.sf)
    val rows = df.collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getLong(3) == 6L)) // n_dumped
    assert(rows.map(_.getString(0)).distinct.length == 6)
  }
}
