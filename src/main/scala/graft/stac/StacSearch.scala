package graft.stac

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import scala.jdk.CollectionConverters._

/** STAC API search client + GeoJSON snapshot dump — S16, the reference's
  * `dump_site` (`bench/_prepare.py:36-85`): query a STAC API endpoint
  * and persist the result as a FeatureCollection snapshot the loader
  * then consumes offline.
  *
  * Speaks the STAC API item-search protocol: `POST {endpoint}/search`
  * with a JSON body (`collections`, `bbox`, `datetime`, `limit`),
  * consumes FeatureCollection pages, and follows `rel=next` pagination
  * links — including the POST-continuation form where the next link
  * carries a `body` to merge over the original request (the pystac-client
  * behavior the reference delegates to).
  *
  * Transport is `java.net.http` over any http(s) endpoint. The sandbox
  * has no egress, so `StacSearchSpec` pins the protocol against an
  * in-process JDK HttpServer serving paginated fixture pages — request
  * serialization, pagination, termination, and snapshot round-trip are
  * all exercised for real; a cluster points the same client at a live
  * API. Driver-side by design: search returns item METADATA (the same
  * driver-side stage as the reference's prepare step); the pixel work it
  * seeds is what distributes.
  */
object StacSearch {

  final case class SearchParams(
      collections: Seq[String] = Nil,
      bbox: Option[(Double, Double, Double, Double)] = None,
      datetime: Option[String] = None,
      limit: Int = 100,
      maxItems: Int = 10000)

  /** One page of a search: item JSON strings + the next-page request, if
    * any. Exposed for the spec. */
  final case class Page(items: Seq[String], next: Option[(String, Option[String])])

  private val mapper = new ObjectMapper()

  private[graft] def requestBody(p: SearchParams): String = {
    val b = mapper.createObjectNode()
    b.put("limit", p.limit)
    if (p.collections.nonEmpty) {
      val arr = b.putArray("collections")
      p.collections.foreach(arr.add)
    }
    p.bbox.foreach { case (x0, y0, x1, y1) =>
      val arr = b.putArray("bbox")
      Seq(x0, y0, x1, y1).foreach(arr.add)
    }
    p.datetime.foreach(b.put("datetime", _))
    mapper.writeValueAsString(b)
  }

  private def post(client: HttpClient, url: String, body: String): JsonNode = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"STAC search failed: HTTP ${resp.statusCode()} from $url")
    mapper.readTree(resp.body())
  }

  private def get(client: HttpClient, url: String): JsonNode = {
    val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"STAC search failed: HTTP ${resp.statusCode()} from $url")
    mapper.readTree(resp.body())
  }

  /** Parse one FeatureCollection page: features re-serialized as
    * standalone item JSON, plus the rel=next continuation — (href,
    * Some(body)) means POST the body there, (href, None) means GET. */
  private[stac] def parsePage(node: JsonNode): Page = {
    val feats = Option(node.get("features")).toSeq
      .flatMap(_.elements().asScala)
      .map(mapper.writeValueAsString)
    val next = Option(node.get("links")).toSeq
      .flatMap(_.elements().asScala)
      .find(l => Option(l.get("rel")).exists(_.asText() == "next"))
      .flatMap { l =>
        Option(l.get("href")).map { href =>
          val body = Option(l.get("body")).map(mapper.writeValueAsString)
          val isPost = Option(l.get("method")).exists(_.asText() == "POST") ||
            body.isDefined
          (href.asText(), if (isPost) body.orElse(Some("{}")) else None)
        }
      }
    Page(feats, next)
  }

  /** Run a full paginated search; returns item JSON strings (at most
    * `maxItems` — a loud cap, not silent truncation: hitting it throws,
    * because a snapshot that quietly lost items corrupts every
    * downstream answer). */
  def search(endpoint: String, p: SearchParams): Seq[String] = {
    val client = HttpClient.newHttpClient()
    val out = Seq.newBuilder[String]
    var n = 0
    var page = parsePage(post(client,
      endpoint.stripSuffix("/") + "/search", requestBody(p)))
    var done = false
    while (!done) {
      out ++= page.items
      n += page.items.size
      require(n <= p.maxItems,
        s"search exceeded maxItems=${p.maxItems}; raise the cap or narrow the query")
      page.next match {
        case Some((href, Some(body))) => page = parsePage(post(client, href, body))
        case Some((href, None)) => page = parsePage(get(client, href))
        case None => done = true
      }
    }
    out.result()
  }

  /** Search and write the GeoJSON FeatureCollection snapshot (the
    * reference's dump artifact). Returns the item count. */
  def dump(endpoint: String, p: SearchParams,
           outFile: java.nio.file.Path): Int = {
    val items = search(endpoint, p)
    val sb = new StringBuilder("""{"type": "FeatureCollection", "features": [""")
    items.zipWithIndex.foreach { case (j, i) =>
      if (i > 0) sb.append(",")
      sb.append(j)
    }
    sb.append("]}")
    java.nio.file.Files.writeString(outFile, sb.toString)
    items.size
  }

  /** Snapshot consumer: re-read a dump file into item JSON strings —
    * the loader-side half of the dump/load round trip (the reference
    * reads its dumps back with `read_geojson`). */
  def readDump(file: java.nio.file.Path): Seq[String] = {
    val node = mapper.readTree(java.nio.file.Files.readString(file))
    Option(node.get("features")).toSeq
      .flatMap(_.elements().asScala)
      .map(mapper.writeValueAsString)
      .toSeq
  }
}
