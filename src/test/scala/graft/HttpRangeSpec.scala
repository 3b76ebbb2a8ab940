package graft

import graft.raster._
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the remote-IO seam with a REAL remote source: an
  * in-process HTTP file server (Range-capable, with injectable 503s)
  * behind [[HttpRangeSource]] — format decoders unchanged. Proves
  * (a) ranged-GET reads are byte-identical to local reads for both the
  * positioned-decoder path (GRB) and the javax.imageio stream-fallback
  * path (GeoTIFF), (b) the retry policy (the reference's
  * GDAL_HTTP_MAX_RETRY analog, `_rio.py:65-69`) absorbs transient
  * failures, and (c) non-transient failures fail fast.
  */
class HttpRangeSpec extends AnyFunSuite {

  private val failNext = new java.util.concurrent.atomic.AtomicInteger(0)
  private val nRequests = new java.util.concurrent.atomic.AtomicInteger(0)

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("graft_http_src").toString

  private lazy val server = {
    val s = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/", (exchange: com.sun.net.httpserver.HttpExchange) => {
      nRequests.incrementAndGet()
      if (failNext.getAndUpdate(v => math.max(v - 1, 0)) > 0) {
        exchange.sendResponseHeaders(503, -1)
        exchange.close()
      } else {
        val f = new java.io.File(dir, exchange.getRequestURI.getPath)
        if (!f.isFile) {
          exchange.sendResponseHeaders(404, -1)
          exchange.close()
        } else {
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          Option(exchange.getRequestHeaders.getFirst("Range")) match {
            case Some(r) =>
              val m = "bytes=(\\d+)-(\\d+)".r.findFirstMatchIn(r).get
              val a = m.group(1).toInt
              val b = math.min(m.group(2).toLong, bytes.length - 1L).toInt
              val slice = java.util.Arrays.copyOfRange(bytes, a, b + 1)
              exchange.getResponseHeaders.set(
                "Content-Range", s"bytes $a-$b/${bytes.length}")
              exchange.sendResponseHeaders(206, slice.length)
              exchange.getResponseBody.write(slice)
              exchange.close()
            case None =>
              exchange.sendResponseHeaders(200, bytes.length)
              exchange.getResponseBody.write(bytes)
              exchange.close()
          }
        }
      }
    })
    s.start()
    // fast-backoff instance for the suite (policy shape identical)
    RasterIO.register("http",
      new HttpRangeSource(maxRetries = 10, retryDelayMs = 1))
    s
  }
  private def base = s"http://127.0.0.1:${server.getAddress.getPort}"

  private lazy val g = Fixtures.sceneGeobox(0)
  private lazy val px = Fixtures.scenePixels(0)
  private lazy val grbPath = {
    val p = s"$dir/s.grb"
    Grb.writeWithOverviews(p, px, g, "uint16", Some(0.0))
    p
  }
  private lazy val tifPath = {
    val p = s"$dir/s.tif"
    Tiff.write(p, px, g, "uint16", Some(0.0), tileSize = Some(64))
    p
  }

  test("GRB header + window over http equal local reads, via few ranged GETs") {
    grbPath // materialize the served file before the first request
    val uri = s"$base/s.grb"
    assert(Grb.readHeader(uri) == Grb.readHeader(grbPath))
    val before = nRequests.get()
    val remote = Grb.readWindow(uri, 3, 5, 40, 20)._2
    val gets = nRequests.get() - before
    assert(remote.sameElements(Grb.readWindow(grbPath, 3, 5, 40, 20)._2))
    // span coalescing holds over http: a 40x20 window is a handful of
    // ranged GETs (one per coalesced row span + length probe), not 800
    assert(gets < 30, s"windowed read issued $gets GETs")
  }

  test("GeoTIFF decode over http routes through the stream fallback") {
    tifPath // materialize the served file before the first request
    val uri = s"$base/s.tif"
    val remote = Tiff.readWindow(uri, 2, 2, 30, 30)
    assert(remote.sameElements(Tiff.readWindow(tifPath, 2, 2, 30, 30)))
  }

  test("transient 503s are retried and the read still succeeds") {
    grbPath // materialize before priming failures
    failNext.set(3)
    val remote = Grb.readWindow(s"$base/s.grb", 0, 0, 16, 16)._2
    assert(remote.sameElements(Grb.readWindow(grbPath, 0, 0, 16, 16)._2))
    assert(failNext.get() == 0, "injected failures were never consumed")
  }

  test("retry budget exhausts into a loud IOException") {
    grbPath
    val src = new HttpRangeSource(maxRetries = 2, retryDelayMs = 1)
    failNext.set(100)
    val e = intercept[java.io.IOException] { src.readAll(s"$base/s.grb") }
    failNext.set(0)
    assert(e.getMessage.contains("after 3 attempts"), e.getMessage)
  }

  test("404 fails fast: no retry storm, exists() is false") {
    server
    val before = nRequests.get()
    assert(!RasterIO.exists(s"$base/missing.grb"))
    assert(nRequests.get() - before == 1, "404 must not be retried")
  }

  test("readPrefix and readAll match the local bytes") {
    val local = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(grbPath))
    assert(RasterIO.readAll(s"$base/s.grb").sameElements(local))
    assert(RasterIO.readPrefix(s"$base/s.grb", 64)
      .sameElements(local.take(64)))
  }
}
