package graft

import graft.load.Load
import graft.raster._
import graft.stac.StacParse
import org.scalatest.funsuite.AnyFunSuite

/** The credential capture/restore seam (the reference's `_aws.py` +
  * `capture_rio_env`/worker-restore analog): an in-process HTTP server
  * REQUIRES an Authorization bearer token; credentials configured on
  * the driver are captured at plan time, ride a broadcast into the
  * read tasks, and are restored into the executor-JVM registry before
  * the first pixel read — format decoders unchanged. */
class IoSessionSpec extends AnyFunSuite {
  import GraftSpark.spark

  private val Token = "graft-test-token-1337"

  private lazy val server = {
    val s = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (!auth.contains(s"Bearer $Token")) {
        ex.sendResponseHeaders(401, -1)
        ex.close()
      } else {
        val f = new java.io.File(Fixtures.dir.toString,
          ex.getRequestURI.getPath)
        if (!f.isFile) { ex.sendResponseHeaders(404, -1); ex.close() }
        else {
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          Option(ex.getRequestHeaders.getFirst("Range")) match {
            case Some(r) =>
              val m = "bytes=(\\d+)-(\\d+)".r.findFirstMatchIn(r).get
              val a = m.group(1).toInt
              val b = math.min(m.group(2).toLong, bytes.length - 1L).toInt
              val slice = java.util.Arrays.copyOfRange(bytes, a, b + 1)
              ex.getResponseHeaders.set(
                "Content-Range", s"bytes $a-$b/${bytes.length}")
              ex.sendResponseHeaders(206, slice.length)
              ex.getResponseBody.write(slice)
              ex.close()
            case None =>
              ex.sendResponseHeaders(200, bytes.length)
              ex.getResponseBody.write(bytes)
              ex.close()
          }
        }
      }
    })
    s.start()
    s
  }
  private def base = s"http://127.0.0.1:${server.getAddress.getPort}"

  /** Fixture items with hrefs pointing at the authed server. */
  private def httpItems(n: Int): Seq[String] = {
    val jsons = Fixtures.writeScenes(n)
    server
    jsons.map(_.replace(s"file://${Fixtures.dir}", base))
  }

  private def loadTiles(n: Int) = {
    import spark.implicits._
    val (ds, schemas) = StacParse.parseItems(spark,
      spark.createDataset(httpItems(n)))
    val items = ds.collect().toSeq.sortBy(_.id)
    Load.load(spark, items, schemas, bands = Seq("red"),
      groupby = "id", chunks = 64).tiles
      .select("band", "tIdx", "ty", "tx", "validCount").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4))).sortBy(_.toString)
  }

  test("authed load: driver-configured credentials restore in read tasks") {
    try {
      IoSession.configure(Map(
        "http" -> Map("Authorization" -> s"Bearer $Token")))
      val remote = loadTiles(2)
      assert(remote.nonEmpty)
      // same pixels as the plain local-file load
      import spark.implicits._
      val jsons = Fixtures.writeScenes(2)
      val (ds, schemas) = StacParse.parseItems(spark,
        spark.createDataset(jsons))
      val items = ds.collect().toSeq.sortBy(_.id)
      val local = Load.load(spark, items, schemas, bands = Seq("red"),
        groupby = "id", chunks = 64).tiles
        .select("band", "tIdx", "ty", "tx", "validCount").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getLong(4))).sortBy(_.toString)
      assert(remote.sameElements(local))
    } finally {
      IoSession.clear()
      RasterIO.register("http", new HttpRangeSource())
    }
  }

  test("without credentials the authed read fails fast (401, no retry storm)") {
    IoSession.clear()
    RasterIO.register("http", new HttpRangeSource(retryDelayMs = 1))
    try {
      val e = intercept[Exception] { loadTiles(1) }
      val msg = Option(e.getCause).fold(e.getMessage)(c =>
        e.getMessage + " " + c.getMessage)
      assert(msg.contains("401") || e.getMessage.contains("401"),
        s"expected 401 failure, got: ${e.getMessage}")
    } finally RasterIO.register("http", new HttpRangeSource())
  }

  test("credential payload is masked and versioned") {
    val c1 = IoSession.configure(Map(
      "https" -> Map("Authorization" -> s"Bearer $Token")))
    val c2 = IoSession.configure(Map(
      "https" -> Map("Authorization" -> s"Bearer $Token")))
    try {
      // toString must never leak the token (closure/log hygiene)
      assert(!c1.toString.contains(Token) && c1.toString.contains("https"))
      // refresh bumps the version so executors re-install
      assert(c2.version > c1.version)
      // env capture shape (the aws_unsigned_check_env pattern)
      val env = IoSession.configureFromEnv(Map("GRAFT_IO_BEARER" -> "t"))
      assert(env.exists(_.headers.keySet == Set("http", "https")))
    } finally IoSession.clear()
  }
}
