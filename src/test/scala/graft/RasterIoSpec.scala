package graft

import graft.raster._
import org.scalatest.funsuite.AnyFunSuite

/** Remote-IO seam spec (VERDICT r6 missing #1): every format decoder
  * resolves URIs through the [[RasterIO]] scheme registry. A counting
  * `testfs://` source that deliberately reports NO local file proves
  * (a) reads route through the registered source, (b) results are
  * byte-identical to direct local reads, and (c) the javax.imageio
  * fallback path (stream over [[RasterInput]], no java.io.File) decodes
  * TIFF windows correctly — the path a real object-store source takes.
  */
class RasterIoSpec extends AnyFunSuite {

  private object TestFs extends RasterByteSource {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    private def local(uri: String): String = {
      require(uri.startsWith("testfs://"), s"not a testfs uri: $uri")
      calls.incrementAndGet()
      uri.stripPrefix("testfs://")
    }
    def open(uri: String): RasterInput = LocalFileSource.open(local(uri))
    def readAll(uri: String): Array[Byte] = LocalFileSource.readAll(local(uri))
    def readPrefix(uri: String, maxLen: Int): Array[Byte] =
      LocalFileSource.readPrefix(local(uri), maxLen)
    def exists(uri: String): Boolean = LocalFileSource.exists(local(uri))
    def list(uri: String): Seq[String] = LocalFileSource.list(local(uri))
    def localFile(uri: String): Option[java.io.File] = { local(uri); None }
  }
  RasterIO.register("testfs", TestFs)

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("graft_rasterio").toString
  private lazy val g = Fixtures.sceneGeobox(0)
  private lazy val px = Fixtures.scenePixels(0)

  test("GRB header+window reads route through the registered source") {
    val p = s"$dir/s.grb"
    Grb.writeWithOverviews(p, px, g, "uint16", Some(0.0))
    val before = TestFs.calls.get()
    val hd = Grb.readHeader(s"testfs://$p")
    assert(hd == Grb.readHeader(p))
    val w = Grb.readWindow(s"testfs://$p", 3, 5, 40, 20)._2
    assert(w.sameElements(Grb.readWindow(p, 3, 5, 40, 20)._2))
    assert(TestFs.calls.get() > before, "testfs source was never consulted")
  }

  test("zarr listing, metadata and chunk reads go through the seam") {
    val store = s"$dir/s.zarr"
    Zarr.write(store, "red", px, g, "uint16", Some(0.0))
    Zarr.write(store, "nir", px.map(v => if (v != 0.0) v + 1 else v), g,
      "uint16", Some(0.0), zlib = true)
    assert(Zarr.variables(s"testfs://$store") == Zarr.variables(store))
    val a = Zarr.readWindow(s"testfs://$store#nir", 2, 2, 30, 30)
    assert(a.sameElements(Zarr.readWindow(s"$store#nir", 2, 2, 30, 30)))
  }

  test("netCDF header and window reads go through the seam") {
    val p = s"$dir/s.nc"
    NetCdf.write(p, Seq("red" -> px), g, "int16", Some(0.0))
    val a = NetCdf.readWindow(s"testfs://$p#red", 1, 1, 25, 25)
    assert(a.sameElements(NetCdf.readWindow(s"$p#red", 1, 1, 25, 25)))
  }

  test("TIFF decodes through the no-local-File stream fallback") {
    val p = s"$dir/s.tif"
    Tiff.write(p, px, g, "uint16", Some(0.0), tileSize = Some(64))
    val before = TestFs.calls.get()
    val a = Tiff.readWindow(s"testfs://$p", 4, 4, 33, 17, 1)
    assert(a.sameElements(Tiff.readWindow(p, 4, 4, 33, 17, 1)))
    assert(TestFs.calls.get() > before)
  }

  test("unregistered scheme fails loudly, naming the scheme") {
    val e = intercept[IllegalArgumentException] {
      RasterIO.open("s3://bucket/key.grb")
    }
    assert(e.getMessage.contains("'s3'"))
  }

  test("GraftIoPlugin registers conf-declared sources by class name") {
    GraftIoPlugin.registerFromConf(
      "plugfs:graft.PlugFsSource, plugfs2:graft.PlugFsSource")
    val p = s"$dir/plug.grb"
    Grb.write(p, px, g, "uint16", Some(0.0))
    assert(Grb.readHeader(s"plugfs://$p") == Grb.readHeader(p))
    assert(Grb.readHeader(s"plugfs2://$p") == Grb.readHeader(p))
    // malformed entries and unloadable classes fail loudly at startup
    intercept[IllegalArgumentException] {
      GraftIoPlugin.registerFromConf("notaclasspair")
    }
    intercept[ClassNotFoundException] {
      GraftIoPlugin.registerFromConf("x:no.such.Source")
    }
  }
}

/** No-arg-constructible source for the plugin spec: a `plugfs://` view
  * of the local filesystem. */
class PlugFsSource extends RasterByteSource {
  private def local(uri: String): String = uri.replaceFirst("^plugfs2?://", "")
  def open(uri: String): RasterInput = LocalFileSource.open(local(uri))
  def readAll(uri: String): Array[Byte] = LocalFileSource.readAll(local(uri))
  def readPrefix(uri: String, maxLen: Int): Array[Byte] =
    LocalFileSource.readPrefix(local(uri), maxLen)
  def exists(uri: String): Boolean = LocalFileSource.exists(local(uri))
  def list(uri: String): Seq[String] = LocalFileSource.list(local(uri))
  def localFile(uri: String): Option[java.io.File] = None
}
