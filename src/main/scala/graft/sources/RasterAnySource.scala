package graft.sources

import graft.raster.{Grb, NetCdf, Tiff, Zarr}
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Unified DataSource V2 table over EVERY raster container the engine
  * reads (`spark.read.format("raster")`): GeoTIFF, GRB, zarr v2 stores
  * and netCDF classic files share one pixel-table surface. Container
  * formats are expanded at resolve time — each zarr variable / netCDF
  * variable becomes its own `uri#variable` row source, so `uri` LIKE
  * predicates select subdatasets the same way they select files.
  *
  * Pushdown design is the `gtiff`/`grb` one (SURVEY §4): ROI x/y
  * predicates narrow the windowed decode per partition, `band`
  * predicates stop non-addressed planes from being planned, world
  * coordinates are computed only when projected, and files split into
  * ~[[GrbTable.TargetPartitionPx]] row-band partitions so parallelism
  * tracks pixel volume. The per-format work is confined to
  * [[AnyFormat]] — everything else is format-independent.
  *
  * Row shape: `(uri, band, x, y, wx, wy, value, nodata)`.
  */
class RasterAnyDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "raster"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GTiffTable.Schema // shared pixel-table schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RasterAnyTable(RasterAnyTable.resolvePaths(properties.get("path")))
}

/** Format routing: the four per-format calls the generic scan needs.
  * Extensions are decided on the path part (before any `#fragment`). */
private[sources] object AnyFormat {
  private val Known = Seq(".tif", ".tiff", ".grb", ".zarr", ".nc")

  def isRaster(path: String): Boolean = {
    val p = path.toLowerCase
    Known.exists(p.endsWith)
  }

  private def pathPart(uri: String): String = {
    val p = uri.takeWhile(_ != '#').toLowerCase
    p
  }

  /** Container → one uri per subdataset; plain files pass through. */
  def expand(path: String): Seq[String] = pathPart(path) match {
    case p if p.endsWith(".zarr") && !path.contains("#") =>
      Zarr.variables(path).map(v => s"$path#$v")
    case p if p.endsWith(".nc") && !path.contains("#") =>
      NetCdf.variables(path).map(v => s"$path#$v")
    case _ => Seq(path)
  }

  def numBands(uri: String): Int = pathPart(uri) match {
    case p if p.endsWith(".tif") || p.endsWith(".tiff") => Tiff.numBands(uri)
    case _ => 1 // grb planes and zarr/nc variables are single-band
  }

  def header(uri: String, band: Int): Grb.Header = pathPart(uri) match {
    case p if p.endsWith(".tif") || p.endsWith(".tiff") =>
      Tiff.readHeader(uri, band)
    case p if p.endsWith(".zarr") => Zarr.readHeader(uri)
    case p if p.endsWith(".nc") => NetCdf.readHeader(uri)
    case _ => Grb.readHeader(uri)
  }

  def window(uri: String, x0: Int, y0: Int, w: Int, h: Int,
             band: Int): Array[Double] = pathPart(uri) match {
    case p if p.endsWith(".tif") || p.endsWith(".tiff") =>
      Tiff.readWindow(uri, x0, y0, w, h, band)
    case p if p.endsWith(".zarr") => Zarr.readWindow(uri, x0, y0, w, h)
    case p if p.endsWith(".nc") => NetCdf.readWindow(uri, x0, y0, w, h)
    case _ => Grb.readWindow(uri, x0, y0, w, h)._2
  }
}

object RasterAnyTable {
  /** A file, a container store, or a directory of any mix; containers
    * expand to their subdatasets. */
  def resolvePaths(path: String): Seq[String] = {
    require(path != null && path.nonEmpty,
      "raster source requires exactly one path (file, store or directory)")
    val f = new java.io.File(path.stripPrefix("file:").takeWhile(_ != '#'))
    val frag = path.dropWhile(_ != '#') // '#variable' or empty
    if (f.isDirectory && !f.getName.endsWith(".zarr")) {
      val listed = f.listFiles()
      require(listed != null, s"cannot list directory: ${f.getPath}")
      listed.toSeq.map(_.getPath).filter(AnyFormat.isRaster)
        .sorted.flatMap(AnyFormat.expand)
    } else AnyFormat.expand(f.getPath + frag)
  }
}

class RasterAnyTable(uris: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"raster(${uris.mkString(",")})"
  override def schema(): StructType = GTiffTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RasterAnyScanBuilder(uris)
}

/** Same prune-only pushdown surface as [[GTiffScanBuilder]], over the
  * format-routed scan. */
class RasterAnyScanBuilder(uris: Seq[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var bounds = PixelBounds.All
  private var uriPred: String => Boolean = _ => true
  private var bandPred: Int => Boolean = _ => true
  private var pushed = Array.empty[Filter]
  private var required: StructType = GTiffTable.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def narrow(f: Filter): Boolean = f match {
      case GreaterThan("x", v: Int) => bounds = bounds.copy(xMin = math.max(bounds.xMin, v + 1)); true
      case GreaterThanOrEqual("x", v: Int) => bounds = bounds.copy(xMin = math.max(bounds.xMin, v)); true
      case LessThan("x", v: Int) => bounds = bounds.copy(xMax = math.min(bounds.xMax, v - 1)); true
      case LessThanOrEqual("x", v: Int) => bounds = bounds.copy(xMax = math.min(bounds.xMax, v)); true
      case EqualTo("x", v: Int) =>
        bounds = bounds.copy(xMin = math.max(bounds.xMin, v), xMax = math.min(bounds.xMax, v)); true
      case GreaterThan("y", v: Int) => bounds = bounds.copy(yMin = math.max(bounds.yMin, v + 1)); true
      case GreaterThanOrEqual("y", v: Int) => bounds = bounds.copy(yMin = math.max(bounds.yMin, v)); true
      case LessThan("y", v: Int) => bounds = bounds.copy(yMax = math.min(bounds.yMax, v - 1)); true
      case LessThanOrEqual("y", v: Int) => bounds = bounds.copy(yMax = math.min(bounds.yMax, v)); true
      case EqualTo("y", v: Int) =>
        bounds = bounds.copy(yMin = math.max(bounds.yMin, v), yMax = math.min(bounds.yMax, v)); true
      case EqualTo("band", v: Int) =>
        val prev = bandPred; bandPred = b => prev(b) && b == v; true
      case In("band", vs) =>
        val set = vs.collect { case i: Int => i }.toSet
        val prev = bandPred; bandPred = b => prev(b) && set(b); true
      case EqualTo("uri", v: String) =>
        val prev = uriPred; uriPred = u => prev(u) && u == v; true
      case StringStartsWith("uri", v: String) =>
        val prev = uriPred; uriPred = u => prev(u) && u.startsWith(v); true
      case StringEndsWith("uri", v: String) =>
        val prev = uriPred; uriPred = u => prev(u) && u.endsWith(v); true
      case StringContains("uri", v: String) =>
        val prev = uriPred; uriPred = u => prev(u) && u.contains(v); true
      case And(l, r) => narrow(l) && narrow(r)
      case _ => false
    }
    pushed = filters.filter(narrow)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new RasterAnyScan(uris.filter(uriPred), bounds, bandPred, required)
}

class RasterAnyScan(uris: Seq[String], bounds: PixelBounds,
                    bandPred: Int => Boolean, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"RasterAnyScan window=[x ${bounds.xMin}..${bounds.xMax}, y ${bounds.yMin}..${bounds.yMax}] " +
      s"columns=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    PlanUtil.parMap(uris) { u =>
      val hd = AnyFormat.header(u, 1)
      val nBands = AnyFormat.numBands(u)
      val b = bounds.clampTo(hd.width, hd.height)
      if (b.isEmpty) Seq.empty
      else {
        val w = b.xMax - b.xMin + 1
        val rowsPer = math.max(1, (GrbTable.TargetPartitionPx / math.max(1, w)).toInt)
        for {
          band <- 1 to nBands if bandPred(band)
          y0 <- b.yMin to b.yMax by rowsPer
        } yield {
          val h = math.min(rowsPer, b.yMax - y0 + 1)
          RasterAnyInputPartition(u, band, b.xMin, y0, w, h): InputPartition
        }
      }
    }.flatten.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RasterAnyReaderFactory(required.fieldNames)
}

final case class RasterAnyInputPartition(uri: String, band: Int,
                                         x0: Int, y0: Int,
                                         w: Int, h: Int) extends InputPartition

class RasterAnyReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RasterAnyPartitionReader(
      partition.asInstanceOf[RasterAnyInputPartition], columns)
}

class RasterAnyPartitionReader(part: RasterAnyInputPartition,
                               columns: Array[String])
    extends PartitionReader[InternalRow] {

  private val header = AnyFormat.header(part.uri, part.band)
  private val pixels =
    AnyFormat.window(part.uri, part.x0, part.y0, part.w, part.h, part.band)
  private val uri = UTF8String.fromString(part.uri)
  private val t = header.geobox.transform
  private val nodataOrNull: Any = header.nodata.orNull
  private var i = -1
  private val n = part.w * part.h
  private val row = new GenericInternalRow(columns.length)
  private val codes: Array[Int] = columns.map {
    case "uri" => 0; case "band" => 1; case "x" => 2; case "y" => 3
    case "wx" => 4; case "wy" => 5; case "value" => 6; case "nodata" => 7
  }
  private val needsWorld = codes.exists(c => c == 4 || c == 5)

  override def next(): Boolean = { i += 1; i < n }

  override def get(): InternalRow = {
    val px = part.x0 + i % part.w
    val py = part.y0 + i / part.w
    var wx = 0.0
    var wy = 0.0
    if (needsWorld) {
      val w = t(px + 0.5, py + 0.5)
      wx = w._1; wy = w._2
    }
    var c = 0
    while (c < codes.length) {
      row.update(c, (codes(c): @annotation.switch) match {
        case 0 => uri
        case 1 => part.band
        case 2 => px
        case 3 => py
        case 4 => wx
        case 5 => wy
        case 6 => pixels(i)
        case 7 => nodataOrNull
      })
      c += 1
    }
    row
  }

  override def close(): Unit = ()
}
