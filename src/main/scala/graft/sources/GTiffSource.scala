package graft.sources

import graft.raster.Tiff
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 table over GeoTIFF rasters
  * (`spark.read.format("gtiff")`) — the real-container sibling of the
  * `grb` source (SURVEY §4 "COG table"), sharing its pushdown design:
  *
  *  - **ROI pushdown**: x/y comparison predicates narrow the windowed
  *    TIFF decode (`ImageReadParam.setSourceRegion` reads only the
  *    tiles/strips under the window — the COG access pattern); pruned
  *    row-bands are never planned as partitions;
  *  - **band pruning**: `band = k` predicates stop the non-addressed
  *    planes of a multi-band file from being planned at all — a packed
  *    RGB/MSI stack scans one plane, not three;
  *  - **column pruning**: world coordinates are computed only when
  *    projected;
  *  - **parallel scan**: files split into ~[[GrbTable.TargetPartitionPx]]
  *    row-band partitions, so scan parallelism tracks pixel volume, not
  *    file count.
  *
  * Row shape: `(uri, band, x, y, wx, wy, value, nodata)` — one row per
  * pixel per addressed band, joinable with everything in the engine.
  */
class GTiffDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gtiff"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GTiffTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GTiffTable(GTiffTable.resolvePaths(properties.get("path")))
}

object GTiffTable {
  val Schema: StructType = StructType(Seq(
    StructField("uri", StringType, nullable = false),
    StructField("band", IntegerType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("wx", DoubleType, nullable = false),
    StructField("wy", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("nodata", DoubleType, nullable = true)))

  def resolvePaths(path: String): Seq[String] = {
    require(path != null && path.nonEmpty,
      "gtiff source requires exactly one path (point at a file or directory)")
    val f = new java.io.File(path.stripPrefix("file:"))
    if (f.isDirectory) {
      val listed = f.listFiles()
      require(listed != null, s"cannot list directory: ${f.getPath}")
      listed.toSeq.map(_.getPath)
        .filter(p => p.endsWith(".tif") || p.endsWith(".tiff")).sorted
    } else Seq(f.getPath)
  }
}

class GTiffTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"gtiff(${paths.mkString(",")})"
  override def schema(): StructType = GTiffTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GTiffScanBuilder(paths)
}

class GTiffScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var bounds = PixelBounds.All
  private var uriPred: String => Boolean = _ => true
  private var bandPred: Int => Boolean = _ => true
  private var pushed = Array.empty[Filter]
  private var required: StructType = GTiffTable.Schema

  /** Prune-only pushdown (parquet row-group semantics): pushed filters
    * are also returned as residual, Spark re-checks them. */
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
    new GTiffScan(paths.filter(uriPred), bounds, bandPred, required)
}

class GTiffScan(paths: Seq[String], bounds: PixelBounds,
                bandPred: Int => Boolean, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GTiffScan window=[x ${bounds.xMin}..${bounds.xMax}, y ${bounds.yMin}..${bounds.yMax}] " +
      s"columns=${required.fieldNames.mkString(",")}"

  /** One partition per (surviving band, row-band of the pushed window)
    * per file — ROI and band pruning happen at planning time. Header
    * reads fan out over a bounded pool: planning must not serialize on
    * per-file metadata I/O when the table spans thousands of files. */
  override def planInputPartitions(): Array[InputPartition] = {
    PlanUtil.parMap(paths) { p =>
      val hd = Tiff.readHeader(p)
      val nBands = Tiff.numBands(p)
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
          GTiffInputPartition(p, band, b.xMin, y0, w, h): InputPartition
        }
      }
    }.flatten.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GTiffReaderFactory(required.fieldNames)
}

final case class GTiffInputPartition(path: String, band: Int,
                                     x0: Int, y0: Int,
                                     w: Int, h: Int) extends InputPartition

class GTiffReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GTiffPartitionReader(partition.asInstanceOf[GTiffInputPartition], columns)
}

/** Streams the partition's window as pixel rows, materializing only the
  * pruned columns; the TIFF decode touches only the window's tiles. */
class GTiffPartitionReader(part: GTiffInputPartition, columns: Array[String])
    extends PartitionReader[InternalRow] {

  private val header = Tiff.readHeader(part.path, part.band)
  private val pixels =
    Tiff.readWindow(part.path, part.x0, part.y0, part.w, part.h, part.band)
  private val uri = UTF8String.fromString(part.path)
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
