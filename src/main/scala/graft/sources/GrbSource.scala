package graft.sources

import graft.raster.Grb
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

/** DataSource V2 table over GRB rasters — the "COG table" of SURVEY §4:
  * makes rasters a first-class SQL source (`spark.read.format("grb")`)
  * with genuine scan pushdown, the piece a `mapPartitions` reader can't
  * express:
  *
  *  - **ROI pushdown** (`SupportsPushDownFilters`): x/y comparison
  *    predicates narrow the windowed read — partitions outside the ROI
  *    are never planned, and each surviving partition reads only the
  *    pushed column window (file-level pruning, `_rio.py:314-348`
  *    analog, but driven by Catalyst filters);
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): world
  *    coordinates / values are only computed when selected;
  *  - **parallel scan**: each file splits into row-band partitions
  *    (~`TargetPartitionPx` pixels each), so one huge raster fans out
  *    across the cluster — scan parallelism is data-size-driven, not
  *    file-count-driven.
  *
  * Row shape: one row per pixel `(uri, x, y, wx, wy, value, nodata)` —
  * the relational projection of a raster, joinable/aggregable with
  * everything else in the engine.
  */
class GrbDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "grb"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GrbTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GrbTable(GrbTable.resolvePaths(properties.get("path")))
}

object GrbTable {
  val Schema: StructType = StructType(Seq(
    StructField("uri", StringType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("wx", DoubleType, nullable = false),
    StructField("wy", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("nodata", DoubleType, nullable = true)))

  /** ~pixels per input partition (row-band split granularity). */
  val TargetPartitionPx: Long = 4L << 20

  def resolvePaths(path: String): Seq[String] = {
    require(path != null && path.nonEmpty,
      "grb source requires exactly one path (multi-path load() is not supported; " +
        "point at a directory instead)")
    val f = new java.io.File(path.stripPrefix("file:"))
    if (f.isDirectory) {
      val listed = f.listFiles()
      require(listed != null, s"cannot list directory: ${f.getPath}")
      listed.toSeq.map(_.getPath).filter(_.endsWith(".grb")).sorted
    } else Seq(f.getPath)
  }
}

class GrbTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"grb(${paths.mkString(",")})"
  override def schema(): StructType = GrbTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GrbScanBuilder(paths)
}

/** Pixel-coordinate ROI accumulated from pushed filters. */
final case class PixelBounds(xMin: Int, xMax: Int, yMin: Int, yMax: Int) {
  def clampTo(w: Int, h: Int): PixelBounds =
    PixelBounds(math.max(0, xMin), math.min(w - 1, xMax),
      math.max(0, yMin), math.min(h - 1, yMax))
  def isEmpty: Boolean = xMin > xMax || yMin > yMax
}

object PixelBounds {
  val All: PixelBounds =
    PixelBounds(Int.MinValue, Int.MaxValue, Int.MinValue, Int.MaxValue)
}

class GrbScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var bounds = PixelBounds.All
  private var uriPred: String => Boolean = _ => true
  private var pushed = Array.empty[Filter]
  private var required: StructType = GrbTable.Schema

  /** Push x/y comparisons into the windowed read; everything else stays
    * a Spark-side residual. Pushed filters are still re-evaluated by
    * Spark (we return them as residual too) — pushdown here is a prune,
    * not a correctness contract, matching parquet row-group semantics. */
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
      // file-level pruning on the uri column (partition-key analog)
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
    filters // all residual: Spark re-checks (prune-only pushdown)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GrbScan(paths.filter(uriPred), bounds, required)
}

class GrbScan(paths: Seq[String], bounds: PixelBounds, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GrbScan window=[x ${bounds.xMin}..${bounds.xMax}, y ${bounds.yMin}..${bounds.yMax}] " +
      s"columns=${required.fieldNames.mkString(",")}"

  /** One partition per row-band of the pushed window per file — the ROI
    * prune happens HERE, at planning time: out-of-window bands are never
    * materialized as partitions. Header reads fan out over a bounded
    * pool (see [[PlanUtil.parMap]]): planning must not serialize on
    * per-file metadata I/O across thousands of files. */
  override def planInputPartitions(): Array[InputPartition] = {
    PlanUtil.parMap(paths) { p =>
      val hd = Grb.readHeader(p)
      val b = bounds.clampTo(hd.width, hd.height)
      if (b.isEmpty) Seq.empty
      else {
        val w = b.xMax - b.xMin + 1
        val rowsPer = math.max(1, (GrbTable.TargetPartitionPx / math.max(1, w)).toInt)
        (b.yMin to b.yMax by rowsPer).map { y0 =>
          val h = math.min(rowsPer, b.yMax - y0 + 1)
          GrbInputPartition(p, b.xMin, y0, w, h): InputPartition
        }
      }
    }.flatten.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GrbReaderFactory(required.fieldNames)
}

final case class GrbInputPartition(path: String, x0: Int, y0: Int,
                                   w: Int, h: Int) extends InputPartition

class GrbReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GrbPartitionReader(partition.asInstanceOf[GrbInputPartition], columns)
}

/** Streams the partition's window as pixel rows, materializing only the
  * pruned columns. The window is read once (single span read). */
class GrbPartitionReader(part: GrbInputPartition, columns: Array[String])
    extends PartitionReader[InternalRow] {

  private val (header, pixels) =
    Grb.readWindow(part.path, part.x0, part.y0, part.w, part.h)
  private val uri = UTF8String.fromString(part.path)
  private val t = header.geobox.transform
  private val nodataOrNull: Any = header.nodata.orNull
  private var i = -1
  private val n = part.w * part.h
  private val row = new GenericInternalRow(columns.length)
  // column dispatch hoisted out of the pixel loop: one int code per
  // projected column, and one shared transform eval when wx/wy project
  private val codes: Array[Int] = columns.map {
    case "uri" => 0; case "x" => 1; case "y" => 2
    case "wx" => 3; case "wy" => 4; case "value" => 5; case "nodata" => 6
  }
  private val needsWorld = codes.exists(c => c == 3 || c == 4)

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
        case 1 => px
        case 2 => py
        case 3 => wx
        case 4 => wy
        case 5 => pixels(i)
        case 6 => nodataOrNull
      })
      c += 1
    }
    row
  }

  override def close(): Unit = ()
}
