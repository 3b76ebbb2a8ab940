package graft.sources

import graft.raster.Grb
import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 table over GRB rasters — the "COG table" of SURVEY §4:
  * makes rasters a first-class SQL source (`spark.read.format("grb")`).
  * All scan machinery (ROI/uri pushdown, row-band partition planning,
  * column-pruned emit) is the shared [[PixelScan]] skeleton; GRB planes
  * are single-band, so the schema carries no `band` column.
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

  private[sources] object Format extends PixelFormat {
    override def numBands(uri: String): Int = 1
    override def header(uri: String, band: Int): Grb.Header =
      Grb.readHeader(uri)
    override def window(uri: String, x0: Int, y0: Int, w: Int, h: Int,
                        band: Int): Array[Double] =
      Grb.readWindow(uri, x0, y0, w, h)._2
  }
}

class GrbTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"grb(${paths.mkString(",")})"
  override def schema(): StructType = GrbTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PixelScanBuilder("GrbScan", paths, GrbTable.Schema, GrbTable.Format)
}
