package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for named queries so the
  * scale properties (pushdown, pruning, broadcast, codegen spans) can be
  * audited. Usage: runMain graft.Explain q01_scan_filter q11_broadcast_join
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n======== $n ========")
      try SparkEntry.queries(n)(spark, dir).explain("formatted")
      catch { case scala.util.control.NonFatal(e) => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
