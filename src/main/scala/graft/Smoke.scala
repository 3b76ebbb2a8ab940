package graft

import org.apache.spark.sql.SparkSession

/** Dev-only smoke: print every test table's Spark-side schema + a row. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    if (args.contains("registry")) {
      val q = SparkEntry.queries.keySet
      val o = SparkEntry.oracleSql.keySet
      println(s"== registry queries=${q.size} oracles=${o.size} " +
        s"rows_only=${(q -- o).toSeq.sorted.mkString(",")}")
      val orphans = o -- q
      require(orphans.isEmpty, s"oracles without queries: $orphans")
      return
    }
    if (args.contains("entry")) {
      val spark = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val rows = SparkEntry.entry(spark).count()
      println(s"== entry rows=$rows")
      spark.stop()
      return
    }
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      try {
        val df = Tables.load(spark, dir, n)
        println(s"== $n: ${df.schema.simpleString}")
        df.show(2, truncate = 60)
      } catch {
        case scala.util.control.NonFatal(e) => println(s"== $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
