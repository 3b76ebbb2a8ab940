package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted physical plan (and optionally time)
  * of one registered query — the `.explain("formatted")` loop the
  * build rules call for. `runMain graft.tools.ExplainOne <name> [sfDir]
  * [time]`. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    if (args.contains("time")) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
