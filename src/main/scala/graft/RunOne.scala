package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run named queries with Bench's steady-state protocol (noop
  * sink, second-run timing) without paying for the whole suite. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.RunOne q07_multi_join
  * Pass `-show` to also print the first rows (runs the query once more).
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val show = args.contains("-show")
    // -conf key=value pairs pass straight through to the session builder
    val confs = args.filter(_.startsWith("-conf")).map(_.stripPrefix("-conf"))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val names = args.filterNot(_.startsWith("-"))
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val cold = once(n)
      val warm = once(n)
      println(f"== $n cold=$cold%.3f s warm=$warm%.3f s")
      if (show) SparkEntry.queries(n)(spark, dir).show(20, truncate = false)
    }
    spark.stop()
  }
}
