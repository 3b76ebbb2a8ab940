package graft

import org.apache.spark.sql.SparkSession

/** Dev-only diagnostic: run named registered queries once (or N times)
  * under the Bench session shape and print per-run wall times, with an
  * optional formatted plan dump — for isolating one query's behavior
  * without the full Bench protocol.
  *
  * Usage: runMain graft.RunOne <sfDir> <query> [<query>...]
  *   SPARK_GRAFT_RUNS=N       timed runs per query (default 2)
  *   SPARK_GRAFT_EXPLAIN=1    print .explain("formatted") per query
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunOne <sfDir> <query> [<query>...]")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val q = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").exists(_ == "1"))
        q(spark, sfDir).explain("formatted")
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(s"== $name: " + times.map(t => f"$t%.2f").mkString(" ") + " s")
    }
    spark.stop()
  }
}
