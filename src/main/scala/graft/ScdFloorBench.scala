package graft

import org.apache.spark.sql.SparkSession

/** One-shot harness for the scd2 streaming-floor attribution
  * (verdict r14 task 5): runs [[streaming.StreamingOps.scd2Probe]]
  * once per sink (noop first, then memory — same JVM, so the memory
  * arm's heap picture includes nothing the noop arm left behind except
  * parquet footers) against `SPARK_GRAFT_SF_DIR` and prints ONE JSON
  * line with each arm's wall seconds plus the summed per-batch
  * `StreamingQueryProgress` breakdown. The memory−noop wall delta is
  * the sink's share of the floor; within an arm, `addBatch` vs the
  * offset/planning/commit entries splits real execution from
  * micro-batch machinery. Usage:
  * `SPARK_GRAFT_SF_DIR=... runMain graft.ScdFloorBench [sink...]`. */
object ScdFloorBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val sinks = if (args.isEmpty) Seq("noop", "memory") else args.toSeq
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
    // one discarded warm pass (noop): planning + Janino codegen for the
    // fold are per-JVM, and the FIRST arm would otherwise absorb them
    // (measured 4.4 s of the 5.9 s first-arm wall at sf0.001)
    graft.streaming.StreamingOps.scd2Probe(spark, sfDir, "noop")
    val arms = sinks.map { sink =>
      val t0 = System.nanoTime()
      val m = graft.streaming.StreamingOps.scd2Probe(spark, sfDir, sink)
      val wall = (System.nanoTime() - t0) / 1e9
      val kv = m.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString(",")
      s""""$sink":{"wall_sec":$wall,$kv}"""
    }
    println(s"""{"metric":"scd2_floor","sf":"$sfDir",""" +
      s""""cpus":$cpus,${arms.mkString(",")}}""")
    spark.stop()
  }
}
