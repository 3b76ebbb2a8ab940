package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev-only diagnostic (optimization guide §1): run named registered
  * queries once warm + once timed under the Bench session shape with a
  * listener that prints per-job wall time and per-stage task totals
  * (task time, shuffle read/write bytes, spill), so a query's cost can
  * be attributed to its jobs/stages without the Spark UI.
  *
  * Usage: runMain graft.Profile <sfDir> <query> [<query>...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Profile <sfDir> <query> [<query>...]")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
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

    final case class StageAgg(var name: String = "", var tasks: Int = 0,
      var taskMs: Long = 0, var shufReadB: Long = 0, var shufWriteB: Long = 0,
      var inputB: Long = 0, var spillB: Long = 0, var gcMs: Long = 0)
    // listener state is mutated on the listener-bus thread and read on
    // the main thread after a waitUntilEmpty drain; the shared lock
    // gives the read a happens-before edge (the sleep it replaces had
    // neither a guaranteed drain nor any ordering)
    val lock = new Object
    val jobStart = mutable.Map[Int, Long]()
    val jobLines = mutable.ArrayBuffer[String]()
    val stages = mutable.Map[Int, StageAgg]()
    @volatile var collecting = false

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (collecting) {
        lock.synchronized { jobStart(j.jobId) = j.time; () }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (collecting) {
        lock.synchronized {
          val ms = j.time - jobStart.getOrElse(j.jobId, j.time)
          jobLines += f"  job ${j.jobId}%3d  ${ms}%6d ms"
          ()
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (collecting) {
        lock.synchronized {
          val a = stages.getOrElseUpdate(t.stageId, StageAgg())
          a.tasks += 1
          val m = t.taskMetrics
          if (m != null) {
            a.taskMs += m.executorRunTime
            a.gcMs += m.jvmGCTime
            a.shufReadB += m.shuffleReadMetrics.totalBytesRead
            a.shufWriteB += m.shuffleWriteMetrics.bytesWritten
            a.inputB += m.inputMetrics.bytesRead
            a.spillB += m.memoryBytesSpilled
          }
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (collecting) {
          lock.synchronized {
            val a = stages.getOrElseUpdate(s.stageInfo.stageId, StageAgg())
            a.name = s.stageInfo.name.takeWhile(_ != '\n').take(90)
          }
        }
    })

    names.foreach { name =>
      val q = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      // warm (codegen + landings)
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      lock.synchronized { jobStart.clear(); jobLines.clear(); stages.clear() }
      collecting = true
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // deterministic drain: every queued listener event lands before
      // collecting flips off and the maps are read. listenerBus is
      // private[spark] (public in bytecode), so reflect — dev-only tool.
      val bus = spark.sparkContext.getClass
        .getMethod("listenerBus").invoke(spark.sparkContext)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      collecting = false
      lock.synchronized {
        println(f"\n== $name  wall=$wall%.2f s  jobs=${jobLines.size}")
        jobLines.foreach(println)
        val byStage = stages.toSeq.sortBy(-_._2.taskMs).take(14)
        byStage.foreach { case (sid, a) =>
          println(f"  stage $sid%4d tasks=${a.tasks}%3d task=${a.taskMs}%6d ms " +
            f"gc=${a.gcMs}%4d in=${a.inputB / 1024}%6d K sr=${a.shufReadB / 1024}%6d K " +
            f"sw=${a.shufWriteB / 1024}%6d K spill=${a.spillB / 1024}%5d K  ${a.name}")
        }
      }
    }
    spark.stop()
  }
}
