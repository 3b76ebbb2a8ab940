package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide physical-plan audit: no registered batch query may plan a
  * CartesianProduct — the one join shape that cannot survive a 100 TB
  * input on either side. Single-row stats cross-joins are fine (they
  * plan as BroadcastNestedLoopJoin over a 1-row build side); an actual
  * CartesianProduct means an equi-condition was lost.
  *
  * Streaming queries are excluded (building them executes the stream;
  * their plans are pinned by their own specs/oracles).
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private val excluded: String => Boolean = name =>
    name.startsWith("stream_")

  test("no registered batch query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(excluded)
      .flatMap { name =>
        val plan =
          try SparkEntry.queries(name)(spark, sf)
            .queryExecution.executedPlan.toString
          catch {
            case scala.util.control.NonFatal(e) =>
              fail(s"$name failed to plan: ${e.getMessage}")
          }
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }
}
