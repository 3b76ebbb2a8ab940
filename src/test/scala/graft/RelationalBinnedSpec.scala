package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins `q38_window_distribution_binned` (the 100 TB spelling of
  * `q38_window_distribution`) to the exact query:
  *
  *  - per row, the binned percent_rank/cume_dist may differ from the
  *    exact ones by at most that priority's largest bin share (all of
  *    a bin's rows collapse to the bin's rank), and the quartile by at
  *    most 1 (a bin can straddle one ntile boundary);
  *  - the plan must do the distribution work on the bin histogram —
  *    windows partitioned (never global) and fed by the (pri, bin)
  *    aggregate, rows re-joined by BROADCAST, and no sort-merge join
  *    or row-sized window sort anywhere.
  */
class RelationalBinnedSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("binned q38 tracks the exact distribution within the bin-mass " +
    "bound") {
    val exact = SparkEntry.queries("q38_window_distribution")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getInt(2), r.getDouble(3), r.getDouble(4))).toMap
    val binned = SparkEntry.queries("q38_window_distribution_binned")(
      spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3) / 1e6, r.getLong(4) / 1e6)).toMap
    assert(exact.keySet == binned.keySet && exact.nonEmpty)
    // the largest bin share per priority, read off the binned rows
    // themselves: cd − pr ≈ binShare (exact up to the 1/(n−1) vs 1/n
    // denominators, covered by the slack below)
    val maxShare = binned.toSeq
      .groupBy(_._1._1)
      .view.mapValues(_.map { case (_, (_, pr, cd)) => cd - pr }.max)
      .toMap
    exact.foreach { case (key @ (pri, _), (qE, prE, cdE)) =>
      val (qB, prB, cdB) = binned(key)
      val tol = maxShare(pri) + 2e-3
      assert(math.abs(prB - prE) <= tol, s"$key pr: $prB vs $prE")
      assert(math.abs(cdB - cdE) <= tol, s"$key cd: $cdB vs $cdE")
      assert(math.abs(qB - qE) <= 1, s"$key quartile: $qB vs $qE")
    }
  }

  test("binned q38 plans bin-sized windows and broadcast re-join — " +
    "no row-sized sort") {
    val plan = SparkEntry.queries("q38_window_distribution_binned")(
      spark, sf).queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("No Partition Defined"), "global window")
    val winIdx = plan.indexOf("Window [")
    assert(winIdx >= 0, "no window in plan")
    // the Window's input carries the bin column — it reads the
    // (pri, bin) histogram aggregate, never the orders rows
    assert(plan.indexOf("bin", winIdx) >= 0,
      s"window not over the bin histogram:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"row re-join did not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"row-sized shuffle join in the binned plan:\n$plan")
  }
}
