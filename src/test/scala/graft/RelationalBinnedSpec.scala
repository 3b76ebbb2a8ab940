package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins `q38_window_distribution_binned` (the 100 TB spelling of
  * `q38_window_distribution`) to the exact query:
  *
  *  - the binned output is the per-(priority, bin) distribution table;
  *    every exact row, mapped to its bin by the same integer formula,
  *    must find statistics within that priority's largest bin share of
  *    its exact percent_rank/cume_dist (all of a bin's rows collapse
  *    to the bin's rank) and a quartile within 1 (a bin can straddle
  *    one ntile boundary); the per-bin counts must total the rows;
  *  - the plan must do the work on the histogram: windows partitioned
  *    (never global) over the bin aggregate, extents broadcast, no
  *    sort-merge join and no row-sized window sort anywhere.
  */
class RelationalBinnedSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("binned q38 tracks the exact distribution within the bin-mass " +
    "bound") {
    val cents = Tables.load(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_orderpriority",
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val extents = cents.values.groupBy(_._1)
      .view.mapValues(vs => (vs.map(_._2).min, vs.map(_._2).max)).toMap
    def binOf(pri: String, v: Long): Long = {
      val (lo, hi) = extents(pri)
      (v - lo) * 64 / (hi - lo + 1)
    }
    val binned = SparkEntry.queries("q38_window_distribution_binned")(
      spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4) / 1e6,
          r.getLong(5) / 1e6)).toMap
    assert(binned.nonEmpty)
    // per-bin counts total the per-priority row counts
    val nByPri = binned.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2._1).sum).toMap
    val exactN = cents.values.groupBy(_._1)
      .view.mapValues(_.size.toLong).toMap
    assert(nByPri == exactN.toMap)
    val maxShare = binned.toSeq.groupBy(_._1._1)
      .view.mapValues(bs => bs.map(_._2._1).max.toDouble /
        bs.map(_._2._1).sum).toMap
    val exact = SparkEntry.queries("q38_window_distribution")(spark, sf)
      .collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val (pri, k) = (r.getString(0), r.getLong(1))
      val (qE, prE, cdE) = (r.getInt(2), r.getDouble(3), r.getDouble(4))
      val key = (pri, binOf(pri, cents(k)._2))
      assert(binned.contains(key), s"row $k: no bin row $key")
      val (_, qB, prB, cdB) = binned(key)
      val tol = maxShare(pri) + 2e-3
      assert(math.abs(prB - prE) <= tol, s"$key pr: $prB vs $prE")
      assert(math.abs(cdB - cdE) <= tol, s"$key cd: $cdB vs $cdE")
      assert(math.abs(qB - qE) <= 1, s"$key quartile: $qB vs $qE")
    }
  }

  test("binned q38 plans bin-sized windows over the histogram — " +
    "broadcast extents, no row-sized sort") {
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
      s"extents join did not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"row-sized shuffle join in the binned plan:\n$plan")
  }
}
