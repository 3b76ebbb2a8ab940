package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the registered `stats_cusum` (the two-phase segmented scan,
  * `Stats.cusumScan`) to the per-type ordered-window spelling it
  * replaced (`Stats.cusumSparkSql`, kept as the exact reference): the
  * closed form S_t = C_t − min(0, min prefix C) is a prefix sum plus a
  * prefix min — associative scans — so the chunked evaluation must
  * reproduce the window evaluation's exact BIGINT outputs row for row,
  * including the cross-chunk pieces (episode counting via the previous
  * chunk's closing statistic, global row numbers via count offsets). */
class CusumScanSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("segmented scan equals the ordered-window spelling exactly") {
    import graft.relational.Stats
    val scan = Stats.cusumScan(spark, sf).collect()
      .map(r => r.toSeq.toList)
    val window = Tables.sql(Stats.cusumSparkSql)(spark, sf).collect()
      .map(r => r.toSeq.toList)
    assert(scan.nonEmpty)
    assert(scan.toList == window.toList)
  }

  test("scan stays exact when forced through many tiny chunks") {
    // 32 chunks over sf0.001's ~3k events ≈ 20 rows per chunk per
    // type: every cross-chunk hazard (episodes straddling boundaries,
    // first-alarm row offsets, opening prev_st) fires many times
    import graft.relational.Stats
    val window = Tables.sql(Stats.cusumSparkSql)(spark, sf).collect()
      .map(r => r.toSeq.toList)
    val scan = Stats.cusumScan(spark, sf, chunks = 32).collect()
      .map(r => r.toSeq.toList)
    assert(scan.toList == window.toList)
  }
}
