package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck invariants of `stats_mad_outliers_binned` over randomized
  * event sets — shapes the synthetic fixture cannot produce: degenerate
  * extents (all values equal → one bin), single-row types, negative
  * values, tie-heavy narrow domains, and tiny corpora. Each case runs
  * the registered SQL on a real session (own temp-view catalog — the
  * CusumPropsSpec isolation lesson) and checks against an in-Scala
  * exact model:
  *   - `n` matches the per-type row count;
  *   - `med_milli` lands in the same bin as the exact lower median
  *     (rank `(n+1) div 2`), i.e. within one bin width + 1 milli;
  *   - `mad_milli` within one deviation-bin width of the exact lower
  *     median of |v − med_milli| (deviations taken from the BINNED
  *     median — the statistic the query actually computes);
  *   - `n_outliers` EXACTLY equals the model's count under the integer
  *     threshold `10000·dev > 44478·mad_milli` — the outlier pass is
  *     deterministic given the two estimates, so no tolerance. */
class MadBinnedPropsSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark.newSession()

  private val B = graft.relational.Stats.MadBins

  private val genEvents: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 300)
    rows <- Gen.listOfN(n, for {
      typ <- Gen.oneOf("click", "view")
      // milli-units; narrow domains force heavy ties and empty bins,
      // the constant forces the lo = hi degenerate divisor guard
      m <- Gen.frequency(
        3 -> Gen.choose(-1000000L, 1000000L),
        1 -> Gen.choose(0L, 40L),
        1 -> Gen.const(-777L))
    } yield (typ, m))
  } yield rows

  private def runCase(rows: List[(String, Long)]): Unit = {
    import spark.implicits._
    rows.map { case (t, m) => (t, m / 1000.0) }
      .toDF("event_type", "value")
      .createOrReplaceTempView("events")
    val out = spark
      .sql(graft.relational.Stats.madOutliersBinnedSparkSql).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val byType = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(out.keySet == byType.keySet)
    byType.foreach { case (t, vs) =>
      val (n, med, mad, nOut) = out(t)
      assert(n == vs.size, s"$t n $n vs ${vs.size}")
      val sorted = vs.sorted
      val pos = (vs.size + 1) / 2 // lower-median rank, 1-based
      val w = sorted.max - sorted.min + 1
      // the query's median bin contains the rank-pos value, and the
      // emitted estimate is that bin's midpoint: same-bin ⇒ within one
      // bin width (+1 for the integer-division edges)
      val tol = w / B + 1
      assert(math.abs(med - sorted(pos - 1)) <= tol,
        s"$t med $med vs exact ${sorted(pos - 1)} (tol $tol)")
      val devs = vs.map(v => math.abs(v - med)).sorted
      // the query bins deviations over [0, dhi] with dhi derived from
      // the value extents (max(hi-med, med-lo)), not the observed
      // deviation range — the model must use the same width
      val dhi = math.max(sorted.max - med, med - sorted.min)
      val dtol = (dhi + 1) / B + 1
      assert(math.abs(mad - devs(pos - 1)) <= dtol,
        s"$t mad $mad vs exact ${devs(pos - 1)} (tol $dtol)")
      val expOut = vs.count(v => 10000 * math.abs(v - med) > 44478 * mad)
      assert(nOut == expOut, s"$t outliers $nOut vs $expOut")
    }
  }

  test("binned median/MAD invariants hold on randomized event sets") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAll(genEvents) { rows => runCase(rows); true })
    assert(res.passed, res.status.toString)
  }

  test("degenerate extents: all values equal collapse to zero MAD and " +
    "zero outliers") {
    runCase(List.fill(40)(("click", 5000L)))
  }

  test("single-row type exercises the rank-1 median") {
    runCase(List(("click", -123L)))
  }
}
