package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck invariants of the segmented-scan CUSUM
  * (`Stats.cusumScanFrom`) against the ordered-window spelling
  * (`Stats.cusumSparkSql`) over RANDOMIZED inputs — shapes the events
  * fixture cannot produce: net-negative metrics (the sign-safe floor
  * mean), duplicate timestamps across chunk boundaries, single-row and
  * single-type corpora, alarm episodes opening exactly at a chunk's
  * first row, all-quiet and all-alarming series, NULL values. Each
  * case runs both spellings on a real local session and demands
  * EXACT row equality (everything is integer arithmetic — there is no
  * tolerance to hide behind). */
class CusumPropsSpec extends AnyFunSuite {

  // OWN session (shared context, separate temp-view catalog): this spec
  // re-binds the `events` view to randomized frames, and sbt runs
  // suites concurrently in one JVM — mutating the shared session's
  // view races every other suite's Tables.sql query (observed as
  // CusumScanSpec/CorpusSpec failing only in full-suite runs)
  private lazy val spark = GraftSpark.spark.newSession()

  private val genRow: Gen[(Long, Long, String, Option[Double])] = for {
    id <- Gen.choose(0L, 5000L)
    tsOff <- Gen.choose(0L, 2000L)
    typ <- Gen.oneOf("a", "b", "c")
    v <- Gen.frequency(
      9 -> Gen.choose(-3000.0, 3000.0).map(Some(_)),
      1 -> Gen.const(None))
  } yield (id, tsOff, typ, v)

  private val genEvents: Gen[List[(Long, Long, String, Option[Double])]] =
    Gen.choose(1, 400).flatMap(n => Gen.listOfN(n, genRow))

  private def runBoth(rows: List[(Long, Long, String, Option[Double])],
                      chunks: Int): Unit = {
    import spark.implicits._
    import graft.relational.Stats
    // event_id made unique (gen base + index): the (ts, event_id) sort
    // key must be a total order or BOTH spellings' tie-breaks are
    // arbitrary and the comparison tests nothing
    val df = rows.zipWithIndex.map { case ((id, tsOff, typ, v), i) =>
      (id * 10000L + i,
        new java.sql.Timestamp(1700000000000L + tsOff * 1000L),
        typ, v.map(Double.box).orNull.asInstanceOf[java.lang.Double])
    }.toDF("event_id", "ts", "event_type", "value")
    df.createOrReplaceTempView("events")
    val window = spark.sql(Stats.cusumSparkSql).collect()
      .map(_.toSeq.toList).toList
    val (scanDf, persisted) = Stats.cusumScanFrom(spark, df, chunks)
    try {
      val scan = scanDf.collect().map(_.toSeq.toList).toList
      assert(scan == window,
        s"chunks=$chunks rows=${rows.length}\nscan:   $scan\nwindow: $window")
    } finally persisted.unpersist(blocking = false)
  }

  test("scan == window on randomized corpora across chunk counts") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25),
      Prop.forAll(genEvents, Gen.oneOf(1, 2, 3, 7, 16)) { (rows, chunks) =>
        runBoth(rows, chunks); true
      })
    assert(res.passed, res.status.toString)
  }

  test("net-negative metric: sign-safe floor mean agrees at every chunking") {
    // all-negative values force sv < 0 — the div/floor divergence zone
    val rows = (0 until 97).map(i =>
      (i.toLong, i.toLong, if (i % 2 == 0) "a" else "b",
        Some(-1000.0 - i * 13 % 700))).toList
    Seq(1, 4, 13).foreach(runBoth(rows, _))
  }

  test("degenerate corpora: single row, one type, duplicate timestamps") {
    runBoth(List((1L, 5L, "a", Some(42.0))), 3)
    runBoth((0 until 50).map(i =>
      (i.toLong, 7L, "a", Some(500.0 + i))).toList, 8) // all-equal ts
  }
}
