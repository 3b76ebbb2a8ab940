package graft

import org.scalatest.funsuite.AnyFunSuite

/** Event-time-timeout sessionization: the answer must equal batch
  * sessionization (shared DuckDB oracle does this per round at sf0.01;
  * here pinned in-process at sf0.001 against a Spark SQL respelling),
  * AND the timeout path must actually fire — a broken expiry would
  * still answer correctly via update-mode emissions, so the spec
  * asserts the timed-out count directly. */
class SessionTtlSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  test("sessionizeTtl equals batch sessionization and expires state") {
    val got = graft.streaming.StreamingOps
      .sessionizeTtl(spark, GraftSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted

    Tables.register(spark, GraftSpark.sf)
    val expect = spark.sql(
      s"""WITH o AS (
         |  SELECT user_id, event_id,
         |         unix_seconds(CAST(ts AS TIMESTAMP)) AS sec
         |  FROM events),
         |e AS (
         |  SELECT user_id, sec,
         |         LAG(sec) OVER (PARTITION BY user_id
         |                        ORDER BY sec, event_id) AS prev,
         |         event_id
         |  FROM o),
         |s AS (
         |  SELECT user_id, sec,
         |         SUM(CASE WHEN prev IS NULL OR
         |                       sec - prev > ${graft.streaming.StreamingOps.SessionGapSec}
         |             THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY user_id ORDER BY sec, event_id) AS sid
         |  FROM e)
         |SELECT user_id, CAST(sid AS BIGINT) AS sid, COUNT(*) AS n,
         |       MAX(sec) - MIN(sec) AS dur_s
         |FROM s GROUP BY user_id, sid""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted

    assert(got == expect)
    val fired = graft.streaming.StreamingOps.lastTtlTimeouts
    assert(fired > 0, s"event-time timeouts never fired (count=$fired)")
  }
}
