package graft.relational

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the built-in Catalyst surface lacks: as-of
  * join and interval (range) join. Both are implemented as *relational
  * rewrites* — compositions of shuffle/sort/window/equi-join operators
  * Catalyst already optimizes — rather than custom physical plans, so
  * they inherit AQE, whole-stage codegen, and spill handling for free.
  *
  * Scale rationale (100 TB):
  *  - A naive `l JOIN r ON l.k = r.k AND r.ts <= l.ts` + per-key max
  *    re-aggregation shuffles the full candidate cross-section per key
  *    (quadratic in events-per-key). The union+window as-of below is one
  *    hash shuffle + one sort per side — the same cost envelope as a
  *    sort-merge join — and the running `last()` state is O(1) per row.
  *  - A pure range predicate (no equi key) falls off Catalyst's equi-join
  *    path entirely and plans as BroadcastNestedLoopJoin — O(|L|·|R|)
  *    comparisons and a broadcast of a possibly-huge side. The bucketed
  *    interval join turns the range into an equi-key (time bin) with a
  *    bounded fan-out of ceil(span/width)+1 bins per left row, restoring
  *    a shuffled hash join whose cost is O(|L|+|R|+|out|).
  */
object TemporalJoins {

  /** Distributed as-of join: for each left row, the single right row with
    * the same `keys` and the nearest `rightTs` at-or-before (direction =
    * "backward") or at-or-after ("forward") `leftTs`.
    *
    * Contract: `right`'s non-key column names must not collide with
    * `left`'s (rename before calling); the matched right payload columns
    * are appended to the left row, null when no match (left-outer
    * semantics; filter on a payload column for inner).
    *
    * Mechanism: tag rows with a side marker, union both sides, then over
    * a window partitioned by `keys` and ordered by (ts, side, payload)
    * take the running `last` non-null right payload. Right rows sort
    * before left rows at equal ts, making the bound inclusive; the
    * payload struct itself is the final sort key, so ties among right
    * rows resolve deterministically (max struct wins).
    *
    * `toleranceMicros` nulls out matches farther than the given gap —
    * the match is dropped, not replaced with the next-nearest (same as
    * pandas/polars as-of tolerance semantics).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      direction: String = "backward",
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val collisions = payloadCols.toSet intersect left.columns.toSet
    require(collisions.isEmpty,
      s"right payload columns collide with left: ${collisions.mkString(",")}")

    val lStruct = struct(left.columns.toSeq.map(col): _*)
    val rStruct = struct(payloadCols.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    val lPart = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).cast("timestamp").as("__ts"),
        lit(1).as("__side"),
        lStruct.as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val rPart = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).cast("timestamp").as("__ts"),
        lit(0).as("__side"),
        lit(null).cast(lType).as("__l"),
        rStruct.as("__r")): _*)

    val tsOrd = if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrd, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedRaw = last(col("__r"), ignoreNulls = true).over(w)
    // ts of the matched row: nulls align with __r (both null exactly on
    // left-side rows), so the two running `last`s pick the same row
    val matchedTs = last(when(col("__side") === 0, col("__ts")),
      ignoreNulls = true).over(w)

    val joined = lPart.unionByName(rPart)
      .select(col("__side"), col("__l"), matchedRaw.as("__m"),
        matchedTs.as("__mts"), col("__ts"))
      .where(col("__side") === 1)

    val gap =
      if (direction == "backward") unix_micros(col("__ts")) - unix_micros(col("__mts"))
      else unix_micros(col("__mts")) - unix_micros(col("__ts"))
    val bounded = toleranceMicros match {
      case Some(tol) => joined.withColumn("__m",
        when(col("__mts").isNotNull && gap <= tol, col("__m")))
      case None => joined
    }

    bounded.select(
      left.columns.toSeq.map(c => col(s"__l.$c").as(c)) ++
        payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Floor-division time bin, sign-safe (pmod keeps the remainder
    * non-negative) and exact (the difference is a multiple of `w`, and
    * all magnitudes stay below 2^53). */
  private def binOf(micros: Column, w: Long): Column =
    ((micros - pmod(micros, lit(w))) / lit(w)).cast("long")

  /** Bucketed interval join: rows match when
    * `delta = rightTs - leftTs` lies in [minDelta, maxDelta] micros
    * (either bound exclusive via `minOpen`/`maxOpen`), plus optional
    * equi-`keys`. Left columns must not collide with right columns.
    *
    * The range is turned into an equi-join on a time bucket of width
    * `maxDelta - minDelta`: each left row probes the ceil(span/width)+1
    * = 2 consecutive buckets its candidate window overlaps, the join runs
    * as a shuffled hash/sort-merge join on (bucket, keys), and the exact
    * predicate filters residuals. No broadcast-nested-loop, no cartesian.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      minDelta: Long,
      maxDelta: Long,
      keys: Seq[String] = Nil,
      minOpen: Boolean = false,
      maxOpen: Boolean = false): DataFrame = {
    require(maxDelta >= minDelta, "maxDelta must be >= minDelta")
    val collisions =
      (left.columns.toSet intersect right.columns.toSet) -- keys
    require(collisions.isEmpty,
      s"column collision between sides: ${collisions.mkString(",")}")
    val w = math.max(maxDelta - minDelta, 1L)

    val l2 = left
      .withColumn("__lm", unix_micros(col(leftTs).cast("timestamp")))
      .withColumn("__bin", explode(sequence(
        binOf(col("__lm") + lit(minDelta), w),
        binOf(col("__lm") + lit(maxDelta), w))))
    val r2 = right
      .withColumn("__rm", unix_micros(col(rightTs).cast("timestamp")))
      .withColumn("__bin", binOf(col("__rm"), w))

    val L = l2.as("L"); val R = r2.as("R")
    val delta = col("R.__rm") - col("L.__lm")
    val lo = if (minOpen) delta > minDelta else delta >= minDelta
    val hi = if (maxOpen) delta < maxDelta else delta <= maxDelta
    val keyCond = (col("L.__bin") === col("R.__bin")) +:
      keys.map(k => col(s"L.$k") === col(s"R.$k"))
    val joined = L.join(R, keyCond.reduce(_ && _) && lo && hi, "inner")
      .drop("__lm", "__rm").drop(col("L.__bin")).drop(col("R.__bin"))
    // shared equi-key columns are equal by construction — emit L's copy
    keys.foldLeft(joined)((df, k) => df.drop(col(s"R.$k")))
  }

  // ---- contract queries -------------------------------------------------

  /** q28: each purchase matched to the user's latest at-or-earlier view. */
  private def asofQuery(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.load(s, d, "events")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_event_id"))
    asofJoin(purchases, views, Seq("user_id"), "ts", "view_ts")
      .select(col("event_id"), col("user_id"), col("view_event_id"))
      .orderBy("event_id")
  }

  private val asofOracle: String =
    """SELECT p.event_id, p.user_id, v.event_id AS view_event_id
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN
      |     (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'view') v
      |ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY p.event_id""".stripMargin

  /** q29: error → signups in the following hour, across ALL users (no
    * equi key — the case Catalyst would plan as a nested-loop join). */
  private def rangeQuery(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.load(s, d, "events")
    val errs = ev.where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"))
    val signups = ev.where(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts").as("signup_ts"))
    intervalJoin(errs, signups, "err_ts", "signup_ts",
        minDelta = 0L, maxDelta = 3600L * 1000000L, minOpen = true)
      .select(col("err_id"), col("signup_id"))
      .orderBy("err_id", "signup_id")
  }

  private val rangeOracle: String =
    """SELECT e.event_id AS err_id, s.event_id AS signup_id
      |FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'error') e
      |JOIN (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'signup') s
      |  ON s.ts > e.ts AND s.ts <= e.ts + INTERVAL 1 HOUR
      |ORDER BY err_id, signup_id""".stripMargin

  /** q40: the scale-correct spelling of q29. Pair DENSITY inside the
    * interval is quadratic in event rate (measured ×100 output at ×10
    * data in the sf1 record), so materializing pairs is the wrong
    * production shape — aggregate them instead: per-error signup count.
    * The same bucketed interval join feeds a partial-aggregating
    * `groupBy` — pair rows stream map-side into per-error partials and
    * the exchange carries O(|errors|) rows, never the pair set. */
  private def rangeAggQuery(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.load(s, d, "events")
    val errs = ev.where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"))
    val signups = ev.where(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts").as("signup_ts"))
    intervalJoin(errs, signups, "err_ts", "signup_ts",
        minDelta = 0L, maxDelta = 3600L * 1000000L, minOpen = true)
      .groupBy(col("err_id"))
      .agg(org.apache.spark.sql.functions.count(col("signup_id"))
        .as("n_signups"))
      .orderBy("err_id")
  }

  private val rangeAggOracle: String =
    """SELECT e.event_id AS err_id, COUNT(s.event_id) AS n_signups
      |FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'error') e
      |JOIN (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'signup') s
      |  ON s.ts > e.ts AND s.ts <= e.ts + INTERVAL 1 HOUR
      |GROUP BY e.event_id
      |ORDER BY err_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_asof_join" -> (asofQuery _),
    "q29_range_join" -> (rangeQuery _),
    "q40_range_join_agg" -> (rangeAggQuery _))

  val oracleSql: Map[String, String] = Map(
    "q28_asof_join" -> asofOracle,
    "q29_range_join" -> rangeOracle,
    "q40_range_join_agg" -> rangeAggOracle)
}
