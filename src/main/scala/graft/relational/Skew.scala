package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys (the classic 100 TB
  * failure mode: one key owns a double-digit share of the fact table, so
  * the hash-partitioned join puts that share on ONE task).
  *
  * `saltedJoin` scatters the big side across `salt` sub-keys and
  * replicates the (broadcastable-or-small) side once per sub-key, so the
  * heavy key's rows spread over `salt` tasks. Result set is identical to
  * the plain join: every big row matches exactly the one replica that
  * carries its salt.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in this engine's sessions) handles sort-merge cases at
  * runtime; explicit salting remains the tool when the skew is known in
  * advance, the join is hash-based, or the aggregation after the join
  * inherits the skew.
  */
object Skew {

  /** Inner equi-join with the big side salted `salt` ways. Keys must be
    * single columns; extra join conditions can be applied downstream. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String, salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    // per-row deterministic salt on the big side: hash of the whole row
    // scatters duplicates of the heavy key evenly
    val bigCols: Seq[Column] = big.columns.map(col).toSeq
    val salted = big.withColumn("_salt",
      pmod(abs(hash(bigCols: _*)), lit(salt)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** Salted aggregation: two-phase groupBy for skewed group keys —
    * partial agg on (key, salt), final agg on key. Catalyst already does
    * map-side partial aggregation; this forces an extra reduce level for
    * the case where even the partially-aggregated heavy key overwhelms
    * one reducer (e.g. collect_list-style aggs that don't combine). */
  def saltedCount(df: DataFrame, key: String, salt: Int): DataFrame =
    df.withColumn("_salt", pmod(abs(hash(df.columns.map(col).toSeq: _*)), lit(salt)))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum("_partial").as("n"))
}
