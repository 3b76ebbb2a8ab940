package graft.text

import graft.Tables
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators beyond per-doc analysis: training-shard
  * packing and PII scrubbing (north-star extensions; no reference
  * analog — these are the ops a 100 TB training-data pipeline runs after
  * filtering/dedup and before tokenization).
  */
object Corpus {

  /** Tokens per shard for `corpus_pack`. Small on the test corpus so the
    * result has many shards; at scale this is ~shard-file size in tokens. */
  val ShardBudget = 4096L

  private val packCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Token-budget shard packing: assign documents (in doc_id order) to
    * consecutive training shards of ~`budget` tokens, shard boundary at
    * `floor(tokens_before_doc / budget)`.
    *
    * The naive spelling is a single global window
    * (`SUM(toks) OVER (ORDER BY doc_id)`) — an unpartitioned sort that
    * serializes 100 TB through one task. This implementation is the
    * classic two-phase distributed scan instead:
    *   1. `repartitionByRange(doc_id) + sortWithinPartitions` — the only
    *      shuffle, and partition index order IS global doc_id order;
    *   2. per-partition token sums (P longs to the driver — metadata,
    *      not data), exclusive-prefix them, broadcast the offsets;
    *   3. map-side running sum per partition resumes from its offset.
    * Every stage is parallel; driver traffic is O(partitions).
    * `CorpusSpec` pins equality with the single-window spelling. */
  def pack(spark: SparkSession, dir: String,
           budget: Long = ShardBudget): DataFrame = {
    val key = spark.sparkContext.applicationId + " " + dir + " " + budget
    packCache.computeIfAbsent(key, _ => {
      import spark.implicits._
      val p = spark.sparkContext.defaultParallelism
      val toks = Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          expr("CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)").as("toks"))
        .repartitionByRange(p, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .as[(Long, Long)]
        .persist()
      val partSums = toks.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var s = 0L
        it.foreach { case (_, t) => s += t }
        Iterator.single((pid, s))
      }.collect().toMap
      val nParts = toks.rdd.getNumPartitions
      val offsets = new Array[Long](nParts)
      var acc = 0L
      var i = 0
      while (i < nParts) {
        offsets(i) = acc
        acc += partSums.getOrElse(i, 0L)
        i += 1
      }
      val bc = spark.sparkContext.broadcast(offsets)
      toks.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var run = bc.value(pid)
        it.map { case (id, t) =>
          val shard = run / budget
          run += t
          (id, t, shard)
        }
      }.toDF("doc_id", "toks", "shard_id")
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("tok_sum"))
        .orderBy("shard_id")
    })
  }

  /** Oracle: the single-window spelling of the same prefix sum. */
  val packDuckSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, toks,
       |         COALESCE(SUM(toks) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
       |  FROM t)
       |SELECT CAST(before // $ShardBudget AS BIGINT) AS shard_id,
       |       COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS tok_sum
       |FROM c GROUP BY 1 ORDER BY shard_id""".stripMargin

  /** PII scrub: redact email addresses and digit runs, count both, and
    * fingerprint the scrubbed text — pure projection (no shuffle), the
    * map-side normalization pass of a corpus pipeline. Identical regex
    * semantics in both engines (character classes + bounded repeats
    * only). The synthetic corpus contains no PII, so both engines first
    * append the same deterministic contact line — the scrub is then
    * non-vacuous and the md5 only matches if redaction behaved
    * identically. */
  // [.] not \. — Spark SQL string literals eat single backslashes, so
  // '\.' would reach the regex engine as a bare wildcard dot
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  private val numRe = "[0-9]+"
  private val withPii =
    "text || ' contact user' || CAST(doc_id AS STRING) || " +
      "'@example.com ref ' || CAST(doc_id * 37 AS STRING)"
  private val withPiiDuck = withPii.replace("AS STRING", "AS VARCHAR")

  val piiSparkSql: String =
    s"""WITH t AS (SELECT doc_id, $withPii AS txt FROM documents)
       |SELECT doc_id,
       |  CAST(size(regexp_extract_all(txt, '$emailRe', 0)) AS BIGINT) AS n_email,
       |  CAST(size(regexp_extract_all(txt, '$numRe', 0)) AS BIGINT) AS n_num,
       |  md5(regexp_replace(regexp_replace(txt, '$emailRe', '<EMAIL>'),
       |      '$numRe', '<NUM>')) AS scrub_md5
       |FROM t ORDER BY doc_id""".stripMargin

  val piiDuckSql: String =
    s"""WITH t AS (SELECT doc_id, $withPiiDuck AS txt FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(txt, '$emailRe')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(txt, '$numRe')) AS BIGINT) AS n_num,
       |  md5(regexp_replace(regexp_replace(txt, '$emailRe', '<EMAIL>', 'g'),
       |      '$numRe', '<NUM>', 'g')) AS scrub_md5
       |FROM t ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_pack" -> ((s, d) => pack(s, d)),
    "text_pii" -> Tables.sql(piiSparkSql)
  )

  val oracleSql: Map[String, String] = Map(
    "corpus_pack" -> packDuckSql,
    "text_pii" -> piiDuckSql
  )
}
