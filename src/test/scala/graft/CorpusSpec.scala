package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the round-4 corpus/relational additions:
  *
  *  - `corpus_pack`'s two-phase distributed scan must equal the naive
  *    single-window prefix sum (the oracle spelling), while actually
  *    running over multiple range partitions.
  *  - `text_pii` must be non-vacuous (digit runs exist in the corpus).
  *  - `q31_sliding_window`: length/slide = 2 ⇒ every event is counted in
  *    exactly two windows.
  *  - `q33_upsert`: merged cardinality = base + new keys; updated keys
  *    keep their bumped price.
  *  - `mm_audio_features` / `embed_quantize` bounds sanity.
  */
class CorpusSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("corpus_pack: distributed scan equals single-window prefix sum") {
    import spark.implicits._
    val got = text.Corpus.pack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // naive spelling: one global window (what the DuckDB oracle runs)
    Tables.register(spark, sf)
    val naive = spark.sql(
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS toks
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, toks,
         |         COALESCE(SUM(toks) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
         |  FROM t)
         |SELECT CAST(bef DIV ${text.Corpus.ShardBudget} AS BIGINT) AS shard_id,
         |       COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS tok_sum
         |FROM c GROUP BY 1 ORDER BY shard_id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == naive)
    assert(got.size > 1, "budget too large: packing produced a single shard")
  }

  test("text_pii redacts the injected contact line in every document") {
    val df = text.Corpus.queries("text_pii")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 1, s"doc ${r.getLong(0)}: email not matched")
      assert(r.getLong(2) >= 1, s"doc ${r.getLong(0)}: digit run not matched")
    }
  }

  test("q31 sliding window counts every event exactly twice") {
    Tables.register(spark, sf)
    val events = spark.table("events").count()
    val windowed = relational.Relational.queries("q31_sliding_window")(spark, sf)
      .agg(sum("n")).head().getLong(0)
    assert(windowed == 2 * events, s"$windowed != 2*$events")
  }

  test("q33 upsert: merged cardinality and updated prices") {
    Tables.register(spark, sf)
    val base = spark.table("orders")
    val nBase = base.count()
    val nNew = base.where("o_orderkey % 97 = 0").count()
    val merged = relational.Relational.queries("q33_upsert")(spark, sf)
    assert(merged.agg(sum("n")).head().getLong(0) == nBase + nNew)
    // bucket sums must reflect the 10% price bump on keys ≡ 3 (mod 10):
    // recompute one bucket's expected total directly
    val bump = base.where("o_orderkey % 10 = 3")
      .select(round(col("o_totalprice") * 1.1, 2).as("p"),
        (col("o_orderkey") % 7).as("bucket"))
    val keep = base.where("o_orderkey % 10 != 3")
      .select(col("o_totalprice").as("p"), (col("o_orderkey") % 7).as("bucket"))
    val nw = base.where("o_orderkey % 97 = 0")
      .select(col("o_totalprice").as("p"),
        ((col("o_orderkey") + 10000000L) % 7).as("bucket"))
    val expected = bump.unionByName(keep).unionByName(nw)
      .groupBy("bucket").agg(round(sum("p"), 2).as("tot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    merged.collect().foreach { r =>
      assert(math.abs(r.getDouble(2) - expected(r.getLong(0))) < 1e-6,
        s"bucket ${r.getLong(0)}")
    }
  }

  test("q33 upsert plan broadcasts the update keys — base side never shuffles") {
    Tables.register(spark, sf)
    val plan = relational.Relational.queries("q33_upsert")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"anti-join did not broadcast:\n$plan")
  }

  test("embed_quantize values stay in int8 range") {
    val rows = similarity.Similarity.queries("embed_quantize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= -128 && r.getLong(1) <= 127, "q_min")
      assert(r.getLong(2) >= -127 && r.getLong(2) <= 127, "q_max")
      // max-|x| element quantizes to exactly ±127
      assert(r.getLong(2) == 127 || r.getLong(1) == -127,
        s"vec ${r.getLong(0)}: no element at full scale")
    }
  }
}
