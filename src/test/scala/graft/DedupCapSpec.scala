package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the `MaxBucket` block-membership cap on the prefix-block candidate
  * generators (dedup_ngram_jaccard / dedup_containment / dedup_incremental).
  *
  * Degenerate fixture: 600 documents sharing ONE 40-char prefix (the
  * license-header / ToS-boilerplate shape that makes uncapped prefix
  * blocking quadratic at corpus scale) plus a small 5-doc block that must
  * ride through the cap untouched. With the cap the big block contributes
  * exactly C(MaxBucket, 2) undirected pairs — not C(600, 2) = 179,700.
  */
class DedupCapSpec extends AnyFunSuite {
  import GraftSpark.spark

  private val M = dedup.Dedup.MaxBucket
  private val BigN = 600L
  private val SmallIds = 1000L until 1005L

  /** One shared text per block: every in-block pair has Jaccard 1.0 and
    * containment 1.0, so every generated candidate survives verification —
    * the output count IS the candidate-pair count. */
  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_cap").toString
    val bodyA = "shared license header boilerplate terms " +
      "quick brown fox jumps over the lazy dog again and again"
    val bodyB = "completely different second block prefix " +
      "with its own tail content words for the small block here"
    val rows =
      (0L until BigN).map(i => (i, bodyA)) ++ SmallIds.map(i => (i, bodyB))
    rows.map { case (i, t) => (i, t, "en", "fixture", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("ngram-jaccard pair generation is MaxBucket-capped on a degenerate block") {
    val got = dedup.Dedup.queries("dedup_ngram_jaccard")(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (big, small) = got.partition(_._1 < BigN)
    // capped: first MaxBucket members by doc_id, all pairs among them
    assert(big.length == M * (M - 1) / 2,
      s"big block produced ${big.length} pairs, want C($M,2)=${M * (M - 1) / 2}")
    assert(big.forall { case (a, b) => a < M && b < M },
      "cap must keep the deterministic doc_id-order sample")
    // sub-cap block unaffected: all C(5,2) pairs present
    val wantSmall = (for {
      a <- SmallIds; b <- SmallIds if a < b
    } yield (a, b)).toSet
    assert(small.toSet == wantSmall)
  }

  test("containment pair generation is MaxBucket-capped on a degenerate block") {
    val got = dedup.Dedup.queries("dedup_containment")(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (big, small) = got.partition(_._1 < BigN)
    assert(big.length == M * (M - 1), // directed pairs
      s"big block produced ${big.length} directed pairs, want $M*(${M - 1})")
    assert(big.forall { case (a, b) => a < M && b < M })
    assert(small.length == SmallIds.length * (SmallIds.length - 1))
  }

  test("incremental dedup keeps constant per-row fan-out and full verdict coverage") {
    val out = dedup.Dedup.queries("dedup_incremental")(spark, fixtureDir)
      .collect()
    val oddCount = (0L until BigN).count(_ % 2 == 1) +
      SmallIds.count(_ % 2 == 1)
    // every arriving doc is verdicted exactly once even though the index
    // block is oversized (the cap samples the INDEX side, not the batch)
    assert(out.length == oddCount)
    // identical texts: the capped index still carries the md5 hit, and
    // n_exact is bounded by the cap, not the raw block size
    assert(out.forall(_.getString(1) == "exact"))
    val nExact = out.filter(_.getLong(0) < BigN).map(_.getLong(2)).distinct.toSeq
    assert(nExact == Seq(M.toLong),
      s"index-side fan-out not capped: n_exact values $nExact")
  }
}
