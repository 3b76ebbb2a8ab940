package graft

import org.scalatest.funsuite.AnyFunSuite
import GraftSpark.{spark, sf}

/** Gates the learned quality/language filter (`text_quality_model`):
  * the distilled linear model must actually reproduce the heuristic keep
  * rule on the held-out split, not just memorize the training fold. */
class TextModelSpec extends AnyFunSuite {

  test("distilled tree reproduces the heuristic keep rule on the holdout") {
    val rows = text.TextAnalysis.qualityModel(spark, sf).collect()
    assert(rows.nonEmpty)
    val (hold, train) = rows.partition(_.getLong(3) == 1L)
    assert(hold.nonEmpty && train.nonEmpty)
    def acc(rs: Array[org.apache.spark.sql.Row]) =
      rs.count(r => r.getLong(1) == r.getLong(2)).toDouble / rs.length
    val holdAcc = acc(hold)
    info(f"holdout accuracy = $holdAcc%.3f over ${hold.length} docs")
    assert(holdAcc >= 0.93, f"holdout accuracy $holdAcc%.3f")
    // both classes must be present and predicted — a constant model
    // would fail on the ~55%-keep corpus
    assert(rows.map(_.getLong(1)).distinct.sorted.sameElements(Array(0L, 1L)))
    assert(rows.map(_.getLong(2)).distinct.length == 2, "degenerate predictions")
  }

  test("compression ratio discriminates repeated boilerplate from prose") {
    import spark.implicits._
    val docs = Seq(
      (1L, ("lorem ipsum dolor sit amet " * 40).trim, "en", "s", 1L),
      (2L, (10 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" "), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_cr").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = text.TextAnalysis.compressRatio(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getLong(4)))).toMap
    // the 40x-repeated template must compress far better than the
    // pseudo-random token doc, and trip the low-info flag
    assert(out(1L)._1 < out(2L)._1 / 2, s"$out")
    assert(out(1L)._2 == 1L && out(2L)._2 == 0L, s"$out")
    // the real corpus: ratios positive and bounded
    val corpus = text.TextAnalysis.compressRatio(spark, sf).collect()
    assert(corpus.length > 0)
    corpus.foreach(r => assert(r.getDouble(3) > 0 && r.getDouble(3) < 1.5))
  }
}
