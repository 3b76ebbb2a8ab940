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
}
