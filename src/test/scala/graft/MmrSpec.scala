package graft

import graft.similarity.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Pins the MMR selection contract: per query exactly K distinct
  * picks, the first pick is the plain cosine argmax (MMR with an
  * empty selected set degenerates to relevance), and the kernel's
  * candidate-candidate cosine fold is bit-identical to the native
  * `vec_cosine` Expression both engines' SQL uses. */
class MmrSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("per query: exactly K distinct picks with ranks 1..K") {
    val rows = Similarity.mmrSelect(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == Similarity.NumQueries)
    byQ.foreach { case (q, picks) =>
      assert(picks.length == Similarity.K, s"qid $q: ${picks.length} picks")
      assert(picks.map(_._3).sorted.toSeq == (1 to Similarity.K),
        s"qid $q ranks")
      assert(picks.map(_._2).distinct.length == picks.length,
        s"qid $q picked a candidate twice")
    }
  }

  test("first pick equals the plain cosine top-1") {
    graft.functions.VecFunctions.register(spark)
    Tables.register(spark, sf)
    val top1 = spark.sql(Similarity.bruteforceSparkSql)
      .where("rn = 1").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = Similarity.mmrSelect(spark, sf)
      .where("rn = 1").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first == top1,
      s"MMR step 1 must be the relevance argmax: $first vs $top1")
  }

  test("kernel cosine fold matches the vec_cosine Expression") {
    val rnd = new scala.util.Random(42)
    import spark.implicits._
    for (_ <- 1 to 20) {
      val a = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      graft.functions.VecFunctions.register(spark)
      val expected = Seq((a, b)).toDF("a", "b")
        .selectExpr("vec_cosine(a, b)").head().getDouble(0)
      assert(Similarity.cosineF(a, b) == expected,
        "kernel fold diverged from the native expression")
    }
  }
}
