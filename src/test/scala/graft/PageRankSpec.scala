package graft

import graft.similarity.PageRank
import org.scalatest.funsuite.AnyFunSuite

/** PageRank kernel semantics on hand-computed fixtures: the integer
  * update rule, dangling-mass leak, teleport floor, and the registered
  * query's invariants on the real kNN graph. */
class PageRankSpec extends AnyFunSuite {
  import GraftSpark.{spark, sf}
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val n = nodes.toDF("vec_id")
    val e = edges.toDF("src", "dst")
    PageRank.rank(n, e, iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("one iteration on a 2-cycle is exact") {
    // a <-> b, outdeg 1 each: r1 = 150000 + (1000000 * 85) div 100
    val r = run(Seq(1L, 2L), Seq((1L, 2L), (2L, 1L)), 1)
    assert(r(1L) == 150000L + 850000L)
    assert(r(2L) == 150000L + 850000L)
  }

  test("fan-out splits mass with truncating division; sinks leak") {
    // 1 -> {2, 3}; 2 and 3 are sinks (their damped mass leaks).
    // r1(2) = r1(3) = 150000 + (1000000*85) div (100*2) = 150000+425000
    // r1(1) = 150000 (no in-edges)
    val r = run(Seq(1L, 2L, 3L), Seq((1L, 2L), (1L, 3L)), 1)
    assert(r(1L) == 150000L)
    assert(r(2L) == 575000L)
    assert(r(3L) == 575000L)
    // iteration 2: node 1 still 150000; 2/3 get (150000*85) div 200
    val r2 = run(Seq(1L, 2L, 3L), Seq((1L, 2L), (1L, 3L)), 2)
    assert(r2(1L) == 150000L)
    assert(r2(2L) == 150000L + (150000L * 85L) / 200L)
  }

  test("isolated node holds exactly the teleport floor at any depth") {
    val r = run(Seq(7L, 8L, 9L), Seq((8L, 9L), (9L, 8L)), 5)
    assert(r(7L) == 150000L)
    // the 2-cycle sits at the exact fixed point: 150000 + 850000 = 1e6
    assert(r(8L) == 1000000L)
    assert(r(9L) == 1000000L)
  }

  test("registered query: every node scored, floor respected, hub ranks highest") {
    val out = PageRank.pageRank(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.length == n)
    assert(out.forall(_.getLong(1) >= 150000L))
    // output is ordered by rank desc then id
    val ranks = out.map(r => (r.getLong(1), r.getLong(0)))
    assert(ranks.sameElements(ranks.sortBy { case (q, id) => (-q, id) }))
    // total mass is bounded by injected mass (leak variant): N * 1e6
    assert(out.map(_.getLong(1)).sum <= n * 1000000L)
  }
}
