package graft

import graft.similarity.Graph
import org.scalatest.funsuite.AnyFunSuite

/** Graph-analytics kernel semantics on hand-computed fixtures:
  * min-label components converge to the exact component minimum
  * (through long chains, not just one hop), triangle census counts
  * each closed triple exactly once with mutual edges collapsed. */
class GraphSpec extends AnyFunSuite {
  import GraftSpark.{spark, sf}
  import spark.implicits._

  private def comps(nodes: Seq[Long],
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    Graph.components(nodes.toDF("vec_id"),
        sym.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("components: a 5-chain converges to the chain minimum; an " +
    "isolated node labels itself") {
    // label must travel 4 hops: 10-11-12-13-14, plus isolated 99
    val r = comps(Seq(10L, 11L, 12L, 13L, 14L, 99L),
      Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)))
    assert(Seq(10L, 11L, 12L, 13L, 14L).forall(r(_) == 10L), r)
    assert(r(99L) == 99L)
  }

  test("components: two separate cycles keep separate labels") {
    val r = comps(Seq(1L, 2L, 3L, 7L, 8L, 9L),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L), (8L, 9L), (9L, 7L)))
    assert(Seq(1L, 2L, 3L).forall(r(_) == 1L))
    assert(Seq(7L, 8L, 9L).forall(r(_) == 7L))
  }

  private def tri(edges: Seq[(Long, Long)]): (Long, Long, Long, String) = {
    val r = Graph.triangleStats(edges.toDF("src", "dst")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("triangles: one closed triple with a pendant edge; mutual " +
    "directed edges collapse to one undirected edge") {
    // triangle 1-2-3 (edge 2->1 duplicates 1->2), pendant 3-4
    val (e, t, w, c) = tri(Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L),
      (3L, 4L)))
    assert(e == 4L)
    assert(t == 1L)
    // degrees: 1:2, 2:2, 3:3, 4:1 → wedges 1+1+3+0 = 5
    assert(w == 5L)
    assert(c == "0.600000") // 3·1/5
  }

  test("triangles: a 4-cycle has wedges but no triangles") {
    val (e, t, w, c) = tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(e == 4L && t == 0L && w == 4L)
    assert(c == "0.000000")
  }

  private def lp(nodes: Seq[(Long, Option[Int])],
      edges: Seq[(Long, Long)], rounds: Int = Graph.LpRounds)
      : Map[Long, Option[Int]] = {
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    Graph.labelProp(
        nodes.toDF("vec_id", "lbl0"), sym.toDF("src", "dst"), rounds)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
  }

  test("label prop: majority wins, ties go to the smallest label, " +
    "seeds are clamped, unreachable nodes stay unlabeled") {
    // node 4 sees seeds {1:lbl 7, 2:lbl 7, 3:lbl 3} → majority 7;
    // node 5 sees {1:lbl 7, 6:lbl 3} → tie → smaller label 3;
    // seed 3 keeps label 3 even though both its neighbors say 7;
    // node 9 has no edges → stays NULL
    val r = lp(
      Seq(1L -> Some(7), 2L -> Some(7), 3L -> Some(3), 4L -> None,
        5L -> None, 6L -> Some(3), 9L -> None),
      Seq((1L, 4L), (2L, 4L), (3L, 4L), (1L, 5L), (6L, 5L),
        (1L, 3L), (2L, 3L)))
    assert(r(4L).contains(7) && r(5L).contains(3))
    assert(r(3L).contains(3), "seed must stay clamped")
    assert(r(9L).isEmpty)
  }

  test("label prop: labels travel one hop per round and freeze on " +
    "first adoption") {
    // chain seed(1)=5 - 2 - 3: after 2 rounds node 3 is labeled; a
    // later-arriving competing majority cannot flip node 2
    val r1 = lp(Seq(1L -> Some(5), 2L -> None, 3L -> None),
      Seq((1L, 2L), (2L, 3L)), rounds = 1)
    assert(r1(2L).contains(5) && r1(3L).isEmpty)
    val r2 = lp(Seq(1L -> Some(5), 2L -> None, 3L -> None),
      Seq((1L, 2L), (2L, 3L)), rounds = 2)
    assert(r2(3L).contains(5))
  }

  test("registered label-prop query: seeds keep their true label and " +
    "every propagated label is a label that exists among the seeds") {
    val out = Graph.labelPropagation(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.length == n)
    val seedLbls = out.filter(_.getInt(1) == 1).map(_.getInt(2)).toSet
    out.foreach { r =>
      if (r.getInt(1) == 1) assert(r.getInt(2) == r.getInt(3))
      else if (!r.isNullAt(2)) assert(seedLbls.contains(r.getInt(2)))
    }
  }

  test("registered components query: labels partition all vectors, " +
    "every label is its component's minimum member") {
    val out = Graph.connectedComponents(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.length == n)
    val byComp = out.groupBy(_.getLong(1))
    byComp.foreach { case (comp, members) =>
      assert(members.map(_.getLong(0)).min == comp)
      // comp_n column agrees with the actual member count
      assert(members.forall(_.getLong(2) == members.length))
    }
  }
}
