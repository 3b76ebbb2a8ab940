package graft.relational

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k as a mergeable bounded-heap aggregate.
  *
  * Spark 4 already bounds the window spelling's exchange: the
  * `InferWindowGroupLimit` rule inserts a Partial `WindowGroupLimit`
  * below the shuffle, so `ROW_NUMBER() ... <= k` ships at most
  * `input_partitions x groups x k` rows (plan verified on 4.1.2 this
  * session). What the built-in rewrite CANNOT remove is the map-side
  * Sort it depends on: Partial WindowGroupLimit requires its input
  * sorted on (g, v DESC), so every input partition is fully sorted —
  * O(n log n) comparisons plus sort-buffer/spill pressure — before a
  * single row is dropped, and the reduce side sorts + runs the Window
  * machinery again to re-derive row numbers.
  *
  * This [[Aggregator]] does the same bounded exchange with NO sort
  * anywhere: a size-k min-heap per group map-side (root = worst kept
  * entry, O(1) reject for the common below-root row, O(log k)
  * admission), partials merged heap-into-heap, per-group memory k
  * regardless of skew. Same algebraic shape as Spark's own
  * `TakeOrderedAndProject`, generalized from "one global group" to
  * arbitrary GROUP BY via `ObjectHashAggregate` partial merge
  * (`TopKSpec` asserts the plan: partial aggregate map-side, no
  * Window, no full-input Sort).
  *
  * Measured honestly: at sf0.1 (local[32], noop sink, min of 3 warm,
  * same session) heap 0.76 s vs window 0.65 s — parity, because a
  * 150k-row sort costs nothing locally and the udaf buffer is
  * object-serialized. The operator's value at cluster scale is
  * removing the full-input map-side sort (the window path's only
  * unbounded per-partition cost) — it is not a local wall-clock win.
  */
object TopK {

  /** Rows kept per group in the `topk_grouped` query. */
  val K = 5

  final case class TopKIn(v: Double, id: Long)
  final case class TopKBuf(var vs: Array[Double], var ids: Array[Long],
                           var n: Int)
  final case class TopKOut(vs: Array[Double], ids: Array[Long])

  /** Bounded top-k heap: keep the k largest by (v DESC, id ASC).
    * Buffer arrays form a binary min-heap ordered worst-first, so
    * admission is an O(1) compare against the root. */
  class GroupedTopK(k: Int) extends Aggregator[TopKIn, TopKBuf, TopKOut]
      with Serializable {

    // a strictly worse than b under the (v DESC, id ASC) ranking
    private def worse(av: Double, ai: Long, bv: Double, bi: Long): Boolean =
      av < bv || (av == bv && ai > bi)

    private def siftUp(b: TopKBuf, i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(b.vs(i), b.ids(i), b.vs(p), b.ids(p))) {
          val tv = b.vs(i); b.vs(i) = b.vs(p); b.vs(p) = tv
          val ti = b.ids(i); b.ids(i) = b.ids(p); b.ids(p) = ti
          i = p
        } else return
      }
    }

    private def siftDown(b: TopKBuf): Unit = {
      var i = 0
      while (true) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < b.n && worse(b.vs(l), b.ids(l), b.vs(w), b.ids(w))) w = l
        if (r < b.n && worse(b.vs(r), b.ids(r), b.vs(w), b.ids(w))) w = r
        if (w == i) return
        val tv = b.vs(i); b.vs(i) = b.vs(w); b.vs(w) = tv
        val ti = b.ids(i); b.ids(i) = b.ids(w); b.ids(w) = ti
        i = w
      }
    }

    private def insert(b: TopKBuf, v: Double, id: Long): Unit = {
      if (b.vs == null) {
        b.vs = new Array[Double](k); b.ids = new Array[Long](k); b.n = 0
      }
      if (b.n < k) {
        b.vs(b.n) = v; b.ids(b.n) = id; b.n += 1
        siftUp(b, b.n - 1)
      } else if (worse(b.vs(0), b.ids(0), v, id)) {
        b.vs(0) = v; b.ids(0) = id
        siftDown(b)
      }
    }

    override def zero: TopKBuf = TopKBuf(null, null, 0)

    override def reduce(b: TopKBuf, in: TopKIn): TopKBuf = {
      insert(b, in.v, in.id); b
    }

    override def merge(a: TopKBuf, c: TopKBuf): TopKBuf = {
      if (a.vs == null) return c
      var i = 0
      while (i < c.n) { insert(a, c.vs(i), c.ids(i)); i += 1 }
      a
    }

    /** Emit best-first (v DESC, id ASC): pop the heap worst-first into
      * the tail of the output arrays. */
    override def finish(b: TopKBuf): TopKOut = {
      val n = b.n
      val vs = new Array[Double](n)
      val ids = new Array[Long](n)
      var m = n
      while (m > 0) {
        vs(m - 1) = b.vs(0); ids(m - 1) = b.ids(0)
        m -= 1
        b.vs(0) = b.vs(m); b.ids(0) = b.ids(m); b.n = m
        siftDown(b)
      }
      TopKOut(vs, ids)
    }

    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKOut] = Encoders.product[TopKOut]
  }

  /** Top-[[K]] orders by price within every order priority. One
    * partial-agg shuffle of 5-entry heaps; contrast the window oracle,
    * which fully sorts every input partition before its own (equally
    * bounded) exchange. */
  def grouped(spark: SparkSession, dir: String): DataFrame = {
    Tables.register(spark, dir)
    val topk = udaf(new GroupedTopK(K), Encoders.product[TopKIn])
    spark.table("orders")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("t"))
      .selectExpr("priority",
        """posexplode(zip_with(t.vs, t.ids,
          |  (v, i) -> struct(v AS price, i AS okey))) AS (pos, e)""".stripMargin)
      .selectExpr("priority", "CAST(pos + 1 AS BIGINT) AS rnk",
        "e.okey AS o_orderkey", "e.price AS o_totalprice")
      .orderBy("priority", "rnk")
  }

  /** The window spelling the Aggregator replaces — used as the DuckDB
    * oracle and as the A/B + equality baseline in `TopKSpec`. */
  val windowSql: String =
    s"""SELECT o_orderpriority AS priority, CAST(rn AS BIGINT) AS rnk,
       |       o_orderkey, o_totalprice
       |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
       |             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
       |                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
       |      FROM orders) t
       |WHERE rn <= $K ORDER BY priority, rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topk_grouped" -> ((s, d) => grouped(s, d)))

  val oracleSql: Map[String, String] = Map(
    "topk_grouped" -> windowSql)
}
