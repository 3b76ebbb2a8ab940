package graft.load

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Stratified pixel sampling over a label plane — pick N deterministic
  * sample locations per class from a rasterized mask (ground-truth
  * site selection for model training / validation). With
  * [[Rasterize]] and [[Drill]] this closes the training-data loop:
  * vector labels → mask → stratified locations → drilled pixel values.
  *
  * Determinism + scale: the sampling key is `md5(gy,gx)` — a portable,
  * seedless hash both engines can recompute. Selection is two-phase:
  * a MAP-SIDE hash-threshold prefilter (first hex digit < 4 keeps an
  * expected quarter of each class, no shuffle, no state) and a grouped
  * bottom-N HEAP aggregate over the survivors — partial size-N heaps
  * map-side, merged heap-into-heap, so the exchange carries at most
  * `input_partitions × classes × N` tiny rows and per-group memory is
  * N regardless of class size. The result is still exactly the N
  * smallest keys per class among survivors (= a uniform deterministic
  * sample; the window spelling `row_number() OVER (PARTITION BY zone
  * ORDER BY key) <= N` remains the oracle and ranks identically).
  * A continent-sized class costs its scan, never a single-reducer
  * window partition. Classes smaller than ~4N should lower the
  * threshold; the default suits mask-scale classes.
  */
object Sampling {

  /** (portable md5 rank key, packed location `gy<<32 | gx`). */
  final case class LocIn(key: String, loc: Long)
  final case class LocBuf(var ks: Array[String], var ps: Array[Long],
                          var n: Int)
  final case class LocOut(ks: Array[String], ps: Array[Long])

  /** Bottom-k by key: keep the k SMALLEST entries under
    * (key ASC, loc ASC). Buffer arrays form a binary max-heap ordered
    * worst-first (root = largest kept key), so the common above-root
    * row is an O(1) reject and admission is O(log k) — the same
    * mergeable bounded-heap shape as `relational.TopK`, flipped to
    * smallest-first for the sampling rank. */
  class BottomKLocs(k: Int) extends Aggregator[LocIn, LocBuf, LocOut]
      with Serializable {

    // a strictly worse than b under (key ASC, loc ASC): worse = larger
    private def worse(ak: String, ap: Long, bk: String, bp: Long): Boolean = {
      val c = ak.compareTo(bk)
      c > 0 || (c == 0 && ap > bp)
    }

    private def swap(b: LocBuf, i: Int, j: Int): Unit = {
      val tk = b.ks(i); b.ks(i) = b.ks(j); b.ks(j) = tk
      val tp = b.ps(i); b.ps(i) = b.ps(j); b.ps(j) = tp
    }

    private def siftUp(b: LocBuf, i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(b.ks(i), b.ps(i), b.ks(p), b.ps(p))) { swap(b, i, p); i = p }
        else return
      }
    }

    private def siftDown(b: LocBuf): Unit = {
      var i = 0
      while (true) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < b.n && worse(b.ks(l), b.ps(l), b.ks(w), b.ps(w))) w = l
        if (r < b.n && worse(b.ks(r), b.ps(r), b.ks(w), b.ps(w))) w = r
        if (w == i) return
        swap(b, i, w)
        i = w
      }
    }

    private def insert(b: LocBuf, key: String, loc: Long): Unit = {
      if (b.ks == null) {
        b.ks = new Array[String](k); b.ps = new Array[Long](k); b.n = 0
      }
      if (b.n < k) {
        b.ks(b.n) = key; b.ps(b.n) = loc; b.n += 1
        siftUp(b, b.n - 1)
      } else if (worse(b.ks(0), b.ps(0), key, loc)) {
        b.ks(0) = key; b.ps(0) = loc
        siftDown(b)
      }
    }

    override def zero: LocBuf = LocBuf(null, null, 0)

    override def reduce(b: LocBuf, in: LocIn): LocBuf = {
      insert(b, in.key, in.loc); b
    }

    override def merge(a: LocBuf, c: LocBuf): LocBuf = {
      if (a.ks == null) return c
      var i = 0
      while (i < c.n) { insert(a, c.ks(i), c.ps(i)); i += 1 }
      a
    }

    /** Emit best-first (smallest key first): pop worst-first into the
      * tail of the output arrays. */
    override def finish(b: LocBuf): LocOut = {
      val n = b.n
      val ks = new Array[String](n)
      val ps = new Array[Long](n)
      var m = n
      while (m > 0) {
        ks(m - 1) = b.ks(0); ps(m - 1) = b.ps(0)
        m -= 1
        b.ks(0) = b.ks(m); b.ps(0) = b.ps(m); b.n = m
        siftDown(b)
      }
      LocOut(ks, ps)
    }

    override def bufferEncoder: Encoder[LocBuf] = Encoders.product[LocBuf]
    override def outputEncoder: Encoder[LocOut] = Encoders.product[LocOut]
  }

  /** N sample locations per class from a [[Rasterize.burn]] output.
    * Returns (zone, gy, gx) in global pixel coordinates. */
  def stratifiedLocations(spark: SparkSession, labelTiles: DataFrame,
                          nPerClass: Int): DataFrame = {
    val bottomK = udaf(new BottomKLocs(nPerClass), Encoders.product[LocIn])
    labelTiles
      .select(col("x0"), col("y0"), col("width"),
        posexplode(col("plane")))
      .where(col("col") =!= 0)
      .select(col("col").as("zone"),
        (col("y0") + col("pos") / col("width")).cast("int").as("gy"),
        (col("x0") + col("pos") % col("width")).cast("int").as("gx"))
      .withColumn("key",
        md5(concat(col("gy").cast("string"), lit(","),
          col("gx").cast("string"))))
      .where(substring(col("key"), 1, 1).isin("0", "1", "2", "3"))
      .groupBy("zone")
      .agg(bottomK(col("key"),
        shiftleft(col("gy").cast("long"), 32)
          .bitwiseOR(col("gx").cast("long"))).as("t"))
      .selectExpr("zone", "explode(t.ps) AS p")
      .selectExpr("zone", "CAST(shiftright(p, 32) AS INT) AS gy",
        "CAST(p & 4294967295 AS INT) AS gx")
  }
}
