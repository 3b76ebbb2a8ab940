package graft

import graft.similarity.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Orthogonal Procrustes semantics: the polar-decomposition kernel
  * recovers a planted rotation exactly from a noise-free cross-
  * covariance, stays orthonormal under perturbation, and is loud on a
  * singular (non-unique) problem; the registered query's aligned
  * output tracks its target on the real table. */
class ProcrustesSpec extends AnyFunSuite {
  import GraftSpark.{spark, sf}

  // planted rotation on d=4: column j reads source row (j+3)%4 with
  // the engine's sign pattern — an exact orthogonal matrix
  private val d = 4
  private val sh = Similarity.procShift(d) // 3
  private def rStar: Array[Array[Double]] = {
    val r = Array.fill(d, d)(0.0)
    for (j <- 0 until d) r((j + sh) % d)(j) = Similarity.procSign(j).toDouble
    r
  }

  private def matmul(a: Array[Array[Double]], b: Array[Array[Double]]) =
    Array.tabulate(a.length, b.head.length)((i, j) =>
      (0 until b.length).map(k => a(i)(k) * b(k)(j)).sum)

  test("kernel recovers a planted rotation exactly from a noise-free " +
    "cross-covariance") {
    // A: 6 generic full-rank rows; M = Aᵀ(A·R*) = (AᵀA)R*, whose polar
    // factor is exactly R* when AᵀA is positive definite
    val a = Array(
      Array(1.0, 0.2, -0.3, 0.5), Array(0.1, 1.1, 0.4, -0.2),
      Array(-0.5, 0.3, 0.9, 0.1), Array(0.2, -0.4, 0.2, 1.3),
      Array(0.7, 0.6, -0.1, 0.3), Array(-0.2, 0.1, 0.5, -0.8))
    val ata = Array.tabulate(d, d)((i, j) => a.map(r => r(i) * r(j)).sum)
    val m = matmul(ata, rStar)
    val r = Similarity.procrustesRotation(m)
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(r(i)(j) - rStar(i)(j)) < 1e-9,
        s"R[$i][$j]=${r(i)(j)} vs planted ${rStar(i)(j)}")
  }

  test("rotation stays orthonormal under an asymmetric perturbation") {
    val m = Array(
      Array(3.0, 0.4, 0.1, -0.2), Array(-0.3, 2.5, 0.6, 0.2),
      Array(0.2, -0.1, 4.0, 0.5), Array(0.1, 0.3, -0.4, 1.8))
    val r = Similarity.procrustesRotation(m)
    for (j <- 0 until d; k <- j until d) {
      val dot = (0 until d).map(i => r(i)(j) * r(i)(k)).sum
      val want = if (j == k) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"col ${j}x$k = $dot")
    }
  }

  test("singular cross-covariance is loud, not a degraded rotation") {
    // rank-1 M: every eigenvalue of MᵀM but one is 0
    val m = Array.tabulate(d, d)((i, j) => (i + 1.0) * (j + 1.0))
    val e = intercept[IllegalArgumentException](
      Similarity.procrustesRotation(m))
    assert(e.getMessage.contains("singular"))
  }

  test("registered query: aligned projection tracks the planted target " +
    "within the noise scale on the real table") {
    val out = Similarity.procrustesAlign(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.length == n * Similarity.ProcK)
    // planted noise is ±6 milli per coordinate; the solve sees the
    // whole corpus, so per-coordinate alignment error stays well under
    // the coordinate scale — a loose sanity envelope, exactness is the
    // DuckDB oracle's job
    val errs = out.map(r => math.abs(r.getDouble(2) - r.getDouble(3)))
    assert(errs.max < 0.05, s"max |aligned-target| = ${errs.max}")
  }
}
