package graft

import graft.similarity.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** PCA semantics: the Jacobi eigensolve against known matrices, and
  * the landed rotation's defining properties on the real table —
  * orthonormal rows, descending positive explained variance, and the
  * projected components actually carrying that variance. */
class PcaSpec extends AnyFunSuite {
  import GraftSpark.{spark, sf}

  test("jacobi recovers the spectrum of a known symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1 with vectors (1,1)/√2, (1,-1)/√2
    val (evals, evecs) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = evals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12)
    assert(math.abs(sorted(1) - 3.0) < 1e-12)
    evals.zip(evecs).foreach { case (ev, v) =>
      // eigen equation: A v = ev v
      val av0 = 2.0 * v(0) + 1.0 * v(1)
      val av1 = 1.0 * v(0) + 2.0 * v(1)
      assert(math.abs(av0 - ev * v(0)) < 1e-10)
      assert(math.abs(av1 - ev * v(1)) < 1e-10)
    }
  }

  test("landed rotation is orthonormal with descending positive variance") {
    val out = Similarity.pcaProject(spark, sf)
    val byComp = out.collect()
      .map(r => (r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rot = spark.read.parquet(Similarity.pcaPathFor(sf))
      .select("comp", "vec", "eigval").collect()
      .map(r => (r.getInt(0),
        r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    assert(rot.length == Similarity.PcaK)
    // descending positive eigenvalues
    val evs = rot.map(_._3)
    assert(evs.forall(_ > 0))
    assert(evs.zip(evs.tail).forall { case (a, b) => a >= b })
    // orthonormal rows
    for (i <- rot.indices; j <- i until rot.length) {
      val dot = rot(i)._2.zip(rot(j)._2).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-8, s"R($i)-dot-R($j) = $dot")
    }
    // sign normalization: the largest-|entry| of each row is positive
    rot.foreach { case (c, v, _) =>
      assert(v(v.indices.maxBy(i => (math.abs(v(i)), -i))) >= 0,
        s"component $c not sign-normalized")
    }
    // each projected component's sample variance matches its eigenvalue
    rot.foreach { case (c, _, ev) =>
      val xs = byComp(c)
      val m = xs.sum / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / xs.length
      assert(math.abs(v - ev) <= 1e-3 * math.max(1.0, ev),
        s"component $c variance $v != eigenvalue $ev")
    }
  }

  test("reconstruction residual equals the discarded variance") {
    Similarity.pcaProject(spark, sf).collect() // ensure artifact is fresh
    val rot = spark.read.parquet(Similarity.pcaPathFor(sf))
      .select("comp", "vec", "eigval").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val xs = graft.Tables.load(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = xs.head.length
    val n = xs.length.toDouble
    val mu = Array.tabulate(d)(i => xs.map(_(i)).sum / n)
    // total variance (trace of the covariance) minus the kept
    // eigenvalues = the variance PCA provably discards; the mean
    // squared residual of (x-μ) - Rᵀ R (x-μ) must equal it
    val totalVar = (0 until d).map { i =>
      xs.map(x => (x(i) - mu(i)) * (x(i) - mu(i))).sum / n
    }.sum
    val discarded = totalVar - rot.map(_._3).sum
    val mse = xs.map { x =>
      val cx = Array.tabulate(d)(i => x(i) - mu(i))
      val y = rot.map(_._2.zip(cx).map { case (a, b) => a * b }.sum)
      val recon = Array.tabulate(d)(i =>
        rot.zip(y).map { case ((_, v, _), yj) => v(i) * yj }.sum)
      cx.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum / n
    assert(math.abs(mse - discarded) <= 1e-6 * math.max(1.0, discarded),
      s"residual MSE $mse != discarded variance $discarded")
  }

  test("whitened components land with unit variance and zero mean") {
    val out = Similarity.whitenProject(spark, sf).collect()
      .map(r => (r.getInt(r.fieldIndex("comp")),
        r.getDouble(r.fieldIndex("pcw"))))
    val byComp = out.groupBy(_._1)
    assert(byComp.keySet == (0 until Similarity.PcaK).toSet)
    byComp.foreach { case (comp, vs) =>
      val n = vs.length.toDouble
      val mean = vs.map(_._2).sum / n
      // population variance of (proj - bias)/sqrt(λ) is exactly 1 by
      // construction; the output is rounded to 4 decimals, so allow
      // the rounding-induced slack
      val variance = vs.map(v => (v._2 - mean) * (v._2 - mean)).sum / n
      assert(math.abs(mean) < 1e-3, s"comp $comp mean $mean")
      assert(math.abs(variance - 1.0) < 1e-2,
        s"comp $comp variance $variance")
    }
  }
}
