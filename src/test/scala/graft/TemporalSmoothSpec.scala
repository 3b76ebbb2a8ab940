package graft

import graft.load.TemporalSmooth
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Savitzky–Golay smoothing semantics: the window-5/order-2 kernel
  * REPRODUCES polynomials up to degree 2 exactly (its defining
  * property), drops edge centers by contract, propagates NaN, and is
  * linear in its input. Each property case runs the real distributed
  * operator, so the case count stays small. */
class TemporalSmoothSpec extends AnyFunSuite {
  import GraftSpark.spark

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    check(Prop.forAll(ga) { a => f(a); true })

  /** One single-pixel plane per time step: value series vs. */
  private def series(vs: Seq[Double]) = {
    import spark.implicits._
    vs.zipWithIndex.map { case (v, t) => ("red", t, 0, 0, Array(v)) }
      .toDF("band", "tIdx", "ty", "tx", "filled")
  }

  private def smoothOf(vs: Seq[Double]): Map[Int, Double] =
    TemporalSmooth.smoothAcrossTime(spark, series(vs))
      .select(col("tIdx"), expr("smooth[0]"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

  test("kernel weights sum to 1 and match the classic 5-point table") {
    assert(TemporalSmooth.Coeffs.map(c => math.round(c * 35)).toSeq ==
      Seq(-3L, 12L, 17L, 12L, -3L))
    assert(math.abs(TemporalSmooth.Coeffs.sum - 1.0) < 1e-12)
  }

  test("quadratic series reproduce exactly; edges are dropped") {
    val gen = for {
      a <- Gen.choose(-50.0, 50.0)
      b <- Gen.choose(-10.0, 10.0)
      c <- Gen.choose(-2.0, 2.0)
      n <- Gen.choose(5, 12)
    } yield (a, b, c, n)
    forAll(gen) { case (a, b, c, n) =>
      val vs = (0 until n).map(t => a + b * t + c * t * t)
      val out = smoothOf(vs)
      assert(out.keySet == (2 to n - 3).toSet,
        s"interior centers only, got ${out.keySet}")
      out.foreach { case (t, sv) =>
        assert(math.abs(sv - vs(t)) <= 1e-9 * (1 + math.abs(vs(t))),
          s"SG must reproduce a degree-2 polynomial at t=$t: $sv vs ${vs(t)}")
      }
    }
  }

  test("NaN propagates to exactly the windows containing it") {
    val vs = Seq(1.0, 2.0, 3.0, Double.NaN, 5.0, 6.0, 7.0, 8.0, 9.0)
    val out = smoothOf(vs)
    assert(out.keySet == Set(2, 3, 4, 5, 6))
    assert((2 to 5).forall(t => out(t).isNaN),
      "centers whose window spans the NaN must be NaN")
    // center 6's window (4..8) is clear of the NaN: smooths normally
    assert(!out(6).isNaN)
    assert(math.abs(out(6) - 7.0) < 1e-9, "linear series reproduce")
  }

  test("linearity: smooth(x + y) = smooth(x) + smooth(y)") {
    val gen = for {
      xs <- Gen.listOfN(7, Gen.choose(0.0, 100.0))
      ys <- Gen.listOfN(7, Gen.choose(0.0, 100.0))
    } yield (xs, ys)
    forAll(gen) { case (xs, ys) =>
      val sx = smoothOf(xs)
      val sy = smoothOf(ys)
      val sxy = smoothOf(xs.zip(ys).map { case (x, y) => x + y })
      sxy.foreach { case (t, v) =>
        assert(math.abs(v - (sx(t) + sy(t))) <= 1e-9 * (1 + math.abs(v)))
      }
    }
  }
}
