package graft

import graft.load.Composite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck invariants of the bounded-composite slicing kernels:
  * the slice-height budget rule and the slice reassembly — the pure
  * math under every depth-bounded raster plan (median/quantile/
  * masked/geomedian/MAD/temporal-fill). */
class SlicePropsSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    check(Prop.forAll(ga) { a => f(a); true })

  test("sliceRowsFor: budget honored above the one-row floor, full tile when roomy") {
    val gen = for {
      planes <- Gen.chooseNum(1, 5000)
      w <- Gen.chooseNum(1, 4096)
      h <- Gen.chooseNum(1, 4096)
      budget <- Gen.chooseNum(1L, 8L << 30)
    } yield (planes, w, h, budget)
    forAll(gen) { case (planes, w, h, budget) =>
      val sr = Composite.sliceRowsFor(planes, w, h, budget)
      assert(sr >= 1 && sr <= h)
      // the bound: state fits the budget unless even ONE row overflows
      // (the documented irreducible minimum)
      val rowBytes = planes.toLong * w * 8L
      if (rowBytes <= budget) assert(sr.toLong * rowBytes <= budget)
      else assert(sr == 1)
      // roomy budget => no slicing at all
      if (h.toLong * rowBytes <= budget) assert(sr == h)
      // maximality: one more row would burst the budget (or the tile)
      if (sr < h) assert((sr + 1L) * rowBytes > budget)
    }
  }

  test("concatSlices: reassembly is exact for any slice partition, any plane count") {
    val gen = for {
      nPlanes <- Gen.chooseNum(1, 4)
      n <- Gen.chooseNum(1, 400)
      sr <- Gen.chooseNum(1, 64)
    } yield (nPlanes, n, sr)
    forAll(gen) { case (nPlanes, n, sr) =>
      // reference planes with distinguishable values per plane/index
      val ref = Array.tabulate(nPlanes)(b =>
        Array.tabulate(n)(i => b * 10000.0 + i))
      val cnt = Array.tabulate(n)(i => i % 7)
      // cut into slices of sr rows (here: sr elements), shuffle order
      val parts = (0 until n by sr).map { o =>
        val len = math.min(sr, n - o)
        (o / sr,
          ref.map(p => java.util.Arrays.copyOfRange(p, o, o + len)),
          java.util.Arrays.copyOfRange(cnt, o, o + len))
      }.toArray.reverse // arbitrary arrival order: reassembly must sort
      val (planes, cntOut) = Composite.concatSlices(parts)
      assert(planes.length == nPlanes)
      planes.indices.foreach(b => assert(planes(b).sameElements(ref(b))))
      assert(cntOut.sameElements(cnt))
    }
  }
}
