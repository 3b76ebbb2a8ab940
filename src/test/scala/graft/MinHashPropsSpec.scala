package graft

import graft.functions.HashKernels
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck invariants of the MinHash kernels behind the LSH dedup
  * family (`minhash_bands`, the portable mod-p twin): set semantics,
  * determinism, and the banding collision statistics the LSH blocking
  * design relies on. Property-level companion to the oracle rows
  * (`dedup_minhash_*`), which pin one fixture each. */
class MinHashPropsSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    check(Prop.forAll(ga) { a => f(a); true })

  private def bands(hs: Seq[Long]): Seq[Long] =
    HashKernels.minhashBands(new GenericArrayData(hs.toArray)).toLongArray().toSeq

  private val genSet: Gen[Seq[Long]] =
    Gen.chooseNum(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))

  test("minhash_bands is a SET function: order and duplicates are irrelevant") {
    val gen = for {
      hs <- genSet
      seed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (hs, new scala.util.Random(seed))
    forAll(gen) { case (hs, rnd) =>
      val base = bands(hs)
      assert(bands(rnd.shuffle(hs)) == base)
      assert(bands(hs ++ rnd.shuffle(hs).take(hs.size / 2 + 1)) == base)
    }
  }

  test("identical sets collide on every band; band count is fixed") {
    forAll(genSet) { hs =>
      val b = bands(hs)
      assert(b.size == HashKernels.Bands)
      assert(bands(hs) == b) // determinism
    }
  }

  test("banding collision statistics track Jaccard (the LSH design bound)") {
    // J ~= 0.9 twins must share many bands (P[band] = J^rows ~ 0.66,
    // E ~ 21 of 32); J ~= 0.1 pairs almost none (E ~ 0.004). Generous
    // bounds keep the test deterministic-stable across seeds.
    val gen = for {
      seed <- Gen.chooseNum(0L, Long.MaxValue)
      n <- Gen.chooseNum(100, 300)
    } yield (new scala.util.Random(seed), n)
    forAll(gen) { case (rnd, n) =>
      val universe = Seq.fill(2 * n)(rnd.nextLong()).distinct
      val a = universe.take(n)
      // near-duplicate: drop ~5% of a, add ~5% fresh => J ~ 0.9
      val drop = math.max(1, n / 20)
      val near = a.drop(drop) ++ universe.slice(n, n + drop)
      val far = universe.slice(n, 2 * n) // disjoint-ish => J ~ 0
      val ba = bands(a)
      val sharedNear = ba.zip(bands(near)).count { case (x, y) => x == y }
      val sharedFar = ba.zip(bands(far)).count { case (x, y) => x == y }
      assert(sharedNear >= 8,
        s"near-dup shared only $sharedNear/32 bands (J~0.9)")
      assert(sharedFar <= 2,
        s"unrelated docs shared $sharedFar/32 bands (J~0)")
      assert(sharedNear > sharedFar)
    }
  }

  private def portable(tokens: Seq[String]): Seq[Long] =
    HashKernels.minhashPortable(new GenericArrayData(
      tokens.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray
    )).toLongArray().toSeq

  private val genTokens: Gen[Seq[String]] =
    Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)))

  test("portable minhash: values stay in the mod-p ring and are deterministic") {
    forAll(genTokens) { toks =>
      val sig = portable(toks)
      assert(sig.size == HashKernels.PortPerm)
      assert(sig.forall(v => v >= 0 && v < HashKernels.PortP))
      assert(portable(toks) == sig)
    }
  }

  test("portable minhash: repeating the token stream adds no new shingles") {
    // doc || doc contains exactly the original 3-gram shingles plus the
    // two seam grams; with >= 3 tokens duplicated grams cannot RAISE a
    // per-permutation min, so each component can only stay or drop
    forAll(genTokens.suchThat(_.size >= 3)) { toks =>
      val once = portable(toks)
      val twice = portable(toks ++ toks)
      assert(once.zip(twice).forall { case (o, t) => t <= o })
    }
  }
}
