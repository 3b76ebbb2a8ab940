package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck invariants of the bounded near-duplicate survivorship
  * (`Multimodal.phashNearCappedFrom`) over RANDOMIZED fingerprint sets
  * — structures the periodic image fixture cannot produce: planted
  * exact-duplicate clusters far larger than the anchor bound, hot
  * band buckets shared by unrelated hashes, radius-boundary pairs
  * (Hamming exactly 3 vs 4), and tiny corpora. Each case compares the
  * query's output row-for-row against an in-Scala model of the exact
  * contract: anchors = the K smallest ids of each (band, key16)
  * bucket; a doc is flagged iff some smaller-id anchor in one of its
  * 4 buckets is within Hamming NearRadius, with dup_of the smallest
  * such anchor and hamming measured against IT (min-id dominance). */
class PhashCapPropsSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark.newSession()

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) +
      java.lang.Long.bitCount(a._2 ^ b._2)

  private def bandsOf(h: (Long, Long)): Seq[(Int, Long)] = Seq(
    0 -> (h._2 & 0xFFFFL), 1 -> ((h._2 >> 16) & 0xFFFFL),
    2 -> (h._1 & 0xFFFFL), 3 -> ((h._1 >> 16) & 0xFFFFL))

  /** Base hashes plus planted structure: exact clusters (many copies
    * of one hash) and near-neighbors at controlled Hamming radius. */
  private val genHashes: Gen[List[(Long, Long)]] = for {
    nBase <- Gen.choose(1, 120)
    base <- Gen.listOfN(nBase, for {
      hi <- Gen.choose(0L, 0xFFFFFFFFL)
      lo <- Gen.choose(0L, 0xFFFFFFFFL)
    } yield (hi, lo))
    clusterSize <- Gen.choose(0, 30) // > AnchorK: dominated buckets
    flips <- Gen.listOfN(40, for {
      idx <- Gen.choose(0, nBase - 1)
      k <- Gen.choose(1, 5) // radius 1..5 straddles NearRadius=3
      bits <- Gen.listOfN(k, Gen.choose(0, 63))
    } yield (idx, bits))
  } yield {
    val cluster = List.fill(clusterSize)(base.head)
    val near = flips.map { case (idx, bits) =>
      val (hi, lo) = base(idx)
      bits.distinct.foldLeft((hi, lo)) { case ((h, l), b) =>
        if (b < 32) (h, l ^ (1L << b)) else (h ^ (1L << (b - 32)), l)
      }
    }
    base ++ cluster ++ near
  }

  private def runCase(hashes: List[(Long, Long)]): Unit = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val fp = hashes.zipWithIndex.map { case (h, i) => i.toLong -> h }.toMap
    val df = fp.toSeq.sortBy(_._1)
      .map { case (id, (hi, lo)) => (id, hi, lo) }
      .toDF("doc_id", "h_hi", "h_lo")
    val out = Multimodal.phashNearCappedFrom(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out.keySet == fp.keySet, "not one row per document")
    val buckets = fp.toSeq
      .flatMap { case (id, h) => bandsOf(h).map(bk => (bk, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val anchorsOf = buckets.view
      .mapValues(_.take(Multimodal.AnchorK)).toMap
    fp.foreach { case (id, h) =>
      val q = bandsOf(h).flatMap(bk => anchorsOf(bk)).distinct
        .filter(a => a < id && hamming(fp(a), h) <= Multimodal.NearRadius)
      val (keep, dupOf, ham) = out(id)
      if (q.isEmpty)
        assert(keep == 1L && dupOf == -1L && ham == -1L,
          s"doc $id flagged without a qualifying anchor")
      else {
        assert(keep == 0L, s"doc $id missed anchors $q")
        assert(dupOf == q.min, s"doc $id dup_of $dupOf != ${q.min}")
        assert(ham == hamming(fp(dupOf), h), s"doc $id hamming off")
      }
    }
    // the planted exact cluster must be fully dominated by its min id
    val clusterIds = fp.filter(_._2 == fp(0L)).keys.toSeq.sorted
    if (clusterIds.size > 1)
      clusterIds.tail.foreach { id =>
        assert(out(id)._1 == 0L, s"exact copy $id escaped the cap")
      }
  }

  test("capped survivorship matches the anchor model on randomized " +
    "fingerprint sets with planted clusters") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15),
      Prop.forAll(genHashes) { hs => runCase(hs); true })
    assert(res.passed, res.status.toString)
  }

  test("a 200-copy exact cluster keeps exactly one representative") {
    runCase(List.fill(200)((0xABCDEF12L, 0x3456789AL)) ++
      List((0x1L, 0x2L), (0xFFFFFFFFL, 0xFFFFFFFFL)))
  }
}
