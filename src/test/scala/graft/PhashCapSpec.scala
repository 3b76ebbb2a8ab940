package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins `mm_phash_near_capped` (the bounded production twin of the
  * exact `mm_phash_near` pair query) to its contract:
  *
  *  - output is exactly ONE survivorship row per document — linear no
  *    matter how duplicate-dense the corpus;
  *  - soundness: every flagged row's (dup_of, hamming) is a real
  *    within-radius smaller-id neighbor sharing a band bucket, with
  *    dup_of the SMALLEST qualifying anchor and hamming taken against
  *    it (min-id dominance, the dedup_semantic convention);
  *  - the anchor guarantee: every document within radius of one of
  *    its buckets' K smallest ids (with a smaller id) is flagged —
  *    recall beyond the anchors is the deliberate trade, but the
  *    anchored part is exact, not approximate.
  */
class PhashCapSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) +
      java.lang.Long.bitCount(a._2 ^ b._2)

  private def bandsOf(h: (Long, Long)): Seq[(Int, Long)] = Seq(
    0 -> (h._2 & 0xFFFFL), 1 -> ((h._2 >> 16) & 0xFFFFL),
    2 -> (h._1 & 0xFFFFL), 3 -> ((h._1 >> 16) & 0xFFFFL))

  test("capped twin: one row per doc, sound flags, anchor-complete") {
    import graft.multimodal.Multimodal
    val out = SparkEntry.queries("mm_phash_near_capped")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val fp = {
      // closed-form fingerprints, the oracle's formula
      val docs = Tables.load(spark, sf, "documents")
        .select("doc_id").collect().map(_.getLong(0))
      docs.map { id =>
        val w = 16 + id % 48
        val h = 16 + (id * 7) % 48
        var lo = 0L; var hi = 0L
        for (oy <- 0 until 8; ox <- 0 until 8) {
          val a = ((ox * w) / 9 * 7 + (oy * h) / 8 * 13 + id * 31) % 256
          val b = (((ox + 1) * w) / 9 * 7 + (oy * h) / 8 * 13 + id * 31) % 256
          if (b > a) {
            val bit = oy * 8 + ox
            if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
          }
        }
        id -> (hi, lo)
      }.toMap
    }
    assert(out.keySet == fp.keySet, "not one row per document")
    // bucket membership and anchors
    val buckets = fp.toSeq
      .flatMap { case (id, h) => bandsOf(h).map(bk => (bk, id)) }
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    val anchorsOf = buckets.view
      .mapValues(_.take(Multimodal.AnchorK)).toMap
    def qualifying(id: Long): Seq[Long] = bandsOf(fp(id))
      .flatMap(bk => anchorsOf(bk))
      .distinct
      .filter(a => a < id && hamming(fp(a), fp(id)) <= Multimodal.NearRadius)
    out.foreach { case (id, (keep, dupOf, ham)) =>
      val q = qualifying(id)
      if (q.isEmpty) {
        assert(keep == 1L && dupOf == -1L && ham == -1L,
          s"doc $id flagged without a qualifying anchor")
      } else {
        assert(keep == 0L, s"doc $id missed qualifying anchors $q")
        assert(dupOf == q.min, s"doc $id dup_of $dupOf != min ${q.min}")
        assert(ham == hamming(fp(dupOf), fp(id)),
          s"doc $id hamming mismatch")
      }
    }
  }
}
