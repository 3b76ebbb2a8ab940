package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins the direct RIFF/PCM16 parse ([[Multimodal.decodeWavFast]])
  * sample-exact against the real `javax.sound.sampled` codec path it
  * replaces on the hot path — the contract that let the sf10 audio
  * rows drop the per-payload codec-stack overhead without touching a
  * single emitted integer. */
class MultimodalDecodeSpec extends AnyFunSuite {

  private lazy val spark = graft.GraftSpark.spark
  private val sf = graft.GraftSpark.sf

  test("fast PCM16 parse equals the codec decode on every fixture rate") {
    import spark.implicits._
    val rows = Multimodal.audioTable(spark, sf)
      .select("doc_id", "payload").as[(Long, Array[Byte])]
      .orderBy("doc_id").limit(64).collect()
    assert(rows.length == 64)
    // all four fixture rates appear in any 64 consecutive ids
    rows.foreach { case (id, payload) =>
      val (rF, sF) = Multimodal.decodeWavFast(id, payload)
      val (rC, sC) = Multimodal.decodeWav(id, payload)
      assert(rF == rC, s"doc $id: rate $rF vs codec $rC")
      assert(java.util.Arrays.equals(sF, sC), s"doc $id: samples diverge")
    }
  }

  test("fast parse walks extra/padded chunks and falls back off-contract") {
    // hand-build a WAV with a LIST chunk of ODD size before data —
    // exercises the chunk walk and the RIFF even-offset padding rule
    val n = 5
    val samples = Array[Short](100, -200, 300, -400, 32767)
    val listSz = 7 // odd => 1 pad byte
    val dataLen = n * 2
    val total = 4 + (8 + 16) + (8 + listSz + 1) + (8 + dataLen)
    val bb = java.nio.ByteBuffer.allocate(8 + total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(total)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(12000).putInt(24000)
      .putShort(2).putShort(16)
      .put("LIST".getBytes("US-ASCII")).putInt(listSz)
      .put(Array.fill[Byte](listSz + 1)(0x55))
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    val payload = bb.array()
    val (rate, s) = Multimodal.decodeWavFast(7L, payload)
    assert(rate == 12000 && java.util.Arrays.equals(s, samples))
    // codec agrees on the same container
    val (rC, sC) = Multimodal.decodeWav(7L, payload)
    assert(rC == 12000 && java.util.Arrays.equals(sC, samples))
    // off-contract (stereo) payloads must NOT be hand-parsed: the fast
    // path defers to the codec, whose loud format check rejects them
    val stereo = payload.clone()
    stereo(22) = 2 // channels
    intercept[IllegalStateException] {
      Multimodal.decodeWavFast(7L, stereo)
    }
  }
}
