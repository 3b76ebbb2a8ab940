package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extensions): media payloads as
  * opaque `binary` columns with typed metadata, and decode/feature/frame
  * operators whose **Spark-side shape is real** (schema, partitioning,
  * per-partition batch iteration) while the actual codec is a clearly
  * marked deterministic stub — the container has no image/audio libraries
  * (see the builder brief), so the stub stands in for e.g. a JPEG decoder.
  *
  * The media table is derived deterministically from `documents`: payload =
  * UTF-8 bytes of the text, metadata synthesized from doc_id. At 100 TB the
  * same pipeline shape holds: payloads stay in executor memory one partition
  * at a time; nothing is collected to the driver.
  */
object Multimodal {

  /** documents → media table: (doc_id, mime, width, height, payload). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      concat(lit("image/fake-"), col("source")).as("mime"),
      (lit(16) + pmod(col("doc_id"), lit(48))).cast("int").as("width"),
      (lit(16) + pmod(col("doc_id") * 7, lit(48))).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Typed-metadata scan: payload size + dimensions. Oracle-checkable
    * because octet_length(text) is engine-agnostic. */
  val metadataSparkSql: String =
    """SELECT doc_id, CAST(octet_length(text) AS BIGINT) AS n_bytes,
      |       CAST(16 + doc_id % 48 AS BIGINT) AS width,
      |       CAST(16 + (doc_id * 7) % 48 AS BIGINT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  /** STUB DECODE — deterministic fake "pixel" statistics derived from the
    * payload bytes. A real deployment swaps `decodeStub` for an actual
    * codec; everything around it (distribution, batching, schema) stays. */
  private def decodeStub(payload: Array[Byte], w: Int, h: Int): Array[Int] = {
    val px = new Array[Int](w * h)
    var i = 0
    var seed = 1469598103934665603L
    while (i < payload.length) { seed = (seed ^ payload(i)) * 1099511628211L; i += 1 }
    i = 0
    while (i < px.length) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      px(i) = ((seed >>> 33) & 0xff).toInt
      i += 1
    }
    px
  }

  /** Decode + feature-extract: per-item "pixel" mean/std via mapPartitions
    * (one decode buffer per partition batch, the shape a vectorized decode
    * UDF needs). */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
      .select("doc_id", "width", "height", "payload")
      .as[(Long, Int, Int, Array[Byte])]
    media.mapPartitions { it =>
      it.map { case (id, w, h, payload) =>
        val px = decodeStub(payload, w, h)
        val n = px.length.toDouble
        val mean = px.sum / n
        val variance = px.map(p => (p - mean) * (p - mean)).sum / n
        (id, w, h, math.round(mean * 10000) / 10000.0,
          math.round(math.sqrt(variance) * 10000) / 10000.0)
      }
    }.toDF("doc_id", "width", "height", "px_mean", "px_std")
      .orderBy("doc_id")
  }

  /** Frame sampling: treat payload as a "video" of 64-byte frames, keep
    * every 4th frame, emit (doc_id, frame_idx, checksum) — the explode
    * shape of a real frame sampler. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir).select("doc_id", "payload")
      .as[(Long, Array[Byte])]
    media.flatMap { case (id, payload) =>
      payload.grouped(64).zipWithIndex.collect {
        case (frame, idx) if idx % 4 == 0 =>
          var crc = 0L
          frame.foreach(b => crc = crc * 31 + (b & 0xff))
          (id, idx, crc)
      }
    }.toDF("doc_id", "frame_idx", "checksum")
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize: decode (stub), nearest-neighbor downsample to a fixed
    * thumbnail grid, emit new dims + pixel checksum — the batch-resize
    * shape of a real thumbnailing pipeline (decode swaps in, the
    * distribution/schema stays). */
  def resize(spark: SparkSession, dir: String,
             outW: Int = 8, outH: Int = 8): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
      .select("doc_id", "width", "height", "payload")
      .as[(Long, Int, Int, Array[Byte])]
    media.mapPartitions { it =>
      it.map { case (id, w, h, payload) =>
        val px = decodeStub(payload, w, h)
        var crc = 1125899906842597L
        var oy = 0
        while (oy < outH) {
          var ox = 0
          while (ox < outW) {
            val sx = ox * w / outW
            val sy = oy * h / outH
            crc = crc * 31 + px(sy * w + sx)
            ox += 1
          }
          oy += 1
        }
        (id, outW, outH, crc)
      }
    }.toDF("doc_id", "out_w", "out_h", "thumb_crc")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> Tables.sql(metadataSparkSql),
    "mm_decode_features" -> ((s, d) => decodeFeatures(s, d)),
    "mm_frame_sample" -> ((s, d) => frameSample(s, d)),
    "mm_resize" -> ((s, d) => resize(s, d))
  )

  val metadataDuckSql: String =
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       CAST(16 + doc_id % 48 AS BIGINT) AS width,
      |       CAST(16 + (doc_id * 7) % 48 AS BIGINT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "mm_metadata" -> metadataDuckSql
  )
}
