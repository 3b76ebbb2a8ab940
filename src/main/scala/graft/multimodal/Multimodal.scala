package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extensions): media payloads as
  * opaque `binary` columns with typed metadata, and decode/feature/frame
  * operators. The image path is REAL: payloads are genuine grayscale PNGs
  * (rendered deterministically from doc_id, encoded with the JDK's
  * `javax.imageio` PNG codec) and the decode operators run an actual
  * `ImageIO.read`. Because the rendered pixel function is closed-form,
  * the decoded pixel statistics are DuckDB-oracle-checkable end-to-end —
  * the oracle recomputes them from the formula while Spark recovers them
  * from the PNG bytes. A deterministic stub remains only as the fallback
  * for payloads no installed codec accepts (e.g. video containers).
  *
  * At 100 TB the same pipeline shape holds: payloads stay in executor
  * memory one partition at a time; nothing is collected to the driver.
  */
object Multimodal {

  /** Deterministic pixel function: px(x, y) of doc `id`. */
  @inline private def pixel(id: Long, x: Int, y: Int): Int =
    ((x * 7L + y * 13L + id * 31L) % 256L).toInt

  private def renderPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real decode: any format an installed ImageIO codec accepts (PNG and
    * JPEG are always bundled with the JDK). None when no codec matches. */
  private[multimodal] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Int](w * h)
        img.getRaster.getSamples(0, 0, w, h, 0, px)
        (w, h, px)
      }
    } catch { case _: Exception => None }

  /** STUB DECODE — deterministic fake "pixel" statistics derived from the
    * payload bytes; the fallback when no codec accepts the payload. */
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

  /** documents → media table: (doc_id, mime, width, height, payload) with
    * payload a real PNG encoding of the deterministic image. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (16 + id % 48).toInt
          val h = (16 + (id * 7) % 48).toInt
          (id, "image/png", w, h, renderPng(id, w, h))
        }
      }
      .toDF("doc_id", "mime", "width", "height", "payload")
  }

  /** Typed-metadata scan: payload size + dimensions. Oracle-checkable
    * because octet_length(text) is engine-agnostic. */
  val metadataSparkSql: String =
    """SELECT doc_id, CAST(octet_length(text) AS BIGINT) AS n_bytes,
      |       CAST(16 + doc_id % 48 AS BIGINT) AS width,
      |       CAST(16 + (doc_id * 7) % 48 AS BIGINT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Decode + feature-extract: REAL `ImageIO.read` of the PNG payloads
    * via mapPartitions, emitting exact integer pixel statistics
    * (count/sum/sum-of-squares — no float rounding to diverge between
    * engines). Falls back to the stub for undecodable payloads. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
      .select("doc_id", "width", "height", "payload")
      .as[(Long, Int, Int, Array[Byte])]
    media.mapPartitions { it =>
      it.map { case (id, w0, h0, payload) =>
        val (w, h, px) = decodeImage(payload)
          .getOrElse((w0, h0, decodeStub(payload, w0, h0)))
        var sum = 0L
        var sumsq = 0L
        var i = 0
        while (i < px.length) {
          sum += px(i); sumsq += px(i).toLong * px(i); i += 1
        }
        (id, w.toLong, h.toLong, px.length.toLong, sum, sumsq)
      }
    }.toDF("doc_id", "width", "height", "n_px", "px_sum", "px_sumsq")
      .orderBy("doc_id")
  }

  /** Oracle: recompute the decoded statistics from the closed-form pixel
    * function — Spark must recover the exact same integers from the PNG
    * bytes (lossless grayscale roundtrip). */
  val decodeFeaturesDuckSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         CAST(16 + doc_id % 48 AS BIGINT) AS width,
      |         CAST(16 + (doc_id * 7) % 48 AS BIGINT) AS height
      |  FROM documents),
      |px AS (
      |  -- dims are 16..63, so a fixed 0..63 grid + filter replaces a
      |  -- lateral generate_series (not supported by DuckDB's binder)
      |  SELECT d.doc_id, d.width, d.height,
      |         (tx.x * 7 + ty.y * 13 + d.doc_id * 31) % 256 AS v
      |  FROM d,
      |       generate_series(0, 63) AS tx(x),
      |       generate_series(0, 63) AS ty(y)
      |  WHERE tx.x < d.width AND ty.y < d.height)
      |SELECT doc_id, MIN(width) AS width, MIN(height) AS height,
      |       COUNT(*) AS n_px, SUM(v) AS px_sum, SUM(v * v) AS px_sumsq
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

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

  /** Resize: real decode, nearest-neighbor downsample to a fixed
    * thumbnail grid, emit new dims + pixel checksum — the batch-resize
    * shape of a real thumbnailing pipeline. */
  def resize(spark: SparkSession, dir: String,
             outW: Int = 8, outH: Int = 8): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
      .select("doc_id", "width", "height", "payload")
      .as[(Long, Int, Int, Array[Byte])]
    media.mapPartitions { it =>
      it.map { case (id, w0, h0, payload) =>
        val (w, h, px) = decodeImage(payload)
          .getOrElse((w0, h0, decodeStub(payload, w0, h0)))
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
    "mm_metadata" -> metadataDuckSql,
    "mm_decode_features" -> decodeFeaturesDuckSql
  )
}
