package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Semantics pins for text_zipf and text_boilerplate on handcrafted
  * corpora with closed-form answers (the DuckDB oracle only proves
  * cross-engine agreement; these pin the business rules). Crafted
  * views shadow `documents` and are restored in a finally. */
class TextCleanupSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docsView(rows: Seq[Row]): Unit =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .createOrReplaceTempView("documents")

  private def restore(): Unit =
    Tables.load(spark, sf, "documents")
      .createOrReplaceTempView("documents")

  test("text_zipf: an exact c = 6/rank corpus fits slope -1, r2 1") {
    Tables.register(spark, sf)
    try {
      val corpus = (Seq.fill(6)("w1") ++ Seq.fill(3)("w2") ++
        Seq.fill(2)("w3")).mkString(" ")
      docsView(Seq(Row(1L, corpus, "en", "s1", corpus.length.toLong)))
      val r = spark.sql(text.TextAnalysis.zipfSparkSql).head()
      assert(r.getLong(r.fieldIndex("n_types")) == 3L)
      assert(r.getLong(r.fieldIndex("n_tokens")) == 11L)
      assert(r.getString(r.fieldIndex("zipf_slope")) == "-1.000000")
      assert(r.getString(r.fieldIndex("zipf_r2")) == "1.000000")
    } finally restore()
  }

  test("text_boilerplate: cross-doc same-source grams flag; within-doc " +
    "repetition and cross-source repeats do not; short docs get NULL") {
    Tables.register(spark, sf)
    try {
      docsView(Seq(
        // s1: "a b c" shared by docs 1+2 → boilerplate in s1
        Row(1L, "a b c d", "en", "s1", 7L),
        Row(2L, "a b c x", "en", "s1", 7L),
        // s2: one doc repeating its own gram — NOT boilerplate
        // (distinct-doc count is 1), even though "a b c" also appears
        // in s1 (boilerplate is per-source)
        Row(3L, "a b c a b c a b c", "en", "s2", 17L),
        // two tokens → zero grams → NULL ratio
        Row(4L, "hi there", "en", "s2", 8L)))
      val out = spark.sql(text.TextAnalysis.boilerplateSparkSql)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3)))).toMap
      assert(out(1L) == ((2L, 1L, "0.5000")), out(1L))
      assert(out(2L) == ((2L, 1L, "0.5000")), out(2L))
      assert(out(3L) == ((7L, 0L, "0.0000")), out(3L))
      assert(out(4L) == ((0L, 0L, null)), out(4L))
    } finally restore()
  }

  test("text_novelty: a gram is novel only in its minimum-doc_id doc; " +
    "per-doc grams are distinct; short docs get NULL") {
    Tables.register(spark, sf)
    try {
      docsView(Seq(
        // doc 1 owns both of its grams (first appearance)
        Row(1L, "a b c d", "en", "s1", 7L),
        // doc 2 shares "a b c" (seen in doc 1) + one new gram
        Row(2L, "a b c x", "en", "s2", 7L),
        // doc 3 repeats its own novel gram — distinct-per-doc counts it once
        Row(3L, "p q r p q r", "en", "s1", 11L),
        Row(4L, "hi there", "en", "s1", 8L)))
      val out = spark.sql(text.TextAnalysis.noveltySparkSql)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3)))).toMap
      assert(out(1L) == ((2L, 2L, "1.0000")), out(1L))
      assert(out(2L) == ((2L, 1L, "0.5000")), out(2L))
      // doc 3 grams: p q r / q r p / r p q / p q r → 3 distinct, all novel
      assert(out(3L) == ((3L, 3L, "1.0000")), out(3L))
      assert(out(4L) == ((0L, 0L, null)), out(4L))
    } finally restore()
  }
}
