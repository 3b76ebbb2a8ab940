package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query registries; each module owns its
  * operators' Spark implementations and (where checkable) DuckDB oracles.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3-shaped multi-join over the smoke tables.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    relational.Relational.queries("q07_multi_join")(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.Relational.queries ++
      relational.Stats.queries ++
      relational.TopK.queries ++
      dedup.Dedup.queries ++
      similarity.Similarity.queries ++
      text.TextAnalysis.queries ++
      text.Corpus.queries ++
      text.Bpe.queries ++
      multimodal.Multimodal.queries ++
      streaming.StreamingOps.queries ++
      layout.Layout.queries ++
      rasterops.RasterQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    relational.Relational.oracleSql ++
      relational.Stats.oracleSql ++
      relational.TopK.oracleSql ++
      dedup.Dedup.oracleSql ++
      similarity.Similarity.oracleSql ++
      text.TextAnalysis.oracleSql ++
      text.Corpus.oracleSql ++
      text.Bpe.oracleSql ++
      multimodal.Multimodal.oracleSql ++
      streaming.StreamingOps.oracleSql ++
      layout.Layout.oracleSql ++
      rasterops.RasterQueries.oracleSql
}
