package graft.similarity

import graft.Tables
import graft.functions.VecFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over the `embeddings` table
  * (`Array[Float]`, north-star extensions, SURVEY §7.1 step 8).
  *
  *  - `sim_bruteforce_topk`: exact cosine top-k for a fixed query set —
  *    the correctness baseline (DuckDB-oracle checked). The query side is
  *    tiny → Catalyst broadcasts it; the candidate scan streams map-side.
  *  - `sim_lsh_topk`: random-hyperplane LSH — the 100 TB scale path.
  *    Signatures are one map-side projection; candidate generation is an
  *    equi-join on signature chunks (multi-probe via chunk bands), so the
  *    per-query work is O(bucket) instead of O(N).
  */
object Similarity {

  val K = 5
  val NumQueries = 10 // query set: vec_id < 10, fixed for determinism

  /** Exact cosine via the native `vec_cosine` Expression — left-to-right
    * double folds, so the doubles match the DuckDB oracle bit-for-bit. */
  val bruteforceSparkSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |           WHERE vec_id < $NumQueries),
       |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
       |s AS (SELECT qid, cid, vec_cosine(qe, ce) AS cos
       |  FROM q JOIN c ON qid <> cid)
       |SELECT qid, cid, rn, ROUND(cos, 4) AS cos FROM (
       |  SELECT qid, cid, cos,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |  FROM s) t
       |WHERE rn <= $K ORDER BY qid, rn""".stripMargin

  val bruteforceDuckSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |           WHERE vec_id < $NumQueries),
       |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
       |s AS (SELECT qid, cid,
       |  list_sum(list_transform(generate_series(1, len(qe)),
       |           i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) /
       |  (sqrt(list_sum(list_transform(qe,
       |        v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) *
       |   sqrt(list_sum(list_transform(ce,
       |        v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
       |  FROM q JOIN c ON qid <> cid)
       |SELECT qid, cid, rn, ROUND(cos, 4) AS cos FROM (
       |  SELECT qid, cid, cos,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |  FROM s) t
       |WHERE rn <= $K ORDER BY qid, rn""".stripMargin

  // ---- LSH (random hyperplanes) -------------------------------------------

  val SigBits = 16
  val ChunkBits = 4 // 4 chunks of 4 bits: candidates share any chunk

  /** Deterministic pseudo-random hyperplanes (seed fixed; dimension taken
    * from the data at plan time — one-row driver lookup, metadata-cheap). */
  private def planes(dim: Int): Array[Array[Double]] = {
    val r = new scala.util.Random(7)
    Array.fill(SigBits)(Array.fill(dim)(r.nextGaussian()))
  }

  private def sigUdf(dim: Int) = {
    val ps = planes(dim)
    udf { emb: Seq[Float] =>
      var sig = 0
      var b = 0
      while (b < SigBits) {
        var dot = 0.0
        val p = ps(b)
        var i = 0
        val n = math.min(dim, emb.length)
        while (i < n) { dot += emb(i) * p(i); i += 1 }
        if (dot > 0) sig |= (1 << b)
        b += 1
      }
      sig
    }
  }

  /** (vec_id, chunk, v) signature-chunk rows — ids only, so the candidate
    * join and distinct shuffle 12 bytes/row instead of full embeddings;
    * vectors are joined back only for surviving candidate pairs. */
  private def chunkRows(emb: DataFrame, dim: Int,
                        chunkBits: Int = ChunkBits): DataFrame =
    emb.select(col("vec_id"), sigUdf(dim)(col("embedding")).as("sig"))
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${SigBits / chunkBits - 1}), " +
          s"c -> shiftright(sig, c * $chunkBits) & ${(1 << chunkBits) - 1})"))
        .as(Seq("chunk", "v")))

  /** Approximate top-k: same-chunk LSH candidates, exact cosine re-rank.
    * Output schema matches bruteforce (qid, cid, rn, cos). */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    VecFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val dim = emb.selectExpr("size(embedding)").head().getInt(0)
    val chunked = chunkRows(emb, dim)
    val q = chunked.where(col("vec_id") < NumQueries).toDF("qid", "chunk", "v")
    val c = chunked.toDF("cid", "chunk", "v")
    val pairIds = q.join(c, Seq("chunk", "v"))
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    val cand = pairIds
      .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qe")), "qid")
      .join(emb.select(col("vec_id").as("cid"), col("embedding").as("ce")), "cid")
    // native codegen'd kernel (CosineSimilarity Expression)
    val cosine = call_function("vec_cosine", col("qe"), col("ce"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    cand.select(col("qid"), col("cid"), cosine.as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= K)
      .select(col("qid"), col("cid"), col("rn"), round(col("cos"), 4).as("cos"))
      .orderBy("qid", "rn")
  }

  /** Embedding near-duplicate pairs (cos >= threshold) via LSH blocking —
    * the embedding-cosine member of the dedup family. */
  /* Default threshold tuned to the synthetic embeddings (max pairwise
   * cosine ~0.51 at sf0.01); real corpora would use ~0.9. */
  def nearDupPairs(spark: SparkSession, dir: String,
                   threshold: Double = 0.45): DataFrame = {
    VecFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val dim = emb.selectExpr("size(embedding)").head().getInt(0)
    // all-pairs mode: coarser buckets (8-bit chunks) shrink the expected
    // candidate count; the hard bound against a skewed bucket going
    // quadratic is the MaxBucket cap below (same guard as MinHash-LSH)
    val chunked = chunkRows(emb, dim, chunkBits = 8)
    // native codegen'd kernel (CosineSimilarity Expression)
    val cosine = call_function("vec_cosine", col("ea"), col("eb"))
    val buckets = chunked
      .groupBy("chunk", "v")
      .agg(collect_list(col("vec_id")).as("ids"))
      .where(size(col("ids")).between(2, graft.dedup.Dedup.MaxBucket))
    buckets
      .select(explode(col("ids")).as("vec_a"), col("ids"))
      .select(col("vec_a"), explode(col("ids")).as("vec_b"))
      .where(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
      .select(col("vec_a"), col("vec_b"), cosine.as("cos"))
      .where(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  // ---- IVF (inverted file index via k-means coarse quantizer) -------------

  val IvfCentroids = 16
  val IvfProbes = 4

  /** IVF approximate top-k — the second scale path beside LSH: a k-means
    * coarse quantizer (MLlib, fixed seed) partitions the corpus into
    * `IvfCentroids` cells; each query probes its `IvfProbes` nearest
    * cells and exact-cosine re-ranks only those candidates. At 100 TB the
    * assignment column doubles as the physical partition key, so a probe
    * touches `probes/centroids` of the data; training runs on a sample.
    * Output schema matches bruteforce (qid, cid, rn, cos). */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    VecFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
      .withColumn("vec", array_to_vector(
        expr("transform(embedding, x -> CAST(x AS DOUBLE))")))
      .cache()
    val model = new KMeans().setK(IvfCentroids).setSeed(11)
      .setMaxIter(5).setFeaturesCol("vec").setPredictionCol("cell")
      .fit(emb)
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("cell"))
    // per-query probe list: nearest IvfProbes centroids by euclidean
    val centroids = model.clusterCenters
    val probeUdf = udf { emb2: Seq[Float] =>
      centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        val n = math.min(c.size, emb2.length)
        var j = 0
        while (j < n) { val t = c(j) - emb2(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(_._1).take(IvfProbes).map(_._2)
    }
    val queries = assigned.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(probeUdf(col("embedding"))).as("cell"))
    val cand = queries.join(
        assigned.select(col("vec_id").as("cid"),
          col("embedding").as("ce"), col("cell")), Seq("cell"))
      .where(col("qid") =!= col("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    cand.select(col("qid"), col("cid"),
        call_function("vec_cosine", col("qe"), col("ce")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= K)
      .select(col("qid"), col("cid"), col("rn"), round(col("cos"), 4).as("cos"))
      .orderBy("qid", "rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ivf_topk" -> ((s, d) => ivfTopK(s, d)),
    "sim_bruteforce_topk" -> ((s, d) => {
      VecFunctions.register(s); Tables.sql(bruteforceSparkSql)(s, d)
    }),
    "sim_lsh_topk" -> ((s, d) => lshTopK(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => nearDupPairs(s, d))
  )

  val oracleSql: Map[String, String] = Map(
    "sim_bruteforce_topk" -> bruteforceDuckSql
  )
}
