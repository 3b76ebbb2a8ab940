package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structural graph analytics over the kNN similarity graph
  * ([[Kmeans.knnGraph]]) beyond centrality ([[PageRank]]): connected
  * components (the transitive closure of "is a near neighbor" — the
  * cluster inventory a dedup/diversity pass reads) and triangle/
  * clustering statistics (how clique-like the neighborhoods are — high
  * clustering means redundant near-duplicate pockets, low means a
  * stringy manifold).
  *
  * Scale shapes:
  *   - Components run converging min-label propagation: per iteration
  *     ONE join (labels ⋈ edges, both hash-partitioned on the join key,
  *     AQE reuses the exchange) + ONE groupBy min — the Pregel gather/
  *     apply step as DataFrames. Driver state per iteration is a single
  *     aggregated long (the changed-label count), never node data; the
  *     loop materializes each frontier with persist() so lineage stays
  *     one-deep. At 100 TB scale the same loop ships with the
  *     alternating large-star/small-star optimization for skewed
  *     components; the kNN graph's components are cell-bounded (edges
  *     are cell-local by construction), so plain propagation converges
  *     in a handful of rounds here.
  *   - Triangles canonicalize each undirected edge once (lo < hi) and
  *     count closed wedges with two hash joins — the standard
  *     edge-iterator algorithm. Orientation by vertex id bounds the
  *     duplicate factor to exactly 1 per triangle; a power-law graph at
  *     scale would orient low-degree → high-degree instead (same plan,
  *     different sort key) to keep the wedge fan-out per task bounded.
  *
  * Oracle exactness: labels and counts are integers end-to-end (no
  * floating point anywhere except the final clustering coefficient,
  * spelled identically cross-engine), and converged min-labels are a
  * well-defined fixpoint — both engines agree however many rounds each
  * takes to reach it (DuckDB runs a recursive CTE to ITS fixpoint,
  * Spark loops to ITS; the fixpoint is the same object).
  */
object Graph {

  /** Converged min-label connected components over an arbitrary
    * directed edge list (symmetrize before calling for undirected
    * semantics) — the kernel, fixture-testable.
    *
    * Each round combines the Pregel neighbor-min gather with POINTER
    * JUMPING (lbl ← lbl(lbl), the path-halving step of hash-to-min
    * CC): label chains contract geometrically, so convergence is
    * O(log diameter) rounds instead of O(diameter) — on the kNN
    * graph's ~30-hop cell paths that is 6 rounds instead of ~30, and
    * at 100 TB the round count is what multiplies every shuffle. The
    * fixpoint (component-minimum labels) is the same object either
    * way, which is what lets the DuckDB oracle converge by a different
    * route and still hash-match. */
  private[graft] def components(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 50): DataFrame = {
    val e = edges.persist()
    val n = nodes.select(col("vec_id")).persist()
    // eager localCheckpoint per round: the frontier materializes NOW and
    // its lineage truncates, so round k never re-executes rounds 0..k-1
    // (the persist()/unpersist() spelling silently did exactly that —
    // unpersisting the parent before the lazily-persisted child ever
    // materialized turned the loop quadratic, 56 s for what is 3 s).
    var labels = n.select(col("vec_id"), col("vec_id").as("lbl"))
      .localCheckpoint()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      it += 1
      // gather: min label over in-neighbors
      val gathered = e.join(labels, e("src") === labels("vec_id"))
        .groupBy(e("dst").as("vec_id")).agg(min("lbl").as("nbr_lbl"))
      val stepped = labels.join(gathered, Seq("vec_id"), "left")
        .select(col("vec_id"), col("lbl"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl")))
            .as("mid_lbl"))
      // jump: follow the label's own label (path halving)
      val parent = labels
        .select(col("vec_id").as("p_id"), col("lbl").as("p_lbl"))
      val next = stepped.join(parent, col("mid_lbl") === col("p_id"), "left")
        .select(col("vec_id"), col("lbl"),
          least(col("mid_lbl"), coalesce(col("p_lbl"), col("mid_lbl")))
            .as("new_lbl"))
        .localCheckpoint()
      // ONE aggregated long crosses to the driver per round, read from
      // the already-materialized checkpoint
      converged = next.where(col("new_lbl") < col("lbl")).limit(1)
        .count() == 0L
      labels = next.select(col("vec_id"), col("new_lbl").as("lbl"))
    }
    require(converged, s"components did not converge in $maxIters rounds")
    labels
  }

  /** Registered query: components of the symmetrized kNN graph, each
    * node with its component id (= min member vec_id) and size. */
  def connectedComponents(spark: SparkSession, dir: String): DataFrame = {
    val knn = Kmeans.knnGraphCached(spark, dir)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    val edges = knn.union(knn.select(col("dst").as("src"),
      col("src").as("dst"))).distinct()
    val nodes = graft.Tables.load(spark, dir, "embeddings").select("vec_id")
    val labels = components(nodes, edges)
    val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("comp_n"))
    labels.join(sizes, "lbl")
      .select(col("vec_id"), col("lbl").as("comp_id"),
        col("comp_n").cast("long").as("comp_n"))
      .orderBy("vec_id")
  }

  /** Oracle: the kNN CTE chain feeding a recursive min-label closure.
    * The recursion carries (node, label) pairs pruned to lbl < node —
    * a label ≥ the node can never be its min (the node's own id is
    * already seated), and the component-min label always survives the
    * prune along any path, so the fixpoint is exact while the pair
    * space stays o(component²). */
  def componentsDuckSql: String = {
    // knnCtePrefix opens with "WITH e AS"; the recursive member needs
    // the RECURSIVE keyword hoisted onto that same WITH
    val prefix = "WITH RECURSIVE " +
      Kmeans.knnCtePrefix.stripPrefix("WITH ")
    s"""$prefix,
       |kn AS (SELECT vec_id, nbr_id FROM r WHERE rn <= ${Kmeans.KnnK}),
       |ed AS (
       |  SELECT vec_id AS src, nbr_id AS dst FROM kn
       |  UNION SELECT nbr_id, vec_id FROM kn),
       |nd AS (SELECT vec_id FROM e),
       |cc AS (
       |  SELECT vec_id, vec_id AS lbl FROM nd
       |  UNION
       |  SELECT ed.dst AS vec_id, cc.lbl
       |  FROM cc JOIN ed ON cc.vec_id = ed.src
       |  WHERE cc.lbl < ed.dst),
       |lab AS (
       |  SELECT vec_id, MIN(lbl) AS comp_id FROM cc GROUP BY vec_id),
       |sz AS (
       |  SELECT comp_id, CAST(COUNT(*) AS BIGINT) AS comp_n
       |  FROM lab GROUP BY comp_id)
       |SELECT lab.vec_id, lab.comp_id, sz.comp_n
       |FROM lab JOIN sz ON lab.comp_id = sz.comp_id
       |ORDER BY lab.vec_id""".stripMargin
  }

  /** Exact triangle census of an arbitrary directed edge list
    * (symmetrized + id-canonicalized internally) — the kernel. */
  private[graft] def triangleStats(edges: DataFrame): DataFrame = {
    // one row per undirected edge, oriented lo < hi (mutual kNN pairs
    // collapse); every triangle a<b<c appears exactly once as the
    // wedge (a,b)+(b,c) closed by (a,c)
    val und = edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .where(col("lo") =!= col("hi")).distinct().persist()
    val e1 = und.select(col("lo").as("a"), col("hi").as("b"))
    val e2 = und.select(col("lo").as("b2"), col("hi").as("c"))
    val e3 = und.select(col("lo").as("a3"), col("hi").as("c3"))
    val tri = e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = und.select(col("lo").as("v"))
      .union(und.select(col("hi").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val wedge = deg.agg(
      sum(expr("d * (d - 1) div 2")).as("n_wedges"))
    val edgeN = und.agg(count(lit(1)).as("n_edges"))
    edgeN.crossJoin(tri).crossJoin(wedge)
      .select(col("n_edges").cast("long").as("n_edges"),
        col("n_triangles").cast("long").as("n_triangles"),
        col("n_wedges").cast("long").as("n_wedges"),
        expr("CAST(CAST(3.0 * n_triangles / n_wedges AS DECIMAL(18,6))" +
          " AS STRING)").as("clustering"))
  }

  /** Registered query: triangle count / wedge count / global clustering
    * coefficient of the kNN graph — ONE summary row. */
  def triangles(spark: SparkSession, dir: String): DataFrame =
    triangleStats(Kmeans.knnGraphCached(spark, dir)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst")))

  def trianglesDuckSql: String =
    s"""${Kmeans.knnCtePrefix},
       |kn AS (SELECT vec_id, nbr_id FROM r WHERE rn <= ${Kmeans.KnnK}),
       |und AS (
       |  SELECT DISTINCT LEAST(vec_id, nbr_id) AS lo,
       |         GREATEST(vec_id, nbr_id) AS hi
       |  FROM kn WHERE vec_id <> nbr_id),
       |tri AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
       |  FROM und e1 JOIN und e2 ON e1.hi = e2.lo
       |       JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
       |dg AS (
       |  SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
       |    SELECT lo AS v FROM und UNION ALL SELECT hi FROM und)
       |  GROUP BY v),
       |wg AS (
       |  SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM dg),
       |en AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und)
       |SELECT en.n_edges, tri.n_triangles, wg.n_wedges,
       |       CAST(CAST(3.0 * tri.n_triangles / wg.n_wedges
       |            AS DECIMAL(18,6)) AS VARCHAR) AS clustering
       |FROM en CROSS JOIN tri CROSS JOIN wg""".stripMargin
}
