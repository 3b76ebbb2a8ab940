package graft

import graft.similarity.Kmeans
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the distributed Lloyd's trainer and the cell-blocked
  * kNN graph (the DuckDB oracle proves cross-engine agreement; these
  * pin the clustering/graph contracts on the real sf0.001 table). */
class KmeansSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  test("kmeans: partition of the corpus, deterministic across runs, " +
    "k rows even when clusters empty") {
    val a = Kmeans.kmeans(spark, sf).collect()
    val b = Kmeans.kmeans(spark, sf).collect()
    assert(a.toSeq == b.toSeq) // broadcast + integer argmin → no run drift
    assert(a.length == Kmeans.K)
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(a.map(_.getLong(1)).sum == total) // sizes partition the corpus
    assert(a.forall(_.getLong(2) >= 0L))
  }

  test("kmeans: trained inertia is no worse than the init-centroid " +
    "inertia (Lloyd monotonicity, end to end)") {
    import spark.implicits._
    val q = Kmeans.quantizedVecs(spark, sf)
    val init = q.orderBy("vec_id").limit(Kmeans.K)
      .collect().sortBy(_._1).map(_._2)
    val bc = spark.sparkContext.broadcast(init)
    val initInertia = q.map { case (_, v) =>
      init.indices.map { c =>
        var s = 0L; var i = 0
        val cv = bc.value(c)
        while (i < v.length) { val d = v(i) - cv(i); s += d * d; i += 1 }
        s
      }.min
    }.reduce(_ + _)
    val trained = Kmeans.kmeans(spark, sf).collect()
      .map(_.getLong(2)).sum
    assert(trained <= initInertia, s"$trained > $initInertia")
  }

  test("raster pixel clusterer: k rows, sizes partition the landed " +
    "feature table, deterministic across runs") {
    val a = rasterops.RasterQueries.queries("raster_cluster")(spark, sf)
      .collect()
    assert(a.length == 4)
    val landed = spark.read.parquet(
      s"${sys.props("java.io.tmpdir")}/graft_raster_cluster_parquet")
      .count()
    assert(a.map(_.getLong(1)).sum == landed)
    val b = rasterops.RasterQueries.queries("raster_cluster")(spark, sf)
      .collect()
    assert(a.toSeq == b.toSeq)
  }

  test("knn graph: no self edges, at most K ranked neighbors per " +
    "vector, similarity non-increasing in rank") {
    val rows = Kmeans.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (v, _, n, _) => v != n })
    rows.groupBy(_._1).foreach { case (v, g) =>
      assert(g.length <= Kmeans.KnnK, s"vec $v has ${g.length} neighbors")
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length).toSeq)
      val sims = byRank.map(_._4)
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y },
        s"vec $v sims not non-increasing: ${sims.mkString(",")}")
    }
  }
}
