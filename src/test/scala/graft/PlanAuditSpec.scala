package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide physical-plan audit: no registered batch query may plan a
  * CartesianProduct — the one join shape that cannot survive a 100 TB
  * input on either side. Single-row stats cross-joins are fine (they
  * plan as BroadcastNestedLoopJoin over a 1-row build side); an actual
  * CartesianProduct means an equi-condition was lost.
  *
  * Streaming queries are excluded (building them executes the stream;
  * their plans are pinned by their own specs/oracles).
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private val excluded: String => Boolean = name =>
    name.startsWith("stream_")

  test("column pruning reaches the documents scan (ReadSchema minimal)") {
    // a scan that reads all five documents columns for a two-column
    // operator would ship 2.5x the bytes at 100 TB — assert the pruned
    // ReadSchema for a representative query per family
    val expected = Map(
      "text_stats" -> Set("doc_id", "text"),
      "corpus_split" -> Set("doc_id"),
      "corpus_mix" -> Set("source", "text"),
      "corpus_sample" -> Set("doc_id", "lang"),
      "dedup_exact" -> Set("doc_id", "text"),
      "text_langid" -> Set("doc_id", "lang", "text"),
      "text_langid_segments" -> Set("doc_id", "text"),
      "corpus_segment_filter" -> Set("doc_id", "text"),
      "text_heavy_hitters_sketch" -> Set("text"),
      "text_entropy" -> Set("doc_id", "text"),
      "corpus_js_divergence" -> Set("source", "text"))
    expected.foreach { case (name, cols) =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val reads = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(reads.nonEmpty, s"$name: no parquet ReadSchema in plan")
      // each scan must read no more than the operator needs (a multi-scan
      // plan may legitimately prune different subsets per scan, e.g. a
      // DISTINCT-keys CTE reading one column); together they must need
      // exactly the expected set
      val gots = reads.map(r =>
        r.split(",").filter(_.nonEmpty).map(_.split(":")(0)).toSet)
      gots.foreach { got =>
        assert(got.subsetOf(cols), s"$name scan reads $got, allowed $cols")
      }
      assert(gots.reduce(_ ++ _) == cols,
        s"$name scans read ${gots.reduce(_ ++ _)}, expected $cols")
    }
  }

  test("text_length_filter broadcasts the per-source thresholds; " +
    "corpus_shuffle never plans a global single-partition window") {
    val lf = SparkEntry.queries("text_length_filter")(spark, sf)
      .queryExecution.executedPlan.toString
    // the thresholds side is a handful of rows — a sort-merge join here
    // would shuffle every document row at 100 TB
    assert(lf.contains("BroadcastHashJoin"), s"no broadcast join:\n$lf")
    assert(!lf.contains("SortMergeJoin"), "length filter shuffled the docs")
    val sh = SparkEntry.queries("corpus_shuffle")(spark, sf)
      .queryExecution.executedPlan.toString
    // the two-phase scan must keep the naive spelling's Window out of
    // the plan entirely (a global row_number serializes the corpus)
    assert(!sh.contains("Window"), s"global window in corpus_shuffle:\n$sh")
  }

  test("sparse-retrieval probe prunes the index to hashed keys") {
    // the standing impact index carries the raw term string for
    // debuggability; the probe must never read it — its scans touch
    // only (doc_id, wh, wgt) plus the posting-truncation `kept` flag
    // (one byte/row), so the hot join+agg is all fixed-width
    val probe = SparkEntry.queries("text_sparse_retrieval")(spark, sf)
      .queryExecution.executedPlan.toString
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(probe).map(_.group(1)).toSeq
    assert(reads.nonEmpty, s"no parquet scans in probe plan:\n$probe")
    reads.foreach { r =>
      val cols = r.split(",").filter(_.nonEmpty).map(_.split(":")(0)).toSet
      assert(cols.subsetOf(Set("doc_id", "wh", "wgt", "kept")),
        s"probe scan reads $cols — term strings leaked into the hot path")
    }
    assert(!probe.contains("BroadcastNestedLoopJoin"), probe)
  }

  test("round-7 additions: pruned scans, no corpus-sized shuffles where none needed") {
    // dsir: the corpus explode must read exactly (doc_id, source, text);
    // the vocab-sized ratio join must not degrade to a nested loop
    val dsir = SparkEntry.queries("corpus_dsir_sample")(spark, sf)
      .queryExecution.executedPlan.toString
    val dsirReads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(dsir).map(_.group(1)).toSeq
    assert(dsirReads.nonEmpty)
    dsirReads.foreach { r =>
      val cols = r.split(",").filter(_.nonEmpty).map(_.split(":")(0)).toSet
      assert(cols.subsetOf(Set("doc_id", "source", "text")),
        s"dsir scan reads $cols")
    }
    // the 1-row scalar CTEs (corpus totals) legitimately plan as BNLJ
    // cross joins; the WORD join must be a hash join
    assert(dsir.contains("HashJoin"), s"no hash join on the word key:\n$dsir")

    // chunking is per-row array math: the only exchange is the output
    // sort's range partitioning — a hash exchange would mean the chunker
    // shuffled the corpus
    val chunk = SparkEntry.queries("text_chunk")(spark, sf)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!chunk.contains("Exchange hashpartitioning"),
      s"text_chunk shuffled:\n$chunk")
    val chunkReads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(chunk).map(_.group(1)).toSeq
    chunkReads.foreach { r =>
      val cols = r.split(",").filter(_.nonEmpty).map(_.split(":")(0)).toSet
      assert(cols.subsetOf(Set("doc_id", "text")), s"chunk scan reads $cols")
    }

    // expectations: ALL of a table's rules fold into one scan — adding
    // a rule must add a counter, never a pass over the data
    val exp = SparkEntry.queries("stats_expectations")(spark, sf)
      .queryExecution.executedPlan.toString
    val expScans = "Scan parquet".r.findAllMatchIn(exp).size
    assert(expScans == 2,
      s"stats_expectations must scan events + documents exactly once " +
        s"each, found $expScans scans:\n$exp")

    // ks drift: events scan must read only (event_type, value)
    val ks = SparkEntry.queries("stats_ks_drift")(spark, sf)
      .queryExecution.executedPlan.toString
    val ksReads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(ks).map(_.group(1)).toSeq
    assert(ksReads.nonEmpty)
    ksReads.foreach { r =>
      val cols = r.split(",").filter(_.nonEmpty).map(_.split(":")(0)).toSet
      assert(cols.subsetOf(Set("event_type", "value")), s"ks scan reads $cols")
    }

    // minhash signatures are one map-side pass: no join, no aggregation,
    // no exchange but the output sort
    val sig = SparkEntry.queries("dedup_minhash_sig")(spark, sf)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!sig.contains("Exchange hashpartitioning"),
      s"minhash_sig shuffled:\n$sig")
    assert(!sig.toLowerCase.contains("join"), s"minhash_sig joined:\n$sig")
  }

  test("round-8 additions: portable twins hash-join their band keys; " +
      "PSI reads only (event_type, value)") {
    // portable LSH top-k: the candidate generation must be an equi hash/
    // sort-merge join on (band, key) — a nested loop would mean the band
    // key failed to plan as a join key; the embeddings scan must read
    // only (vec_id, embedding)
    val lsh = SparkEntry.queries("sim_lsh_topk_portable")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(lsh.contains("HashJoin") || lsh.contains("SortMergeJoin"),
      s"portable LSH candidate join not an equi-join:\n$lsh")
    val lshReads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(lsh).map(_.group(1)).toSeq
    assert(lshReads.nonEmpty)
    lshReads.foreach { r =>
      val cols = r.split(",").filter(_.nonEmpty).map(_.split(":")(0)).toSet
      assert(cols.subsetOf(Set("vec_id", "embedding")),
        s"portable LSH scan reads $cols")
    }
    // PSI drift: events scan must read only (event_type, value)
    val psi = SparkEntry.queries("stats_psi_drift")(spark, sf)
      .queryExecution.executedPlan.toString
    val psiReads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(psi).map(_.group(1)).toSeq
    assert(psiReads.nonEmpty)
    psiReads.foreach { r =>
      val cols = r.split(",").filter(_.nonEmpty).map(_.split(":")(0)).toSet
      assert(cols.subsetOf(Set("event_type", "value")),
        s"psi scan reads $cols")
    }
    // domain cap: the corpus never hash-shuffles in the small arm — the
    // only hash exchanges belong to the domain-sized count aggregate and
    // the oversized-domain window
    val cap = SparkEntry.queries("corpus_domain_cap")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(cap.contains("BroadcastHashJoin") || cap.contains("BroadcastExchange"),
      s"domain lists should broadcast:\n$cap")
    val capReads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(cap).map(_.group(1)).toSeq
    capReads.foreach { r =>
      val cols = r.split(",").filter(_.nonEmpty).map(_.split(":")(0)).toSet
      assert(cols.subsetOf(Set("doc_id", "source")),
        s"domain cap scan reads $cols")
    }
  }

  test("gram queries explode the word stream exactly once (no cloned " +
    "Generate subtrees)") {
    // the r12 transform()-lambda spelling planned TWO Generates (Spark
    // inlines WITH subtrees) each behind an InferFiltersFromGenerate
    // clone of the full gram expression — 37 s for 260k grams; the
    // posexplode+lead() spelling must keep ONE Generate and no
    // higher-order gram lambda anywhere in the plan
    Seq("text_novelty", "text_boilerplate").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val generates = "Generate ".r.findAllMatchIn(plan).size
      assert(generates == 1, s"$name plans $generates Generate nodes")
      assert(!plan.contains("lambdafunction(concat_ws"),
        s"$name rebuilt the interpreted gram lambda")
    }
  }

  test("stats_cusum plans the segmented scan (range exchange, no " +
    "per-type window); stats_kanon reads events exactly once for both " +
    "lattice levels") {
    // cusum: the two-phase scan's only row-sized exchange is the range
    // partitioning on (event_type, ts, event_id) — a Window node or a
    // hashpartitioning(event_type) exchange would mean the 5-value
    // ordered-window spelling crept back (one N/5-row task sort)
    val cusum = SparkEntry.queries("stats_cusum")(spark, sf)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(cusum.contains("Exchange rangepartitioning"),
      s"stats_cusum lost its range exchange:\n$cusum")
    assert(!cusum.contains("Window"),
      s"stats_cusum re-grew a window:\n$cusum")

    // kanon: the coarse QI level must roll up from the fine class
    // table, never re-scan events
    val kanon = SparkEntry.queries("stats_kanon")(spark, sf)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scans = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(kanon).length
    assert(scans == 1, s"stats_kanon scans events $scans times:\n$kanon")
  }

  test("every global (partition-less) window in the registry sits on a " +
    "provably bounded input") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.{WindowExec,
      WindowGroupLimitExec}
    def walk(p: SparkPlan): Iterator[SparkPlan] =
      Iterator(p) ++ p.children.iterator.flatMap(walk) ++
        p.subqueries.iterator.flatMap(walk) ++ (p match {
          case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
          case _ => Iterator.empty
        })
    def hasGlobalWindow(df: org.apache.spark.sql.DataFrame): Boolean =
      walk(df.queryExecution.executedPlan).exists {
        case w: WindowExec => w.partitionSpec.isEmpty
        case w: WindowGroupLimitExec => w.partitionSpec.isEmpty
        case _ => false
      }
    // the detector must catch a planted unbounded global window — a
    // row_number over the raw events scan with no partitioning is
    // exactly the 100 TB serialization this gate exists to stop
    val planted = Tables.load(spark, sf, "events").withColumn("rn",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("ts")))
    assert(hasGlobalWindow(planted), "detector missed the planted window")
    // Allowlist: every entry is a global window whose INPUT is bounded
    // by a constant, not by the corpus — the justification names the
    // bound. Adding a query that plans an unjustified global window
    // fails this test; so does a stale entry (bound got refactored away).
    val allowed = Map[String, String](
      "corpus_pmi" ->
        ("SUM(c) OVER () totals ride on the vocabulary-sized unigram/" +
          "bigram aggregates (lexicon-bounded; the scalar-subquery " +
          "spelling re-ran the corpus explode 6x, Corpus.pmiSql)"),
      "layout_zorder" ->
        "NTILE(16) over the constant 4096-point synthetic locality grid",
      "sim_hybrid_rrf" ->
        ("sparse-arm rank over the BM25 probe-term candidates — a fixed " +
          "probe panel's matching docs, WAND-truncated at scale (the " +
          "text_sparse_retrieval shape)"),
      "stats_ks_drift" ->
        ("cumulative counts over the ndv(value)-sized distinct-value " +
          "spine — bounded for this integer-milli metric; " +
          "stats_ks_drift_binned is the registered continuous-metric " +
          "scale path"),
      "stats_ks_drift_binned" ->
        "cumulative counts over at most KsBins=64 bins",
      "text_zipf" ->
        "frequency rank over the word-frequency table (lexicon-sized)",
      "text_quality_calibration" ->
        "ECE totals over the at-most-16-bin reliability table")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(excluded)
      .filter { name =>
        try hasGlobalWindow(SparkEntry.queries(name)(spark, sf))
        catch {
          case scala.util.control.NonFatal(e) =>
            fail(s"$name failed to plan: ${e.getMessage}")
        }
      }
    val unexplained = offenders.filterNot(allowed.contains)
    assert(unexplained.isEmpty,
      s"unjustified global windows in: ${unexplained.mkString(", ")}")
    val stale = allowed.keySet -- offenders
    assert(stale.isEmpty, s"stale allowlist entries: ${stale.mkString(", ")}")
  }

  test("no registered batch query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(excluded)
      .flatMap { name =>
        val plan =
          try SparkEntry.queries(name)(spark, sf)
            .queryExecution.executedPlan.toString
          catch {
            case scala.util.control.NonFatal(e) =>
              fail(s"$name failed to plan: ${e.getMessage}")
          }
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }
}
