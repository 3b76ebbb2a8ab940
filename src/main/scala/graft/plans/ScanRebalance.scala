package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Split-starvation rebalance: unlock CPU parallelism on badly-chunked
  * parquet, but only where it pays.
  *
  * Parquet scan parallelism is bounded by ROW GROUPS, not by
  * `maxPartitionBytes` splits — a split only yields rows when a
  * row-group midpoint falls inside it, so a `coalesce(1)` export or any
  * single-row-group file is read by exactly ONE task no matter how it is
  * sliced, and AQE cannot re-plan a stage that has no exchange. At 100 TB
  * such files routinely arrive from upstream writers; per-byte kernels
  * (regex, shingling, hashing, array math) then serialize on the accident
  * of the file layout (measured 20x on `text_pii` over a one-group corpus).
  *
  * The naive fix — repartition every starved table at load — measurably
  * HURTS scan-bound plans: a round-robin exchange below a partial
  * aggregate replaces a tiny sketch-state shuffle with a full-row shuffle
  * (exact/approx percentile, HLL and drift queries regressed 1.5-3x), and
  * adds a pre-shuffle local sort. So this rule is plan-aware: walking from
  * the root, it tracks whether EXPENSIVE per-row work (UDFs, regex,
  * higher-order array functions, crypto hashes, JSON parsing, this
  * engine's native expressions, or a row-expanding Generate) accumulates
  * between a starved scan and the first exchange-inducing operator
  * (aggregate without expensive map-side expressions, window, sort,
  * distinct, limit — each resets the flag because work above it runs
  * after that exchange anyway). Only a starved leaf with expensive work
  * in its scan stage gets a `Repartition(defaultParallelism)`; column
  * pruning and predicate pushdown still reach the scan through it.
  *
  * Starvation test (driver-side, metadata-only, cached): fewer files than
  * cores AND fewer row groups than cores AND more than
  * `spark.graft.scan.minSplitMB` (default 24, env fallback
  * `SPARK_GRAFT_SCAN_MIN_SPLIT_MB`, <=0 disables) compressed bytes per
  * group. Tables with >= cores files skip the footer reads entirely, so
  * a genuinely large (100 TB) table costs one directory listing already
  * done by the file index, never a footer sweep.
  */
case class ScanRebalanceRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val minSplitMB = spark.conf.getOption("spark.graft.scan.minSplitMB")
      .orElse(sys.env.get("SPARK_GRAFT_SCAN_MIN_SPLIT_MB"))
      .map(_.toDouble).getOrElse(24.0)
    if (minSplitMB <= 0) plan
    else {
      val out = walk(plan, exp = false, minSplitMB)
      // this rule runs after the built-in pruning batch, and an injected
      // Repartition hides the scan from PhysicalOperation — re-run
      // column pruning so the narrow Project lands back on the relation
      if (out.fastEquals(plan)) plan
      else org.apache.spark.sql.catalyst.optimizer.ColumnPruning(out)
    }
  }

  private def cores: Int = spark.sparkContext.defaultParallelism

  /** Expensive-above-scan propagation. `exp` = some ancestor between this
    * node and the nearest exchange boundary does heavy per-row work that
    * would execute inside the scan task. */
  private def walk(p: LogicalPlan, exp: Boolean, mb: Double): LogicalPlan =
    p match {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        if (exp && starved(lr.relation.asInstanceOf[HadoopFsRelation], mb))
          Repartition(cores, shuffle = true, lr)
        else lr
      case pj: Project =>
        pj.copy(child =
          walk(pj.child, exp || pj.projectList.exists(expensive), mb))
      case f: Filter =>
        f.copy(child = walk(f.child, exp || expensive(f.condition), mb))
      // row expansion: downstream per-row work multiplies inside the scan
      // task even when the generator itself is cheap
      case g: Generate => g.copy(child = walk(g.child, exp = true, mb))
      case s: SubqueryAlias => s.copy(child = walk(s.child, exp, mb))
      case s: Sample => s.copy(child = walk(s.child, exp, mb))
      // typed Dataset ops run opaque per-row lambdas in the scan stage
      case m: MapElements => m.copy(child = walk(m.child, exp = true, mb))
      case m: MapPartitions => m.copy(child = walk(m.child, exp = true, mb))
      case t: TypedFilter => t.copy(child = walk(t.child, exp = true, mb))
      case s: SerializeFromObject => s.copy(child = walk(s.child, exp, mb))
      case d: DeserializeToObject => d.copy(child = walk(d.child, exp, mb))
      case u: Union =>
        u.withNewChildren(u.children.map(walk(_, exp, mb)))
      // partial aggregation evaluates grouping expressions and aggregate
      // FUNCTION INPUTS map-side, i.e. inside the scan stage; result
      // projections folded into aggregateExpressions by CollapseProject
      // evaluate post-exchange and must not count
      case a: Aggregate =>
        val mapSide = a.groupingExpressions ++
          a.aggregateExpressions
            .flatMap(_.collect {
              case ae: org.apache.spark.sql.catalyst.expressions.aggregate
                .AggregateExpression => ae
            })
            .flatMap(_.aggregateFunction.children)
        a.copy(child = walk(a.child, mapSide.exists(expensive), mb))
      // a broadcast join streams the big side with no exchange, so work
      // above it still lands in the scan stage; for a shuffle join the
      // extra exchange is wasted but bounded. Joins between starved
      // CPU-heavy scans are broadcast-shaped in this engine, so pass
      // `exp` through rather than reset.
      case j: Join => j.withNewChildren(j.children.map(walk(_, exp, mb)))
      // an explicit repartition IS the rebalance — also makes this rule
      // idempotent under the optimizer's fixed-point batch
      case r: Repartition => r.copy(child = walk(r.child, exp = false, mb))
      case r: RepartitionByExpression =>
        r.withNewChildren(Seq(walk(r.child, exp = false, mb)))
      // anything else (window, sort, distinct, limit, setops, write):
      // conservatively treat as a boundary — work above it does not run
      // in the scan task, or we cannot tell
      case other =>
        other.withNewChildren(other.children.map(walk(_, exp = false, mb)))
    }

  /** Per-row work heavy enough that serializing it on one scan task
    * dominates the cost of one round-robin shuffle of the pruned
    * columns. */
  private def expensive(root: Expression): Boolean = root.exists {
    case _: ScalaUDF => true
    case _: HigherOrderFunction => true // transform/filter/aggregate/zip_with
    case _: RLike | _: RegExpExtract | _: RegExpExtractAll |
        _: RegExpReplace => true
    case _: StringSplit | _: SplitPart => true
    case _: Md5 | _: Sha1 | _: Sha2 | _: Crc32 => true
    case _: JsonToStructs | _: GetJsonObject | _: JsonTuple => true
    case _: Levenshtein => true
    // this engine's native expression family (shingles, minhash bands,
    // simhash, stopword hits, cosine, zorder, nfc, ...)
    case e if e.getClass.getName.startsWith("graft.") => true
    case _ => false
  }

  private def starved(fs: HadoopFsRelation, mb: Double): Boolean = {
    val files = fs.location.inputFiles
    if (files.isEmpty || files.length >= cores) return false
    val (groups, bytes) = ScanRebalance.footerStats(spark, files.toSeq)
    groups > 0 && groups < cores &&
      bytes.toDouble / groups > mb * 1024 * 1024
  }
}

object ScanRebalance {

  /** (rowGroups, compressedBytes) of a file set — footer metadata only,
    * cached per (path, length, mtime) fingerprint so an artifact
    * rewritten at the same path (landed indexes under /tmp) never serves
    * stale stats. Only consulted for relations with fewer files than
    * cores, so the status + footer sweep is O(cores) reads worst case. */
  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], (Long, Long)]()

  private[plans] def footerStats(
      spark: SparkSession, files: Seq[String]): (Long, Long) = {
    val conf = spark.sessionState.newHadoopConf()
    val parquet = files.sorted.filter(_.endsWith(".parquet"))
    val statuses = parquet.map { f =>
      val path = new org.apache.hadoop.fs.Path(f)
      (path, path.getFileSystem(conf).getFileStatus(path))
    }
    val key = statuses.map { case (p, s) =>
      s"$p:${s.getLen}:${s.getModificationTime}"
    }
    footerCache.computeIfAbsent(key, { _ =>
      var groups = 0L
      var bytes = 0L
      statuses.foreach { case (path, status) =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(path, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try groups += r.getRowGroups.size()
        finally r.close()
        bytes += status.getLen
      }
      (groups, bytes)
    })
  }

  /** Install on a running session (the `spark.sql.extensions` path
    * injects at build time; this covers sessions built without it).
    * Idempotent. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[ScanRebalanceRule]))
      spark.experimental.extraOptimizations = cur :+ ScanRebalanceRule(spark)
  }
}
