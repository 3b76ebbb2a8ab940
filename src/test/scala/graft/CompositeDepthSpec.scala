package graft

import graft.load.{Composite, Fuse}
import org.scalatest.funsuite.AnyFunSuite

/** Deep-time-stack memory bound for the non-mergeable composites
  * (median/quantile/masked/geomedian/MAD): when the caller passes the
  * B·T plane count, tiles are sliced into row bands BEFORE the rechunk
  * shuffle so any one task buffers at most `stateBudgetBytes` of
  * decoded planes regardless of archive depth T — and the sliced plan
  * produces BIT-IDENTICAL results to the full-tile plan (shared
  * per-pixel kernels). T=160 here satisfies the T ≥ 128 deep-stack
  * requirement. */
class CompositeDepthSpec extends AnyFunSuite {
  import GraftSpark.spark

  private val T = 160
  private val W = 32
  private val H = 32

  /** Deterministic deep stack: `nb` bands × T times of one W×H uint16
    * tile, nodata=0, with per-pixel holes (pixel i invalid at time t
    * when (t + i) % 7 == 0) and a few all-hole pixels. */
  private def deepTiles(nb: Int) = {
    import spark.implicits._
    val bands = Seq("red", "nir", "qa").take(nb)
    val rows = for {
      (band, b) <- bands.zipWithIndex
      t <- 0 until T
    } yield {
      val px = Array.tabulate(W * H) { i =>
        if (i < 3 || (t + i) % 7 == 0) 0.0 // nodata holes
        else if (band == "qa") (t + i) % 2 // mask plane: 0/1 flags
        else 1.0 + ((t * 31 + i * 7 + b * 13) % 997)
      }
      (band, t, 0, 0, Fuse.encode(px, "uint16"), "uint16", 0.0, W, H)
    }
    rows.toDF("band", "tIdx", "ty", "tx", "data", "dtype", "nodata",
      "width", "height")
  }

  /** Budget forcing ~8 row-band slices for `planes` planes per group. */
  private def budgetFor(planes: Int): Long = planes.toLong * W * 8L * (H / 8)

  private def probe(): Composite.MaxAcc = {
    val a = new Composite.MaxAcc
    spark.sparkContext.register(a, "composite_state_probe")
    a
  }

  /** Canonical row dump (schemas are identical across the two plans, so
    * whole-row string equality IS bit equality incl. NaN markers). */
  private def planesOf(df: org.apache.spark.sql.DataFrame,
                       cols: Seq[String]): Seq[String] = {
    val key = df.columns.filterNot(cols.contains).toSeq
    df.select((key ++ cols).map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toString).sorted.toSeq
  }

  test("sliceRowsFor honors the budget with a one-row floor") {
    assert(Composite.sliceRowsFor(160, 32, 32, budgetFor(160)) == 4)
    assert(Composite.sliceRowsFor(1, 32, 32, Long.MaxValue) == 32)
    // budget below one row of planes: floor at 1 row (the irreducible
    // minimum), bound becomes planes·w·8
    assert(Composite.sliceRowsFor(1000, 2048, 2048, 1024) == 1)
    // the motivating 100-TB shape: 8 bands × 500 times × 2048-wide tile
    // under the default budget → a few rows per slice, not 2048
    val sr = Composite.sliceRowsFor(4000, 2048, 2048,
      Composite.DefaultStateBudgetBytes)
    assert(sr >= 1 && sr.toLong * 4000 * 2048 * 8 <=
      Composite.DefaultStateBudgetBytes)
  }

  test("median/quantile: sliced plan bit-identical to full-tile, state capped") {
    val tiles = deepTiles(1)
    val full = planesOf(
      Composite.medianAcrossTime(spark, tiles), Seq("median", "count"))
    val acc = probe()
    val budget = budgetFor(T)
    val sliced = planesOf(
      Composite.medianAcrossTime(spark, tiles, planesPerTile = T,
        stateBudgetBytes = budget, stateProbe = Some(acc)),
      Seq("median", "count"))
    assert(sliced == full)
    assert(acc.value > 0 && acc.value <= budget,
      s"peak decoded state ${acc.value} exceeds budget $budget")

    val fullQ = planesOf(
      Composite.quantileAcrossTime(spark, tiles, 0.25),
      Seq("quantile", "count"))
    val slicedQ = planesOf(
      Composite.quantileAcrossTime(spark, tiles, 0.25, planesPerTile = T,
        stateBudgetBytes = budget), Seq("quantile", "count"))
    assert(slicedQ == fullQ)
  }

  test("masked median: sliced plan bit-identical, state capped (T=160 ×2 bands)") {
    val tiles = deepTiles(3).where("band in ('red','qa')")
    val full = planesOf(
      Composite.maskedMedianAcrossTime(spark, tiles, "red", "qa", _ == 1.0),
      Seq("median", "count"))
    val acc = probe()
    val budget = budgetFor(2 * T)
    val sliced = planesOf(
      Composite.maskedMedianAcrossTime(spark, tiles, "red", "qa", _ == 1.0,
        planesPerTile = 2 * T, stateBudgetBytes = budget,
        stateProbe = Some(acc)), Seq("median", "count"))
    assert(sliced == full)
    assert(acc.value > 0 && acc.value <= budget,
      s"peak decoded state ${acc.value} exceeds budget $budget")
  }

  test("temporal fill: sliced plan bit-identical, state capped (T=160)") {
    import org.apache.spark.sql.functions.{col, expr}
    // the fill keys planes by timestamp, so give each tIdx a real time
    val tiles = deepTiles(1).withColumn("time",
      expr("timestampadd(DAY, tIdx, timestamp'2020-06-01 00:00:00')"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("band"), col("tIdx"), col("ty"), col("tx"),
        col("n_filled"), col("filled"))
        .collect().map(_.toString).sorted.toSeq
    val full = canon(graft.load.TemporalFill.fillAcrossTime(spark, tiles))
    val acc = probe()
    // the fill holds decoded + filled planes: 2·T enters the slicing
    val budget = budgetFor(2 * T)
    val sliced = canon(graft.load.TemporalFill.fillAcrossTime(spark, tiles,
      timeDepth = T, stateBudgetBytes = budget, stateProbe = Some(acc)))
    assert(sliced == full)
    assert(acc.value > 0 && acc.value <= budget,
      s"peak decoded state ${acc.value} exceeds budget $budget")
  }

  test("geomedian + MADs: sliced plan bit-identical, state capped (T=160 ×2 bands)") {
    val tiles = deepTiles(2)
    val bands = Seq("red", "nir")
    val full = planesOf(
      Composite.geomedianAcrossTime(spark, tiles, bands),
      Seq("geomedian", "count"))
    val acc = probe()
    val budget = budgetFor(2 * T)
    val sliced = planesOf(
      Composite.geomedianAcrossTime(spark, tiles, bands,
        planesPerTile = 2 * T, stateBudgetBytes = budget,
        stateProbe = Some(acc)), Seq("geomedian", "count"))
    assert(sliced == full)
    assert(acc.value > 0 && acc.value <= budget,
      s"peak decoded state ${acc.value} exceeds budget $budget")

    val fullM = planesOf(
      Composite.geomadAcrossTime(spark, tiles, bands),
      Seq("emad", "smad", "bcmad", "count"))
    val accM = probe()
    val slicedM = planesOf(
      Composite.geomadAcrossTime(spark, tiles, bands, planesPerTile = 2 * T,
        stateBudgetBytes = budget, stateProbe = Some(accM)),
      Seq("emad", "smad", "bcmad", "count"))
    assert(slicedM == fullM)
    assert(accM.value > 0 && accM.value <= budget,
      s"peak decoded state ${accM.value} exceeds budget $budget")
  }
}
