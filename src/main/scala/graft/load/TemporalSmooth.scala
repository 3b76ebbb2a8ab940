package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Savitzky–Golay temporal smoothing — the per-pixel time-series
  * polish step EO pipelines run after gap-filling (NDVI phenology
  * curves, cloud-shadow residual suppression; the odc-algo/hdstats
  * users' standard post-fill pass). Beyond the reference surface:
  * odc-stac stops at the loaded cube.
  *
  * Semantics per pixel: the classic window-5 / order-2 SG kernel
  * `(-3, 12, 17, 12, -3)/35` convolved along the time axis by INDEX
  * (the uniform-sampling convention; run it on a gap-filled series —
  * [[TemporalFill]] — so missing observations were already repaired).
  * Only interior timestamps with a full window are emitted (centers
  * `h ≤ t ≤ T-1-h`); SG edge handling varies by library, and a
  * truncated-window fit is a different estimator, so the contract
  * stays the unambiguous one. NaN (never-valid pixels) propagates
  * through the arithmetic untouched.
  *
  * Scale shape — and why this is NOT the composite/fill rechunk: each
  * output plane needs only its `W = 5` input planes, so every plane is
  * EXPLODED into its W (center, weight) contributions and one
  * `(band, center, ty, tx)` shuffle groups exactly ≤ W planes per
  * task — per-task state is W planes REGARDLESS of archive depth T
  * (the fill must see the whole T-deep series per pixel; a fixed-width
  * convolution never does). The weighted fold is `aggregate`/`zip_with`
  * array arithmetic ordered by offset, so the double summation order is
  * fixed and cross-engine exact. NOTE: Spark higher-order functions are
  * CodegenFallback — this fold runs interpreted, per-element lambdas
  * with boxing. It stays acceptable here because the work per output
  * plane is a fixed W=5 multiply-adds per pixel (measured at depth in
  * BASELINE.md r12); a depth-proportional interpreted path would not
  * be (see [[Anomaly]]'s kernel rewrite).
  */
object TemporalSmooth {

  /** Window width (odd) and the half-window. */
  val Window = 5
  private val H = Window / 2

  /** Order-2 SG coefficients for window 5: (-3, 12, 17, 12, -3)/35.
    * Spelled as literal divisions so the DuckDB oracle's identical
    * literals produce bit-equal IEEE doubles. */
  val Coeffs: Seq[Double] =
    Seq(-3.0 / 35.0, 12.0 / 35.0, 17.0 / 35.0, 12.0 / 35.0, -3.0 / 35.0)

  /** Smooth a filled-plane frame (the [[TemporalFill.fillAcrossTime]]
    * output: band, tIdx, ty, tx, filled) along time. Returns one row
    * per interior center: (band, tIdx, ty, tx, smooth, n_valid). */
  def smoothAcrossTime(spark: SparkSession, filled: DataFrame): DataFrame = {
    val wArr = array(Coeffs.map(lit): _*)
    // a plane at tIdx serves centers tIdx-H .. tIdx+H; the part's `o`
    // is its offset AS SEEN FROM THE CENTER (plane = ctr + o), so the
    // by-`o` sorted fold runs x(c-H) .. x(c+H) — the same left-to-right
    // order the DuckDB oracle's lag/lead sum uses, keeping the double
    // summation bit-identical (the palindromic kernel makes the weights
    // agree either way; the ADDITION order only agrees this way)
    val contrib = filled
      .select(col("band"), col("tIdx"), col("ty"), col("tx"), col("filled"),
        explode(sequence(lit(-H), lit(H))).as("o"))
      .select(col("band"), (col("tIdx") - col("o")).as("ctr"),
        col("ty"), col("tx"),
        struct(col("o"),
          element_at(wArr, col("o") + lit(H + 1)).as("w"),
          col("filled").as("p")).as("part"))
    contrib
      .groupBy(col("band"), col("ctr"), col("ty"), col("tx"))
      .agg(collect_list(col("part")).as("parts"))
      // a full window exists only at interior centers; edge centers
      // (and the out-of-range phantom centers the explode creates)
      // collect fewer than W parts and are dropped by contract
      .where(size(col("parts")) === Window)
      .select(col("band"), col("ctr").cast("int").as("tIdx"),
        col("ty"), col("tx"),
        expr(s"""aggregate(
                |  array_sort(parts),
                |  array_repeat(CAST(0.0 AS DOUBLE), size(parts[0].p)),
                |  (acc, pt) -> zip_with(acc, pt.p, (a, v) -> a + pt.w * v))
                |""".stripMargin.replaceAll("\n", " ")).as("smooth"))
      .select(col("band"), col("tIdx"), col("ty"), col("tx"), col("smooth"),
        expr("aggregate(smooth, 0, (s, v) -> s + if(isnan(v), 0, 1))")
          .as("n_valid"))
  }
}
