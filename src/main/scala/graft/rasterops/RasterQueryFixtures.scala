package graft.rasterops

/** Shared fixture constants for the [[RasterQueries]] families: scene
  * count and the tmp-parquet paths each query shares with its DuckDB
  * oracle (both engines read the SAME landed file). Mixed in FIRST so
  * these vals initialize before any family trait's oracle-SQL val
  * interpolates them (trait init order is linearization order).
  */
private[rasterops] trait RasterQueryFixtures {


  private[rasterops] val NScenes = 4


  /** Path shared between the Spark query and its DuckDB oracle: the
    * mosaic's pixels land here as plain pixel-row parquet, and both
    * engines aggregate the SAME file. */
  private[rasterops] val CellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_mosaic_cells_parquet"

  /** Landed per-pixel planes of the 7-kernel cross-CRS load
    * ([[RasterLoadQueries.loadResampling]]); its oracle re-aggregates
    * the same file. */
  private[rasterops] val LoadResampleCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_load_resample_cells_parquet"

  /** Landed planes of the per-band MIXED-kernel load
    * ([[RasterLoadQueries.loadResamplingMixed]]); its oracle compares
    * the red half pixel-for-pixel against [[LoadResampleCellsPath]]'s
    * nearest-mode landing. */
  private[rasterops] val MixedResampleCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_mixed_resample_cells_parquet"

  /** Polygon-ROI load oracle landing
    * ([[RasterLoadQueries.loadPolygon]]): the ROI polygon's edges in
    * world coordinates; the oracle replays the engine's rect×polygon
    * intersection from them. */
  private[rasterops] val PolyRoiEdgesPath =
    s"${sys.props("java.io.tmpdir")}/graft_polyroi_edges_parquet"

  /** Multi-grid joint-load landings
    * ([[RasterLoadQueries.loadMultigrid]]): the 10 m joint planes and
    * the swir band's NATIVE 20 m planes; the oracle re-derives the
    * swir upsample from the native planes. */
  private[rasterops] val MultigridCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_multigrid_cells_parquet"
  private[rasterops] val MultigridNativePath =
    s"${sys.props("java.io.tmpdir")}/graft_multigrid_native_parquet"



  /** Shared path for the parse anchor (see [[parseItemsDuckSql]]). */
  private[rasterops] val ParseItemsPath =
    s"${sys.props("java.io.tmpdir")}/graft_parse_items_parquet"

  /** S1 parse summary — cross-engine anchored: the RAW item JSON lands
    * as parquet and DuckDB re-derives every output column from the raw
    * bytes with its own JSON parser (id/collection extraction, the
    * image/&data asset classification behind n_bands, geometry
    * presence, the sorted band list, the ISO datetime, and the F1
    * solar-date truncate-toward-zero lon/15 offset). A parse bug that
    * drops an asset, shifts the datetime, or mis-truncates the solar
    * offset breaks the hash. */


  /** Shared path for the search-dump anchor. */
  private[rasterops] val StacSearchPath =
    s"${sys.props("java.io.tmpdir")}/graft_stac_search_parquet"

  /** The dumped snapshot re-read by ANOTHER engine: DuckDB parses the
    * landed raw feature JSON and re-derives the per-item summary plus
    * the dump count — a dump that drops, duplicates, or mangles items
    * across the paginated fetch breaks the hash (the HTTP protocol
    * itself is pinned by StacSearchSpec against the in-process
    * server). */


  /** Landed inputs for the output-geobox oracle replay. */
  private[rasterops] val GeoboxPlanPath =
    s"${sys.props("java.io.tmpdir")}/graft_geobox_plan_parquet"

  /** Output-geobox planning table across parameter shapes (A4/A5/P8),
    * DuckDB-replayed end to end: the per-item grid keys (for the
    * identical fast path and the majority election), the footprint /
    * ROI bboxes ALREADY in each case's target CRS (the CRS transform
    * itself is hash-checked by `raster_reproject_cells`; here the
    * election + bbox-union + anchor-snap arithmetic is what's on
    * trial), and the case parameters all land as parquet, and the
    * oracle re-runs the whole decision procedure: all-identical fast
    * path, mode election with the (count desc, key-string desc)
    * tie-break, the ≤10% anchor-ignoring retry, min/max bbox union,
    * and the floor/ceil anchor-lattice snap of `GeoBox.fromBBoxXY`.
    * Three synthetic election cases (`elect_majority`, `elect_tie`,
    * `elect_retry`) exercise the A4 paths the identical-grid fixture
    * items cannot. */


  /** Landed raw item JSON for the EO3 oracle replay. */
  private[rasterops] val Eo3ExportPath =
    s"${sys.props("java.io.tmpdir")}/graft_eo3_export_parquet"

  /** S13 STAC→EO3 conversion, cross-engine anchored: the raw item JSON
    * lands as parquet and every emitted column is extracted by
    * RE-PARSING the generated EO3 document (so the serialized doc is
    * what's summarized, not the in-memory objects), while DuckDB
    * re-derives the same fields from the raw STAC JSON — grid
    * shape/transform projection, measurement paths, and the
    * STAC→EO3 property renames. The uuid5 dataset id is the one field
    * DuckDB cannot re-derive (no SHA-1 there); it stays pinned by
    * `Eo3Spec` against RFC 4122 known values. */


  /** Shared path for the composite anchor (see [[compositeCells]]). */
  private[rasterops] val CompositeCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_composite_cells_parquet"

  /** Second cross-engine raster anchor, one level deeper than
    * [[mosaicCells]]: the PER-TIME pixel planes (the median composite's
    * INPUT, nodata already mapped to NaN) land as parquet, Spark runs
    * the real `Composite.medianAcrossTime` operator over the tiles, and
    * DuckDB recomputes the per-pixel across-time median FROM THE RAW
    * PLANES with its own `median` — verifying the custom mapGroups
    * composite's semantics (valid-set selection, odd/even interpolation)
    * against an engine sharing none of the code, not merely re-adding
    * its output. Interpolated-median convention matches DuckDB's;
    * per-pixel medians are integer-quantized (×100 → BIGINT) before the
    * per-tile sum so the check is aggregation-order-exact. */


  /** Shared path for the warp anchor (see [[reprojectCells]]). */
  private[rasterops] val ReprojectCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_reproject_cells_parquet"

  /** Third cross-engine raster anchor — the WARP path (the hardest
    * numerics in the repo: `raster/Reader.scala` reproject kernels +
    * `geo/Crs.scala` projection inverses). The warped planes of the
    * same three cross-CRS loads as `raster_load_reproject` (web
    * mercator, EASE-Grid 2.0, World CEA) land as (crs, band, tile, y,
    * x, value) pixel rows; Spark aggregates per tile and DuckDB
    * recomputes the same quantized checksums from the same file. A
    * mis-projected inverse, a wrong kernel weight, or a nodata leak in
    * the warp shifts a per-tile sum an engine sharing none of the warp
    * code verifies — graduating the reproject family from spec-pinned
    * to hash-checked. */


  /** Shared paths for the resampling anchor (see [[resampleCells]]). */
  private[rasterops] val ResampleNativePath =
    s"${sys.props("java.io.tmpdir")}/graft_resample_native_parquet"

  private[rasterops] val ResampleCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_resample_cells_parquet"

  /** The block-expressible subset of the F16 kernel matrix (the four
    * conv kernels — cubic/lanczos/cubic_spline/gauss — stay
    * golden-pinned: their windows span blocks and their weights are
    * transcendental) — except CUBIC: at the aligned 2× case its
    * Catmull-Rom taps hit offsets ±0.5/±1.5 whose weights (9/16, −1/16)
    * are exact binary fractions, so the 4×4 weighted sum is exact
    * rational math DuckDB can recompute order-free. */


  /** The block-expressible subset of the F16 kernel matrix (the four
    * conv kernels — cubic/lanczos/cubic_spline/gauss — stay
    * golden-pinned: their windows span blocks and their weights are
    * transcendental) — except CUBIC: at the aligned 2× case its
    * Catmull-Rom taps hit offsets ±0.5/±1.5 whose weights (9/16, −1/16)
    * are exact binary fractions, so the 4×4 weighted sum is exact
    * rational math DuckDB can recompute order-free. */
  private[rasterops] val ResampleModes = Seq("nearest", "bilinear", "average", "sum",
    "min", "max", "mode", "med", "q1", "q3", "rms", "cubic")

  /** Fourth cross-engine raster anchor — the RESAMPLING KERNELS
    * themselves (F16, `loader/types.py:113-114`'s rasterio mode
    * strings). A same-CRS 2× shrink with overviews disabled makes every
    * pooled kernel an exact 2×2-block operation on the native grid: dst
    * pixel (PY, PX) pools native rows 2PY..2PY+1 × cols 2PX..2PX+1, and
    * `nearest` reads the block's odd-odd corner (floor((PX+0.5)·2)).
    * The NATIVE planes land as absolute-grid pixel rows (scene offsets
    * are multiples of the shrink, so no per-item offsets exist), the
    * resampled planes land per mode, and DuckDB RECOMPUTES each dst
    * pixel from the native block — avg/sum/min/max/rms as SQL
    * aggregates, med/q1/q3 via the kernel's round((cnt−1)·p) order
    * statistic, mode via max-count-then-smallest — then re-aggregates
    * per tile. Unlike the mosaic/warp anchors (which re-aggregate
    * landed values), this one derives the values themselves in SQL, so
    * a wrong window origin, a nodata leak into a pool, or a tie-break
    * flip in `Reader.sample` breaks the hash. All math is exact
    * (uint16 sources, float64 output, quarter-step averages), and the
    * only divisions/sqrt are single IEEE ops on identical operands. */


  /** Shared paths for the convolution-kernel anchor ([[resampleConv]]). */
  private[rasterops] val ConvNativePath =
    s"${sys.props("java.io.tmpdir")}/graft_conv_native_parquet"

  private[rasterops] val ConvCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_conv_cells_parquet"

  private[rasterops] val ConvWeightsPath =
    s"${sys.props("java.io.tmpdir")}/graft_conv_weights_parquet"

  /** The last three resampling kernels (lanczos / cubic_spline / gauss
    * — golden-pinned only until now: transcendental weights). At the
    * aligned 2× shrink every dst pixel sees the SAME tap geometry
    * (fx=fy=1/2), so the per-tap weights are a tiny constant table —
    * landed from [[graft.raster.Kernels]], the exact functions the warp
    * multiplies with, so both engines share bit-identical weights — and
    * DuckDB re-applies them: join native taps at (2·P+o), fold
    * value·w and w in the engine's (dy,dx) loop order (`list_reduce`
    * over an ordered list — float addition is order-sensitive),
    * renormalize over the valid taps, NaN on empty/tiny wsum, domain
    * gated on the landed center-cell coverage. This checks kernel
    * APPLICATION — window origin, nodata renormalization, tap
    * clipping — complementing the weight DERIVATION the golden pins
    * hold. `chunks=256` puts each whole scene in ONE dst tile so the
    * per-task source window is the full scene and window truncation
    * coincides with the landed-coverage truncation; the native landing
    * stays at 64 (scene bboxes are 64-aligned, so tile coverage equals
    * the exact scene clip). */


  /** Shared paths for the overview anchor (see [[overviewCells]]). */
  private[rasterops] val OverviewNativePath =
    s"${sys.props("java.io.tmpdir")}/graft_overview_native_parquet"

  private[rasterops] val OverviewCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_overview_cells_parquet"

  /** Fifth cross-engine raster anchor — OVERVIEW SELECTION (S8,
    * `loader/_reader.py:104-114`). The fixture pyramids are decimations
    * of the base plane (`Grb.writeWithOverviews`: level-s pixel (j,i) =
    * base (s·j, s·i)), and scene offsets are multiples of every level
    * stride, so a dst pixel read through level s equals the base plane
    * at the absolute even grid point (s·PY, s·PX). A 20 m read must
    * pick `.ovr2` (expected = base(2PY, 2PX) — the block's EVEN-even
    * corner, distinguishing the decimation path from
    * `raster_resample_cells`' overviews-off nearest kernel, which reads
    * the ODD-odd corner), and a 40 m read must pick `.ovr4`
    * (base(4PY, 4PX)). DuckDB recomputes both from the landed native
    * plane — selecting the wrong level, an off-by-one in the decimation
    * origin, or a broken `pickOverview` shifts every expected value. */



  /** Shared path for the zonal-stats oracle: zone ring edges land as a
    * tiny parquet table so DuckDB can run the SAME even-odd ray cast. */
  private[rasterops] val ZoneEdgesPath =
    s"${sys.props("java.io.tmpdir")}/graft_zone_edges_parquet"

  /** Zonal statistics (graft.load.Zonal — beyond the reference): three
    * zones over the demo mosaic — an axis-aligned rectangle, a triangle
    * (non-trivial ray-cast geometry), and a rectangle with a hole
    * (even-odd rule) — aggregated per band and solar day. The oracle
    * recomputes zone membership from the landed mosaic plane
    * (`CellsPath`) and the landed zone edges with the identical ray
    * cast (`(y1 > py) != (y2 > py) AND px < (x2-x1)(py-y1)/(y2-y1)+x1`,
    * odd crossing count = inside), then re-aggregates — so the
    * distributed tile-partial pipeline is checked against a flat
    * per-pixel recomputation in another engine. Zone vertices sit on
    * 10 m grid lines while pixel centers sit at 5 m offsets, so no
    * center lies exactly on an edge and the decision is tie-free. */


  /** Shared path for the gap-fill oracle's input planes. */
  private[rasterops] val GapCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_gap_cells_parquet"

  /** Landed FILLED pixel series (7-scene gap fixture) — the smoothing
    * oracle's input: DuckDB re-runs the SG convolution over these. */
  private[rasterops] val SmoothCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_smooth_cells_parquet"

  /** Landed RAW pixel series + epochs (7-scene gap fixture) — the
    * trend oracle's input: DuckDB re-runs the per-pixel OLS. */
  private[rasterops] val TrendCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_trend_cells_parquet"

  /** Landed RAW pixel series + epochs for the peak-of-season argmax
    * oracle ([[RasterAnalyticsQueries]]' `raster_phenology`). */
  private[rasterops] val PhenologyCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_phenology_cells_parquet"

  /** Landed RAW pixel series + epochs of the one-shot batch load the
    * STREAMED running-trend state must equal. */
  private[rasterops] val StreamTrendCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_stream_trend_cells_parquet"

  /** Landed RAW pixel series + epochs of the one-shot batch load the
    * STREAMED standing peak-argmax state must equal. */
  private[rasterops] val StreamPeakCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_stream_peak_cells_parquet"

  /** Landed RAW pixel series + epochs (7-scene gap fixture) — the
    * Theil–Sen oracle's input: DuckDB re-runs the pairwise-median fit. */
  private[rasterops] val TrendRobustCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_trend_robust_cells_parquet"

  /** Landed RAW pixel series + epochs (7-scene gap fixture) — the
    * harmonic-fit oracle's input: DuckDB re-runs the 3×3 normal-
    * equation solve. */
  private[rasterops] val HarmonicCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_harmonic_cells_parquet"

  /** Landed quantized (tsec → cq, sq) basis lookup for the harmonic
    * oracle — trig runs once JVM-side; DuckDB reads the same integers
    * instead of re-running libm. */
  private[rasterops] val HarmonicBasisPath =
    s"${sys.props("java.io.tmpdir")}/graft_harmonic_basis_parquet"

  /** Landed per-pixel (vec_id, [red, nir]) feature table — the pixel
    * clusterer's oracle input: DuckDB re-runs the FULL unrolled
    * Lloyd's over the same integers. */
  private[rasterops] val RasterClusterPath =
    s"${sys.props("java.io.tmpdir")}/graft_raster_cluster_parquet"

  /** Landed RAW pixel series (7-scene gap fixture) — the anomaly
    * oracle's input: DuckDB re-runs the per-pixel z-scoring. */
  private[rasterops] val AnomalyCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_anomaly_cells_parquet"

  /** Temporal gap-fill (graft.load.TemporalFill — beyond the
    * reference): three same-footprint scenes on consecutive days, the
    * middle one holed with a 32×32 nodata square, loaded per-item and
    * gap-filled along time. The per-time input planes land WITH their
    * epoch seconds and DuckDB replays the whole fill rule — interior
    * gaps by time-weighted linear interpolation between the
    * IGNORE-NULLS window neighbors, edges by nearest-valid carry —
    * then re-aggregates the filled planes. The hole pixels are valid
    * at t0/t2 with a uniform step, so their fill is exactly
    * `base + 100` (the t1 ramp value): interpolation correctness is
    * visible in the checksum, not just the fill count. */


  /** Shared path for the masked-composite oracle's input planes. */
  private[rasterops] val MaskCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_mask_cells_parquet"

  /** Shared path for the geomedian oracle's input planes. */
  private[rasterops] val GeomedianCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_geomedian_cells_parquet"

  /** Cloud-masked median composite
    * (Composite.maskedMedianAcrossTime — beyond the reference): three
    * same-footprint days with a `qa` band; the middle day's qa flags a
    * cloud square whose red stays VALID, and the per-day value steps
    * are non-uniform, so excluding the cloudy observation changes the
    * median value, not just the count. Both bands' per-time planes land
    * and DuckDB recomputes the masked median (join red to qa per
    * (time, pixel), keep qa = 1, `median` per pixel). */


  /** Shared path for the rasterize oracle's zone edges. */
  private[rasterops] val RasterizeEdgesPath =
    s"${sys.props("java.io.tmpdir")}/graft_rasterize_edges_parquet"

  /** Rasterize (graft.load.Rasterize — beyond the reference): burn four
    * zones onto the mosaic grid — the zonal trio plus an overlay
    * rectangle that overlaps the triangle, so PAINTER'S ORDER (later
    * zones overwrite) is visible in the per-zone pixel counts, not just
    * membership. DuckDB regenerates the whole grid with `range`,
    * re-runs the identical even-odd ray cast from the landed edges, and
    * resolves overlaps with `arg_max(zone, paint_order)`. */
  /** The demo label zones (shared by rasterize and sample-drill). */


  /** Shared path for the streaming-ingest anchor (see
    * [[streamRasterIngest]]). */
  private[rasterops] val StreamCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_stream_cells_parquet"

  /** Landed per-time pixel planes for the RUNNING-composite anchor
    * (see [[streamComposite]]): the oracle recomputes the across-time
    * statistics the streamed state accumulated. */
  private[rasterops] val StreamCompCellsPath =
    s"${sys.props("java.io.tmpdir")}/graft_stream_comp_cells_parquet"
}
