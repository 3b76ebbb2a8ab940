package graft.load

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Across-time pixel composites — the analytics layer above the fused
  * cube that the reference's first-valid mosaic cannot express (its fuse
  * TODO notes mask-based fusing, `loader/_builder.py:182`): per-pixel
  * mean / max / min / count over a tile's time planes, nodata-aware.
  *
  * Implemented as a custom Spark `Aggregator` over tile rows (the one
  * genuinely custom aggregation of the engine, SURVEY §4): partial
  * buffers are (sum, count) planes that combine associatively, so
  * Catalyst runs it with map-side partial aggregation and the shuffle
  * carries one buffer per (band, ty, tx) — never the raw time planes.
  * At 100 TB that is the difference between shuffling the cube and
  * shuffling one plane per tile.
  */
object Composite {

  /** Default cap on one task's DECODED plane state for the
    * non-mergeable composites (median/quantile/masked/geomedian/MAD):
    * those gather every time plane of a tile into one task, which is
    * O(B·T·tileBytes) — unbounded in archive depth T. When the caller
    * supplies `planesPerTile` (= B·T, driver-side metadata every
    * `LoadResult` knows), the tile is SLICED into row bands sized so
    * `planesPerTile · width · sliceRows · 8 ≤ budget` BEFORE the
    * rechunk shuffle, and full output planes are reassembled in a
    * second, output-sized shuffle (1/T of the input — negligible).
    * This is odc-algo's pre-geomedian rechunk rule: spatial chunks
    * chosen as a function of time depth. */
  val DefaultStateBudgetBytes: Long = 256L << 20

  /** Row-band height honoring the state budget: the largest
    * `sliceRows ∈ [1, h]` with `planesPerTile·w·sliceRows·8 ≤ budget`
    * (floor 1: a single row of all planes is the irreducible minimum —
    * the effective bound is `max(budget, planesPerTile·w·8)`). */
  def sliceRowsFor(planesPerTile: Int, w: Int, h: Int,
                   budgetBytes: Long): Int = {
    val perRow = math.max(1L, planesPerTile.toLong * w * 8L)
    math.max(1L, math.min(h.toLong, budgetBytes / perRow)).toInt
  }

  /** max-accumulator for spec-level proof of the per-task state bound
    * (peak decoded bytes actually buffered by any slice group). */
  final class MaxAcc extends org.apache.spark.util.AccumulatorV2[Long, Long] {
    private var m = 0L
    def isZero: Boolean = m == 0L
    def copy(): MaxAcc = { val a = new MaxAcc; a.m = m; a }
    def reset(): Unit = m = 0L
    def add(v: Long): Unit = m = math.max(m, v)
    def merge(o: org.apache.spark.util.AccumulatorV2[Long, Long]): Unit =
      m = math.max(m, o.value)
    def value: Long = m
  }

  /** One input tile plane for the aggregation. */
  final case class TileIn(data: Array[Byte], dtype: String, nodata: Double,
                          width: Int, height: Int)

  /** (sum, min, max, count) planes; sized lazily from the first tile. */
  final case class Buf(var sum: Array[Double], var min: Array[Double],
                       var max: Array[Double], var cnt: Array[Int],
                       var width: Int, var height: Int)

  final case class CompositeOut(mean: Array[Double], min: Array[Double],
                                max: Array[Double], count: Array[Int])

  class PixelComposite extends Aggregator[TileIn, Buf, CompositeOut]
      with Serializable {

    override def zero: Buf = Buf(null, null, null, null, 0, 0)

    private def ensure(b: Buf, w: Int, h: Int): Unit =
      if (b.sum == null) {
        val n = w * h
        b.sum = new Array[Double](n)
        b.min = Array.fill(n)(Double.PositiveInfinity)
        b.max = Array.fill(n)(Double.NegativeInfinity)
        b.cnt = new Array[Int](n)
        b.width = w; b.height = h
      }

    override def reduce(b: Buf, t: TileIn): Buf = {
      ensure(b, t.width, t.height)
      require(b.width == t.width && b.height == t.height,
        s"tile shape mismatch: ${b.width}x${b.height} vs ${t.width}x${t.height}")
      val px = Fuse.decode(t.data, t.dtype)
      var i = 0
      while (i < px.length) {
        val v = px(i)
        if (!(v.isNaN || v == t.nodata)) {
          b.sum(i) += v
          if (v < b.min(i)) b.min(i) = v
          if (v > b.max(i)) b.max(i) = v
          b.cnt(i) += 1
        }
        i += 1
      }
      b
    }

    override def merge(a: Buf, c: Buf): Buf = {
      if (a.sum == null) return c
      if (c.sum == null) return a
      require(a.width == c.width && a.height == c.height,
        s"tile shape mismatch in merge: ${a.width}x${a.height} vs ${c.width}x${c.height}")
      var i = 0
      while (i < a.sum.length) {
        a.sum(i) += c.sum(i)
        if (c.min(i) < a.min(i)) a.min(i) = c.min(i)
        if (c.max(i) > a.max(i)) a.max(i) = c.max(i)
        a.cnt(i) += c.cnt(i)
        i += 1
      }
      a
    }

    override def finish(b: Buf): CompositeOut = {
      if (b.sum == null) return CompositeOut(Array.empty, Array.empty,
        Array.empty, Array.empty)
      val n = b.sum.length
      val mean = new Array[Double](n)
      var i = 0
      while (i < n) {
        if (b.cnt(i) > 0) mean(i) = b.sum(i) / b.cnt(i)
        else { mean(i) = Double.NaN; b.min(i) = Double.NaN; b.max(i) = Double.NaN }
        i += 1
      }
      CompositeOut(mean, b.min, b.max, b.cnt)
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[CompositeOut] =
      Encoders.product[CompositeOut]
  }

  /** Across-time composite of a `Load` tile DataFrame: one row per
    * (band, ty, tx) with per-pixel mean/min/max/count planes. */
  /** Tile rows keyed `(band, ty, tx)` with per-row `TileIn` values —
    * the shared prelude of every across-time composite. */
  private def keyedTiles(spark: SparkSession, tiles: DataFrame)
      : org.apache.spark.sql.KeyValueGroupedDataset[(String, Int, Int), TileIn] = {
    import spark.implicits._
    tiles
      .select(col("band"), col("ty"), col("tx"),
        col("data"), col("dtype"), col("nodata"),
        col("width"), col("height"))
      .as[(String, Int, Int, Array[Byte], String, Double, Int, Int)]
      .groupByKey { case (band, ty, tx, _, _, _, _, _) => (band, ty, tx) }
      .mapValues { case (_, _, _, data, dtype, nodata, w, h) =>
        TileIn(data, dtype, nodata, w, h)
      }
  }

  def acrossTime(spark: SparkSession, tiles: DataFrame): DataFrame = {
    import spark.implicits._
    val agg = new PixelComposite().toColumn
    keyedTiles(spark, tiles)
      .agg(agg)
      .map { case ((band, ty, tx), out) =>
        (band, ty, tx, out.mean, out.min, out.max, out.count)
      }
      .toDF("band", "ty", "tx", "mean", "min", "max", "count")
  }

  /** Per-pixel MEDIAN across time — the robust composite of the odc
    * ecosystem (geomedian family): unlike mean, a few cloudy/saturated
    * outlier scenes do not drag the composite.
    *
    * Median is not mergeable, so there is no partial-agg shape: every
    * valid value of a pixel must meet in one task. The scale-true plan
    * is the rechunk odc-algo performs before its geomedian: ONE shuffle
    * of tile rows keyed `(band, ty, tx)`, then per-group selection over
    * the bounded time depth — task state is ≤ T decoded planes of one
    * tile (T = time depth, tens to hundreds), never the cube.
    * `mapGroups` rather than an `Aggregator`: a collect-list buffer
    * would shuffle the same bytes while pretending mergeability. */
  def medianAcrossTime(spark: SparkSession, tiles: DataFrame,
                       planesPerTile: Int = 0,
                       stateBudgetBytes: Long = DefaultStateBudgetBytes,
                       stateProbe: Option[MaxAcc] = None): DataFrame =
    selectionAcrossTime(spark, tiles, 0.5, planesPerTile, stateBudgetBytes,
      stateProbe).toDF("band", "ty", "tx", "median", "count")

  /** Per-pixel interpolated QUANTILE across time (q in [0,1]) — the
    * percentile composite (seasonal p25/p75 products): same one-shuffle
    * rechunk shape as the median, same interpolation convention as
    * SQL `quantile_cont`/numpy `percentile` (position q·(m−1), linear
    * between the straddling order statistics; q=0.5 reduces exactly to
    * the median). */
  def quantileAcrossTime(spark: SparkSession, tiles: DataFrame,
                         q: Double, planesPerTile: Int = 0,
                         stateBudgetBytes: Long = DefaultStateBudgetBytes,
                         stateProbe: Option[MaxAcc] = None): DataFrame =
    selectionAcrossTime(spark, tiles, q, planesPerTile, stateBudgetBytes,
      stateProbe).toDF("band", "ty", "tx", "quantile", "count")

  /** Cloud-masked median — the signature EO composite (cloud-free
    * mosaic): per-pixel median of `dataBand` across time, using ONLY
    * observations whose `maskBand` pixel satisfies `clear` at the same
    * time. Data-valid-but-cloudy pixels are excluded (the case the data
    * band alone cannot catch); a missing mask plane for a time keeps
    * the observation (mask absence is not evidence of cloud); the mask
    * value reaches `clear` with nodata already mapped to NaN (so a
    * nodata mask pixel fails any equality predicate and masks out).
    *
    * Scale shape: the same single rechunk as the unmasked median, just
    * keyed so the data AND mask planes of a tile meet in one task —
    * the shuffle carries both bands' planes once, state is ≤ 2T planes.
    */
  def maskedMedianAcrossTime(spark: SparkSession, tiles: DataFrame,
                             dataBand: String, maskBand: String,
                             clear: Double => Boolean,
                             planesPerTile: Int = 0,
                             stateBudgetBytes: Long = DefaultStateBudgetBytes,
                             stateProbe: Option[MaxAcc] = None): DataFrame = {
    import spark.implicits._
    val masked = tiles.where(col("band").isin(dataBand, maskBand))
    if (planesPerTile <= 0) {
      masked
        .select(col("band"), col("tIdx"), col("ty"), col("tx"),
          col("data"), col("dtype"), col("nodata"),
          col("width"), col("height"))
        .as[(String, Int, Int, Int, Array[Byte], String, Double, Int, Int)]
        .groupByKey { case (_, _, ty, tx, _, _, _, _, _) => (ty, tx) }
        .mapGroups { (key, it) =>
          val (ty, tx) = key
          var w = 0
          var h = 0
          val dataPl = scala.collection.mutable.Map.empty[Int, (Array[Double], Double)]
          val maskPl = scala.collection.mutable.Map.empty[Int, (Array[Double], Double)]
          it.foreach { case (band, tIdx, _, _, data, dtype, nodata, tw, th) =>
            if (w == 0) { w = tw; h = th }
            require(w == tw && h == th,
              s"tile shape mismatch at ($ty,$tx): ${w}x$h vs ${tw}x$th")
            val pl = (Fuse.decode(data, dtype), nodata)
            if (band == dataBand) dataPl(tIdx) = pl else maskPl(tIdx) = pl
          }
          val (med, cnt) = maskedMedianKernel(dataPl, maskPl, w * h, clear)
          (dataBand, ty, tx, med, cnt)
        }
        .toDF("band", "ty", "tx", "median", "count")
    } else {
      val probe = stateProbe
      val sliced = slicedTiles(spark, masked, planesPerTile, stateBudgetBytes)
        .groupByKey(s => (s.ty, s.tx, s.slice))
        .mapGroups { (key, it) =>
          val (ty, tx, slice) = key
          var w = 0
          var sh = 0
          val dataPl = scala.collection.mutable.Map.empty[Int, (Array[Double], Double)]
          val maskPl = scala.collection.mutable.Map.empty[Int, (Array[Double], Double)]
          it.foreach { s =>
            if (w == 0) { w = s.width; sh = s.sliceH }
            require(w == s.width && sh == s.sliceH,
              s"slice shape mismatch at ($ty,$tx): ${w}x$sh vs ${s.width}x${s.sliceH}")
            val pl = (Fuse.decode(s.data, s.dtype), s.nodata)
            if (s.band == dataBand) dataPl(s.tIdx) = pl else maskPl(s.tIdx) = pl
          }
          probe.foreach(_.add((dataPl.size + maskPl.size).toLong * w * sh * 8L))
          val (med, cnt) = maskedMedianKernel(dataPl, maskPl, w * sh, clear)
          (dataBand, ty, tx, slice, med, cnt)
        }
      reassemble(sliced).toDF("band", "ty", "tx", "median", "count")
    }
  }

  /** Masked-median kernel over gathered (already full or sliced) data +
    * mask planes keyed by tIdx — shared by both plan shapes. */
  private def maskedMedianKernel(
      dataPl: scala.collection.Map[Int, (Array[Double], Double)],
      maskPl: scala.collection.Map[Int, (Array[Double], Double)],
      n: Int, clear: Double => Boolean): (Array[Double], Array[Int]) = {
    val times = dataPl.keys.toArray.sorted
    val med = new Array[Double](n)
    val cnt = new Array[Int](n)
    val vals = new Array[Double](times.length)
    var i = 0
    while (i < n) {
      var m = 0
      var p = 0
      while (p < times.length) {
        val (px, nodata) = dataPl(times(p))
        val v = px(i)
        val ok = !(v.isNaN || v == nodata) && (maskPl.get(times(p)) match {
          case Some((mp, mnd)) =>
            val mv = mp(i)
            clear(if (mv.isNaN || mv == mnd) Double.NaN else mv)
          case None => true
        })
        if (ok) { vals(m) = v; m += 1 }
        p += 1
      }
      if (m == 0) med(i) = Double.NaN
      else {
        java.util.Arrays.sort(vals, 0, m)
        med(i) =
          if (m % 2 == 1) vals(m / 2)
          else (vals(m / 2 - 1) + vals(m / 2)) / 2.0
      }
      cnt(i) = m
      i += 1
    }
    (med, cnt)
  }

  /** Per-pixel interpolated quantile over `planes` (each `n` pixels,
    * paired with its nodata) — the shared kernel of the full-tile and
    * sliced paths (identical arithmetic, so slicing cannot change a
    * single output value). */
  private def selectionKernel(
      planes: scala.collection.IndexedSeq[(Array[Double], Double)],
      n: Int, q: Double): (Array[Double], Array[Int]) = {
    val out = new Array[Double](n)
    val cnt = new Array[Int](n)
    val vals = new Array[Double](planes.length)
    var i = 0
    while (i < n) {
      var m = 0
      var p = 0
      while (p < planes.length) {
        val (px, nodata) = planes(p)
        val v = px(i)
        if (!(v.isNaN || v == nodata)) { vals(m) = v; m += 1 }
        p += 1
      }
      if (m == 0) out(i) = Double.NaN
      else {
        java.util.Arrays.sort(vals, 0, m)
        val pos = q * (m - 1)
        val lo = math.floor(pos).toInt
        val hi = math.ceil(pos).toInt
        out(i) =
          if (lo == hi) vals(lo)
          else vals(lo) + (vals(hi) - vals(lo)) * (pos - lo)
      }
      cnt(i) = m
      i += 1
    }
    (out, cnt)
  }

  /** One sliced tile-plane row band: the encoded bytes of rows
    * `[r0, r0+sh)` of a plane (contiguous in the row-major payload, so
    * slicing is one arraycopy of ENCODED data — never a decode). */
  final case class SliceIn(band: String, tIdx: Int, ty: Int, tx: Int,
                           slice: Int, data: Array[Byte], dtype: String,
                           nodata: Double, width: Int, sliceH: Int,
                           height: Int)

  /** Cut every tile row into row-band slices honoring the state budget.
    * All planes of a tile share (w, h), so every row of a group
    * computes the same slicing — slice `s` of every time plane lands in
    * the same `(…, s)` group. */
  private[graft] def slicedTiles(spark: SparkSession, tiles: DataFrame,
                          planesPerTile: Int, budgetBytes: Long)
      : org.apache.spark.sql.Dataset[SliceIn] = {
    import spark.implicits._
    tiles
      .select(col("band"), col("tIdx"), col("ty"), col("tx"),
        col("data"), col("dtype"), col("nodata"),
        col("width"), col("height"))
      .as[(String, Int, Int, Int, Array[Byte], String, Double, Int, Int)]
      .flatMap { case (band, tIdx, ty, tx, data, dtype, nodata, w, h) =>
        val sr = sliceRowsFor(planesPerTile, w, h, budgetBytes)
        val rowBytes = w * graft.raster.Grb.dtypeSize(dtype)
        (0 until h by sr).iterator.map { r0 =>
          val sh = math.min(sr, h - r0)
          val cut = java.util.Arrays.copyOfRange(
            data, r0 * rowBytes, (r0 + sh) * rowBytes)
          SliceIn(band, tIdx, ty, tx, r0 / sr, cut, dtype, nodata, w, sh, h)
        }
      }
  }

  /** Concatenate slice-ordered plane fragments — the ONE arraycopy
    * kernel every bounded reassembly shares: `parts(i) = (sliceIdx,
    * doublePlanes, cntSlice)`, all parts carrying the same number of
    * double planes. Sorts by slice index in place. */
  private[graft] def concatSlices(
      parts: Array[(Int, Array[Array[Double]], Array[Int])])
      : (Array[Array[Double]], Array[Int]) = {
    scala.util.Sorting.stableSort(parts,
      (a: (Int, Array[Array[Double]], Array[Int]),
       b: (Int, Array[Array[Double]], Array[Int])) => a._1 < b._1)
    val nPlanes = parts(0)._2.length
    val n = parts.iterator.map(_._3.length).sum
    val planes = Array.fill(nPlanes)(new Array[Double](n))
    val cnt = new Array[Int](n)
    var off = 0
    parts.foreach { case (_, ps, c) =>
      var b = 0
      while (b < nPlanes) {
        System.arraycopy(ps(b), 0, planes(b), off, c.length)
        b += 1
      }
      System.arraycopy(c, 0, cnt, off, c.length)
      off += c.length
    }
    (planes, cnt)
  }

  /** Reassemble full output planes from per-slice results: one
    * output-sized shuffle keyed (band, ty, tx); task state is the S
    * slices of ONE tile's output planes — i.e. exactly the contract
    * row being built, bounded by tile size, independent of T. */
  private def reassemble(
      ds: org.apache.spark.sql.Dataset[(String, Int, Int, Int,
        Array[Double], Array[Int])])(implicit
      e: Encoder[(String, Int, Int, Array[Double], Array[Int])])
      : org.apache.spark.sql.Dataset[(String, Int, Int, Array[Double], Array[Int])] =
    ds.groupByKey { case (band, ty, tx, _, _, _) => (band, ty, tx) }(
        Encoders.tuple(Encoders.STRING, Encoders.scalaInt, Encoders.scalaInt))
      .mapGroups { (key, it) =>
        val (band, ty, tx) = key
        val parts = it.map { case (_, _, _, s, o, c) => (s, Array(o), c) }
          .toArray
        val (planes, cnt) = concatSlices(parts)
        (band, ty, tx, planes(0), cnt)
      }

  private def selectionAcrossTime(spark: SparkSession, tiles: DataFrame,
                                  q: Double, planesPerTile: Int,
                                  budgetBytes: Long,
                                  stateProbe: Option[MaxAcc]) = {
    import spark.implicits._
    require(q >= 0 && q <= 1, s"quantile out of range: $q")
    if (planesPerTile <= 0) {
      // depth unknown: full-tile groups (state ≤ T planes of one tile;
      // callers at archive scale pass planesPerTile from LoadResult)
      keyedTiles(spark, tiles)
        .mapGroups { (key: (String, Int, Int), it: Iterator[TileIn]) =>
          val (band, ty, tx) = key
          var w = 0
          var h = 0
          val planes =
            scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Double)]
          it.foreach { t =>
            if (planes.isEmpty) { w = t.width; h = t.height }
            require(w == t.width && h == t.height,
              s"tile shape mismatch: ${w}x$h vs ${t.width}x${t.height}")
            planes += ((Fuse.decode(t.data, t.dtype), t.nodata))
          }
          val (out, cnt) = selectionKernel(planes, w * h, q)
          (band, ty, tx, out, cnt)
        }
    } else {
      // bounded path: slice → rechunk → kernel per slice → reassemble
      val probe = stateProbe
      val sliced = slicedTiles(spark, tiles, planesPerTile, budgetBytes)
        .groupByKey(s => (s.band, s.ty, s.tx, s.slice))
        .mapGroups { (key, it) =>
          val (band, ty, tx, slice) = key
          var w = 0
          var sh = 0
          val planes =
            scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Double)]
          it.foreach { s =>
            if (planes.isEmpty) { w = s.width; sh = s.sliceH }
            require(w == s.width && sh == s.sliceH,
              s"slice shape mismatch: ${w}x$sh vs ${s.width}x${s.sliceH}")
            planes += ((Fuse.decode(s.data, s.dtype), s.nodata))
          }
          probe.foreach(_.add(planes.length.toLong * w * sh * 8L))
          val (out, cnt) = selectionKernel(planes, w * sh, q)
          (band, ty, tx, slice, out, cnt)
        }
      reassemble(sliced)
    }
  }

  /** Geometric MEDIAN composite (the EO "geomedian" product — the
    * multi-band JOINT median): per pixel, the band-vector x minimizing
    * Σ_t ‖x − p_t‖₂ over the per-time observations p_t, so the
    * composite pixel is spectrally consistent across bands (per-band
    * medians can mix dates; the geomedian cannot). Computed with a
    * FIXED-iteration Weiszfeld scheme — x⁰ = mean, then
    * xᵏ⁺¹ = Σ wₜ·pₜ / Σ wₜ with wₜ = 1/max(‖xᵏ−pₜ‖, eps) — every fold
    * time-ascending, so the arithmetic is a closed deterministic
    * formula a SQL oracle can replay bit-for-bit (no convergence test,
    * no data-dependent branching).
    *
    * An observation contributes only where ALL requested bands are
    * valid at that pixel (the joint-vector requirement); pixels with
    * zero complete observations emit NaN.
    *
    * Scale shape: same single rechunk as the masked median — ONE
    * shuffle keyed (ty, tx) co-locates every band's time planes for a
    * tile, each task runs the per-pixel iterations locally, state is
    * ≤ B·T planes. Weiszfeld is embarrassingly parallel across pixels;
    * nothing iterates across tasks. */
  def geomedianAcrossTime(spark: SparkSession, tiles: DataFrame,
                          bands: Seq[String], iters: Int = 8,
                          eps: Double = 1e-7, planesPerTile: Int = 0,
                          stateBudgetBytes: Long = DefaultStateBudgetBytes,
                          stateProbe: Option[MaxAcc] = None): DataFrame = {
    import spark.implicits._
    require(bands.nonEmpty, "geomedian needs at least one band")
    val nb = bands.length
    val bandIdx = bands.zipWithIndex.toMap
    val bandTiles = tiles.where(col("band").isin(bands.map(x => x: Any): _*))
    if (planesPerTile <= 0) {
      bandTiles
        .select(col("band"), col("tIdx"), col("ty"), col("tx"),
          col("data"), col("dtype"), col("nodata"),
          col("width"), col("height"))
        .as[(String, Int, Int, Int, Array[Byte], String, Double, Int, Int)]
        .groupByKey { case (_, _, ty, tx, _, _, _, _, _) => (ty, tx) }
        .flatMapGroups { (key, it) =>
          val (ty, tx) = key
          var w = 0
          var h = 0
          // planes((tIdx, bandOrdinal)) -> (pixels, nodata)
          val planes =
            scala.collection.mutable.Map.empty[(Int, Int), (Array[Double], Double)]
          it.foreach { case (band, tIdx, _, _, data, dtype, nodata, tw, th) =>
            if (w == 0) { w = tw; h = th }
            require(w == tw && h == th,
              s"tile shape mismatch at ($ty,$tx): ${w}x$h vs ${tw}x$th")
            planes((tIdx, bandIdx(band))) = (Fuse.decode(data, dtype), nodata)
          }
          val (geo, cnt) = geomedianKernel(planes, nb, w * h, iters, eps)
          bands.indices.iterator.map(b => (bands(b), ty, tx, geo(b), cnt))
        }
        .toDF("band", "ty", "tx", "geomedian", "count")
    } else {
      val probe = stateProbe
      val sliced = slicedTiles(spark, bandTiles, planesPerTile, stateBudgetBytes)
        .groupByKey(s => (s.ty, s.tx, s.slice))
        .flatMapGroups { (key, it) =>
          val (ty, tx, slice) = key
          var w = 0
          var sh = 0
          val planes =
            scala.collection.mutable.Map.empty[(Int, Int), (Array[Double], Double)]
          it.foreach { s =>
            if (w == 0) { w = s.width; sh = s.sliceH }
            require(w == s.width && sh == s.sliceH,
              s"slice shape mismatch at ($ty,$tx): ${w}x$sh vs ${s.width}x${s.sliceH}")
            planes((s.tIdx, bandIdx(s.band))) = (Fuse.decode(s.data, s.dtype), s.nodata)
          }
          probe.foreach(_.add(planes.size.toLong * w * sh * 8L))
          val (geo, cnt) = geomedianKernel(planes, nb, w * sh, iters, eps)
          bands.indices.iterator.map(b =>
            (bands(b), ty, tx, slice, geo(b), cnt))
        }
      reassemble(sliced).toDF("band", "ty", "tx", "geomedian", "count")
    }
  }

  /** Geomedian kernel over gathered (tIdx, bandOrdinal)-keyed planes of
    * `n` pixels: complete-observation gather (time-ascending) + the
    * fixed-iteration Weiszfeld solve — shared by the full-tile and
    * sliced plan shapes, so slicing cannot change a value. */
  private[graft] def geomedianKernel(
      planes: scala.collection.Map[(Int, Int), (Array[Double], Double)],
      nb: Int, n: Int, iters: Int,
      eps: Double): (Array[Array[Double]], Array[Int]) = {
    // only times with a plane for EVERY band can contribute
    val times = planes.keys.map(_._1).toSeq.distinct.sorted
      .filter(t => (0 until nb).forall(b => planes.contains((t, b))))
      .toArray
    val geo = Array.fill(nb)(new Array[Double](n))
    val cnt = new Array[Int](n)
    val obs = Array.ofDim[Double](times.length, nb)
    var i = 0
    while (i < n) {
      // gather complete observations, time-ascending
      var m = 0
      var p = 0
      while (p < times.length) {
        var ok = true
        var b = 0
        while (b < nb && ok) {
          val (px, nodata) = planes((times(p), b))
          val v = px(i)
          if (v.isNaN || v == nodata) ok = false else obs(m)(b) = v
          b += 1
        }
        if (ok) m += 1
        p += 1
      }
      cnt(i) = m
      if (m == 0) {
        var b = 0
        while (b < nb) { geo(b)(i) = Double.NaN; b += 1 }
      } else {
        val x = weiszfeld(obs, m, nb, iters, eps)
        var b = 0
        while (b < nb) { geo(b)(i) = x(b); b += 1 }
      }
      i += 1
    }
    (geo, cnt)
  }

  /** Fixed-iteration Weiszfeld geometric median of `obs(0 until m)`
    * (each a length-`nb` band vector): x⁰ = component mean, then
    * xᵏ⁺¹ = Σ wₜ·pₜ / Σ wₜ with wₜ = 1/max(‖xᵏ−pₜ‖, eps). Every fold
    * is time- then band-ascending — the deterministic contract the SQL
    * oracles replay. */
  private[graft] def weiszfeld(obs: Array[Array[Double]], m: Int, nb: Int,
                        iters: Int, eps: Double): Array[Double] = {
    // m = 1: the geomedian of one observation IS that observation —
    // exactly, not via (p·w)/w with the clamped weight w = 1/eps, whose
    // two roundings wobble the last ulp (the SQL oracles shortcut the
    // same way, so the arithmetic stays replayable bit-for-bit)
    if (m == 1) return java.util.Arrays.copyOf(obs(0), nb)
    val x = new Array[Double](nb)
    var b = 0
    while (b < nb) {
      var s = 0.0; var t = 0
      while (t < m) { s += obs(t)(b); t += 1 }
      x(b) = s / m
      b += 1
    }
    var k = 0
    while (k < iters) {
      val wts = new Array[Double](m)
      var t = 0
      while (t < m) {
        var d2 = 0.0; var b2 = 0
        while (b2 < nb) {
          val dd = obs(t)(b2) - x(b2); d2 += dd * dd; b2 += 1
        }
        wts(t) = 1.0 / math.max(math.sqrt(d2), eps)
        t += 1
      }
      var den = 0.0
      t = 0
      while (t < m) { den += wts(t); t += 1 }
      b = 0
      while (b < nb) {
        var num = 0.0; t = 0
        while (t < m) { num += obs(t)(b) * wts(t); t += 1 }
        x(b) = num / den
        b += 1
      }
      k += 1
    }
    x
  }

  /** Median with the medianAcrossTime convention: middle value for odd
    * m, mean of the two middles for even (matches SQL MEDIAN). Sorts
    * vals(0 until m) in place. */
  private def medianOf(vals: Array[Double], m: Int): Double = {
    java.util.Arrays.sort(vals, 0, m)
    if (m % 2 == 1) vals(m / 2) else (vals(m / 2 - 1) + vals(m / 2)) / 2.0
  }

  /** The geomedian's three MAD companion layers (the deviation bands
    * every production geomedian ships with): per pixel, the MEDIAN
    * across time of each observation's deviation from the geomedian
    * point x —
    *   EMAD  = median ‖pₜ − x‖₂            (Euclidean distance)
    *   SMAD  = median 1 − cos(pₜ, x)       (spectral / angular)
    *   BCMAD = median Σ|pₜ−x| / Σ|pₜ+x|   (Bray–Curtis)
    * Zero denominators yield 0 (not NaN) in both engines. Same single
    * (ty, tx)-keyed rechunk and fixed-iteration Weiszfeld as
    * [[geomedianAcrossTime]] — the MADs are a per-pixel postpass over
    * the same gathered observations. */
  def geomadAcrossTime(spark: SparkSession, tiles: DataFrame,
                       bands: Seq[String], iters: Int = 8,
                       eps: Double = 1e-7, planesPerTile: Int = 0,
                       stateBudgetBytes: Long = DefaultStateBudgetBytes,
                       stateProbe: Option[MaxAcc] = None): DataFrame = {
    import spark.implicits._
    require(bands.nonEmpty, "geomad needs at least one band")
    val nb = bands.length
    val bandIdx = bands.zipWithIndex.toMap
    val bandTiles = tiles.where(col("band").isin(bands.map(x => x: Any): _*))
    if (planesPerTile <= 0) {
      bandTiles
        .select(col("band"), col("tIdx"), col("ty"), col("tx"),
          col("data"), col("dtype"), col("nodata"),
          col("width"), col("height"))
        .as[(String, Int, Int, Int, Array[Byte], String, Double, Int, Int)]
        .groupByKey { case (_, _, ty, tx, _, _, _, _, _) => (ty, tx) }
        .mapGroups { (key, it) =>
          val (ty, tx) = key
          var w = 0
          var h = 0
          val planes =
            scala.collection.mutable.Map.empty[(Int, Int), (Array[Double], Double)]
          it.foreach { case (band, tIdx, _, _, data, dtype, nodata, tw, th) =>
            if (w == 0) { w = tw; h = th }
            require(w == tw && h == th,
              s"tile shape mismatch at ($ty,$tx): ${w}x$h vs ${tw}x$th")
            planes((tIdx, bandIdx(band))) = (Fuse.decode(data, dtype), nodata)
          }
          val (emad, smad, bcmad, cnt) = geomadKernel(planes, nb, w * h, iters, eps)
          (ty, tx, emad, smad, bcmad, cnt)
        }
        .toDF("ty", "tx", "emad", "smad", "bcmad", "count")
    } else {
      val probe = stateProbe
      slicedTiles(spark, bandTiles, planesPerTile, stateBudgetBytes)
        .groupByKey(s => (s.ty, s.tx, s.slice))
        .mapGroups { (key, it) =>
          val (ty, tx, slice) = key
          var w = 0
          var sh = 0
          val planes =
            scala.collection.mutable.Map.empty[(Int, Int), (Array[Double], Double)]
          it.foreach { s =>
            if (w == 0) { w = s.width; sh = s.sliceH }
            require(w == s.width && sh == s.sliceH,
              s"slice shape mismatch at ($ty,$tx): ${w}x$sh vs ${s.width}x${s.sliceH}")
            planes((s.tIdx, bandIdx(s.band))) = (Fuse.decode(s.data, s.dtype), s.nodata)
          }
          probe.foreach(_.add(planes.size.toLong * w * sh * 8L))
          val (emad, smad, bcmad, cnt) = geomadKernel(planes, nb, w * sh, iters, eps)
          (ty, tx, slice, emad, smad, bcmad, cnt)
        }
        // output-sized reassembly: state = the S slices of ONE tile's
        // four output planes — bounded by tile size, independent of T
        .groupByKey { case (ty, tx, _, _, _, _, _) => (ty, tx) }
        .mapGroups { (key, it) =>
          val (ty, tx) = key
          val parts = it.map { case (_, _, s, e, sm, bc, c) =>
            (s, Array(e, sm, bc), c)
          }.toArray
          val (planes, cnt) = concatSlices(parts)
          (ty, tx, planes(0), planes(1), planes(2), cnt)
        }
        .toDF("ty", "tx", "emad", "smad", "bcmad", "count")
    }
  }

  /** MAD-layer kernel over gathered (tIdx, bandOrdinal)-keyed planes of
    * `n` pixels — same gather + Weiszfeld as [[geomedianKernel]], then
    * the three deviation medians. Shared by both plan shapes. */
  private[graft] def geomadKernel(
      planes: scala.collection.Map[(Int, Int), (Array[Double], Double)],
      nb: Int, n: Int, iters: Int, eps: Double)
      : (Array[Double], Array[Double], Array[Double], Array[Int]) = {
    val times = planes.keys.map(_._1).toSeq.distinct.sorted
      .filter(t => (0 until nb).forall(b => planes.contains((t, b))))
      .toArray
    val emad = new Array[Double](n)
    val smad = new Array[Double](n)
    val bcmad = new Array[Double](n)
    val cnt = new Array[Int](n)
    val obs = Array.ofDim[Double](times.length, nb)
    val dev = new Array[Double](times.length)
    var i = 0
    while (i < n) {
      var m = 0
      var p = 0
      while (p < times.length) {
        var ok = true
        var b = 0
        while (b < nb && ok) {
          val (px, nodata) = planes((times(p), b))
          val v = px(i)
          if (v.isNaN || v == nodata) ok = false else obs(m)(b) = v
          b += 1
        }
        if (ok) m += 1
        p += 1
      }
      cnt(i) = m
      if (m == 0) {
        emad(i) = Double.NaN; smad(i) = Double.NaN; bcmad(i) = Double.NaN
      } else {
        val x = weiszfeld(obs, m, nb, iters, eps)
        var xn2 = 0.0
        var b = 0
        while (b < nb) { xn2 += x(b) * x(b); b += 1 }
        val xn = math.sqrt(xn2)
        // EMAD
        var t = 0
        while (t < m) {
          var d2 = 0.0; b = 0
          while (b < nb) { val d = obs(t)(b) - x(b); d2 += d * d; b += 1 }
          dev(t) = math.sqrt(d2)
          t += 1
        }
        emad(i) = medianOf(dev, m)
        // SMAD
        t = 0
        while (t < m) {
          var dot = 0.0; var pn2 = 0.0; b = 0
          while (b < nb) {
            dot += obs(t)(b) * x(b); pn2 += obs(t)(b) * obs(t)(b); b += 1
          }
          val den = math.sqrt(pn2) * xn
          dev(t) = if (den == 0.0) 0.0 else 1.0 - dot / den
          t += 1
        }
        smad(i) = medianOf(dev, m)
        // BCMAD
        t = 0
        while (t < m) {
          var num = 0.0; var den = 0.0; b = 0
          while (b < nb) {
            num += math.abs(obs(t)(b) - x(b))
            den += math.abs(obs(t)(b) + x(b))
            b += 1
          }
          dev(t) = if (den == 0.0) 0.0 else num / den
          t += 1
        }
        bcmad(i) = medianOf(dev, m)
      }
      i += 1
    }
    (emad, smad, bcmad, cnt)
  }
}
