package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Focal (neighborhood) statistics — the 3×3/(2r+1)² moving-window mean
  * of map algebra (smoothing, texture, pre-classification filtering).
  * Beyond the reference surface, and the one raster operator whose
  * distribution is genuinely non-trivial: a window straddling a tile
  * boundary needs pixels the neighboring TASK holds.
  *
  * Scale shape — halo exchange, the stencil-computation pattern: each
  * tile task emits its full plane to its own key plus the `radius`-wide
  * BORDER STRIPS addressed to its 8 neighbors' keys, all in one
  * `flatMap`; ONE shuffle then co-locates every tile with exactly the
  * halo it needs (strip traffic is ~4·r/T of the plane bytes, 6% for
  * r=1, T=64 — not a second copy of the cube), and each group computes
  * its windowed means independently. No driver assembly, no global
  * plane, no iteration: the whole operator is flatMap → groupByKey →
  * mapGroups, and output stays tile-shaped for downstream operators.
  *
  * Window semantics are nodata-aware: the mean runs over the VALID taps
  * of the window (mosaic edges and nodata holes contribute nothing); a
  * window with zero valid taps yields NaN.
  */
object Focal {

  /** One shuffled fragment: a plane or border strip in GLOBAL pixel
    * coordinates, addressed to tile (ty, tx); `own` marks the center
    * tile's full plane (groups without one are dropped — strips sent to
    * tiles that don't exist). */
  final case class Frag(ty: Int, tx: Int, gx0: Int, gy0: Int,
                        w: Int, h: Int, own: Boolean, vals: Array[Double])

  /** A border strip addressed to a neighbor, global-coordinate anchored
    * (the join payload of the standing-layout path). */
  final case class Strip(gx0: Int, gy0: Int, sw: Int, sh: Int,
                         vals: Array[Double])

  /** Assemble the (w+2r)×(h+2r) padded plane from the center + halo
    * fragments — NaN beyond what any fragment covers. The shared front
    * half of every focal kernel. */
  private def assemblePad(center: Frag, frags: Iterator[Frag],
                          r: Int): Array[Double] = {
    val pw = center.w + 2 * r
    val ph = center.h + 2 * r
    val pad = Array.fill(pw * ph)(Double.NaN)
    (Iterator.single(center) ++ frags).foreach { f =>
      val ox = f.gx0 - (center.gx0 - r)
      val oy = f.gy0 - (center.gy0 - r)
      var y = 0
      while (y < f.h) {
        val py = oy + y
        if (py >= 0 && py < ph) {
          var x = 0
          while (x < f.w) {
            val pxx = ox + x
            if (pxx >= 0 && pxx < pw)
              pad(py * pw + pxx) = f.vals(y * f.w + x)
            x += 1
          }
        }
        y += 1
      }
    }
    pad
  }

  /** Shared windowed-mean kernel: assemble the padded plane from the
    * center + halo fragments, then summed-area tables over
    * (value, validity) — every window mean is 4 lookups, O(1) per pixel
    * at ANY radius (the naive loop is O(r²) per pixel and loses at
    * r ≥ 2). Both exchange strategies call THIS, so their outputs are
    * bit-identical. */
  private def windowedMean(center: Frag, frags: Iterator[Frag],
                           r: Int): (Array[Double], Long) = {
    val w = center.w
    val h = center.h
    val pw = w + 2 * r
    val ph = h + 2 * r
    val pad = assemblePad(center, frags, r)
    val sw = pw + 1
    val satS = new Array[Double](sw * (ph + 1))
    val satC = new Array[Int](sw * (ph + 1))
    var sy = 0
    while (sy < ph) {
      var sx = 0
      while (sx < pw) {
        val v = pad(sy * pw + sx)
        val valid = !v.isNaN
        val i = (sy + 1) * sw + (sx + 1)
        satS(i) = (if (valid) v else 0.0) +
          satS(i - sw) + satS(i - 1) - satS(i - sw - 1)
        satC(i) = (if (valid) 1 else 0) +
          satC(i - sw) + satC(i - 1) - satC(i - sw - 1)
        sx += 1
      }
      sy += 1
    }
    val focal = new Array[Double](w * h)
    var nValid = 0L
    val win = 2 * r + 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // window rows y..y+2r, cols x..x+2r of the padded plane
        val a = y * sw + x
        val b = y * sw + (x + win)
        val c0 = (y + win) * sw + x
        val d = (y + win) * sw + (x + win)
        val c = satC(d) - satC(b) - satC(c0) + satC(a)
        focal(y * w + x) =
          if (c == 0) Double.NaN
          else (satS(d) - satS(b) - satS(c0) + satS(a)) / c
        if (c > 0) nValid += 1
        x += 1
      }
      y += 1
    }
    (focal, nValid)
  }

  /** Decode a tile plane to doubles with nodata mapped to NaN. */
  private def decodePlane(data: Array[Byte], dtype: String,
                          nodata: Double): Array[Double] = {
    val px = Fuse.decode(data, dtype)
    var i = 0
    while (i < px.length) {
      if (px(i) == nodata) px(i) = Double.NaN
      i += 1
    }
    px
  }

  /** The 8 border strips of a decoded plane, each paired with the
    * neighbor tile key offset it is addressed to. */
  private def borderStrips(px: Array[Double], w: Int, h: Int, r: Int)
      : Seq[(Int, Int, Strip)] = {
    require(r <= w && r <= h,
      s"focal radius $r exceeds tile ${w}x$h — rechunk larger tiles")
    def strip(sx: Int, sy: Int, sw: Int, sh: Int): Array[Double] = {
      val out = new Array[Double](sw * sh)
      var y = 0
      while (y < sh) {
        System.arraycopy(px, (sy + y) * w + sx, out, y * sw, sw)
        y += 1
      }
      out
    }
    val b = Seq.newBuilder[(Int, Int, Strip)]
    var dy = -1
    while (dy <= 1) {
      var dx = -1
      while (dx <= 1) {
        if (dx != 0 || dy != 0) {
          val sx = if (dx > 0) math.max(0, w - r) else 0
          val sy = if (dy > 0) math.max(0, h - r) else 0
          val sw = if (dx == 0) w else math.min(r, w)
          val sh = if (dy == 0) h else math.min(r, h)
          b += ((dy, dx, Strip(sx, sy, sw, sh, strip(sx, sy, sw, sh))))
        }
        dx += 1
      }
      dy += 1
    }
    b.result()
  }

  /** The full-exchange skeleton every focal operator shares: each tile
    * task emits its plane to its own key + border strips to its 8
    * neighbors, ONE shuffle co-locates them, and `kernel` computes the
    * output plane(s) from (center, halo). Returns one row per tile:
    * (band, tIdx, ty, tx, planes, n_valid). */
  private[load] def focalExchange(spark: SparkSession, tiles: DataFrame,
      r: Int)(kernel: (Frag, Iterator[Frag]) => (Array[Array[Double]], Long))
      : DataFrame = {
    import spark.implicits._
    require(r >= 1, s"radius must be >= 1: $r")
    tiles
      .select("band", "tIdx", "ty", "tx", "x0", "y0", "width", "height",
        "data", "dtype", "nodata")
      .as[(String, Int, Int, Int, Int, Int, Int, Int, Array[Byte], String, Double)]
      .flatMap { case (band, tIdx, ty, tx, x0, y0, w, h, data, dtype, nodata) =>
        // one ring of neighbors is the whole halo: a window may not
        // reach past the adjacent tile (r <= tile dims), or strips from
        // two tiles away would be silently missing
        val px = decodePlane(data, dtype, nodata)
        val frags = Seq.newBuilder[((String, Int, Int, Int), Frag)]
        frags += (((band, tIdx, ty, tx),
          Frag(ty, tx, x0, y0, w, h, own = true, px)))
        // border strips to the 8 neighbors (clipped to this tile)
        borderStrips(px, w, h, r).foreach { case (dy, dx, s) =>
          frags += (((band, tIdx, ty + dy, tx + dx),
            Frag(ty + dy, tx + dx, x0 + s.gx0, y0 + s.gy0, s.sw, s.sh,
              own = false, s.vals)))
        }
        frags.result()
      }
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val (band, tIdx, ty, tx) = key
        val frags = it.map(_._2).toArray
        frags.find(_.own) match {
          case None => Iterator.empty // strips addressed to a hole
          case Some(center) =>
            val (planes, nValid) =
              kernel(center, frags.iterator.filterNot(_.own))
            Iterator.single((band, tIdx, ty, tx, planes, nValid))
        }
      }
      .toDF("band", "tIdx", "ty", "tx", "planes", "n_valid")
  }

  /** Focal mean over a `LoadResult.tiles` frame (any number of bands;
    * windows never cross bands or times). Returns one row per tile:
    * (band, tIdx, ty, tx, focal, n_valid). */
  def focalMean(spark: SparkSession, tiles: DataFrame,
                radius: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions._
    val r = radius
    focalExchange(spark, tiles, r) { (center, frags) =>
      val (focal, nValid) = windowedMean(center, frags, r)
      (Array(focal), nValid)
    }
      .select(col("band"), col("tIdx"), col("ty"), col("tx"),
        expr("planes[0]").as("focal"), col("n_valid"))
  }

  /** Horn terrain gradients over a `LoadResult.tiles` frame — the
    * slope/aspect front half of every DEM pipeline: per pixel, the
    * 8-neighbor weighted differences
    * `gx = ((c + 2f + i) − (a + 2d + g)) / 8`,
    * `gy = ((g + 2h + i) − (a + 2b + c)) / 8` (per-pixel-unit; divide
    * by cell size for world-unit slopes; +y points DOWN rows), and the
    * gradient magnitude `√(gx² + gy²)`. A pixel whose 3×3 window has
    * ANY missing tap (nodata hole or mosaic edge) yields NaN — the
    * GDAL edge convention, and the same rule the oracle's
    * count-9-taps join spells. Same halo-exchange scale shape as
    * [[focalMean]]; `n_valid` counts pixels with a complete window. */
  def horn(spark: SparkSession, tiles: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    focalExchange(spark, tiles, 1) { (center, frags) =>
      val w = center.w
      val h = center.h
      val pw = w + 2
      val pad = assemblePad(center, frags, 1)
      val gx = new Array[Double](w * h)
      val gy = new Array[Double](w * h)
      val mag = new Array[Double](w * h)
      var nValid = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val c0 = (y + 1) * pw + (x + 1)
          val a = pad(c0 - pw - 1); val b = pad(c0 - pw); val c = pad(c0 - pw + 1)
          val d = pad(c0 - 1); val f = pad(c0 + 1)
          val g = pad(c0 + pw - 1); val hh = pad(c0 + pw); val i = pad(c0 + pw + 1)
          val e = pad(c0)
          val o = y * w + x
          if (a.isNaN || b.isNaN || c.isNaN || d.isNaN || e.isNaN ||
              f.isNaN || g.isNaN || hh.isNaN || i.isNaN) {
            gx(o) = Double.NaN; gy(o) = Double.NaN; mag(o) = Double.NaN
          } else {
            val gxv = ((c + 2 * f + i) - (a + 2 * d + g)) / 8.0
            val gyv = ((g + 2 * hh + i) - (a + 2 * b + c)) / 8.0
            gx(o) = gxv; gy(o) = gyv
            mag(o) = math.sqrt(gxv * gxv + gyv * gyv)
            nValid += 1
          }
          x += 1
        }
        y += 1
      }
      (Array(gx, gy, mag), nValid)
    }
      .select(col("band"), col("tIdx"), col("ty"), col("tx"),
        expr("planes[0]").as("gx"), expr("planes[1]").as("gy"),
        expr("planes[2]").as("mag"), col("n_valid"))
  }

  /** Focal mean for a STANDING tile layout — `tiles` already clustered
    * by (band, tIdx, ty, tx), e.g. a bucketed table or the output of a
    * layout `repartition`. Identical results to [[focalMean]] (same
    * [[windowedMean]] kernel), different exchange economics:
    *
    * [[focalMean]] re-keys every fragment — center planes INCLUDED — so
    * ~1.06× the whole cube moves through its one exchange. Here only
    * the border strips are re-keyed (flatMap → groupBy: ~4·r/T of the
    * plane bytes, 6% for r=1, T=64) and then joined back onto the
    * standing planes on the layout's own clustering — the join adds NO
    * exchange on the plane side (the standing partitioning satisfies
    * its distribution requirement; on a fresh unpartitioned frame
    * Catalyst inserts the plane exchange and this degrades to
    * [[focalMean]]'s cost, never to wrong results). The plane source is
    * scanned twice (strip derivation + join probe) — two columnar reads
    * of a standing layout are far cheaper at scale than one full-cube
    * shuffle write+read. `FocalSpec` pins the plan: exactly one
    * exchange carries the `data` column (the caller's standing
    * repartition itself). */
  def focalMeanStanding(spark: SparkSession, tiles: DataFrame,
                        radius: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    require(radius >= 1, s"radius must be >= 1: $radius")
    val r = radius
    val keyCols = Seq("band", "tIdx", "ty", "tx")
    val strips = tiles
      .select("band", "tIdx", "ty", "tx", "x0", "y0", "width", "height",
        "data", "dtype", "nodata")
      .as[(String, Int, Int, Int, Int, Int, Int, Int, Array[Byte], String, Double)]
      .flatMap { case (band, tIdx, ty, tx, x0, y0, w, h, data, dtype, nodata) =>
        val px = decodePlane(data, dtype, nodata)
        borderStrips(px, w, h, r).map { case (dy, dx, s) =>
          (band, tIdx, ty + dy, tx + dx,
            Strip(x0 + s.gx0, y0 + s.gy0, s.sw, s.sh, s.vals))
        }
      }
      .toDF("band", "tIdx", "ty", "tx", "strip")
      .groupBy(keyCols.map(col): _*)
      .agg(collect_list("strip").as("halo"))
    tiles
      .select("band", "tIdx", "ty", "tx", "x0", "y0", "width", "height",
        "data", "dtype", "nodata")
      .join(strips, keyCols, "left_outer")
      .as[(String, Int, Int, Int, Int, Int, Int, Int, Array[Byte], String,
           Double, Option[Seq[Strip]])]
      .map { case (band, tIdx, ty, tx, x0, y0, w, h, data, dtype, nodata,
                   halo) =>
        require(r <= w && r <= h,
          s"focal radius $r exceeds tile ${w}x$h — rechunk larger tiles")
        val center = Frag(ty, tx, x0, y0, w, h, own = true,
          decodePlane(data, dtype, nodata))
        val frags = halo.getOrElse(Nil).iterator
          .map(s => Frag(ty, tx, s.gx0, s.gy0, s.sw, s.sh, own = false,
            s.vals))
        val (focal, nValid) = windowedMean(center, frags, r)
        (band, tIdx, ty, tx, focal, nValid)
      }
      .toDF("band", "tIdx", "ty", "tx", "focal", "n_valid")
  }
}
