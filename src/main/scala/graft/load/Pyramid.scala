package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed overview (pyramid) construction — the level-s decimated
  * planes every tile server / COG exporter needs, built from the tile
  * frame itself instead of a single-node gdaladdo pass. Decimation
  * matches the fixture/GRB sidecar convention (`Grb.writeWithOverviews`,
  * reference `loader/_reader.py:104-114` consumption side): level-s
  * pixel (j, i) = base (s·j, s·i).
  *
  * Scale shape: each base tile DECIMATES LOCALLY first (the s²-fold
  * data reduction happens before the exchange), then the s×s
  * sub-planes of each level tile meet in ONE shuffle keyed
  * (band, tIdx, ty/s, tx/s) — so the shuffle carries the already-small
  * level planes (1/s² of the cube), and assembly is by global level
  * coordinates, ragged edge tiles included. Output is tile-shaped at
  * the level grid; build level 4 from level 2's output (s=2 twice) or
  * directly (s=4) — both land on the same decimation identity.
  */
object Pyramid {

  /** One decimated sub-plane in GLOBAL level-grid coordinates. */
  final case class Sub(gx0: Int, gy0: Int, w: Int, h: Int,
                       vals: Array[Double])

  /** Build the level-`s` overview of a `LoadResult.tiles` frame
    * (chunk = the base tile size, needed to place sub-planes on the
    * level grid). Returns (band, tIdx, ty, tx, x0, y0, width, height,
    * plane, n_valid) rows on the level tile grid. */
  def buildLevel(spark: SparkSession, tiles: DataFrame, s: Int,
                 chunk: Int = 64): DataFrame = {
    import spark.implicits._
    require(s >= 2, s"level scale must be >= 2: $s")
    require(chunk % s == 0, s"chunk $chunk not divisible by scale $s")
    tiles
      .select("band", "tIdx", "ty", "tx", "x0", "y0", "width", "height",
        "data", "dtype", "nodata")
      .as[(String, Int, Int, Int, Int, Int, Int, Int, Array[Byte], String, Double)]
      .map { case (band, tIdx, ty, tx, x0, y0, w, h, data, dtype, nodata) =>
        val px = Fuse.decode(data, dtype)
        // local decimation: keep base pixels at (s·j, s·i) whose GLOBAL
        // coords are multiples of s (tile origins are chunk-aligned and
        // chunk % s == 0, so local stride-s from offset 0 is exact)
        val ow = (w + s - 1) / s
        val oh = (h + s - 1) / s
        val out = new Array[Double](ow * oh)
        var j = 0
        while (j < oh) {
          var i = 0
          while (i < ow) {
            val v = px(j * s * w + i * s)
            out(j * ow + i) =
              if (v.isNaN || v == nodata) Double.NaN else v
            i += 1
          }
          j += 1
        }
        ((band, tIdx, ty / s, tx / s),
          Sub(x0 / s, y0 / s, ow, oh, out))
      }
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val (band, tIdx, lty, ltx) = key
        val subs = it.map(_._2).toArray
        val lx0 = ltx * chunk
        val ly0 = lty * chunk
        val w = subs.map(f => f.gx0 + f.w).max - lx0
        val h = subs.map(f => f.gy0 + f.h).max - ly0
        val plane = Array.fill(w * h)(Double.NaN)
        subs.foreach { f =>
          val ox = f.gx0 - lx0
          val oy = f.gy0 - ly0
          var y = 0
          while (y < f.h) {
            System.arraycopy(f.vals, y * f.w, plane, (oy + y) * w + ox, f.w)
            y += 1
          }
        }
        var n = 0L
        var i = 0
        while (i < plane.length) { if (!plane(i).isNaN) n += 1; i += 1 }
        (band, tIdx, lty, ltx, lx0, ly0, w, h, plane, n)
      }
      .toDF("band", "tIdx", "ty", "tx", "x0", "y0", "width", "height",
        "plane", "n_valid")
  }
}
