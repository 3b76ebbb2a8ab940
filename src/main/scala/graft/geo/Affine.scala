package graft.geo

/** 2-D affine transform `(x, y) -> (a*x + b*y + c, d*x + e*y + f)` —
  * the pixel->world mapping used throughout (reference consumes
  * `affine.Affine`, e.g. `_mdtools.py:295-303`). Row-major 6 coefficients
  * like GDAL/rasterio: (a, b, c, d, e, f).
  */
final case class Affine(a: Double, b: Double, c: Double,
                        d: Double, e: Double, f: Double) {

  def apply(x: Double, y: Double): (Double, Double) =
    (a * x + b * y + c, d * x + e * y + f)

  def det: Double = a * e - b * d

  /** Inverse transform (world->pixel for a pixel->world affine). */
  def inverse: Affine = {
    val idet = 1.0 / det
    val (ra, rb, rd, re) = (e * idet, -b * idet, -d * idet, a * idet)
    Affine(ra, rb, -c * ra - f * rb, rd, re, -c * rd - f * re)
  }

  /** this ∘ other: apply `other` first, then `this`. */
  def compose(o: Affine): Affine =
    Affine(
      a * o.a + b * o.d, a * o.b + b * o.e, a * o.c + b * o.f + c,
      d * o.a + e * o.d, d * o.b + e * o.e, d * o.c + e * o.f + f)

  def toArray: Array[Double] = Array(a, b, c, d, e, f)

  /** No shear/rotation terms. */
  def isAxisAligned: Boolean = b == 0.0 && d == 0.0
}

object Affine {
  val identity: Affine = Affine(1, 0, 0, 0, 1, 0)

  def fromArray(v: Seq[Double]): Affine = {
    require(v.length == 6 || v.length == 9,
      s"affine needs 6 or 9 elements, got ${v.length}")
    if (v.length == 9)
      require(v(6) == 0 && v(7) == 0 && v(8) == 1,
        s"transform is not affine: $v")
    Affine(v(0), v(1), v(2), v(3), v(4), v(5))
  }

  /** translation * scale, the standard north-up grid transform. */
  def grid(originX: Double, originY: Double,
           resX: Double, resY: Double): Affine =
    Affine(resX, 0, originX, 0, resY, originY)
}
