package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stratified pixel sampling over a label plane — pick N deterministic
  * sample locations per class from a rasterized mask (ground-truth
  * site selection for model training / validation). With
  * [[Rasterize]] and [[Drill]] this closes the training-data loop:
  * vector labels → mask → stratified locations → drilled pixel values.
  *
  * Determinism + scale: the sampling key is `md5(gy,gx)` — a portable,
  * seedless hash both engines can recompute. Selection is two-phase:
  * a MAP-SIDE hash-threshold prefilter (first hex digit < 4 keeps an
  * expected quarter of each class, no shuffle, no state) and an exact
  * rank over the bounded survivors — so the exchange carries the
  * survivor fraction, never the mask, and the result is still exactly
  * the N smallest keys per class among survivors (= a uniform
  * deterministic sample). Classes smaller than ~4N should lower the
  * threshold; the default suits mask-scale classes.
  */
object Sampling {

  /** N sample locations per class from a [[Rasterize.burn]] output.
    * Returns (zone, gy, gx) in global pixel coordinates. */
  def stratifiedLocations(spark: SparkSession, labelTiles: DataFrame,
                          nPerClass: Int): DataFrame = {
    labelTiles
      .select(col("x0"), col("y0"), col("width"),
        posexplode(col("plane")))
      .where(col("col") =!= 0)
      .select(col("col").as("zone"),
        (col("y0") + col("pos") / col("width")).cast("int").as("gy"),
        (col("x0") + col("pos") % col("width")).cast("int").as("gx"))
      .withColumn("key",
        md5(concat(col("gy").cast("string"), lit(","),
          col("gx").cast("string"))))
      .where(substring(col("key"), 1, 1).isin("0", "1", "2", "3"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("zone").orderBy("key")))
      .where(col("rn") <= nPerClass)
      .select("zone", "gy", "gx")
  }
}
