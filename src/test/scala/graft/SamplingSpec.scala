package graft

import graft.load.Sampling
import org.scalatest.funsuite.AnyFunSuite

/** Stratified location sampling: deterministic, N per class, subset of
  * the class's pixels. */
class SamplingSpec extends AnyFunSuite {
  import GraftSpark.spark

  private def labels = {
    import spark.implicits._
    // one 8x8 tile: west half class 1, east half class 2
    val plane = Array.tabulate(64)(i => if (i % 8 < 4) 1 else 2)
    Seq((0, 0, 0, 0, 8, 8, plane, 64L))
      .toDF("ty", "tx", "x0", "y0", "width", "height", "plane", "n_burned")
  }

  test("N per class, deterministic across runs, drawn from the class") {
    val a = Sampling.stratifiedLocations(spark, labels, 3).collect()
    val b = Sampling.stratifiedLocations(spark, labels, 3).collect()
    assert(a.map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sortBy(_.toString)
      .sameElements(b.map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
        .sortBy(_.toString)))
    val byZone = a.groupBy(_.getInt(0))
    assert(byZone.keySet == Set(1, 2))
    assert(byZone.values.forall(_.length == 3))
    // every sampled location really carries its class in the mask
    a.foreach { r =>
      val (zone, gy, gx) = (r.getInt(0), r.getInt(1), r.getInt(2))
      assert((if (gx % 8 < 4) 1 else 2) == zone && gy < 8 && gx < 8)
    }
  }

  test("requesting more than the survivor pool returns the whole pool") {
    val all = Sampling.stratifiedLocations(spark, labels, 1000).collect()
    // the hash-threshold keeps ~1/4 of 32 pixels per class; all survive
    assert(all.length < 64 && all.nonEmpty)
    assert(all.groupBy(_.getInt(0)).keySet == Set(1, 2))
  }

  /** A mask dominated by one class (160k of its 163.8k pixels) — the
    * shape that used to funnel ~25% of the mask into ONE row_number
    * window partition. The heap spelling must (a) keep the exchange
    * bounded: partial ObjectHashAggregate map-side, no Window, no
    * full-input Sort anywhere in the plan; (b) rank identically to the
    * window oracle it replaced. */
  test("dominant class: bounded heap exchange, window-identical sample") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 10 tiles of 128x128: class 1 everywhere except a 60x64 class-2
    // patch in tile 0 => class 1 has ~160k pixels
    val tiles = (0 until 10).map { tx =>
      val plane = Array.tabulate(128 * 128) { i =>
        if (tx == 0 && i % 128 < 64 && i / 128 < 60) 2 else 1
      }
      (0, tx, tx * 128, 0, 128, 128, plane, 128L * 128L)
    }
    val labels = tiles
      .toDF("ty", "tx", "x0", "y0", "width", "height", "plane", "n_burned")
    val df = Sampling.stratifiedLocations(spark, labels, 20)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      "heap aggregate must drive the exchange")
    assert(!plan.contains("Window"), "window operator must not appear")
    assert(!plan.toLowerCase.contains("sort "),
      "no full-input sort may precede the exchange")
    val got = df.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    // the window spelling the heap replaced, on the same survivors
    val expected = labels
      .select(col("x0"), col("y0"), col("width"), posexplode(col("plane")))
      .where(col("col") =!= 0)
      .select(col("col").as("zone"),
        (col("y0") + col("pos") / col("width")).cast("int").as("gy"),
        (col("x0") + col("pos") % col("width")).cast("int").as("gx"))
      .withColumn("key", md5(concat(col("gy").cast("string"), lit(","),
        col("gx").cast("string"))))
      .where(substring(col("key"), 1, 1).isin("0", "1", "2", "3"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("zone").orderBy("key")))
      .where(col("rn") <= 20)
      .select("zone", "gy", "gx").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == expected, "heap sample must equal the window oracle")
    assert(got.count(_._1 == 1) == 20 && got.count(_._1 == 2) == 20)
  }
}
