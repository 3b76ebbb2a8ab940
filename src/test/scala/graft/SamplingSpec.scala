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
}
