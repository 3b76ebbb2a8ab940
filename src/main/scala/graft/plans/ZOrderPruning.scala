package graft.plans

import graft.functions.ZOrderKernel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: derive a Morton-code range predicate from x/y box
  * predicates on z-clustered tables.
  *
  * A tile table laid out by `zorder64(tx, ty)` (see `graft.layout`) is
  * written range-partitioned and sorted on its `z` column, so parquet
  * row-group min/max stats on `z` are tight. A user's ROI query,
  * however, filters on `tx BETWEEN a AND b AND ty BETWEEN c AND d` —
  * predicates with no pushdown value on a z-sorted file. This rule adds
  * the implied conjunct
  *
  *   z >= zorder64(a, c) AND z <= zorder64(b, d)
  *
  * which IS pushdown-able: `zorder64` is monotone in each coordinate
  * (each operand's bit-spread preserves order and the two interleaves
  * occupy disjoint bit positions), so every row inside the box satisfies
  * the z range. The bound is coarse — the z interval can cover tiles
  * outside the box (the classic Z-curve overshoot) — but the original
  * predicates remain in place for exactness; the added range exists
  * purely so the scan can skip row groups/files. At 100 TB this is the
  * difference between "read the whole tile table" and "read the files
  * the curve maps the ROI onto".
  *
  * Applies when the filtered relation exposes integer `tx`, `ty` and a
  * long `z` column (the engine's clustered tile schema), both
  * coordinates have literal lower AND upper bounds in the filter's
  * conjuncts, and no z bound is present yet (idempotence across
  * optimizer runs).
  */
case class ZOrderRangePruning(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val attrs = child.output
      (find(attrs, "tx", IntegerType), find(attrs, "ty", IntegerType),
        find(attrs, "z", LongType)) match {
        case (Some(tx), Some(ty), Some(z)) =>
          val conjuncts = splitConjunctivePredicates(cond)
          if (conjuncts.exists(_.references.contains(z))) f
          else (bounds(conjuncts, tx), bounds(conjuncts, ty)) match {
            case (Some((xa, xb)), Some((ya, yb))) =>
              val lo = ZOrderKernel.compute(xa, ya)
              val hi = ZOrderKernel.compute(xb, yb)
              Filter(And(cond, And(
                GreaterThanOrEqual(z, Literal(lo)),
                LessThanOrEqual(z, Literal(hi)))), child)
            case _ => f
          }
        case _ => f
      }
  }

  private def find(attrs: Seq[Attribute], name: String,
                   dt: org.apache.spark.sql.types.DataType): Option[Attribute] =
    attrs.find(a => a.name.equalsIgnoreCase(name) && a.dataType == dt)

  /** Literal [lower, upper] bounds for `a` from the conjunct list; None
    * unless both sides are bounded. */
  private def bounds(conjuncts: Seq[Expression], a: Attribute)
  : Option[(Int, Int)] = {
    var lo: Option[Int] = None
    var hi: Option[Int] = None
    def keepMax(o: Option[Int], v: Int) = Some(o.fold(v)(math.max(_, v)))
    def keepMin(o: Option[Int], v: Int) = Some(o.fold(v)(math.min(_, v)))
    conjuncts.foreach {
      case GreaterThanOrEqual(x: Attribute, Literal(v: Int, IntegerType))
        if x.semanticEquals(a) => lo = keepMax(lo, v)
      case GreaterThan(x: Attribute, Literal(v: Int, IntegerType))
        if x.semanticEquals(a) && v < Int.MaxValue => lo = keepMax(lo, v + 1)
      case LessThanOrEqual(x: Attribute, Literal(v: Int, IntegerType))
        if x.semanticEquals(a) => hi = keepMin(hi, v)
      case LessThan(x: Attribute, Literal(v: Int, IntegerType))
        if x.semanticEquals(a) && v > Int.MinValue => hi = keepMin(hi, v - 1)
      case EqualTo(x: Attribute, Literal(v: Int, IntegerType))
        if x.semanticEquals(a) => lo = keepMax(lo, v); hi = keepMin(hi, v)
      case EqualTo(Literal(v: Int, IntegerType), x: Attribute)
        if x.semanticEquals(a) => lo = keepMax(lo, v); hi = keepMin(hi, v)
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), x: Attribute)
        if x.semanticEquals(a) => hi = keepMin(hi, v)
      case LessThanOrEqual(Literal(v: Int, IntegerType), x: Attribute)
        if x.semanticEquals(a) => lo = keepMax(lo, v)
      case _ =>
    }
    for (l <- lo; h <- hi if l <= h) yield (l, h)
  }
}

object ZOrderPruning {
  /** Install on an already-running session (the extensions path injects
    * at build time; this covers sessions built without it). Idempotent. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[ZOrderRangePruning]))
      spark.experimental.extraOptimizations = cur :+ ZOrderRangePruning(spark)
  }
}
