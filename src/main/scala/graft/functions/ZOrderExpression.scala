package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) interleave kernel. Static forwarders make it
  * callable from generated code.
  *
  * Why a native expression: z-ordering is the write-time clustering key
  * for spatial tile tables — at 100 TB the key is computed once per row
  * on the write path, so it must live inside whole-stage codegen, not a
  * boxed UDF. The curve keeps x/y-adjacent tiles in the same or nearby
  * files, which is what turns a square ROI predicate into parquet
  * row-group pruning instead of a full scan.
  */
object ZOrderKernel {
  /** Spread the low 32 bits of v to the even bit positions of a long. */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleaved code of (x, y), totally ordered as a SIGNED long.
    * Coordinates are sign-bias-flipped first (so negative tile indices —
    * global grids west/south of the origin — sort before positive ones),
    * and the result's top bit is flipped back so signed comparison equals
    * unsigned z-curve order. x occupies even bits, y odd bits. */
  def compute(x: Int, y: Int): Long = {
    val zx = spread(x ^ 0x80000000)
    val zy = spread(y ^ 0x80000000)
    (zx | (zy << 1)) ^ java.lang.Long.MIN_VALUE
  }
}

/** `zorder64(x, y)` — codegen'd Morton code of two int coordinates. */
case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder64 expects (int, int), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKernel.compute(x.asInstanceOf[Int], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZOrderKernel.compute($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}
