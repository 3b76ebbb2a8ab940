package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String kernels callable from generated code. */
object StringKernels {
  /** Unicode NFC (canonical composition). Fast path: `Normalizer
    * .isNormalized` is a cheap scan that avoids allocating for the
    * overwhelmingly-ASCII corpus case (ASCII is always NFC). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc(str)` — Unicode canonical composition (NFC), the normalization
  * every text-dedup pipeline must run before hashing: visually identical
  * strings with decomposed combining marks ("e" + U+0301 vs "é") hash
  * differently and silently split duplicate groups. Spark SQL has no
  * normalization builtin (DuckDB ships `nfc_normalize`), so this is a
  * native codegen expression — one static call in the generated code,
  * staying inside whole-stage codegen. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    StringKernels.nfc(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StringKernels.nfc($c);")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
