package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Primitive kernels for the dedup signatures, callable from generated
  * code (Scala objects emit static forwarders). Shared constants with
  * `graft.dedup.Dedup`. */
object HashKernels {
  val NumPerm = 128
  val Bands = 32
  val RowsPerBand: Int = NumPerm / Bands

  /** Deterministic universal-hash permutation params (a odd => bijection
    * over the 2^64 ring). */
  val permA: Array[Long] = {
    val r = new scala.util.Random(42)
    Array.fill(NumPerm)(r.nextLong() | 1L)
  }
  val permB: Array[Long] = {
    val r = new scala.util.Random(43)
    Array.fill(NumPerm)(r.nextLong())
  }

  /** MinHash signature folded into per-band hashes in one pass over the
    * shingle set: sig[p] = min over h of h*a[p]+b[p]; band hash = FNV-ish
    * fold of its signature slice. Input: hashed shingle set. */
  def minhashBands(arr: ArrayData): ArrayData = {
    val hs = arr.toLongArray()
    val sig = new Array[Long](NumPerm)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var p = 0
      while (p < NumPerm) {
        val v = h * permA(p) + permB(p)
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    val out = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      var acc = 1125899906842597L
      var j = b * RowsPerBand
      while (j < (b + 1) * RowsPerBand) { acc = acc * 31 + sig(j); j += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over the hashed shingle set. */
  def simhash64(arr: ArrayData): Long = {
    val hs = arr.toLongArray()
    val acc = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (acc(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }
}

private[functions] trait LongArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires array<bigint>, got ${t.simpleString}")
  }
}

/** `minhash_bands(hset)` — MinHash signature + LSH band hashes in one
  * native pass (no per-element boxing; stays inside whole-stage codegen
  * via a static kernel call). */
case class MinHashBands(child: Expression)
    extends UnaryExpression with LongArrayInput {
  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashBands(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.minhashBands($c);")
  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** `simhash64(hset)` — 64-bit SimHash signature, native pass. */
case class SimHash64(child: Expression)
    extends UnaryExpression with LongArrayInput {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash64(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.simhash64($c);")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
