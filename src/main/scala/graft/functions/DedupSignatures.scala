package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash-64 over whitespace tokens as a native codegen Expression —
  * the scan-side signature kernel of [[graft.operators.Dedup.simhashPairs]].
  * A Scala UDF here was the last opaque projection on the dedup scan
  * path: it blocked whole-stage codegen at exactly the operator whose
  * cost at 100 TB is the scan itself, and hid the column reference from
  * pruning. Values are identical to the former UDF (same FNV-1a token
  * hash, same per-bit vote fold). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"SimHash64 expects STRING, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.simhash64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.simhash64($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** 64-bit SimHash over whitespace tokens (FNV-1a token hash, per-bit
    * majority vote). Deterministic, partition-local. */
  def simhash64(text: String): Long = {
    if (text == null) return 0L
    val votes = new Array[Int](64)
    for (t <- text.split("\\s+") if t.nonEmpty) {
      val h = graft.operators.TextAnalysis.fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhash(c: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      SimHash64(org.apache.spark.sql.GraftExprBridge.expression(c)))
}

/** MinHash signature (nPerm universal-hash permutations over the FNV-1a
  * shingle hash) as a native codegen Expression — the other scan-side
  * dedup kernel that was a Scala UDF. nPerm is a plan-time constant
  * (it IS the signature schema), so it rides the expression, not a
  * child column. Values are identical to the former UDF. */
case class MinHashSig(child: Expression, nPerm: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashSig expects ARRAY<STRING>, got ${other.catalogString}")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.sigFromArrayData(input.asInstanceOf[ArrayData], nPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.sigFromArrayData($c, $nPerm);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Signature straight off the internal ArrayData — no Seq
    * materialization, no row conversion. Same permutation constants and
    * min fold as the reference-parity UDF it replaces. */
  def sigFromArrayData(shingles: ArrayData, nPerm: Int): GenericArrayData = {
    val n = shingles.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = graft.operators.TextAnalysis.fnv1a64(
        shingles.getUTF8String(i).toString)
      i += 1
    }
    val sig = new Array[Long](nPerm)
    var p = 0
    while (p < nPerm) {
      val a = 0x9E3779B97F4A7C15L * (2 * p + 1)
      val b = 0xC2B2AE3D27D4EB4FL * (p + 1)
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = java.lang.Long.rotateLeft(hs(j) * a + b, 17) * 0x165667B19E3779F9L
        if (v < m) m = v
        j += 1
      }
      sig(p) = m
      p += 1
    }
    new GenericArrayData(sig)
  }

  def minhash_sig(c: Column, nPerm: Int): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      MinHashSig(org.apache.spark.sql.GraftExprBridge.expression(c), nPerm))
}
