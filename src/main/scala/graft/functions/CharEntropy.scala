package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (log₂, per-codepoint) of a string — the cheap
  * compression-ratio proxy quality signal: gibberish/binary spill has
  * high char entropy, template/boilerplate repetition has low entropy,
  * natural text sits in a stable band. Used as a map-only scan-side
  * filter column, same posture as the quality classifier.
  *
  * A native codegen Expression rather than an explode+groupBy: the
  * histogram is per-row bounded (≤ distinct codepoints in one doc), so
  * shuffling (doc, char) rows corpus-wide just to count within a row
  * would be a self-inflicted exchange — at 100 TB the difference is a
  * full shuffle of the corpus's characters vs zero shuffles.
  *
  * The sum folds over codepoints in ascending order so the result is
  * bit-deterministic across partitionings; the DuckDB oracle's
  * `entropy()` aggregate may sum in another order, so comparisons
  * round to 4 decimals (values are O(log₂ alphabet), far from the
  * rounding boundary).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"CharEntropy expects STRING, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy.entropy($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  private val LOG2 = math.log(2.0)

  /** −Σ p·log₂p over the codepoint histogram; empty string → 0.0.
    * Deterministic fold order (ascending codepoint). */
  def entropy(s: String): Double = {
    if (s.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Integer]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().doubleValue() / n
      h -= p * (math.log(p) / LOG2)
    }
    h
  }

  def char_entropy(c: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      CharEntropy(org.apache.spark.sql.GraftExprBridge.expression(c)))
}
