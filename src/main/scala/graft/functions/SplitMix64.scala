package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** SplitMix64 finalizer as a native codegen expression — the engine's
  * deterministic row-hash for reproducible sampling (and the same hash
  * family Similarity.hyperplanes seeds its planes from).
  *
  * A Catalyst Expression rather than SQL arithmetic because the mix
  * REQUIRES 64-bit wraparound multiplication, which ANSI-mode Spark SQL
  * (the 4.x default) rejects as overflow; Java long ops wrap by
  * definition and stay inside whole-stage codegen. The identical
  * function is reproducible in the DuckDB oracle via HUGEINT mod-2^64
  * arithmetic, so sampling decisions are hash-checkable end to end.
  */
case class SplitMix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    SplitMix64.mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.SplitMix64.mix($c);")

  override protected def withNewChildInternal(newChild: Expression): SplitMix64 =
    copy(child = newChild)
}

object SplitMix64 {
  /** Fortuna/SplitMix64 finalizer (public-domain constants). */
  def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def splitmix64(c: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      SplitMix64(org.apache.spark.sql.GraftExprBridge.expression(c)))
}
