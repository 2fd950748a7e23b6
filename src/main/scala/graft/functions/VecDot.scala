package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two float-array columns — the hot kernel of
  * every similarity/dedup pairwise pass. The `zip_with`+`aggregate`
  * higher-order-function formulation evaluates an interpreted lambda
  * per element (~µs per 64-dim pair); this expression is one tight
  * primitive loop inside whole-stage codegen (~ns per pair), which is
  * the difference between hours and minutes on an all-pairs sweep at
  * corpus scale. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot needs two array<float> inputs, got $other")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecDot.dot($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Primitive-loop dot product; dimensions beyond the shorter array
    * are ignored (mirrors zip_with's null-pad then 0-coalesce shape for
    * equal-length corpora). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def vec_dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      VecDot(org.apache.spark.sql.GraftExprBridge.expression(a),
        org.apache.spark.sql.GraftExprBridge.expression(b)))
}
