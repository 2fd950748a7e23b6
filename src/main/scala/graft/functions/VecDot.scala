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

/** Dot product of a float-array column with a CONSTANT query vector
  * (ANN search / centroid assignment): the constant rides the codegen
  * references array instead of being re-evaluated as an array literal
  * per row. Fold order matches `aggregate(zip_with(v, q, _*_), 0, +)`
  * left-to-right, so results are bit-identical to the lambda form. */
case class VecDotConst(child: Expression, q: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  @transient private lazy val qa: Array[Double] = q.toArray

  override def nullSafeEval(a: Any): Any =
    VecDotConst.dot(a.asInstanceOf[ArrayData], qa)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecDotQ", qa, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecDotConst.dot($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): VecDotConst =
    copy(child = newChild)
}

object VecDotConst {
  def dot(a: ArrayData, q: Array[Double]): Double = {
    val n = math.min(a.numElements(), q.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * q(i); i += 1 }
    s
  }

  def vec_dot_q(a: Column, q: Seq[Double]): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      VecDotConst(org.apache.spark.sql.GraftExprBridge.expression(a), q))
}

/** Squared euclidean distance of a float-array column to a CONSTANT
  * centroid — same left-to-right `Σ(x−c)²` fold order as the
  * zip_with/aggregate form (bit-identical, so IVF cell assignment is
  * unchanged). */
case class VecSqDistConst(child: Expression, c: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  @transient private lazy val ca: Array[Double] = c.toArray

  override def nullSafeEval(a: Any): Any =
    VecSqDistConst.sqDist(a.asInstanceOf[ArrayData], ca)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecSqC", ca, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecSqDistConst.sqDist($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): VecSqDistConst =
    copy(child = newChild)
}

object VecSqDistConst {
  def sqDist(a: ArrayData, c: Array[Double]): Double = {
    val n = math.min(a.numElements(), c.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - c(i)
      s += d * d
      i += 1
    }
    s
  }

  def vec_sqdist_q(a: Column, c: Seq[Double]): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      VecSqDistConst(org.apache.spark.sql.GraftExprBridge.expression(a), c))
}
