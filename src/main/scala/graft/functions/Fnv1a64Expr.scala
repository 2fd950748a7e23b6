package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit over a string column as a native codegen Expression —
  * the shared scan-side hash every signature kernel already folds over
  * ([[SimHash64]], [[MinHashSig]], `doc_fingerprint`), exposed directly
  * so feature-hashing operators (DSIR bucket features, BM25 postings
  * buckets) stay inside whole-stage codegen instead of re-deriving the
  * hash behind an opaque UDF. The DuckDB oracle replays the identical
  * byte fold in HUGEINT (`SparkEntry.fnvSql`). */
case class Fnv1a64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv1a64 expects STRING, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    graft.operators.TextAnalysis.fnv1a64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.TextAnalysis.fnv1a64($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64Expr =
    copy(child = newChild)
}

object Fnv1a64Expr {
  def fnv1a64(c: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      Fnv1a64Expr(org.apache.spark.sql.GraftExprBridge.expression(c)))
}
