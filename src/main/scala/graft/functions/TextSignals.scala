package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scan-side text signals as native codegen expressions — language-ID
  * and document fingerprinting were the last per-doc string kernels
  * running as Scala UDFs on the documents scan (the [[SimHash64]]
  * conversion pattern). Kernels live in
  * [[graft.operators.TextAnalysis]]; these wrappers keep the
  * projection inside whole-stage codegen and visible to pruning. */
case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"LangId expects STRING, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.operators.TextAnalysis.detectLanguage(
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = UTF8String.fromString(
         |  graft.operators.TextAnalysis.detectLanguage($c.toString()));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

case class DocFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"DocFingerprint expects STRING, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    graft.operators.TextAnalysis.fingerprint(
      input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.TextAnalysis.fingerprint($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): DocFingerprint =
    copy(child = newChild)
}

object TextSignals {
  def lang_id(c: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      LangId(org.apache.spark.sql.GraftExprBridge.expression(c)))

  def doc_fingerprint(c: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      DocFingerprint(org.apache.spark.sql.GraftExprBridge.expression(c)))
}
