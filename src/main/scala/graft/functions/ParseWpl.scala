package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.wpl._

/** `parse_wpl(line)` as a Catalyst expression (SURVEY.md §4's optional
  * nicety): the compiled rule set lives inside the expression, so the
  * parse is a regular projection — usable from SQL, composable with
  * filters that Catalyst pushes around it, no RDD hop.
  *
  * Returns struct<rule_key, status, fields: array<struct<name,dtype,sval>>,
  * residue, miss_depth, best_wpl> — the same shape as WplEngine rows.
  *
  * Codegen: the expression participates in whole-stage codegen by
  * shipping itself as a reference object (doGenCode below); the
  * per-thread MultiParser is cached so the adaptive rule ordering still
  * amortizes. */
case class ParseWpl(child: Expression, wplSource: String,
    enricher: graft.wpl.Enricher = graft.wpl.Enricher.empty) extends UnaryExpression {

  override def dataType: DataType = ParseWpl.outType
  // UnaryExpression's default eval is null-intolerant: a null input line
  // yields a null struct, so nullability must follow the child.
  override def nullable: Boolean = child.nullable

  @transient private lazy val parserCache =
    new ThreadLocal[Runtime.MultiParser] {
      override def initialValue(): Runtime.MultiParser = Runtime.compile(wplSource, enricher)
    }

  /** Called from both interpreted eval and generated code. */
  def evalLine(u: UTF8String): InternalRow =
    ParseWpl.toRow(parserCache.get().parseLine(u.toString))

  override def nullSafeEval(input: Any): Any =
    evalLine(input.asInstanceOf[UTF8String])

  /** Real codegen (not CodegenFallback — that would knock the whole
    * projection out of whole-stage codegen): the expression ships itself
    * as a reference object and generated code calls evalLine. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("parseWpl", this, classOf[ParseWpl].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalLine($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseWpl =
    copy(child = newChild)
}

object ParseWpl {
  val fieldType: StructType = StructType(Seq(
    StructField("name", StringType), StructField("dtype", StringType),
    StructField("sval", StringType)))
  val outType: StructType = StructType(Seq(
    StructField("rule_key", StringType),
    StructField("status", StringType),
    StructField("fields", ArrayType(fieldType)),
    StructField("residue", StringType),
    StructField("miss_depth", IntegerType),
    StructField("best_wpl", StringType)))

  private def u(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)

  private def fieldsArray(fs: Vector[WField]): ArrayData =
    new GenericArrayData(fs.map(f =>
      InternalRow(u(f.name), u(f.value.dtype), u(f.value.sval))).toArray[Any])

  def toRow(o: ParseOutcome): InternalRow = o match {
    case PSuccess(k, fs) =>
      InternalRow(u(k), u("success"), fieldsArray(fs), null, 0, null)
    case PPartial(k, fs, res) =>
      InternalRow(u(k), u("partial"), fieldsArray(fs), u(res), 0, null)
    case PMiss(best, depth) =>
      InternalRow(null, u("miss"), new GenericArrayData(Array.empty[Any]), null, depth, u(best))
    case PBlank =>
      InternalRow(null, u("blank"), new GenericArrayData(Array.empty[Any]), null, 0, null)
  }

  def parse_wpl(c: Column, wplSource: String,
                enricher: graft.wpl.Enricher = graft.wpl.Enricher.empty): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      ParseWpl(org.apache.spark.sql.GraftExprBridge.expression(c), wplSource, enricher))
}
