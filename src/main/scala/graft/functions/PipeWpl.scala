package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.engine.Pipeline
import graft.oml.KnowDb

/** The full WPL-parse → OML-transform pipeline as ONE codegen-participating
  * Catalyst expression (same ABI as [[ParseWpl]]), replacing the
  * struct-returning Scala UDF that boxed every row through the
  * ScalaUDF encoder path (reference dataflow: src/sinks/routing/dispatcher/
  * oml.rs routed per record in one pass — this is its Spark analogue).
  *
  * Returns struct<rule_key, oml_model, status, fields: array<struct<name,
  * dtype, sval>>, residue, err_hint> — identical schema to the old UDF's
  * PipeOut case-class encoding, so all channel consumers are unchanged.
  *
  * The per-thread [[Pipeline.PipelineFn]] keeps the adaptive WPL rule
  * reordering and lazily-compiled OML evaluators amortized per executor
  * thread; KnowDb rides along as a broadcast. */
case class PipeWpl(child: Expression, wplSource: String, omlSources: Seq[String],
                   sourceTags: Map[String, String], bcDb: Broadcast[KnowDb],
                   enricher: graft.wpl.Enricher = graft.wpl.Enricher.empty,
                   semanticEnabled: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = PipeWpl.outType
  override def nullable: Boolean = child.nullable

  @transient private lazy val fnCache =
    new ThreadLocal[Pipeline.PipelineFn] {
      override def initialValue(): Pipeline.PipelineFn =
        new Pipeline.PipelineFn(wplSource, omlSources, bcDb, sourceTags, enricher,
          semanticEnabled)
    }

  /** Called from both interpreted eval and generated code. */
  def evalLine(u: UTF8String): InternalRow =
    PipeWpl.toRow(fnCache.get()(u.toString))

  override def nullSafeEval(input: Any): Any =
    evalLine(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pipeWpl", this, classOf[PipeWpl].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalLine($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PipeWpl =
    copy(child = newChild)
}

object PipeWpl {
  val outType: StructType = StructType(Seq(
    StructField("rule_key", StringType),
    StructField("oml_model", StringType),
    StructField("status", StringType),
    StructField("fields", ArrayType(ParseWpl.fieldType)),
    StructField("residue", StringType),
    StructField("err_hint", StringType)))

  private def u(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)

  def toRow(o: Pipeline.PipeOut): InternalRow = InternalRow(
    u(o.rule_key), u(o.oml_model), u(o.status),
    new GenericArrayData(o.fields.map(f =>
      InternalRow(u(f.name), u(f.dtype), u(f.sval))).toArray[Any]),
    u(o.residue), u(o.err_hint))
}
