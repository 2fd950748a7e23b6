package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.knowdb.RangeLookup.Range

/** Whole-operator form of the interval lookup (SURVEY.md §7.3 ladder
  * step (c)): a custom LogicalPlan + SparkStrategy + SparkPlan that adds
  * `outName` by binary-searching a broadcast sorted range array with the
  * child's `key` expression.
  *
  * Equivalent to the UDF in `knowdb/RangeLookup` but planned as a real
  * operator: it reports its output attributes to the analyzer (so columns
  * resolve through it and pruning works above it) and executes as a
  * narrow mapPartitions over InternalRows — no shuffle, no Row
  * conversion. Registered via `GraftExtensions` /
  * `RangeLookupJoin.lookup`. */
final case class RangeLookupJoin(
    child: LogicalPlan,
    key: Expression,
    ranges: Array[Range],
    outAttr: AttributeReference) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): RangeLookupJoin =
    copy(child = newChild)
}

final case class RangeLookupExec(
    child: SparkPlan,
    key: Expression,
    ranges: Array[Range],
    outAttr: Attribute) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)

  override protected def doExecute(): RDD[InternalRow] = {
    val sorted = ranges // task-serialized with the closure (small dim)
    val boundKey = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(key, child.output)
    child.execute().mapPartitions { it =>
      val toUnsafe = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(output.map(_.dataType).toArray)
      it.map { row =>
        val k = boundKey.eval(row)
        val v: UTF8String =
          if (k == null) null
          else {
            val hit = graft.knowdb.RangeLookup.search(sorted, k.asInstanceOf[Long])
            if (hit == null) null else UTF8String.fromString(hit)
          }
        val out = new GenericInternalRow(row.numFields + 1)
        var i = 0
        while (i < row.numFields) {
          out.update(i, row.get(i, child.output(i).dataType))
          i += 1
        }
        out.update(row.numFields, v)
        toUnsafe(out)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): RangeLookupExec =
    copy(child = newChild)
}

object RangeLookupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  import org.apache.spark.sql.execution.SparkPlan
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeLookupJoin(child, key, ranges, outAttr) =>
      RangeLookupExec(planLater(child), key, ranges, outAttr) :: Nil
    case _ => Nil
  }
}
