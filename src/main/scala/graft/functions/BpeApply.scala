package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_apply(text)` — the APPLICATION step of BPE tokenizer induction,
  * closing the loop [[graft.operators.TextAnalysis.topBigramMerges]]
  * opens: given a learned merge table (rank-ordered pairs), greedily
  * re-encode each document — repeatedly find the highest-rank (lowest
  * index) adjacent pair present and fuse every leftmost-non-overlapping
  * occurrence, exactly the reference BPE encode loop — and return the
  * final symbol sequence (fused symbols join with "_").
  *
  * A native Expression, not a UDF: the merge table is a plan-time
  * constant baked into the expression (the production path for a
  * learned tokenizer — the table is the artifact, the corpus is the
  * stream), evaluation is per-row bounded (O(len × merges)), and the
  * projection stays visible to column pruning. No SQL-engine oracle:
  * the iterative innermost loop is not SQL-expressible, so semantics
  * are pinned by R8cOpsSpec properties (merge-order priority, leftmost
  * non-overlap, fixpoint termination, count conservation) instead of
  * the DuckDB gate.
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_apply needs a string input, got $other")
    }
  }

  @transient private lazy val table: BpeApply.Table = BpeApply.Table(merges)

  override def nullSafeEval(input: Any): Any =
    BpeApply.encode(input.asInstanceOf[UTF8String], table)

  // codegen references the expression instance (merge table included)
  // via the ctx object pool — the loop itself runs in one JVM call, so
  // this is a single virtual dispatch per row, not an interpreter hop
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeApply.Table].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BpeApply.encode($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}

object BpeApply {

  /** Rank lookup keyed on the (left, right) symbol pair. */
  case class Table(merges: Seq[(String, String)]) extends Serializable {
    @transient lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  def encode(s: UTF8String, table: Table): ArrayData = {
    var cur: Array[String] = s.toString.trim.split("\\s+").filter(_.nonEmpty)
    val ranks = table.rank
    var done = cur.length < 2
    while (!done) {
      // highest-priority pair present this round
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < cur.length - 1) {
        val r = ranks.getOrElse((cur(i), cur(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0 || best == Int.MaxValue) done = true
      else {
        val a = cur(bi); val b = cur(bi + 1)
        val out = new scala.collection.mutable.ArrayBuffer[String](cur.length)
        var j = 0
        while (j < cur.length) {
          if (j < cur.length - 1 && cur(j) == a && cur(j + 1) == b) {
            out += a + "_" + b; j += 2
          } else { out += cur(j); j += 1 }
        }
        cur = out.toArray
        done = cur.length < 2
      }
    }
    new GenericArrayData(cur.map(UTF8String.fromString(_)))
  }

  def bpe_apply(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      BpeApply(org.apache.spark.sql.GraftExprBridge.expression(text), merges))
}
