package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `cms_sketch(key, d, wExp)` — Count–Min sketch (Cormode & Muthukrishnan,
  * "An Improved Data Stream Summary: The Count-Min Sketch and its
  * Applications", J. Algorithms 2005) as a mergeable Catalyst aggregate:
  * the point-frequency companion to the SpaceSaving top-k
  * ([[HeavyHitters]]). SpaceSaving answers "which keys are hot";
  * CMS answers "how often does THIS key occur" for any probe key, from
  * d·w counters regardless of the key space — the per-key frequency
  * primitive behind stop-shingle caps, per-key rate limits, and
  * join-cardinality estimates at 100 TB.
  *
  * Fourth mergeable sketch in the engine (SpaceSaving / KLL-style
  * quantiles / HLL), and the only one whose merge is EXACTLY
  * elementwise addition — partial sketches sum counter-for-counter, so
  * the final table is bit-identical under any partitioning or merge
  * order even in the approximate regime (the others guarantee that only
  * within capacity). That makes every estimate engine-replayable: the
  * DuckDB oracle rebuilds the identical table from per-key counts.
  *
  * Hashing: one 64-bit draw h = splitmix64(fnv1a64(key)) per key; row r
  * reads bit field (h >>> r·wExp) & (w−1) — disjoint bit fields of one
  * high-quality mix, the same j/w field-split HLL uses. Requires
  * d·wExp ≤ 64. Estimate(key) = min over rows of the addressed counter
  * — always ≥ the true count; over-estimate ≤ εN with ε = e/w at
  * confidence 1 − e^−d. Probe-side math needs no custom code: the
  * counter table broadcasts as one array row and `element_at` +
  * [[SplitMix64]]/[[Fnv1a64Expr]] compute the addresses in-plan.
  *
  * Output: array<long> of length d·w, row-major (row r at offset r·w).
  */
case class CmsSketch(child: Expression, d: Int, wExp: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(d > 0 && wExp > 0 && d * wExp <= 64,
    s"need d > 0, wExp > 0, d*wExp <= 64 (got d=$d wExp=$wExp)")

  private val w: Int = 1 << wExp

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects STRING key, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return b
    val h = SplitMix64.mix(
      graft.operators.TextAnalysis.fnv1a64(v.asInstanceOf[UTF8String].toString))
    var r = 0
    while (r < d) {
      b(r * w + (((h >>> (r * wExp)) & (w - 1)).toInt)) += 1L
      r += 1
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(b.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < b.length) { out.writeLong(b(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new Array[Long](d * w)
    var i = 0
    while (i < b.length) { b(i) = in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsSketch =
    copy(child = c.head)
  override def prettyName: String = "cms_sketch"
}

object CmsSketch {
  def cms_sketch(c: Column, d: Int, wExp: Int): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      CmsSketch(org.apache.spark.sql.GraftExprBridge.expression(c),
        d, wExp).toAggregateExpression())

  /** Join-cardinality estimate from two counter tables over the same
    * (d, wExp) family: |A ⋈ B on key| = Σ_key cntA·cntB ≈ min over
    * rows r of Σ_c A[r][c]·B[r][c] (Cormode & Muthukrishnan §4.2, the
    * CM inner-product estimator — one-sided like the point estimate).
    * Estimates the join SIZE without executing the join: the
    * broadcast-vs-salt decision input at 100 TB, from two 24 KB
    * sketches. Exact integer math ⇒ engine-replayable bit-for-bit. */
  def cmsInnerProduct(tableA: Column, tableB: Column, d: Int, wExp: Int): Column = {
    import org.apache.spark.sql.functions._
    val w = 1 << wExp
    val rows = (0 until d).map { r =>
      aggregate(
        zip_with(slice(tableA, r * w + 1, w), slice(tableB, r * w + 1, w),
          (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
    }
    least(rows: _*)
  }

  /** In-plan point estimate: min over the d rows of the broadcast
    * counter table addressed by the probe key's bit fields — plain
    * Column math over `element_at`, no custom probe kernel. */
  def cmsEstimate(table: Column, key: Column, d: Int, wExp: Int): Column = {
    import org.apache.spark.sql.functions._
    val w = 1 << wExp
    val h = SplitMix64.splitmix64(Fnv1a64Expr.fnv1a64(key))
    val reads = (0 until d).map { r =>
      element_at(table,
        (shiftrightunsigned(h, r * wExp).bitwiseAND(lit((w - 1).toLong))
          + lit(r.toLong * w) + lit(1L)).cast("int"))
    }
    least(reads: _*)
  }
}
