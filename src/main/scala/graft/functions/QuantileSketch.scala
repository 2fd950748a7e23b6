package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `quantile_sketch(value, qs, capacity)` — a mergeable bounded-memory
  * quantile summary in the KLL/compactor family (Karnin–Lang–Liberty,
  * FOCS'16): the "what's the p99 of this column?" answer WITHOUT a
  * global sort at 100 TB. Each partition holds at most `capacity`
  * weighted samples; overflow compacts the sorted buffer by collapsing
  * adjacent pairs into their lower value with summed weight — a
  * DETERMINISTIC single-level compactor (the randomized-parity choice
  * of the paper is traded for replayability, at a one-sided rank bias
  * of at most one pair per compaction level; cross-partition merge
  * ORDER still varies with scheduling, so compacted results are
  * run-dependent — the same inherent caveat as [[HeavyHitters]]'
  * eviction tail). Merge concatenates and re-compacts, so partial →
  * shuffle-of-summaries → final carries `capacity` samples per task,
  * never the data.
  *
  * Exactness contract (the oracle-able regime, like [[HeavyHitters]]):
  * while a group's row count stays ≤ capacity no compaction ever fires,
  * every weight is 1, and the reported quantile is EXACTLY the sorted
  * element at rank `floor(q·(n−1))` — the nearest-rank-lower order
  * statistic an engine-independent oracle can replay. Beyond capacity
  * the summary degrades gracefully (rank error ∝ compactions/capacity).
  *
  * Output: array<struct<q, value>> in the order of the requested `qs`;
  * empty input → empty array.
  */
case class QuantileSketch(child: Expression, qs: Seq[Double], capacity: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {
  require(capacity >= 2 && qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    "need capacity >= 2 and quantiles in [0,1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  /** Collapse sorted adjacent pairs — keeping the LOWER member of even
    * pairs and the UPPER member of odd pairs, weights summed — until the
    * buffer fits. The alternating parity cancels the rank bias a
    * fixed-side collapse would accumulate across compaction rounds,
    * while staying fully deterministic for a given merge order. */
  private def compactTo(b: ArrayBuffer[(Double, Long)], cap: Int): ArrayBuffer[(Double, Long)] = {
    var cur = b
    while (cur.size > cap) {
      val sorted = cur.sortBy(identity)
      val next = new ArrayBuffer[(Double, Long)](sorted.size / 2 + 1)
      var i = 0
      var pair = 0
      while (i < sorted.size) {
        if (i + 1 < sorted.size) {
          val keep = if (pair % 2 == 0) sorted(i)._1 else sorted(i + 1)._1
          next += ((keep, sorted(i)._2 + sorted(i + 1)._2))
          pair += 1
        } else next += sorted(i)
        i += 2
      }
      cur = next
    }
    cur
  }

  override def update(b: ArrayBuffer[(Double, Long)],
                      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = child.eval(input)
    if (v == null) return b
    val d = v match {
      case x: Double => x
      case x: Float => x.toDouble
      case x: Long => x.toDouble
      case x: Int => x.toDouble
      case x: Short => x.toDouble
      case x: Byte => x.toDouble
      case x: org.apache.spark.sql.types.Decimal => x.toDouble
      case other => other.toString.toDouble
    }
    b += ((d, 1L))
    if (b.size > capacity) compactTo(b, capacity) else b
  }

  override def merge(b: ArrayBuffer[(Double, Long)],
                     o: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b ++= o
    if (b.size > capacity) compactTo(b, capacity) else b
  }

  override def eval(b: ArrayBuffer[(Double, Long)]): Any = {
    if (b.isEmpty) return new GenericArrayData(Array.empty[Any])
    val sorted = b.sortBy(identity)
    val total = sorted.iterator.map(_._2).sum
    val out = qs.map { q =>
      // nearest-rank-lower: the element whose cumulative weight first
      // exceeds floor(q·(W−1))
      val target = math.floor(q * (total - 1)).toLong
      var cum = 0L
      var i = 0
      var ans = sorted.last._1
      var found = false
      while (i < sorted.size && !found) {
        cum += sorted(i)._2
        if (cum > target) { ans = sorted(i)._1; found = true }
        i += 1
      }
      InternalRow(q, ans)
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def serialize(b: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (v, w) => out.writeDouble(v); out.writeLong(w) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { b += ((in.readDouble(), in.readLong())); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "quantile_sketch"
}

object QuantileSketch {
  import org.apache.spark.sql.Column

  def quantile_sketch(c: Column, qs: Seq[Double], capacity: Int): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      QuantileSketch(org.apache.spark.sql.GraftExprBridge.expression(c),
        qs, capacity).toAggregateExpression())
}
