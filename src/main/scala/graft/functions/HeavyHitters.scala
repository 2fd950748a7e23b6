package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `heavy_hitters(key, k, capacity)` — SpaceSaving (Metwally et al.,
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams", ICDT'05) as a mergeable Catalyst aggregate: the
  * bounded-memory hot-key detector that answers "should this key be
  * salted?" WITHOUT a full groupBy over 100 TB. Each partition keeps at
  * most `capacity` counters; merge sums counters and re-evicts to
  * capacity. Guarantee: any key with true count > N/capacity survives
  * every eviction, and each reported count c with error e brackets the
  * true count in [c − e, c] — the decision-grade signal for skew
  * handling, partitioning choices, and stop-shingle caps.
  *
  * This is the aggregation rung of the custom-operator ladder (scalar
  * codegen Expressions and a LogicalPlan+Strategy operator exist
  * elsewhere): a `TypedImperativeAggregate` with a serialized map
  * buffer, so Spark runs it partial → shuffle-of-summaries → final like
  * any built-in — the shuffle carries `capacity` counters per task, not
  * the key space. Output: array<struct<item, count, err>>, top-k by
  * (count desc, item), size ≤ k. The exact tail below the eviction
  * floor is merge-order dependent (inherent to SpaceSaving), so pin
  * semantics on clearly-hot keys, not the boundary.
  */
case class HeavyHitters(child: Expression, k: Int, capacity: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HeavyHitters.SpaceSavingBuffer] {
  import HeavyHitters.SpaceSavingBuffer
  require(k > 0 && capacity >= k, "need k > 0 and capacity >= k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer

  override def update(b: SpaceSavingBuffer,
                      input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v == null) return b
    b.inc(v.asInstanceOf[UTF8String].toString, capacity)
    b
  }

  override def merge(b: SpaceSavingBuffer,
                     o: SpaceSavingBuffer): SpaceSavingBuffer = {
    o.counts.foreach { case (key, (c, e)) => b.put(key, c, e) }
    b.evictTo(capacity)
    b
  }

  override def eval(b: SpaceSavingBuffer): Any = {
    val top = b.counts.toSeq
      .sortBy { case (item, (c, _)) => (-c, item) }
      .take(k)
      .map { case (item, (c, e)) =>
        InternalRow(UTF8String.fromString(item), c, e) }
    new GenericArrayData(top)
  }

  override def serialize(b: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (item, (c, e)) =>
      val bytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new SpaceSavingBuffer
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len); in.readFully(buf)
      val item = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      b.put(item, in.readLong(), in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HeavyHitters =
    copy(child = c.head)
  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {

  /** SpaceSaving stream summary with an O(log capacity) eviction path:
    * `counts` (item → (count, err)) plus a TreeSet ordered by
    * (count, item) so the minimum counter — the SpaceSaving victim — is
    * `order.head`, never a full-buffer scan. The naive minBy-per-evict
    * form was O(capacity) per incoming DISTINCT key, which on a
    * quasi-unique key stream (e.g. band buckets in the near-dup miner,
    * where almost every row past the first `capacity` evicts) turned a
    * sub-second detection pass into seconds. Victim choice is
    * bit-identical to the old scan: min count, ties on the item. */
  final class SpaceSavingBuffer {
    val counts = mutable.HashMap.empty[String, (Long, Long)]
    private val order = mutable.TreeSet.empty[(Long, String)]

    /** The streaming update: seen keys increment; new keys fill to
      * capacity, then replace the min counter, inheriting its count as
      * the overestimate bound (the SpaceSaving step). */
    def inc(key: String, capacity: Int): Unit =
      counts.get(key) match {
        case Some((c, e)) =>
          order.remove((c, key)); counts.update(key, (c + 1, e))
          order.add((c + 1, key)); ()
        case None if counts.size < capacity =>
          counts.update(key, (1L, 0L)); order.add((1L, key)); ()
        case None =>
          val min @ (mc, victim) = order.head
          order.remove(min); counts.remove(victim)
          counts.update(key, (mc + 1, mc)); order.add((mc + 1, key)); ()
      }

    /** Merge-path upsert: counters and error bounds sum. */
    def put(key: String, c: Long, e: Long): Unit =
      counts.get(key) match {
        case Some((c0, e0)) =>
          order.remove((c0, key)); counts.update(key, (c0 + c, e0 + e))
          order.add((c0 + c, key)); ()
        case None =>
          counts.update(key, (c, e)); order.add((c, key)); ()
      }

    def evictTo(cap: Int): Unit =
      while (counts.size > cap) {
        val min @ (_, victim) = order.head
        order.remove(min); counts.remove(victim); ()
      }
  }

  def heavy_hitters(c: Column, k: Int, capacity: Int): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      HeavyHitters(org.apache.spark.sql.GraftExprBridge.expression(c),
        k, capacity).toAggregateExpression())
}
