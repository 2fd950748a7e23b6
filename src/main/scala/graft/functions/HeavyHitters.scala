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
    extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {
  require(k > 0 && capacity >= k, "need k > 0 and capacity >= k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def evictTo(b: mutable.HashMap[String, (Long, Long)], cap: Int): Unit =
    while (b.size > cap) {
      // deterministic victim: min count, ties on the item string
      val victim = b.minBy { case (item, (c, _)) => (c, item) }._1
      b.remove(victim)
      ()
    }

  override def update(b: mutable.HashMap[String, (Long, Long)],
                      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v == null) return b
    val key = v.asInstanceOf[UTF8String].toString
    b.get(key) match {
      case Some((c, e)) => b.update(key, (c + 1, e))
      case None if b.size < capacity => b.update(key, (1L, 0L))
      case None =>
        // replace the minimum counter: new key inherits its count as
        // the overestimate bound (the SpaceSaving step)
        val (victim, (mc, _)) = b.minBy { case (item, (c, _)) => (c, item) }
        b.remove(victim)
        b.update(key, (mc + 1, mc))
    }
    b
  }

  override def merge(b: mutable.HashMap[String, (Long, Long)],
                     o: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    o.foreach { case (key, (c, e)) =>
      b.get(key) match {
        case Some((c0, e0)) => b.update(key, (c0 + c, e0 + e))
        case None => b.update(key, (c, e))
      }
    }
    evictTo(b, capacity)
    b
  }

  override def eval(b: mutable.HashMap[String, (Long, Long)]): Any = {
    val top = b.toSeq
      .sortBy { case (item, (c, _)) => (-c, item) }
      .take(k)
      .map { case (item, (c, e)) =>
        InternalRow(UTF8String.fromString(item), c, e) }
    new GenericArrayData(top)
  }

  override def serialize(b: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (item, (c, e)) =>
      val bytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len); in.readFully(buf)
      val item = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      b.update(item, (in.readLong(), in.readLong()))
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
  def heavy_hitters(c: Column, k: Int, capacity: Int): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      HeavyHitters(org.apache.spark.sql.GraftExprBridge.expression(c),
        k, capacity).toAggregateExpression())
}
