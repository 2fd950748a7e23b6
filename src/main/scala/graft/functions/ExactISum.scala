package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `exact_isum(term)` — exact integer sum of an INTEGER-VALUED double
  * column (a `floor(x·scale + 0.5)` quantization term), emitted as
  * decimal(38,0).
  *
  * Drop-in replacement (r13, guide step 2 "per-task work") for the
  * `sum(cast(floor(...) as decimal(38,0)))` idiom on hot aggregation
  * paths: the decimal fold allocates a BigDecimal per ROW per sum
  * (measured ~60% of the ALS half-step task time), where this
  * aggregate adds a long per row — with BigInteger ESCALATION on
  * overflow, so the decimal(38,0) headroom contract is intact at any
  * corpus size (the sum is exact integer arithmetic either way, and
  * integer addition is associative, so the result is bit-identical to
  * the decimal fold under any partitioning or merge order). Each term
  * must be integer-valued and |term| < 2^63 (floor-quantized doubles
  * are exact below 2^53 — the quantizers' own documented envelope);
  * terms beyond ±2^62 would still be representable by the decimal
  * fold, so callers keep quantizer scales inside the long range, which
  * every 1e9/1e12/1e15 contract in this repo already does.
  *
  * Nulls are skipped; an all-null/empty group yields NULL — both
  * exactly as `sum` does.
  */
case class ExactISum(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ExactISum.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 0)

  override def createAggregationBuffer(): ExactISum.Buf = new ExactISum.Buf

  // Spark's floor(double) is already LongType; accept the integer-valued
  // double/int forms too so callers pass their quantizer term verbatim
  @transient private lazy val toLong: Any => Long = child.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case DoubleType => v => v.asInstanceOf[Double].toLong
    case other => throw new IllegalArgumentException(
      s"exact_isum needs an integer-valued numeric column, got $other")
  }

  override def update(b: ExactISum.Buf, input: InternalRow): ExactISum.Buf = {
    val v = child.eval(input)
    if (v != null) b.add(toLong(v))
    b
  }

  override def merge(b: ExactISum.Buf, o: ExactISum.Buf): ExactISum.Buf = {
    if (o.seen) {
      b.add(o.acc)
      if (o.big != null) b.addBig(o.big)
    }
    b
  }

  override def eval(b: ExactISum.Buf): Any =
    if (!b.seen) null
    else {
      var s = BigInteger.valueOf(b.acc)
      if (b.big != null) s = s.add(b.big)
      Decimal(new java.math.BigDecimal(s), 38, 0)
    }

  override def serialize(b: ExactISum.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeBoolean(b.seen)
    o.writeLong(b.acc)
    val bytes = if (b.big == null) Array.emptyByteArray else b.big.toByteArray
    o.writeInt(bytes.length)
    o.write(bytes)
    o.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ExactISum.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new ExactISum.Buf
    b.seen = in.readBoolean()
    b.acc = in.readLong()
    val len = in.readInt()
    if (len > 0) {
      val bb = new Array[Byte](len)
      in.readFully(bb)
      b.big = new BigInteger(bb)
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ExactISum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ExactISum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ExactISum =
    copy(child = c.head)
}

object ExactISum {
  import org.apache.spark.sql.Column

  /** Long accumulator with BigInteger escalation (see class doc). */
  final class Buf {
    var seen: Boolean = false
    var acc: Long = 0L
    var big: BigInteger = null
    def add(term: Long): Unit = {
      seen = true
      val s = acc + term
      if (((acc ^ s) & (term ^ s)) < 0) { // overflow: spill and restart
        addBig(BigInteger.valueOf(acc))
        acc = term
      } else acc = s
    }
    def addBig(x: BigInteger): Unit =
      big = if (big == null) x else big.add(x)
  }

  def exact_isum(term: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      ExactISum(org.apache.spark.sql.GraftExprBridge.expression(term))
        .toAggregateExpression())
}
