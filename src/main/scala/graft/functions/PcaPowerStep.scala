package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `pca_power_step(xh, v)` — ONE quantized power-iteration round over a
  * centered (id, x̂[D]) relation, as a single mergeable aggregate:
  * per row the projection dq = Σ_d floor(x̂_d·v_d·1e9 + 0.5) (exact
  * long — D-bounded), then per dim the back-projection term
  * floor(x̂_d·(dq/1e9)·1e9 + 0.5) accumulated into an unbounded
  * integer (the decimal(38,0) headroom contract of the SQL oracle,
  * held as long with BigInteger escalation on overflow).
  *
  * Why an imperative aggregate (r13): the Column formulation of one
  * round is a D-column wide aggregate over a higher-order-function
  * projection — ~65 aggregate expressions plus interpreted lambdas
  * whose ANALYSIS + PLANNING alone cost ~100 ms per round at D = 64,
  * dominating the whole query once the shuffles were removed (the
  * per-round data work is milliseconds). This expression shrinks the
  * round's plan to one aggregate node with a tight primitive loop —
  * same integers, same floor/cast ops, in the same order.
  *
  * Determinism: every accumulated term is an exact integer; integer
  * addition is associative, so the result is bit-identical under any
  * partitioning or merge order — the same argument as the exploded
  * layout's decimal sums. Output: array<decimal(38,0)> of length D
  * (dims with no contributing rows read 0 — the driver treated the
  * old NULL sums as 0 identically). Null elements and rows shorter
  * than D contribute nothing, matching the null-skipping sums.
  */
case class PcaPowerStep(child: Expression, v: Seq[Double],
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PcaPowerStep.Buf] {
  require(v.nonEmpty, "pca_power_step: empty vector")
  private val dims = v.length
  @transient private lazy val vArr = v.toArray

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DecimalType(38, 0), containsNull = false)

  override def createAggregationBuffer(): PcaPowerStep.Buf =
    new PcaPowerStep.Buf(new Array[Long](dims),
      new Array[BigInteger](dims))

  override def update(b: PcaPowerStep.Buf, input: InternalRow): PcaPowerStep.Buf = {
    val a = child.eval(input)
    if (a == null) return b
    val arr = a.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dims)
    // row-local projection: Σ floor(x̂_d · v_d · 1e9 + 0.5), nulls skipped
    var dq = 0L
    var d = 0
    while (d < n) {
      if (!arr.isNullAt(d)) {
        dq += math.floor(arr.getDouble(d) * vArr(d) * 1e9 + 0.5).toLong
      }
      d += 1
    }
    val dqd = dq.toDouble / 1e9
    d = 0
    while (d < n) {
      if (!arr.isNullAt(d)) {
        val term = math.floor(arr.getDouble(d) * dqd * 1e9 + 0.5).toLong
        b.add(d, term)
      }
      d += 1
    }
    b
  }

  override def merge(b: PcaPowerStep.Buf, o: PcaPowerStep.Buf): PcaPowerStep.Buf = {
    var d = 0
    while (d < dims) {
      b.add(d, o.acc(d))
      if (o.big(d) != null) b.addBig(d, o.big(d))
      d += 1
    }
    b
  }

  override def eval(b: PcaPowerStep.Buf): Any = {
    val out = new Array[Any](dims)
    var d = 0
    while (d < dims) {
      var s = BigInteger.valueOf(b.acc(d))
      if (b.big(d) != null) s = s.add(b.big(d))
      out(d) = Decimal(new java.math.BigDecimal(s), 38, 0)
      d += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: PcaPowerStep.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(dims)
    var d = 0
    while (d < dims) {
      o.writeLong(b.acc(d))
      val bytes = if (b.big(d) == null) Array.emptyByteArray
                  else b.big(d).toByteArray
      o.writeInt(bytes.length)
      o.write(bytes)
      d += 1
    }
    o.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PcaPowerStep.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new PcaPowerStep.Buf(new Array[Long](n), new Array[BigInteger](n))
    var d = 0
    while (d < n) {
      buf.acc(d) = in.readLong()
      val len = in.readInt()
      if (len > 0) {
        val bb = new Array[Byte](len)
        in.readFully(bb)
        buf.big(d) = new BigInteger(bb)
      }
      d += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): PcaPowerStep =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PcaPowerStep =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): PcaPowerStep =
    copy(child = c.head)
}

object PcaPowerStep {
  import org.apache.spark.sql.Column

  /** Per-dim long accumulators with BigInteger escalation — exact
    * integer sums with decimal(38,0)-class headroom, cheap in the
    * common (long-ranged) case. */
  final class Buf(val acc: Array[Long], val big: Array[BigInteger]) {
    def add(d: Int, term: Long): Unit = {
      val s = acc(d) + term
      // overflow check (Math.addExact without the throw/catch): spill
      // the running long into the BigInteger lane and restart
      if (((acc(d) ^ s) & (term ^ s)) < 0) {
        addBig(d, BigInteger.valueOf(acc(d)))
        acc(d) = term
      } else acc(d) = s
    }
    def addBig(d: Int, x: BigInteger): Unit =
      big(d) = if (big(d) == null) x else big(d).add(x)
  }

  def pca_power_step(xh: Column, v: Seq[Double]): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      PcaPowerStep(org.apache.spark.sql.GraftExprBridge.expression(xh), v)
        .toAggregateExpression())
}
