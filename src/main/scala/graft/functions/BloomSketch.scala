package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `bloom_sketch(hash64, mExp, k)` — Bloom filter (Bloom, CACM 1970)
  * over precomputed 64-bit keys as a mergeable Catalyst aggregate: the
  * MEMBERSHIP companion to the frequency sketches (SpaceSaving "which
  * keys are hot", CMS "how often this key", HLL "how many keys" — this
  * one answers "have we seen THIS key at all"). m = 2^mExp bits packed
  * into m/64 longs; k probe positions per key via Kirsch–Mitzenmacher
  * double hashing (h1 + i·h2, "Less Hashing, Same Performance",
  * ESA 2006) over one SplitMix64 draw of the input hash.
  *
  * Like CMS — and unlike the capacity-bounded sketches — the merge is
  * EXACT: partial filters OR together bit-for-bit, so the final bit
  * array is identical under any partitioning or merge order, and an
  * `appendTo` fold equals a from-scratch rebuild. False-positive rate
  * ≈ (1 − e^{−kn/m})^k; no false negatives ever, which is what makes
  * the filter a sound PRE-FILTER for exact membership: a "no" is
  * final (map-side, no shuffle), only "maybe" rows pay the confirm
  * join against the on-disk hash set.
  *
  * The child is the LONG hash (e.g. [[Fnv1a64Expr]] of the key), not
  * the key itself, so the probe side shares one scan-side hash with
  * the confirm join and the bit positions replay exactly in any
  * engine with 64-bit integer math.
  */
case class BloomSketch(child: Expression, mExp: Int, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(mExp >= 6 && mExp <= 30, s"need 6 <= mExp <= 30 (got $mExp)")
  require(k >= 1 && k <= 16, s"need 1 <= k <= 16 (got $k)")

  private val words: Int = 1 << (mExp - 6)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_sketch expects BIGINT hash, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return b
    BloomBits.set(b, v.asInstanceOf[Long], mExp, k)
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= o(i); i += 1 }
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
    val b = new Array[Long](words)
    var i = 0
    while (i < b.length) { b(i) = in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomSketch =
    copy(child = c.head)
  override def prettyName: String = "bloom_sketch"
}

/** Shared bit math for the aggregate's update and the probe
  * expression — one definition so build and probe can never drift. */
object BloomBits {
  /** Kirsch–Mitzenmacher position i = (h1 + i·h2) mod m with h2 forced
    * odd (a unit mod 2^mExp, so the k positions never collapse). */
  @inline private def pos(h1: Long, h2: Long, i: Int, mask: Int): Int =
    ((h1 + i.toLong * h2) & mask).toInt

  def set(bits: Array[Long], hash: Long, mExp: Int, k: Int): Unit = {
    val mask = (1 << mExp) - 1
    val h1 = SplitMix64.mix(hash)
    val h2 = SplitMix64.mix(h1) | 1L
    var i = 0
    while (i < k) {
      val p = pos(h1, h2, i, mask)
      bits(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  /** Zero-copy probe over the columnar long array. */
  def mightContain(bits: ArrayData, hash: Long, mExp: Int, k: Int): Boolean = {
    val mask = (1 << mExp) - 1
    val h1 = SplitMix64.mix(hash)
    val h2 = SplitMix64.mix(h1) | 1L
    var i = 0
    while (i < k) {
      val p = pos(h1, h2, i, mask)
      if ((bits.getLong(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `bloom_might_contain(bits, hash64)` — in-plan probe of a broadcast
  * bit array (one row per filter): false = DEFINITELY novel (the
  * map-side fast path), true = confirm against the exact hash set.
  * Codegen-capable so the 99%-novel scan stays inside whole-stage
  * codegen. */
case class BloomMightContain(left: Expression, right: Expression,
                             mExp: Int, k: Int) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (ARRAY<BIGINT>, BIGINT), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(bits: Any, hash: Any): Any =
    BloomBits.mightContain(bits.asInstanceOf[ArrayData],
      hash.asInstanceOf[Long], mExp, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, hash) =>
      s"${ev.value} = graft.functions.BloomBits.mightContain($bits, $hash, $mExp, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain"
}

object BloomSketch {
  def bloom_sketch(c: Column, mExp: Int, k: Int): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      BloomSketch(org.apache.spark.sql.GraftExprBridge.expression(c),
        mExp, k).toAggregateExpression())

  def bloom_might_contain(bits: Column, hash: Column, mExp: Int, k: Int): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      BloomMightContain(org.apache.spark.sql.GraftExprBridge.expression(bits),
        org.apache.spark.sql.GraftExprBridge.expression(hash), mExp, k))
}
