package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `hll_distinct(key, p)` — HyperLogLog (Flajolet et al., AofA'07) as a
  * mergeable Catalyst aggregate: the bounded-memory distinct counter
  * whose shuffle payload is 2^p one-byte registers per group, not the
  * key set. The third rung of the engine's sketch family (SpaceSaving
  * heavy hitters, KLL-style quantiles, HLL cardinality) — together they
  * answer the three profile questions a 100 TB curation pass asks of
  * every key column (how hot, how spread, how many) without a full
  * groupBy over the key space.
  *
  * Determinism contract (what makes the estimate ORACLE-able, unlike
  * Spark's own approx_count_distinct): the hash is the engine's
  * [[Fnv1a64Expr FNV-1a-64]] finalized through [[SplitMix64.mix]] —
  * FNV alone under-mixes the HIGH bits for short keys (every 1-char
  * key lands in the same register), and HLL reads both ends of the
  * word; the splitmix finalizer makes all 64 bits uniform and is
  * already replayable in HUGEINT SQL. Register j = top p mixed bits,
  * rank rho = (64-p) - bitlength(remainder) + 1, and the register
  * array is a pure elementwise max — update and merge order cannot
  * change it. The
  * harmonic sum is kept EXACT in integers (Σ 2^((q+1) - M_j) with
  * q = 64-p, a BigInt), so the only floating-point steps are the final
  * alpha·m²·2^(q+1)/S division and the small-range linear-counting
  * branch — both replayed literally by the DuckDB oracle in HUGEINT +
  * one double division (`SparkEntry` `q_hll_distinct`).
  *
  * Output struct: `est` (the HLL estimate, small-range corrected),
  * `reg_sum` (Σ M_j — an integer checksum that pins every register
  * exactly), `nonzero` (occupied registers). Standard error ≈
  * 1.04/√m — p=9 (512 registers, 512 bytes) gives ~4.6%. */
case class HllSketch(child: Expression, p: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {
  require(p >= 4 && p <= 16, s"hll_distinct: p must be in [4,16], got $p")

  private val m = 1 << p
  private val q = 64 - p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("est", DoubleType, nullable = false),
    StructField("reg_sum", LongType, nullable = false),
    StructField("nonzero", IntegerType, nullable = false)))

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) return b
    val h = SplitMix64.mix(graft.operators.TextAnalysis.fnv1a64(
      v.asInstanceOf[UTF8String].toString))
    val j = (h >>> q).toInt
    val w = h & ((1L << q) - 1L)
    // rho = leading-zero run of the q-bit remainder + 1
    val rho = if (w == 0L) q + 1 else q - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > b(j)) b(j) = rho.toByte
    b
  }

  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (o(i) > b(i)) b(i) = o(i); i += 1 }
    b
  }

  override def eval(b: Array[Byte]): Any = {
    // exact integer harmonic sum: Σ_j 2^-M_j = S / 2^(q+1)
    var s = BigInt(0)
    var regSum = 0L
    var zeros = 0
    var i = 0
    while (i < m) {
      val mj = b(i) & 0xFF
      s += BigInt(1) << (q + 1 - mj)
      regSum += mj
      if (mj == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m) // m >= 128 constant
    val raw = alpha * m * m * math.pow(2.0, (q + 1).toDouble) / s.toDouble
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    InternalRow(est, regSum, m - zeros)
  }

  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketch =
    copy(child = c.head)
  override def prettyName: String = "hll_distinct"
}

object HllSketch {
  def hll_distinct(c: Column, p: Int): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      HllSketch(org.apache.spark.sql.GraftExprBridge.expression(c),
        p).toAggregateExpression())
}
