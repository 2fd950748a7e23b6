package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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

  // analysis-time type error (not a runtime ClassCastException) when
  // SQL-registered callers pass a non-string key
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_distinct expects STRING, got ${child.dataType.catalogString}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("est", DoubleType, nullable = false),
    StructField("reg_sum", LongType, nullable = false),
    StructField("nonzero", IntegerType, nullable = false)))

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      HllSketch.updateRegisters(b, v.asInstanceOf[UTF8String].toString, p)
    b
  }

  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] =
    HllSketch.mergeRegisters(b, o)

  override def eval(b: Array[Byte]): Any = {
    val (est, regSum, nonzero) = HllSketch.estimate(b, p)
    InternalRow(est, regSum, nonzero)
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

  /** Register update for one key — shared by the aggregates and any
    * register-level consumer (e.g. the persisted cardinality index). */
  def updateRegisters(regs: Array[Byte], key: String, p: Int): Unit = {
    val q = 64 - p
    val h = SplitMix64.mix(graft.operators.TextAnalysis.fnv1a64(key))
    val j = (h >>> q).toInt
    val w = h & ((1L << q) - 1L)
    val rho = if (w == 0L) q + 1 else q - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > regs(j)) regs(j) = rho.toByte
  }

  /** Elementwise-max merge — HLL union: the merged registers estimate
    * the cardinality of the UNION of the merged key sets exactly as if
    * it had been sketched in one pass. */
  def mergeRegisters(into: Array[Byte], from: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < into.length) { if (from(i) > into(i)) into(i) = from(i); i += 1 }
    into
  }

  /** (estimate, register sum, nonzero count) from raw registers — the
    * exact-integer harmonic sum (Σ_j 2^-M_j = S / 2^(q+1), S a BigInt)
    * plus the small-range linear-counting branch; the DuckDB oracle
    * replays this literally. */
  def estimate(b: Array[Byte], p: Int): (Double, Long, Int) = {
    val m = 1 << p
    val q = 64 - p
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
    // Flajolet AofA'07 Fig.3: the 0.7213/(1+1.079/m) closed form is the
    // m >= 128 asymptote; the small-m bias corrections are tabulated.
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m * math.pow(2.0, (q + 1).toDouble) / s.toDouble
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    (est, regSum, m - zeros)
  }
}

/** `hll_registers(key, p)` — the same sketch, evaluated to its RAW
  * 2^p register bytes instead of the estimate: the storable/mergeable
  * form. Registers from disjoint passes merge by elementwise max into
  * the union sketch ([[HllSketch.mergeRegisters]]), which is what makes
  * a PERSISTED cardinality profile incrementally maintainable — fold a
  * new batch's registers in without touching the key sets. */
case class HllRegisters(child: Expression, p: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {
  require(p >= 4 && p <= 16, s"hll_registers: p must be in [4,16], got $p")
  private val m = 1 << p

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_registers expects STRING, got ${child.dataType.catalogString}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      HllSketch.updateRegisters(b, v.asInstanceOf[UTF8String].toString, p)
    b
  }

  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] =
    HllSketch.mergeRegisters(b, o)

  override def eval(b: Array[Byte]): Any = b

  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllRegisters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegisters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllRegisters =
    copy(child = c.head)
  override def prettyName: String = "hll_registers"
}

object HllRegisters {
  def hll_registers(c: Column, p: Int): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      HllRegisters(org.apache.spark.sql.GraftExprBridge.expression(c),
        p).toAggregateExpression())
}
