package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen expression — the
  * transposition-tolerant string distance fuzzy record linkage wants
  * for person/org names, where Levenshtein over-penalizes swapped
  * syllables. Standard parameterization (the one DuckDB's
  * `jaro_winkler_similarity` replays exactly, which is what makes the
  * query oracle-able): match window `max(|a|,|b|)/2 − 1`, Winkler
  * prefix boost (scale 0.1, prefix cap 4) applied only when the Jaro
  * score exceeds 0.7, and either-empty → 0.0.
  *
  * Scale shape: per-row bounded work (O(|a|·window) with two small
  * bitset-free boolean arrays), no state, stays inside whole-stage
  * codegen — the right kernel for a blocked linkage join where each
  * block's candidate pairs are already materialized by an equi-join on
  * a cheap blocking key. Operates on codepoints, so supplementary-plane
  * text compares by character, not UTF-16 surrogate half.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"JaroWinklerSim expects (STRING, STRING), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.jaroWinkler(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerSim.jaroWinkler(" +
        s"$a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {

  /** Jaro similarity over codepoint arrays; 0.0 if either is empty. */
  def jaro(sa: String, sb: String): Double = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    jaroCp(a, b)
  }

  private def jaroCp(a: Array[Int], b: Array[Int]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2.0) / md) / 3.0
  }

  /** Winkler boost: scale 0.1, prefix cap 4, threshold 0.7. */
  def jaroWinkler(sa: String, sb: String): Double = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    val j = jaroCp(a, b)
    if (j <= 0.7) return j
    var p = 0
    val cap = math.min(4, math.min(a.length, b.length))
    while (p < cap && a(p) == b(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }

  def jaro_winkler_sim(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      JaroWinklerSim(org.apache.spark.sql.GraftExprBridge.expression(a),
        org.apache.spark.sql.GraftExprBridge.expression(b)))

  def jaro_sim_of(a: String, b: String): Double = jaro(a, b)
}
