package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** TRUE (unrestricted) Damerau–Levenshtein distance — Lowrance–Wagner
  * 1975, the variant where a transposition may be followed by later
  * edits between the swapped characters ("CA"→"ABC" = 2, where the
  * restricted OSA variant says 3). This is the variant DuckDB's
  * `damerau_levenshtein` implements, which makes queries over it
  * exactly oracle-able; Spark ships only plain `levenshtein`.
  *
  * Per-row bounded O(|a|·|b|) time and space over codepoint arrays —
  * the verification kernel for blocked linkage pairs (name-length
  * strings), same posture as [[JaroWinklerSim]]: candidate pairs come
  * from a dictionary equi-join on a blocking key, the distance only
  * scores within-block pairs, and the integer result means the gate
  * can never disagree across engines by a float boundary.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"DamerauLevenshtein expects (STRING, STRING), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DamerauLevenshtein.distance(" +
        s"$a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Hard per-input cap: this kernel is for name/title-length strings
    * out of a blocked linkage join, and the DP allocates an
    * (|a|+2)×(|b|+2) int matrix PER ROW PAIR — at document length
    * a single pair can allocate hundreds of MB and stall an executor.
    * Capping loudly (not truncating: a silently-truncated distance is
    * a wrong answer) keeps a mis-aimed caller from taking the stage
    * down. 1024 codepoints bounds the matrix at ~4 MB. */
  val MaxLen = 1024

  /** Lowrance–Wagner DP with the last-occurrence table. */
  def distance(sa: String, sb: String): Int = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la > MaxLen || lb > MaxLen)
      throw new IllegalArgumentException(
        s"damerau_levenshtein: input length ${math.max(la, lb)} exceeds " +
        s"the $MaxLen-codepoint cap — this kernel scores name-length " +
        "blocked-linkage pairs; truncate or hash longer text upstream")
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // d is (la+2) x (lb+2), offset by 1 so d(0)(0) = inf border
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da.getOrDefault(b(j - 1), 0)
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val subst = d(i)(j) + cost
        val insert = d(i + 1)(j) + 1
        val delete = d(i)(j + 1) + 1
        val transp = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(subst, insert), math.min(delete, transp))
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }

  def damerau_levenshtein(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      DamerauLevenshtein(org.apache.spark.sql.GraftExprBridge.expression(a),
        org.apache.spark.sql.GraftExprBridge.expression(b)))
}
