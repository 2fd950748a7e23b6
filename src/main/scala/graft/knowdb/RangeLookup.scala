package graft.knowdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (IP-range) lookup — the reference's ip_geo KnowDB pattern
  * (`select zone from ip_geo where ip_start_int <= ip4_int(x) and
  * ip_end_int >= ip4_int(x)`, SURVEY.md §2.4).
  *
  * Spark's default plan for a non-equi range join against a small dim is
  * BroadcastNestedLoopJoin — O(rows × ranges) comparisons. The classic
  * fix (SURVEY.md §4): broadcast the SORTED range array and binary-search
  * per row — O(rows × log ranges), stays map-only/narrow, no shuffle.
  * Both forms are provided; `lookup` is the scale path. */
object RangeLookup {

  final case class Range(start: Long, end: Long, value: String)

  /** Build the sorted broadcast side from a dim frame of
    * (startCol, endCol, valueCol). Ranges must be non-overlapping. */
  def ranges(dim: DataFrame, startCol: String, endCol: String, valueCol: String): Array[Range] =
    dim.select(col(startCol).cast("long"), col(endCol).cast("long"),
        col(valueCol).cast("string"))
      .collect()
      .map(r => Range(r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_.start)

  def search(sorted: Array[Range], key: Long): String = {
    var lo = 0; var hi = sorted.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val r = sorted(mid)
      if (key < r.start) hi = mid - 1
      else if (key > r.end) lo = mid + 1
      else return r.value
    }
    null
  }

  /** Map-only range lookup: adds `outCol` by binary-searching the
    * broadcast sorted ranges with the key column. */
  def lookup(df: DataFrame, keyCol: Column, sorted: Array[Range], outCol: String): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(sorted)
    val fn = udf((k: java.lang.Long) =>
      if (k == null) null else search(bc.value, k.longValue()))
    df.withColumn(outCol, fn(keyCol))
  }

  /** Whole-operator form: plans the custom RangeLookupJoin logical node
    * (requires RangeLookupStrategy — registered by GraftExtensions or
    * injected here on first use). */
  def lookupPlanned(df: DataFrame, keyCol: Column, sorted: Array[Range],
                    outCol: String): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.RangeLookupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.RangeLookupStrategy
    // resolve the key expression against df by analyzing a probe
    // projection (a bridged Column is otherwise unresolved inside a
    // custom logical node)
    val probe = df.select(keyCol.as("__range_key")).queryExecution.analyzed
    val (childPlan, keyExpr) = probe match {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        (p.child, p.projectList.head.asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.Alias].child)
      case other => throw new IllegalStateException(s"unexpected probe plan: $other")
    }
    val outAttr = org.apache.spark.sql.catalyst.expressions
      .AttributeReference(outCol, org.apache.spark.sql.types.StringType,
        nullable = true)()
    org.apache.spark.sql.GraftExprBridge.ofRows(spark,
      graft.plans.RangeLookupJoin(childPlan, keyExpr, sorted, outAttr))
  }

  /** Declarative alternative: plain non-equi join (Catalyst plans BNLJ
    * with the dim broadcast). Correct at any size; prefer `lookup` when
    * the probe side is huge. */
  def joinRange(df: DataFrame, keyCol: Column, dim: DataFrame,
                startCol: String, endCol: String): DataFrame =
    df.join(broadcast(dim), keyCol >= col(startCol) && keyCol <= col(endCol), "left")
}
