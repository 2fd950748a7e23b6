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

  /** Declarative alternative: plain non-equi join (Catalyst plans BNLJ
    * with the dim broadcast). Correct at any size; prefer `lookup` when
    * the probe side is huge. */
  def joinRange(df: DataFrame, keyCol: Column, dim: DataFrame,
                startCol: String, endCol: String): DataFrame =
    df.join(broadcast(dim), keyCol >= col(startCol) && keyCol <= col(endCol), "left")
}
