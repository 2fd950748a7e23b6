package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: attach to each left row the value columns of the LATEST
  * right row with the same keys and right.ts <= left.ts (the standard
  * time-series enrichment — "state as of event time").
  *
  * Spark has no native as-of join; the naive encodings are a range
  * join (O(n·m) explosion per key) or a per-key collect. This is the
  * scalable composition: UNION both sides tagged, ONE shuffle on the
  * key, and a single ordered window pass where `last(value,
  * ignoreNulls)` carries the most recent right-side state forward into
  * each left row. Cost = one exchange + one sort per key group,
  * identical asymptotics to a SortMergeJoin on the same key — no pair
  * explosion at any scale. Right rows order BEFORE left rows at equal
  * timestamps (side 0 < side 1), giving inclusive `right.ts <=
  * left.ts` semantics, matching DuckDB's `ASOF JOIN ... ON l.ts >=
  * r.ts` for oracle comparison.
  *
  * Right must be unique per (keys, ts) — pre-aggregate if needed (an
  * ambiguous tie has no canonical as-of answer). Two contract caveats
  * from the carry-forward encoding: right value columns must be
  * non-null (a null value would be skipped by the ignoreNulls carry,
  * yielding the previous state instead of the matched row's null) and
  * `valCols` names must not collide with left column names.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, valCols: Seq[String]): DataFrame = {
    val leftPayload = left.columns.toSeq
    val l2 = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        struct(leftPayload.map(col): _*).as("__l")) ++
        valCols.map(v => lit(null).cast(right.schema(v).dataType).as(v)): _*)
    val r2 = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        lit(null).cast(l2.schema("__l").dataType).as("__l")) ++
        valCols.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valCols.foldLeft(l2.unionByName(r2)) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftPayload.map(c => col(s"__l.$c").as(c)) ++ valCols.map(col): _*)
  }

  /** Forward as-of: each left row takes the value of the EARLIEST right
    * row at-or-after its timestamp (inclusive) — "what happens next"
    * (time-to-next-purchase, next sensor reading, label-at-horizon)
    * where [[asOf]] answers "what happened last". Same
    * union-plus-single-window shape, mirrored: the right side sorts
    * AFTER the left at an equal instant (so same-instant right rows
    * match, inclusive), and the fill is `first(ignoreNulls)` over the
    * current-row→following frame. One shuffle on the keys, no range
    * explosion — the same scale argument as the backward form. */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  valCols: Seq[String]): DataFrame = {
    val leftPayload = left.columns.toSeq
    val l2 = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(0).as("__side") :+
        struct(leftPayload.map(col): _*).as("__l")) ++
        valCols.map(v => lit(null).cast(right.schema(v).dataType).as(v)): _*)
    val r2 = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(l2.schema("__l").dataType).as("__l")) ++
        valCols.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = valCols.foldLeft(l2.unionByName(r2)) { (df, v) =>
      df.withColumn(v, first(col(v), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 0)
      .select(leftPayload.map(c => col(s"__l.$c").as(c)) ++ valCols.map(col): _*)
  }
}
