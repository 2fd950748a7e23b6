package graft.oml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast-join compilation of an OML equality SQL-enrich
  * (`out = select col from dim where dimKey = read(src)`).
  *
  * The KnowDb path (reference sql.rs per-record probe against per-thread
  * SQLite clones) is right for true dims — small, driver-resident,
  * probed inside the parse projection with zero shuffle. When the "dim"
  * is big, the Spark-native shape is a real join: the dim stays a
  * DataFrame, Catalyst plans a BroadcastHashJoin (or shuffle join if the
  * dim outgrows the broadcast threshold), and nothing is ever collected
  * to the driver. [[KnowDb.fromDim]]'s guardrail points here.
  */
object SqlEnrichJoin {

  /** Left-join `dim` onto `parsed` on `keyExpr === dim(dimKey)`,
    * emitting `select` as (dimColumn -> outputName) pairs. The dim side
    * is explicitly broadcast: an enrich dim is the small side by
    * definition; if it exceeds the broadcast threshold Spark falls back
    * to a shuffle join rather than failing. */
  def enrich(parsed: DataFrame, keyExpr: Column, dim: DataFrame, dimKey: String,
             select: Seq[(String, String)]): DataFrame = {
    val dimCols = (dimKey +: select.map(_._1)).distinct
    val d = broadcast(dim.select(dimCols.map(c => col(c).as(s"__dim_$c")): _*))
    val joined = parsed.join(d, keyExpr === d(s"__dim_$dimKey"), "left")
      .drop(s"__dim_$dimKey")
    select.foldLeft(joined) { case (df, (src, out)) =>
      df.withColumnRenamed(s"__dim_$src", out)
    }
  }
}
