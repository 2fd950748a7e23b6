package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deequ-style data-quality profiling: per-column completeness,
  * cardinality, range, and central tendency in ONE pass over the scan
  * — the pre-ingest quality report a curation pipeline publishes next
  * to its dataset card (which profiles the corpus semantically; this
  * profiles it relationally).
  *
  * Numeric columns only, deliberately: min/max/mean stay doubles end
  * to end, so results are engine-replayable without string-formatting
  * parity problems. One aggregation computes every column's stats
  * (the multi-countDistinct expands the scan |cols|× map-side — the
  * standard cost of exact column cardinality; at extreme scale swap
  * the distinct counts for the HLL sketch and keep the rest). The
  * 1-row aggregate then explodes to one row per column — rows ∝
  * |cols|, never the data.
  */
object Profile {

  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericProfile: need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c).cast("double")).as(s"__min_$c"),
        max(col(c).cast("double")).as(s"__max_$c"),
        avg(col(c).cast("double")).as(s"__mean_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col(s"__rows_$c").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        round(col(s"__min_$c"), 4).as("min_v"),
        round(col(s"__max_$c"), 4).as("max_v"),
        round(col(s"__mean_$c"), 4).as("mean_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
