package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series smoothing over bucketed event counts — the forecasting
  * primitive the hourly-anomaly operator's z-scores don't provide: a
  * one-step-ahead level via simple exponential smoothing,
  * `s₁ = x₁, s_t = α·x_t + (1−α)·s_{t−1}` (the forecast for t+1 IS the
  * level). α near 1 tracks, α near 0 smooths.
  *
  * Scale shape: one (key, bucket) partial aggregation over the scan,
  * then the fold runs per key over its bucket-count ARRAY — bounded by
  * the observation span in buckets (hundreds to thousands of doubles
  * per key), deterministic because `sort_array` fixes the fold order
  * and both engines execute the identical left-to-right op sequence
  * (DuckDB `list_reduce` replays it exactly — same init-from-first
  * convention). Keys fold independently; no window over the scan.
  */
object TimeSeries {

  def expSmoothing(events: DataFrame, keyCol: String = "event_type",
                   tsCol: String = "ts", alpha: Double = 0.3,
                   bucketUs: Long = 3600000000L): DataFrame = {
    val hourly = events
      .select(col(keyCol).as("k"),
        expr(s"unix_micros($tsCol) DIV $bucketUs").as("bucket"))
      .groupBy(col("k"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val seq0 = hourly.groupBy(col("k"))
      .agg(count(lit(1)).as("n_buckets"),
        sort_array(collect_list(struct(col("bucket"), col("cnt"))))
          .as("ord"))
      .select(col("k"), col("n_buckets"),
        transform(col("ord"), e => e.getField("cnt")).as("xs"))
    seq0.select(col("k").as(keyCol), col("n_buckets"),
      round(aggregate(
        slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
        element_at(col("xs"), 1),
        (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc), 6)
        .as("level"))
  }

  /** Theil–Sen robust trend per key: the MEDIAN of all pairwise slopes
    * (c_j − c_i)/(d_j − d_i) over the key's daily-count series — the
    * outlier-resistant answer to "is this event type growing", immune
    * to the single traffic spike that wrecks an OLS fit (breakdown
    * point 29.3%, Sen 1968).
    *
    * Scale shape: slopes are O(days²) per key, so the pair join runs on
    * the aggregated per-(key, day) frame — bounded by the calendar, not
    * the event count (a year is ~66k pairs/key) — and is an equi-join
    * on the key, never a cartesian across keys. The median is Spark's
    * exact interpolated `percentile` over that bounded pair frame,
    * matching DuckDB's `median` for the oracle. */
  def theilSen(events: DataFrame, keyCol: Column, tsCol: Column,
               valueAgg: Column): DataFrame = {
    val daily = events
      .groupBy(keyCol.as("k"), unix_date(to_date(tsCol)).as("d"))
      .agg(valueAgg.as("c"))
    val a = daily.select(col("k"), col("d").as("d1"), col("c").as("c1"))
    val b = daily.select(col("k").as("k2"), col("d").as("d2"), col("c").as("c2"))
    a.join(b, col("k") === col("k2") && col("d1") < col("d2"))
      .select(col("k"),
        ((col("c2") - col("c1")).cast("double") /
          (col("d2") - col("d1")).cast("double")).as("slope"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)"), 4).as("sen_slope"))
  }
}
