package graft.operators

import org.apache.spark.sql.DataFrame
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
}
