package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline statistics (reference crates/wp-stats: windowed counters per
  * stage Gen|Pick|Parse|Sink keyed by (target rule, dimension), reported
  * every --stat N seconds to console + monitor sink).
  *
  * Spark-native forms:
  *  - batch: `observe()` named metrics — computed inline with the job,
  *    zero extra passes; read back from QueryExecutionListener or the
  *    returned observation;
  *  - streaming: per-micro-batch `observe` + StreamingQueryListener
  *    (StreamingPipeline.monitorStats does the windowed groupBy form).
  */
object Stats {

  /** Attach parse-stage counters to a parsed frame (status column from
    * WplEngine/Pipeline). Metrics appear in the query's observedMetrics
    * under `name`. */
  def observeParse(parsed: DataFrame, name: String = "parse_stats"): DataFrame =
    parsed.observe(name,
      count(lit(1)).as("total"),
      count(when(col("status") === "success" || col("status") === "ok", 1)).as("success"),
      count(when(col("status") === "partial", 1)).as("partial"),
      count(when(col("status") === "miss", 1)).as("miss"),
      count(when(col("status") === "error", 1)).as("error"))

  /** Per-rule hit counts (reference: per-pipeline hit/access counters that
    * drive adaptive ordering + `wproj data stat`). One aggregation. */
  def ruleStats(parsed: DataFrame): DataFrame =
    parsed.groupBy(col("rule_key"), col("status")).count()

  /** Per-group quantile profile via the mergeable bounded-memory sketch
    * ([[graft.functions.QuantileSketch]]): the "p50/p90/p99 of this
    * column per key" card WITHOUT a global sort — partials carry at most
    * `capacity` weighted samples per task through the exchange. Exact
    * (and oracle-able) while each group's row count ≤ capacity; degrades
    * to bounded rank error beyond. Output: one row per (group, q). */
  def quantileProfile(df: DataFrame, grpCol: String, valCol: String,
                      qs: Seq[Double], capacity: Int = 4096): DataFrame =
    df.groupBy(col(grpCol))
      .agg(graft.functions.QuantileSketch
        .quantile_sketch(col(valCol).cast("double"), qs, capacity).as("qv"))
      .select(col(grpCol), explode(col("qv")).as("e"))
      .select(col(grpCol), col("e.q").as("q"), col("e.value").as("value"))

  /** Collect observed metrics synchronously for a batch frame via the
    * Observation API (metrics ride the same job as the action — no second
    * pass over the data). */
  def runWithMetrics(df: DataFrame, name: String = "parse_stats"): (Long, Map[String, Long]) = {
    val obs = org.apache.spark.sql.Observation(name)
    val observed = df.observe(obs,
      count(lit(1)).as("total"),
      count(when(col("status") === "success" || col("status") === "ok", 1)).as("success"),
      count(when(col("status") === "partial", 1)).as("partial"),
      count(when(col("status") === "miss", 1)).as("miss"),
      count(when(col("status") === "error", 1)).as("error"))
    val n = observed.count()
    val m = obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }
    (n, m)
  }
}
