package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.engine.Pipeline
import graft.oml.KnowDb
import graft.sinks.SinkRouter

/** Streaming mode — the reference's `wparse daemon` (SURVEY §3.1) as
  * Structured Streaming: the SAME query graph as batch under `readStream`
  * + `foreachBatch` multi-sink fanout.
  *
  *  - sources: file stream (rescue/`wprescue` replay included — Spark's
  *    file source already does offset checkpointing), kafka, socket;
  *  - rate limiting (reference rate_limit_rps): `maxFilesPerTrigger` /
  *    `maxOffsetsPerTrigger` + trigger interval;
  *  - stats (reference wp-stats windowed counters): `observe()` metrics
  *    per micro-batch surfaced via StreamingQueryListener — counts per
  *    status routed to the monitor sink.
  */
object StreamingPipeline {

  final case class Config(
      wplSource: String,
      omlSources: Seq[String],
      sinks: Seq[SinkRouter.SinkSpec],
      knowDb: KnowDb = KnowDb.empty,
      checkpoint: String = "/tmp/graft-checkpoint",
      triggerMs: Long = 1000L)

  /** Attach the engine to a streaming frame of raw lines. `writeSink`
    * receives (sinkName, channel, frame) per micro-batch — channel is
    * "business" | "intercept" | "miss" | "residue" | "error". */
  def start(lines: DataFrame, lineCol: String, cfg: Config)
           (writeSink: (String, String, DataFrame) => Unit): StreamingQuery = {
    lines.writeStream
      .option("checkpointLocation", cfg.checkpoint)
      .trigger(Trigger.ProcessingTime(cfg.triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val parsed = Pipeline.run(batch, lineCol, cfg.wplSource, cfg.omlSources,
          knowDb = cfg.knowDb).persist()
        // residue-only = Partial without a model: the record still flows
        // to the business sinks (reference ProcessResult::Partial)
        val ok = parsed.filter(col("status") === "ok" || col("status") === "default" ||
          col("status") === "residue-only")
        try {
          for ((name, (business, intercept)) <- SinkRouter.fanout(ok, cfg.sinks)) {
            writeSink(name, "business", business)
            writeSink(name, "intercept", intercept)
          }
          // infra side-outputs (reference default/miss/residue/error groups)
          writeSink("infra", "miss", parsed.filter(col("status") === "miss"))
          writeSink("infra", "residue",
            parsed.filter(col("residue").isNotNull && col("residue") =!= ""))
          writeSink("infra", "error", parsed.filter(col("status") === "error"))
        } finally {
          // fanout persisted `ok` when multiple sinks share it — release
          // both per micro-batch or the daemon's cache grows unbounded
          ok.unpersist(false); parsed.unpersist()
        }
        ()
      }
      .start()
  }

  /** File-directory source (daemon tail / wprescue replay). */
  def fileLines(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream.option("maxFilesPerTrigger", maxFilesPerTrigger).text(dir)
      .withColumnRenamed("value", "line")

  /** Kafka source wrapper (reference connectors/source.d/30-kafka.toml). */
  def kafkaLines(spark: SparkSession, brokers: String, topic: String,
                 maxOffsetsPerTrigger: Long = 100000L): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
      .select(col("value").cast("string").as("line"))

  /** Processing-time windowed stats (reference wp-stats: counters per
    * (stage, target rule) reported every N seconds to the monitor sink). */
  def monitorStats(parsed: DataFrame, windowSec: Int = 10): DataFrame =
    parsed
      .withColumn("observed_at", current_timestamp())
      .groupBy(window(col("observed_at"), s"$windowSec seconds"),
        col("status"), col("rule_key"))
      .count()

  /** Event-time windowed quantiles as a TRUE streaming stateful
    * aggregation (not foreachBatch): the mergeable bounded-memory
    * sketch ([[graft.functions.QuantileSketch]]) is the aggregation
    * buffer, so per-(window, group) state in the store is ≤ capacity
    * weighted samples — the "p95 latency per 10-s window" monitor
    * without keeping the window's rows. Watermark bounds state: closed
    * windows emit once (append mode) and their state evicts. Output:
    * one row per (window_start, group, q). */
  def windowedQuantiles(events: DataFrame, tsCol: String, grpCol: String,
                        valCol: String, windowDur: String, watermark: String,
                        qs: Seq[Double], capacity: Int = 1024): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(grpCol))
      .agg(graft.functions.QuantileSketch
        .quantile_sketch(col(valCol).cast("double"), qs, capacity).as("qv"))
      .select(col("window.start").as("window_start"), col(grpCol),
        explode(col("qv")).as("e"))
      .select(col("window_start"), col(grpCol),
        col("e.q").as("q"), col("e.value").as("value"))

  /** Event-time windowed hot keys — the SpaceSaving aggregate
    * ([[graft.functions.HeavyHitters]]) as streaming aggregation state:
    * "which keys dominate this window" with ≤ capacity counters per
    * window in the store, closed windows emitted once under the
    * watermark. The streaming twin of [[graft.operators.Skew.hotKeys]],
    * feeding the same salting/partitioning decisions continuously.
    * Output: one row per (window_start, key) in the window's top-k,
    * with the [count_lo, count_hi] bracket. */
  def windowedHotKeys(events: DataFrame, tsCol: String, keyCol: String,
                      windowDur: String, watermark: String,
                      k: Int, capacity: Int = 1024): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(graft.functions.HeavyHitters
        .heavy_hitters(col(keyCol).cast("string"), k, capacity).as("hh"))
      .select(col("window.start").as("window_start"),
        explode(col("hh")).as("h"))
      .select(col("window_start"), col("h.item").as("key"),
        (col("h.count") - col("h.err")).as("count_lo"),
        col("h.count").as("count_hi"))

  /** Event-time windowed distinct cardinality — the HLL sketch
    * ([[graft.functions.HllSketch]]) as streaming aggregation state:
    * per-(window, group) state is 2^p one-byte registers (p=9 →
    * 512 B) no matter how many keys the window sees, closed windows
    * emit once under the watermark. Completes the windowed sketch trio
    * (quantiles / hot keys / cardinality) — the continuous corpus
    * profile a 100 TB ingest daemon reports without holding key sets
    * in the state store. `nonzero` is exact below ~m/2.5 occupied
    * registers (linear-counting regime), so tests can pin small
    * windows exactly. */
  def windowedDistinct(events: DataFrame, tsCol: String, grpCol: String,
                       keyCol: String, windowDur: String, watermark: String,
                       p: Int = 9): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(grpCol))
      .agg(graft.functions.HllSketch
        .hll_distinct(col(keyCol).cast("string"), p).as("h"))
      .select(col("window.start").as("window_start"), col(grpCol),
        round(col("h.est"), 4).as("est_distinct"),
        col("h.nonzero").as("nonzero"))
}
