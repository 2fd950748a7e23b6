package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Kafka sink wrapper (reference src/sinks/kafka): formats the pipeline's
  * `fields` array through [[Formatters]] into the `value` column the
  * built-in kafka writer requires, with an optional key expression.
  *
  * Spark already ships the kafka DSv2 sink — this wrapper owns only the
  * record→bytes projection (fmt parity with the file/tcp sinks) so a
  * sink-group route can say `connect = kafka, fmt = kv` and behave like
  * the reference's formatter-composed producer. The write itself is
  * `df.write.format("kafka")` — distributed, partition-parallel, no
  * driver involvement. */
object KafkaSink {

  /** Project pipeline output (with a `fields` array column) to the kafka
    * writer's (key, value) schema using a Formatters fmt. */
  def prepare(parsed: DataFrame, fmt: String = "json",
              keyExpr: Option[Column] = None): DataFrame =
    // dtype-aware native projection (Formatters.line): typed json
    // (`"st":200` unquoted) at full codegen speed — the old shape
    // rebuilt each field as WChars inside a per-row UDF and quoted
    // every value
    parsed.select(
      (keyExpr.map(_.cast("string").as("key")).toSeq :+
        Formatters.line(fmt, col("fields")).as("value")): _*)

  /** Batch write. */
  def write(parsed: DataFrame, bootstrap: String, topic: String,
            fmt: String = "json", keyExpr: Option[Column] = None): Unit =
    prepare(parsed, fmt, keyExpr).write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()

  /** Streaming write (caller sets checkpoint/trigger and starts). */
  def writeStream(parsed: DataFrame, bootstrap: String, topic: String,
                  fmt: String = "json",
                  keyExpr: Option[Column] = None): DataStreamWriter[Row] =
    prepare(parsed, fmt, keyExpr).writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
}
