package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful event-time streaming operators — the custom-state side of
  * the engine (Structured Streaming `flatMapGroupsWithState` +
  * watermarks). The reference has no event-time processing at all
  * (SURVEY §2.9: processing-time stats windows only); these are part of
  * the beyond-reference training-pipeline surface, built the way a
  * 1000-executor deployment needs them: per-key state is bounded by the
  * watermark (expired via event-time timeout), so state size tracks the
  * number of ACTIVE keys, not history. */
object Sessionize {

  final case class Event(key: String, ts: java.sql.Timestamp) {
    def tsMicros: Long =
      ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
  }
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(key: String, session_start: Long, session_end: Long,
                           n_events: Long)

  /** Gap-based sessionization over a streaming frame: events for a key
    * belong to one session while gaps stay under `gapSec`; a session
    * closes when the watermark passes its gap horizon (event-time
    * timeout), emitting exactly one row per closed session (the
    * streaming analogue of the batch q_events_sessionize query).
    *
    * Input needs columns (key: string, ts: timestamp); the caller sets
    * the watermark delay — late events beyond it are dropped by Spark
    * before they reach the state function. */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               gapSec: Long, watermarkDelay: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    // the watermarked TIMESTAMP column must survive into the Dataset —
    // replacing it with a derived long would detach the watermark the
    // event-time timeout needs
    val typed = events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).cast("string").as("key"), col(tsCol).as("ts"))
      .as[Event]

    typed.groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, events, state: GroupState[SessionState]) =>
          val gapMicros = gapSec * 1000000L
          if (state.hasTimedOut) {
            // watermark passed the gap horizon → close and emit
            val s = state.get
            state.remove()
            Iterator.single(Session(key, s.start, s.last, s.n))
          } else {
            // fold the micro-batch's events into (possibly several)
            // sessions; only the LAST session stays open in state
            val sorted = events.map(_.tsMicros).toArray.sorted
            val closed = Iterator.newBuilder[Session]
            var cur = state.getOption.orNull
            for (ts <- sorted) {
              if (cur == null) cur = SessionState(ts, ts, 0L)
              if (ts - cur.last > gapMicros) {
                closed += Session(key, cur.start, cur.last, cur.n)
                cur = SessionState(ts, ts, 1L)
              } else {
                cur = SessionState(cur.start, ts, cur.n + 1)
              }
            }
            if (cur != null) {
              state.update(cur)
              // close when the watermark passes last event + gap
              state.setTimeoutTimestamp((cur.last + gapMicros) / 1000L)
            }
            closed.result()
          }
      }
  }

  /** Event-time windowed counts with a watermark: append mode emits each
    * (window, key) exactly once, when the watermark finalizes the
    * window; events later than the watermark are dropped. State is
    * bounded to open windows — the 100-TB-stream shape (processing-time
    * monitorStats has unbounded key history instead). */
  def windowedCounts(events: DataFrame, keyCol: String, tsCol: String,
                     windowSpec: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowSpec), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol), col("n"))
}
