package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel — the continuous twin of
  * [[graft.operators.Funnel.orderedFunnel]]: per-user stage progression
  * tracked AS THE STREAM RUNS with O(1) state (current stage + its
  * completion instant), emitting one row per stage ADVANCE. A
  * downstream stateless aggregation over the advance stream gives live
  * per-stage conversion counts.
  *
  * Semantics match the batch operator's earliest-completion chain: the
  * batch form takes stage i's completion as the earliest stage-i event
  * STRICTLY after stage i−1's completion; a greedy event-time-ordered
  * fold computes exactly that chain (the first qualifying event IS the
  * earliest), and same-instant stage pairs do not advance on either
  * side (strict >). In-batch rows sort by (ts, id); across batches the
  * state carries the chain forward. Caveat (shared with
  * [[Attribution.attribute]]): an event arriving in a later batch than
  * its event-time position cannot retro-advance a chain the state has
  * already moved past — bound lateness at the source if that matters;
  * the batch operator is the exact replay. */
object FunnelStream {

  case class Advance(user_id: Long, stage_idx: Int, stage: String,
                     ts_us: Long)

  case class FState(stage: Int, ctUs: Long)

  def stageAdvances(events: DataFrame, stages: Seq[String],
                    userCol: String = "user_id", tsCol: String = "ts",
                    typeCol: String = "event_type",
                    idCol: String = "event_id"): Dataset[Advance] = {
    require(stages.nonEmpty, "stageAdvances needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events.filter(col(typeCol).isin(stages: _*))
      .select(col(idCol).cast("long").as("id"),
        col(userCol).cast("long").as("u"),
        unix_micros(col(tsCol)).as("tsUs"),
        col(typeCol).as("typ"))
      .as[(Long, Long, Long, String)]
    ds.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, String)],
         state: GroupState[FState]) =>
          val evs = it.toArray.sortBy(e => (e._3, e._1))
          var st = state.getOption.getOrElse(FState(0, Long.MinValue))
          val out = Seq.newBuilder[Advance]
          for ((_, _, tsUs, typ) <- evs)
            if (st.stage < stages.length && typ == stages(st.stage) &&
                tsUs > st.ctUs) {
              st = FState(st.stage + 1, tsUs)
              out += Advance(user, st.stage, typ, tsUs)
            }
          state.update(st)
          out.result().iterator
      }
  }

  /** Live funnel dashboard: event-time windowed per-stage advance
    * counts — a second stateful operator (windowed aggregation)
    * chained after the per-user fold, with the watermark re-anchored
    * on the advance's event time. Closed windows emit once; dividing
    * window counts stage-over-stage gives live conversion rates. */
  def windowedStageCounts(events: DataFrame, stages: Seq[String],
                          windowDur: String, watermark: String,
                          userCol: String = "user_id", tsCol: String = "ts",
                          typeCol: String = "event_type",
                          idCol: String = "event_id"): DataFrame =
    stageAdvances(
        events.withWatermark(tsCol, watermark),
        stages, userCol, tsCol, typeCol, idCol)
      .toDF()
      .withColumn("ats", timestamp_micros(col("ts_us")))
      .withWatermark("ats", watermark)
      .groupBy(window(col("ats"), windowDur), col("stage_idx"), col("stage"))
      .agg(count(lit(1)).as("n_advances"))
      .select(col("window.start").as("window_start"),
        col("stage_idx"), col("stage"), col("n_advances"))
}
