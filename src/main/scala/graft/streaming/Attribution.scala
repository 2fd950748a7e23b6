package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the continuous twin of
  * [[graft.operators.Funnel.lastTouchAttribution]]: conversions are
  * attributed to the user's latest in-window touch AS THE STREAM RUNS,
  * with one tiny state record per user (the last touch seen), not a
  * buffered history.
  *
  * Semantics within a batch are event-time ordered (the group's rows
  * are sorted by (ts, id) before folding), so a touch and a conversion
  * arriving in the same micro-batch attribute exactly like the batch
  * operator. Across batches the state carries the latest touch
  * forward. Caveat (inherent to single-pass streaming): a touch that
  * arrives in a LATER batch than a conversion it precedes in event
  * time cannot retro-attribute — the conversion was already emitted.
  * Bound late arrivals with a source-side watermark if that matters;
  * the batch operator is the exact replay.
  *
  * Scale shape: state is O(1) per user (three fields), the shuffle is
  * the single groupByKey on the user id, and output rows are only the
  * conversions — the same per-key-bounded-state discipline as
  * sessionization. */
object Attribution {

  case class Attributed(event_id: Long, user_id: Long, ts_us: Long,
                        touch_event_id: Option[Long],
                        touch_type: Option[String],
                        micros_since_touch: Option[Long])

  case class TouchState(id: Long, typ: String, tsUs: Long)

  def attribute(events: DataFrame, touchTypes: Seq[String],
                convType: String, windowMicros: Long,
                userCol: String = "user_id", tsCol: String = "ts",
                typeCol: String = "event_type",
                idCol: String = "event_id"): Dataset[Attributed] = {
    val spark = events.sparkSession
    import spark.implicits._
    val touches = touchTypes.toSet
    val ds = events.select(col(idCol).cast("long").as("id"),
        col(userCol).cast("long").as("u"),
        unix_micros(col(tsCol)).as("tsUs"),
        col(typeCol).as("typ"))
      .as[(Long, Long, Long, String)]
    ds.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, String)],
         state: GroupState[TouchState]) =>
          // (ts, touches-before-conversions, id): at an equal microsecond
          // every touch folds before any conversion regardless of event-id
          // order, mirroring the batch AsOfJoin's (__ts, __side) ordering;
          // among same-µs touches the max id folds last and wins.
          val evs = it.toArray.sortBy(e =>
            (e._3, if (touches.contains(e._4)) 0 else 1, e._1))
          var last = state.getOption
          val out = Seq.newBuilder[Attributed]
          for ((id, _, tsUs, typ) <- evs) {
            if (touches.contains(typ)) {
              // later event time wins; same-µs ties break on max id —
              // identical to the batch operator's arg-max pre-agg
              if (last.forall(s =>
                    s.tsUs < tsUs || (s.tsUs == tsUs && s.id < id)))
                last = Some(TouchState(id, typ, tsUs))
            } else if (typ == convType) {
              out += (last match {
                case Some(s) if s.tsUs <= tsUs && tsUs - s.tsUs <= windowMicros =>
                  Attributed(id, user, tsUs, Some(s.id), Some(s.typ),
                    Some(tsUs - s.tsUs))
                case _ => Attributed(id, user, tsUs, None, None, None)
              })
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
