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

  /** Per-user state of the watermark-bounded variant: every touch still
    * inside the attribution horizon plus the conversions awaiting their
    * flush watermark. Bounded: touches ≤ (touch rate × (window +
    * lateness)), pending ≤ (conversion rate × lateness) — the horizon
    * prunes both every invocation. */
  case class BoundedState(touches: List[TouchState],
                          pending: List[(Long, Long)])

  /** Watermark-bounded retro-attribution — closes [[attribute]]'s
    * documented gap: a touch arriving a batch AFTER its conversion (but
    * within the source's allowed lateness) still attributes. Conversions
    * are held in state and emitted only once the event-time watermark
    * passes their timestamp — at that point no touch with an earlier
    * event time can arrive anymore (the watermark would drop it), so the
    * attribution computed at flush is EXACT: for all data within the
    * lateness bound this converges to the batch operator
    * ([[graft.operators.Funnel.lastTouchAttribution]]).
    *
    * The price of retro-exactness is the state bound: instead of O(1)
    * per user this holds the touches inside the attribution horizon
    * (ts + window ≥ watermark) and the unflushed conversions — both
    * pruned every invocation, both bounded by rate × horizon, never by
    * stream length. An event-time timeout flushes users the stream goes
    * quiet on. Emission is watermark-delayed by construction — the same
    * latency/completeness trade every watermarked streaming agg makes.
    * Boundary note: Spark drops input rows whose event time is ≤ the
    * CURRENT watermark before they reach the operator — that is the
    * lateness contract itself (and why the initial watermark of 0
    * swallows rows at exactly epoch 0). */
  def attributeBounded(events: DataFrame, touchTypes: Seq[String],
                       convType: String, windowMicros: Long,
                       latenessDelay: String,
                       userCol: String = "user_id", tsCol: String = "ts",
                       typeCol: String = "event_type",
                       idCol: String = "event_id"): Dataset[Attributed] = {
    val spark = events.sparkSession
    import spark.implicits._
    val touches = touchTypes.toSet
    // the watermarked timestamp column must survive the projection —
    // EventTimeTimeout resolves against it; the fold reads only tsUs
    val ds = events.withWatermark(tsCol, latenessDelay)
      .select(col(idCol).cast("long").as("id"),
        col(userCol).cast("long").as("u"),
        unix_micros(col(tsCol)).as("tsUs"),
        col(typeCol).as("typ"),
        col(tsCol).as("wm_ts"))
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
    ds.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it0: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
         state: GroupState[BoundedState]) =>
          val it = it0.map(e => (e._1, e._2, e._3, e._4))
          val st0 = state.getOption.getOrElse(BoundedState(Nil, Nil))
          val st =
            if (state.hasTimedOut) st0
            else {
              val evs = it.toArray
              BoundedState(
                st0.touches ++ evs.collect {
                  case (id, _, ts, typ) if touches.contains(typ) =>
                    TouchState(id, typ, ts)
                },
                st0.pending ++ evs.collect {
                  case (id, _, ts, typ) if typ == convType => (id, ts)
                })
            }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // flush every conversion the watermark has sealed: no touch
          // with event time ≤ its ts can arrive anymore
          val (ready, stillPending) = st.pending.partition(_._2 < wmUs)
          val out = ready.sortBy(identity).map { case (cid, cts) =>
            val best = st.touches
              .filter(t => t.tsUs <= cts && cts - t.tsUs <= windowMicros)
              .sortBy(t => (t.tsUs, t.id)).lastOption
            best match {
              case Some(t) =>
                Attributed(cid, user, cts, Some(t.id), Some(t.typ),
                  Some(cts - t.tsUs))
              case None => Attributed(cid, user, cts, None, None, None)
            }
          }
          // horizon prune: a touch only matters for conversions with
          // cts ≥ watermark, which need ts ≥ cts − window ≥ wm − window
          val touchesKept = st.touches.filter(_.tsUs + windowMicros >= wmUs)
          if (touchesKept.isEmpty && stillPending.isEmpty) state.remove()
          else {
            state.update(BoundedState(touchesKept, stillPending))
            // wake this user when the earliest pending conversion seals,
            // or when the last touch ages out of the horizon
            val nextUs = stillPending.map(_._2).minOption
              .getOrElse(touchesKept.map(_.tsUs + windowMicros).max)
            state.setTimeoutTimestamp((nextUs / 1000L + 1L)
              .max(state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }
}
