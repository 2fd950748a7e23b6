package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event stream —
  * the product-analytics queries a log engine's events table feeds
  * (reference events model: `src/model/mod.rs` event records with
  * ts/user/type; the reference exposes them to downstream OLAP, it has
  * no funnel operator of its own — this is Spark-side analytics over
  * the same shape).
  *
  * Both operators are aggregation cascades, NOT window scans:
  *  - no `collect_list` of a user's whole history (a hot user at 100 TB
  *    would blow a single task),
  *  - every shuffle keys on the user column with map-side partial
  *    aggregation, so repeated stages re-use the same hash partitioning
  *    and AQE can coalesce the tiny per-stage outputs,
  *  - the event scan is filtered to the funnel's event types BEFORE the
  *    first exchange (predicate lands in PushedFilters).
  */
object Funnel {

  /** Strictly-ordered conversion funnel. A user converts to stage i iff
    * they have a `stages(i)` event strictly after their stage-(i−1)
    * conversion instant; the conversion instant is the earliest such
    * event (min-ts, the standard product-analytics semantics). One row
    * per stage: `(stage_idx, stage, n_users, conv_rate)` with
    * `conv_rate` relative to stage 1.
    *
    * Scale shape: stage i is `events ⋈ conv(i−1)` on the user key
    * followed by a partial-agg min — len(stages) shuffles on the SAME
    * key, each output at most |users| rows and shrinking monotonically.
    * The per-stage counts are 1-row aggregates combined via union +
    * a broadcast of the 1-row stage-1 count for the rate.
    */
  /** conv(i): per-user earliest instant of completing stages 0..i in
    * order — the shared chain of [[orderedFunnel]] and
    * [[funnelStageLatency]]. Each step is one stage-filtered scan
    * joined to the previous (shrinking) completion frame. */
  private def stageCompletions(events: DataFrame, stages: Seq[String],
                               userCol: String, tsCol: String,
                               typeCol: String): Seq[DataFrame] = {
    val ev = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol).as("u"), col(typeCol).as("et"), col(tsCol).as("t"))
    stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val stageEv = ev.filter(col("et") === stage)
        Some(prev match {
          case None =>
            stageEv.groupBy(col("u")).agg(min(col("t")).as("ct"))
          case Some(p) =>
            stageEv.join(p.select(col("u"), col("ct").as("prev_ct")), Seq("u"))
              .filter(col("t") > col("prev_ct"))
              .groupBy(col("u")).agg(min(col("t")).as("ct"))
        })
    }.flatten
  }

  def orderedFunnel(events: DataFrame, stages: Seq[String],
                    userCol: String = "user_id", tsCol: String = "ts",
                    typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "orderedFunnel needs at least one stage")
    val convs = stageCompletions(events, stages, userCol, tsCol, typeCol)

    val counts = convs.zip(stages).zipWithIndex.map { case ((c, stage), i) =>
      c.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(stage).as("stage"),
          col("n_users"))
    }.reduce(_.union(_))

    val base = counts.filter(col("stage_idx") === 1)
      .select(col("n_users").as("base_n"))
    counts.crossJoin(broadcast(base))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        round(col("n_users").cast("double") /
          when(col("base_n") === 0, lit(null)).otherwise(col("base_n")), 6)
          .as("conv_rate"))
  }

  /** Weekly cohort retention. Cohort = ISO week (Monday-truncated) of a
    * user's first event of `cohortType` (any event type when None);
    * a cohort user is "active at offset w" iff they have any event in
    * cohort_week + w weeks. Emits the standard retention triangle:
    * `(cohort_week, week_offset, n_active, n_cohort, retention_rate)`.
    *
    * Scale shape: first-event agg shuffles on the user key; the
    * activity set is a (user, week) distinct partial agg; the join back
    * is user-keyed; the final rollup keys on (cohort_week, offset) —
    * ≤ weeks² rows. No windows, no per-user history materialization.
    */
  def cohortRetention(events: DataFrame, cohortType: Option[String] = None,
                      userCol: String = "user_id", tsCol: String = "ts",
                      typeCol: String = "event_type"): DataFrame = {
    val firstEv = cohortType.fold(events)(ct => events.filter(col(typeCol) === ct))
      .groupBy(col(userCol).as("u"))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val active = events
      .select(col(userCol).as("u"), date_trunc("week", col(tsCol)).as("act_week"))
      .distinct()
    val joined = active.join(firstEv, Seq("u"))
      .filter(col("act_week") >= col("cohort_week"))
      .select(col("u"), col("cohort_week"),
        (datediff(col("act_week"), col("cohort_week")) / 7)
          .cast("int").as("week_offset"))
    val cohortSizes = firstEv.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    joined.groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(cohortSizes), Seq("cohort_week"))
      .select(col("cohort_week").cast("date").as("cohort_week"),
        col("week_offset"), col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 6)
          .as("retention_rate"))
  }

  /** Last-touch attribution: each conversion event is attributed to the
    * LATEST preceding touch event (any of `touchTypes`) by the same
    * user within `windowMicros`; conversions with no touch in-window
    * attribute to null. The standard marketing/product attribution
    * query — and the canonical as-of-join consumer.
    *
    * Touches are first made unique per (user, ts) by arg-max event id
    * (two touches on the same microsecond have no canonical "latest";
    * the max-id one is the deterministic pick both engines replay),
    * then [[AsOfJoin.asOf]] carries the most recent touch into each
    * conversion: ONE shuffle on the user key + one ordered window pass
    * — no range-join pair explosion however hot a user is. The time
    * delta stays in exact integer microseconds (`unix_micros`), so the
    * in-window test is bit-identical cross-engine. Inclusive semantics:
    * a touch on the conversion's own microsecond attributes. */
  def lastTouchAttribution(events: DataFrame, touchTypes: Seq[String],
                           convType: String, windowMicros: Long,
                           userCol: String = "user_id", tsCol: String = "ts",
                           typeCol: String = "event_type",
                           idCol: String = "event_id"): DataFrame = {
    require(touchTypes.nonEmpty, "lastTouchAttribution needs touch types")
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .groupBy(col(userCol), col(tsCol).as("touch_ts"))
      .agg(max(struct(col(idCol), col(typeCol))).as("__m"))
      .select(col(userCol), col("touch_ts"),
        col("__m").getField(idCol).as("touch_event_id"),
        col("__m").getField(typeCol).as("touch_type"))
    val conv = events.filter(col(typeCol) === convType)
      .select(col(idCol), col(userCol), col(tsCol))
    val joined = AsOfJoin.asOf(conv, touches, Seq(userCol), tsCol, "touch_ts",
      Seq("touch_event_id", "touch_type", "touch_ts"))
    val inWindow = col("touch_ts").isNotNull &&
      unix_micros(col(tsCol)) - unix_micros(col("touch_ts")) <= windowMicros
    joined.select(col(idCol), col(userCol), col(tsCol),
      when(inWindow, col("touch_event_id")).as("touch_event_id"),
      when(inWindow, col("touch_type")).as("touch_type"),
      when(inWindow, unix_micros(col(tsCol)) - unix_micros(col("touch_ts")))
        .as("micros_since_touch"))
  }

  /** Hourly volume anomaly flags per event type: each (type, hour)
    * count is z-scored against the trailing 24 OBSERVED hours (ROWS,
    * not RANGE — deterministic under sparse hours, and identical
    * window semantics in any SQL engine). The ops-dashboard "error
    * spike" read over the same events table the funnel consumes.
    *
    * Scale shape: one partial agg to (type, hour) — output is
    * types × hours rows regardless of event volume — then a window
    * whose partitions are single event types over those tiny rows.
    * The guards are exact: mu/sigma need ≥2 trailing rows (Spark's
    * 1-row stddev_samp is NaN where SQL engines yield NULL — the
    * n_prev gate removes the divergence), z needs sigma > 0. */
  def hourlyAnomaly(events: DataFrame, zThresh: Double = 3.0,
                    tsCol: String = "ts",
                    typeCol: String = "event_type"): DataFrame = {
    val hourly = events
      .groupBy(col(typeCol).as("event_type"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    val nPrev = count(lit(1)).over(w)
    val mu = avg(col("n_events")).over(w)
    val sigma = stddev_samp(col("n_events")).over(w)
    hourly
      .withColumn("n_prev", nPrev)
      .withColumn("mu", when(col("n_prev") >= 1, round(mu, 4)))
      .withColumn("sigma", when(col("n_prev") >= 2, round(sigma, 4)))
      .withColumn("z",
        when(col("n_prev") >= 2 && sigma > 0,
          round((col("n_events") - mu) / sigma, 4)))
      .withColumn("is_anomaly", coalesce(col("z") > zThresh, lit(false)))
      .drop("n_prev")
  }

  /** Rolling active users — DAU, `windowDays`-day WAU, and stickiness
    * (DAU/WAU) per day: the engagement card every event pipeline
    * publishes.
    *
    * Scale shape: the raw stream collapses to DISTINCT (day, user)
    * FIRST (one partial-agg exchange; hot users absorb map-side), and
    * the rolling window is a `windowDays`× replication of THAT bounded
    * frame — never of the event stream — followed by a per-cover-day
    * distinct count. No range-window over user histories. At extreme
    * user cardinality swap `countDistinct` for an HLL sketch
    * (`approx_count_distinct`); the replication shape is unchanged. */
  /** Rolling per-type daily event stats: count, calendar-correct
    * trailing 7-day moving average, and week-over-week ratio (vs the
    * SAME weekday one week back — a left join on (type, day-7), so
    * missing history yields NULL, not a fake ratio).
    *
    * Scale shape: the stream collapses to (event_type, day) counts
    * first; the RANGE window (integer day number, -6..0) and the
    * self-join both run over that bounded frame — partition size =
    * days observed, independent of event volume. */
  def rollingEventStats(events: DataFrame, tsCol: String = "ts",
                        typeCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("dnum", datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("dnum"))
      .rangeBetween(-6, 0)
    val cur = daily.withColumn("ma_7d", round(avg(col("n_events")).over(w), 4))
    val prev = daily.select(col("event_type"),
      (col("dnum") + 7).as("dnum"), col("n_events").as("n_prev"))
    cur.join(prev, Seq("event_type", "dnum"), "left")
      .select(col("event_type"), col("day"), col("n_events"), col("ma_7d"),
        round(col("n_events").cast("double") / col("n_prev"), 4).as("wow_ratio"))
  }

  def activeUsers(events: DataFrame, tsCol: String = "ts",
                  userCol: String = "user_id",
                  windowDays: Int = 7): DataFrame = {
    val du = events.select(to_date(col(tsCol)).as("day"),
      col(userCol).as("u")).distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("i"),
        col("day"), col("u"))
      .select(date_add(col("day"), col("i")).as("day"), col("u"))
      .groupBy(col("day"))
      .agg(countDistinct(col("u")).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"),
        col("wau").as(s"wau_${windowDays}d"),
        round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for every adjacent (prev → next) event-type pair, the
    * observed count and the row-normalized transition probability
    * P(next | prev). The user-journey summary the funnel/attribution
    * operators specialize (a funnel is a path through this matrix).
    *
    * Scale shape: one window (partitioned by user, ordered by event
    * time with id tie-break — deterministic under same-µs ties) for
    * the lag, then a types²-bounded aggregation; the normalizing sum
    * windows over the prev-type groups of that tiny frame, never the
    * event scan. Per-user partitions bound the sort; a hot user is a
    * skew concern for the lag window only, same posture as sessionize.
    */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
                       typeCol: String = "event_type",
                       tsCol: String = "ts",
                       idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val counts = events
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("p", round(col("n") /
        sum(col("n")).over(Window.partitionBy(col("prev_type"))), 4))
  }

  /** Time-to-advance distribution per funnel transition: for each
    * adjacent stage pair, exact nearest-rank-lower p50 and p90 of the
    * gap between the earliest-completion instants (seconds). The
    * latency view [[orderedFunnel]]'s counts collapse away — "users
    * convert" vs "users take a week to convert" read identically
    * there. Per-transition gap arrays are completer-bounded; swap the
    * KLL sketch past memory bounds. */
  def funnelStageLatency(events: DataFrame, stages: Seq[String],
                         userCol: String = "user_id", tsCol: String = "ts",
                         typeCol: String = "event_type"): DataFrame = {
    require(stages.length >= 2, "funnelStageLatency needs >= 2 stages")
    val convs = stageCompletions(events, stages, userCol, tsCol, typeCol)
    val gaps = (1 until stages.length).map { i =>
      convs(i).select(col("u"), col("ct"))
        .join(convs(i - 1).select(col("u"), col("ct").as("prev_ct")),
          Seq("u"))
        .select(lit(i + 1).as("stage_idx"), lit(stages(i)).as("stage"),
          (unix_micros(col("ct")) - unix_micros(col("prev_ct")))
            .as("gap_us"))
    }.reduce(_ unionByName _)
    val g = gaps.groupBy(col("stage_idx"), col("stage"))
      .agg(sort_array(collect_list(col("gap_us"))).as("v"),
        count(lit(1)).as("n_users"))
    def q(p: Double) = element_at(col("v"),
      (floor(lit(p) * (col("n_users") - 1)) + 1).cast("int"))
    g.select(col("stage_idx"), col("stage"), col("n_users"),
        round(q(0.5) / lit(1000000.0), 6).as("p50_s"),
        round(q(0.9) / lit(1000000.0), 6).as("p90_s"))
      .orderBy(col("stage_idx"))
  }

  /** Cohort lifetime-value matrix: users cohorted by first-event day,
    * revenue (the value of `valueType` events) accumulated over cohort
    * age — the money view of [[cohortRetention]]. Two aggregations
    * (per-user cohort, then (cohort, age) revenue) and one cumulative
    * window over the cohorts×ages frame, never the scan. */
  def cohortLtv(events: DataFrame, valueType: String = "purchase",
                userCol: String = "user_id", tsCol: String = "ts",
                typeCol: String = "event_type",
                valueCol: String = "value"): DataFrame = {
    val cohorts = events.groupBy(col(userCol).as("u"))
      .agg(min(to_date(col(tsCol))).as("cohort"))
    val rev = events.filter(col(typeCol) === valueType)
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"),
        col(valueCol).as("v"))
    val g = rev.join(cohorts, "u")
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("age_d"))
      .agg(countDistinct(col("u")).as("n_buyers"), sum(col("v")).as("rev"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("age_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.select(col("cohort").as("cohort_day"), col("age_d"), col("n_buyers"),
      round(col("rev"), 2).as("revenue"),
      round(sum(col("rev")).over(w), 2).as("cum_revenue"))
  }

  /** Top-k most common 3-step event-type paths across users — the
    * sequence-mining view of [[transitionMatrix]] (which only sees
    * adjacent pairs). Two lag windows over the same per-user sort, a
    * types³-bounded aggregation, TakeOrdered top-k. */
  def topPaths(events: DataFrame, k: Int = 10,
               userCol: String = "user_id", typeCol: String = "event_type",
               tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("t1", lag(col(typeCol), 2).over(w))
      .withColumn("t2", lag(col(typeCol), 1).over(w))
      .filter(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col(typeCol).as("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(k)
  }

  /** GAPPED 3-sequence support (PrefixSpan-style, Pei et al. 2001,
    * restricted to length 3): how many users exhibit a→b→c with
    * arbitrary gaps — [[topPaths]] only counts CONTIGUOUS triples, so
    * "signup … eventually purchases … eventually errors" is invisible
    * there. Existence is decided by the greedy witness: first a, then
    * the earliest b strictly after it, then any c strictly after that
    * (greedy-earliest is sufficient and necessary for subsequence
    * existence). Share = supporting users / all users.
    *
    * Scale shape: one (user, type) min/max agg over the scan, then
    * the witness chain is an events×|types| fan-out equi-join ON THE
    * USER (bounded by the type-alphabet size, never events²) into a
    * (user, a, b)-keyed agg, then a |types|³-bounded support agg. */
  def gappedSeq3Support(events: DataFrame, topK: Int = 20,
                        userCol: String = "user_id",
                        typeCol: String = "event_type",
                        tsCol: String = "ts"): DataFrame = {
    val us = unix_micros(col(tsCol))
    val ut = events.groupBy(col(userCol).as("u"), col(typeCol).as("tau"))
      .agg(min(us).as("mn"), max(us).as("mx"))
    val firstA = ut.select(col("u"), col("tau").as("a"), col("mn").as("ta"))
    val t2 = events
      .select(col(userCol).as("u"), col(typeCol).as("b"), us.as("t"))
      .join(firstA, "u")
      .filter(col("t") > col("ta"))
      .groupBy(col("u"), col("a"), col("b")).agg(min(col("t")).as("tb"))
    val sup = t2
      .join(ut.select(col("u"), col("tau").as("c"), col("mx").as("tc")),
        "u")
      .filter(col("tc") > col("tb"))
      .groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("support"))
    val nu = events.agg(countDistinct(col(userCol)).as("n_users"))
    sup.crossJoin(broadcast(nu))
      .select(col("a"), col("b"), col("c"), col("support"),
        round(col("support").cast("double") / col("n_users"), 6)
          .as("share"))
      .orderBy(col("support").desc, col("a"), col("b"), col("c"))
      .limit(topK)
  }

  /** Daily-activity streaks per user (gaps-and-islands): total active
    * days, the longest run of consecutive days, the run ending at the
    * user's LAST active day, and that day — the habit-strength card
    * next to [[cohortRetention]]'s cohort view. One distinct + one
    * per-user window; islands key on d − row_number (consecutive days
    * share it), max_by is deterministic because island ends are unique
    * within a user. */
  def activityStreaks(events: DataFrame, userCol: Column,
                      tsCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ud = events.select(userCol.as("u"), to_date(tsCol).as("d"))
      .distinct()
    val w = Window.partitionBy(col("u")).orderBy(col("d"))
    val islands = ud.withColumn("rn", row_number().over(w))
      .withColumn("grp", date_sub(col("d"), col("rn")))
      .groupBy(col("u"), col("grp"))
      .agg(count(lit(1)).as("len"), max(col("d")).as("iend"))
    islands.groupBy(col("u"))
      .agg(sum(col("len")).as("n_active_days"),
        max(col("len")).as("longest_streak"),
        max_by(col("len"), col("iend")).as("last_streak"),
        max(col("iend")).as("last_day"))
  }

  /** Markov removal-effect attribution (Anderl et al. 2016's
    * data-driven model): user journeys become a first-order absorbing
    * chain — start → touches → conv/null, truncated at the first
    * conversion — and each channel's credit is how much the start→conv
    * absorption probability DROPS when that channel's node is removed,
    * normalized across channels. The causal-flavored answer to
    * [[lastTouchAttribution]]'s positional heuristic (a mid-journey
    * channel every converting path flows through gets ~0 last-touch
    * credit but a large removal effect).
    *
    * Contract: absorption probabilities come from exactly `rounds`
    * value-iteration steps vq(s) = Σ_dst ⌊P(s,dst)·w(dst)+0.5⌋ with
    * w(conv)=10¹², w(null)=w(removed)=0 — each term quantized to a
    * long, so the fold is order-free and replays as unrolled SQL.
    *
    * Scale shape: ONE distributed pass builds the transition counts
    * (per-user windows — partitioned by user, never global); the
    * value iteration then runs driver-side on the collected
    * state-domain²-bounded count frame (same bounded-pull contract as
    * the k-means centroids), once per channel + once full. */
  def markovAttribution(events: DataFrame, convType: String,
                        channels: Seq[String],
                        rounds: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val seq0 = events.select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === convType, lit("conv"))
          .otherwise(col("event_type")).as("st"))
      .withColumn("rk", row_number().over(w))
    val firstConv = seq0.filter(col("st") === "conv")
      .groupBy(col("user_id")).agg(min(col("rk")).as("cr"))
    val trunc = seq0.join(firstConv, Seq("user_id"), "left")
      .filter(col("cr").isNull || col("rk") <= col("cr"))
    val withNext = trunc.withColumn("nxt", lead(col("st"), 1).over(w))
    val mids = withNext
      .select(col("st").as("src"),
        when(col("st") === "conv", lit(null))
          .otherwise(coalesce(col("nxt"), lit("null"))).as("dst"))
      .filter(col("dst").isNotNull)
    val starts = trunc.filter(col("rk") === 1)
      .select(lit("start").as("src"), col("st").as("dst"))
    val trans = mids.unionAll(starts)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
    // bounded pull: |states|² rows max (state domain, not event volume)
    val tc = trans.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = tc.groupBy(_._1)
      .map { case (s, rows) =>
        s -> rows.map(r => (r._2, r._3)).toSeq }
    val totals = bySrc.map { case (s, rows) => s -> rows.map(_._2).sum }
    def solve(removed: Set[String]): Long = {
      var v = Map.empty[String, Long].withDefaultValue(0L)
      for (_ <- 1 to rounds) {
        v = bySrc.map { case (s, rows) =>
          s -> rows.map { case (dst, c) =>
            val p = c.toDouble / totals(s)
            val wv: Double =
              if (dst == "conv") 1e12
              else if (dst == "null" || removed(dst)) 0.0
              else v(dst).toDouble
            math.floor(p * wv + 0.5).toLong
          }.sum
        }.toMap.withDefaultValue(0L)
      }
      v("start")
    }
    val vFull = solve(Set.empty)
    val effects = channels.sorted.map { ch =>
      val vRem = solve(Set(ch))
      val eq = if (vFull > 0)
        math.floor((vFull - vRem).toDouble / vFull * 1e9 + 0.5).toLong
      else 0L
      (ch, vRem, eq)
    }
    val eqSum = effects.map(_._3).sum
    // HALF_UP on the double's exact value — the same rounding Spark's
    // round() and DuckDB's round() apply to positive doubles
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    effects.map { case (ch, vRem, eq) =>
      (ch, r6(vFull.toDouble / 1e12), r6(vRem.toDouble / 1e12),
        r6(eq.toDouble / 1e9),
        if (eqSum > 0) r6(eq.toDouble / eqSum) else 0.0)
    }.toDF("channel", "p_conv_full", "p_conv_removed",
      "removal_effect", "attribution_share")
  }
}
