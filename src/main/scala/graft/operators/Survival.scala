package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival analysis over an event stream: time from each
  * user's first event to their first `eventType` occurrence, with
  * right-censoring at the corpus horizon for users who never convert —
  * the time-to-conversion curve funnels/retention summarize away
  * (retention buckets calendar periods; KM handles censoring
  * correctly, which a naive "fraction converted by day d" does not).
  *
  * Estimator (Kaplan & Meier 1958): at each distinct duration with
  * d_i conversion events and n_i users still at risk,
  * `S(t) = Π_{t_i ≤ t} (1 − d_i/n_i)`.
  *
  * Scale shape: one user-keyed aggregation over the scan (min event
  * time, min conversion time), a 1-row censor-horizon broadcast, then
  * everything runs on the distinct-durations frame — bounded by the
  * observation span in horizon units, never the user count. The
  * cumulative product is exp(Σ ln) so both engines fold the same
  * ordered frame; the all-remaining-convert tail (1 − d/n = 0) is
  * handled with an explicit zero flag because `ln(0)` is null on
  * Spark and an error on DuckDB. Durations use integer DIV — no
  * float-epoch edge cases.
  */
object Survival {

  def kaplanMeier(events: DataFrame, eventType: String,
                  userCol: String = "user_id", tsCol: String = "ts",
                  typeCol: String = "event_type",
                  horizonUs: Long = 3600000000L): DataFrame = {
    val us = unix_micros(col(tsCol))
    val perUser = events.groupBy(col(userCol))
      .agg(min(us).as("t0"),
        min(when(col(typeCol) === eventType, us)).as("te"))
    val cens = events.agg(max(us).as("tc"))
    val durs = perUser.crossJoin(broadcast(cens))
      .select(expr(s"(coalesce(te, tc) - t0) DIV $horizonUs").as("dur"),
        when(col("te").isNotNull, 1L).otherwise(0L).as("ev"))
    val byDur = durs.groupBy(col("dur"))
      .agg(count(lit(1)).as("total"), sum(col("ev")).as("d"))
    // global windows over the distinct-durations frame only (bounded
    // by the observation span — same posture as rankSumAuc)
    val wOrd = Window.orderBy(col("dur"))
    val wAll = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wBefore = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wUpto = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    byDur
      .withColumn("n_risk", sum(col("total")).over(wAll) -
        coalesce(sum(col("total")).over(wBefore), lit(0L)))
      .withColumn("lnf", when(col("d") > 0 && col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk")))
        .otherwise(lit(0.0)))
      .withColumn("zf",
        when(col("d") > 0 && col("d") >= col("n_risk"), 1).otherwise(0))
      .withColumn("surv", when(max(col("zf")).over(wUpto) === 1, lit(0.0))
        .otherwise(round(exp(sum(col("lnf")).over(wUpto)), 6)))
      .filter(col("d") > 0)
      .select(col("dur").as("dur_h"), col("n_risk"),
        col("d").as("d_events"), col("surv"))
  }

  /** Two-arm log-rank test (Mantel 1966) on time-to-first-`eventType`:
    * does arm B convert on a different survival curve than arm A —
    * the censoring-correct replacement for "compare mean
    * time-to-convert", which silently drops never-converters. `armCol`
    * is a USER-level expression (evaluated after the per-user rollup;
    * arm 1 = "a", arm 0 = "b", mirroring the `user_id % 2` A/B
    * convention of the other experiment readouts).
    *
    * At each distinct duration t with d events total and n at risk,
    * arm a contributes observed d_a and expected d·n_a/n with
    * hypergeometric variance d·(n_a/n)·(n_b/n)·(n−d)/(n−1);
    * χ² = (Σd_a − ΣE_a)² / ΣV.
    *
    * Scale shape: identical to [[kaplanMeier]] — one user-keyed agg,
    * one 1-row censor broadcast, then cumulative windows over the
    * distinct-durations frame (bounded by the horizon-unit span, never
    * the user count). Determinism: expected/variance terms quantize to
    * longs at 1e-9 before the final fold (terms ≤ n_at_risk keep the
    * quantized magnitudes < 2^51 up to ~10⁶ users at risk per
    * duration; re-derive the resolution before lifting that), so the
    * sums are partition-invariant and an external engine replays χ²
    * exactly. */
  def logRank(events: DataFrame, eventType: String, armCol: Column,
              userCol: String = "user_id", tsCol: String = "ts",
              typeCol: String = "event_type",
              horizonUs: Long = 3600000000L): DataFrame = {
    val us = unix_micros(col(tsCol))
    val perUser = events.groupBy(col(userCol))
      .agg(min(us).as("t0"),
        min(when(col(typeCol) === eventType, us)).as("te"))
    val cens = events.agg(max(us).as("tc"))
    val durs = perUser.crossJoin(broadcast(cens))
      .select(expr(s"(coalesce(te, tc) - t0) DIV $horizonUs").as("dur"),
        when(col("te").isNotNull, 1L).otherwise(0L).as("ev"),
        armCol.cast("int").as("arm"))
    val byDur = durs.groupBy(col("dur"))
      .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("tot_a"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("tot_b"),
        sum(when(col("arm") === 1, col("ev")).otherwise(0L)).as("d_a"),
        sum(when(col("arm") === 0, col("ev")).otherwise(0L)).as("d_b"))
    val wBefore = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val risks = byDur
      .withColumn("na", sum(col("tot_a")).over(wAll) -
        coalesce(sum(col("tot_a")).over(wBefore), lit(0L)))
      .withColumn("nb", sum(col("tot_b")).over(wAll) -
        coalesce(sum(col("tot_b")).over(wBefore), lit(0L)))
      .withColumn("d", col("d_a") + col("d_b"))
      .withColumn("n", col("na") + col("nb"))
      .filter(col("d") > 0)
    // expected + variance terms; quantize BEFORE the cross-partition sum
    val eTerm = col("d").cast("double") * col("na") / col("n")
    val vTerm = when(col("n") > 1,
      col("d").cast("double") * col("na") * col("nb") * (col("n") - col("d")) /
        (col("n").cast("double") * col("n") * (col("n") - lit(1L))))
      .otherwise(lit(0.0))
    val totals = durs.agg(
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_users_a"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_users_b"))
    val agg = risks.agg(
      sum(col("d_a")).as("obs_a"),
      sum(floor(eTerm * lit(1e9) + lit(0.5))).as("eq"),
      sum(floor(vTerm * lit(1e9) + lit(0.5))).as("vq"))
      .crossJoin(broadcast(totals))
    val expA = col("eq") / lit(1e9)
    val v = col("vq") / lit(1e9)
    val diff = col("obs_a").cast("double") - expA
    agg.select(col("n_users_a"), col("n_users_b"), col("obs_a"),
      round(expA, 6).as("exp_a"),
      when(col("vq") > 0, round(diff * diff / v, 6)).as("chi2"),
      when(col("vq") > 0, round(diff / sqrt(v), 6)).as("z"))
  }
}
