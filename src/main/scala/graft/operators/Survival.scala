package graft.operators

import org.apache.spark.sql.DataFrame
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
}
