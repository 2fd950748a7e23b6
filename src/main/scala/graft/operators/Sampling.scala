package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SplitMix64.splitmix64

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Both variants key every decision off `splitmix64(id)` — a pure
  * function of the row id, so the sample is (a) reproducible across
  * runs, clusters, and engines (the DuckDB oracle recomputes the exact
  * same bits), (b) stable under repartitioning (no RNG-per-task state
  * like `df.sample`), and (c) map-only for the Bernoulli form: at
  * 100 TB the filter is pushed into the scan stage, zero shuffles.
  */
object Sampling {

  /** Uniform 53-bit integer in [0, 2^53) derived from the id — compare
    * against `floor(rate * 2^53)` for an exact-rational Bernoulli draw
    * (no float rounding ambiguity between engines). */
  def unitUniform53(id: Column): Column =
    shiftrightunsigned(splitmix64(id.cast("long")), 11)

  def thresholdFor(rate: Double): Long = (rate * (1L << 53)).toLong

  /** Stratified Bernoulli sample: per-stratum keep rates (e.g. balance
    * languages by downsampling the head). Map-only — no shuffle, no
    * state; rows not in `rates` use `defaultRate`. */
  def stratifiedBernoulli(df: DataFrame, idCol: String, stratumCol: String,
                          rates: Map[String, Double],
                          defaultRate: Double): DataFrame = {
    val thr = rates.foldLeft(lit(thresholdFor(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(thresholdFor(rate))).otherwise(acc)
    }
    df.filter(unitUniform53(col(idCol)) < thr)
  }

  /** Exactly-N-per-stratum sample: rank rows inside each stratum by the
    * id hash (a deterministic shuffle order) and keep the first N.
    * One exchange on the stratum key; the per-stratum sort is bounded
    * by stratum size — for corpus-scale strata prefer the Bernoulli
    * form or pre-aggregate counts to derive per-stratum rates. */
  def stratifiedExactN(df: DataFrame, idCol: String, stratumCol: String,
                       n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(unitUniform53(col(idCol)), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }
}
