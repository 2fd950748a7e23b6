package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two time slices of a stream —
  * the pre-training sanity check that a feed's feature distribution
  * hasn't shifted underneath a pipeline (and the offline twin of a
  * serving-skew monitor).
  */
object Drift {

  /** Population Stability Index per group between the first and second
    * half of the observed time range:
    *
    *   PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)
    *
    * with fixed-width value bins (`floor(value / binWidth)` — exact
    * IEEE ops, engine-replayable, no quantile sort) and ε-clamped
    * shares so one-sided bins contribute a finite, bounded term (the
    * standard PSI convention). Rule of thumb: < 0.1 stable, 0.1–0.25
    * moderate shift, > 0.25 drifted.
    *
    * Scale shape: one pass for the (min, max) time bounds (a 1-ROW
    * broadcast, the dataset_card pattern), then ONE corpus-sized
    * partial agg down to (group, half, bin) counts; every join and
    * window after that runs on the bins-sized frame (≤ value_range /
    * binWidth rows per group, independent of event volume). */
  def psi(df: DataFrame, grpCol: String, valCol: String, tsCol: String,
          binWidth: Double, eps: Double = 1e-6): DataFrame = {
    val us = unix_micros(col(tsCol))
    val bounds = df.agg(min(us).as("t0"), max(us).as("t1"))
    val binned = df.crossJoin(broadcast(bounds))
      .select(col(grpCol).as("grp"),
        when(us <= expr("(t0 + t1) DIV 2"), lit("p")).otherwise(lit("q"))
          .as("half"),
        floor(col(valCol) / binWidth).cast("long").as("bin"))
      .groupBy(col("grp"), col("half"), col("bin"))
      .agg(count(lit(1)).as("n"))
    val tot = binned.groupBy(col("grp"), col("half")).agg(sum(col("n")).as("tot"))
    val shares = binned.join(tot, Seq("grp", "half"))
      .select(col("grp"), col("half"), col("bin"),
        (col("n").cast("double") / col("tot")).as("share"))
    val p = shares.filter(col("half") === "p")
      .select(col("grp").as("pg"), col("bin").as("pb"), col("share").as("p_share"))
    val q = shares.filter(col("half") === "q")
      .select(col("grp").as("qg"), col("bin").as("qb"), col("share").as("q_share"))
    p.join(q, col("pg") === col("qg") && col("pb") === col("qb"), "full_outer")
      .select(coalesce(col("pg"), col("qg")).as("grp"),
        greatest(coalesce(col("p_share"), lit(0.0)), lit(eps)).as("pc"),
        greatest(coalesce(col("q_share"), lit(0.0)), lit(eps)).as("qc"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_bins"),
        round(sum((col("pc") - col("qc")) * log(col("pc") / col("qc"))), 4)
          .as("psi"))
  }
}
