package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
        binOf(col(valCol), binWidth))
      .groupBy(col("grp"), col("half"), col("bin"))
      .agg(count(lit(1)).as("n"))
    psiOfShares(
      shares(binned.filter(col("half") === "p").drop("half")),
      shares(binned.filter(col("half") === "q").drop("half")), eps)
  }

  private def binOf(v: org.apache.spark.sql.Column, binWidth: Double) =
    floor(v / binWidth).cast("long").as("bin")

  /** (grp, bin, share) from a (grp, bin, n) histogram — totals via one
    * bins-sized agg + join, no window. */
  private def shares(hist: DataFrame): DataFrame = {
    val tot = hist.groupBy(col("grp")).agg(sum(col("n")).as("tot"))
    hist.join(tot, "grp")
      .select(col("grp"), col("bin"),
        (col("n").cast("double") / col("tot")).as("share"))
  }

  /** Shared PSI tail: ε-clamped full-outer share join + per-group sum. */
  private def psiOfShares(p: DataFrame, q: DataFrame,
                          eps: Double): DataFrame = {
    val pp = p.select(col("grp").as("pg"), col("bin").as("pb"),
      col("share").as("p_share"))
    val qq = q.select(col("grp").as("qg"), col("bin").as("qb"),
      col("share").as("q_share"))
    pp.join(qq, col("pg") === col("qg") && col("pb") === col("qb"), "full_outer")
      .select(coalesce(col("pg"), col("qg")).as("grp"),
        greatest(coalesce(col("p_share"), lit(0.0)), lit(eps)).as("pc"),
        greatest(coalesce(col("q_share"), lit(0.0)), lit(eps)).as("qc"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_bins"),
        round(sum((col("pc") - col("qc")) * log(col("pc") / col("qc"))), 4)
          .as("psi"))
  }

  /** PSI between two frames' value distributions under the same
    * binning — the two-sample form of the monitor (no time split, no
    * persisted reference): p = `dfP`'s shares, q = `dfQ`'s. Same
    * bins-sized tail as every other PSI path. */
  def psiBetween(dfP: DataFrame, dfQ: DataFrame, grpCol: String,
                 valCol: String, binWidth: Double,
                 eps: Double = 1e-6): DataFrame =
    psiOfShares(
      shares(referenceHistogram(dfP, grpCol, valCol, binWidth)),
      shares(referenceHistogram(dfQ, grpCol, valCol, binWidth)), eps)

  /** Reference-side histogram for the drift MONITOR: (grp, bin, n)
    * counts at `binWidth`. Built once from the reference corpus, then
    * persisted — probes never rescan the reference data; the histogram
    * (bins-sized, not corpus-sized) is the only state they read. The
    * same continual-ingest posture as the three persisted dedup/ANN
    * indexes. */
  def referenceHistogram(df: DataFrame, grpCol: String, valCol: String,
                         binWidth: Double): DataFrame =
    df.select(col(grpCol).as("grp"), binOf(col(valCol), binWidth))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("n"))

  /** Persisted drift-reference index — the operable form (fourth
    * persisted index next to the text-band / emb-bucket / PQ-code
    * three): histogram parquet under `<path>/hist`, binWidth in
    * meta.properties so a probe can never compare with mismatched
    * binning. The histogram is bins-sized, so append's merge agg and
    * even a driver materialization are bounded regardless of how much
    * data ever flowed through. */
  final case class DriftRef(hist: DataFrame, binWidth: Double) {

    def save(path: String): Unit = {
      new java.io.File(path).mkdirs()
      hist.write.mode("overwrite").parquet(s"$path/hist")
      ArtifactMeta.store(path, "drift", Seq("binWidth" -> binWidth.toString),
        layout = Seq("hist" -> ""))
    }

    /** Fold a new slice's counts into the saved histogram (bin-keyed
      * sum — exact, order-independent). localCheckpoint materializes
      * the merge BEFORE overwriting the files it read from. */
    def appendTo(path: String, newData: DataFrame, grpCol: String,
                 valCol: String): Unit = {
      val merged = hist
        .unionByName(referenceHistogram(newData, grpCol, valCol, binWidth))
        .groupBy(col("grp"), col("bin")).agg(sum(col("n")).as("n"))
        .localCheckpoint()
      merged.write.mode("overwrite").parquet(s"$path/hist")
    }

    /** PSI of a batch against this reference (probe step). */
    def psiOf(batch: DataFrame, grpCol: String, valCol: String,
              eps: Double = 1e-6): DataFrame =
      psiVsReference(batch, hist, grpCol, valCol, binWidth, eps)

    /** KS sup-gap of a batch against this reference (probe step). */
    def ksOf(batch: DataFrame, grpCol: String, valCol: String): DataFrame =
      ksVsReference(batch, hist, grpCol, valCol, binWidth)

    /** Per-group in-control (μ, σ) derived from the persisted
      * histogram at bin midpoints — the reference moments the
      * batch-cadence CUSUM drift gate (`wpcurate daemon
      * --drift-cusum`) walks against, exactly the ewmaAlarms/
      * cusumAlarms contract: the stream never judges itself.
      * Bins-sized collect (bounded regardless of corpus size). */
    def moments: Map[String, (Double, Double)] =
      hist.groupBy(col("grp").cast("string").as("grp"))
        .agg(sum(col("n")).cast("double").as("m0"),
          sum(col("n") * (col("bin") + lit(0.5)) * lit(binWidth)).as("m1"),
          sum(col("n") * pow((col("bin") + lit(0.5)) * lit(binWidth), 2))
            .as("m2"))
        .collect().map { r =>
          val (n, s1, s2) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
          val mu = s1 / n
          r.getString(0) -> (mu, math.sqrt(math.max(0.0, s2 / n - mu * mu)))
        }.toMap
  }

  object DriftRef {
    def build(df: DataFrame, grpCol: String, valCol: String,
              binWidth: Double): DriftRef =
      DriftRef(referenceHistogram(df, grpCol, valCol, binWidth), binWidth)

    def load(spark: SparkSession, path: String): DriftRef = {
      val props = ArtifactMeta.load(path, "drift")
      DriftRef(spark.read.parquet(s"$path/hist"),
        props.getProperty("binWidth").toDouble)
    }
  }

  /** PSI of a new batch against a persisted reference histogram — the
    * drift monitor's probe step (run it under `foreachBatch`): p = the
    * reference's shares, q = the batch's. Both sides are bins-sized
    * before any join; the batch pays one partial agg. Equal inputs at
    * the same binWidth reproduce [[psi]] exactly (parity is pinned in
    * R8OpsSpec). */
  def psiVsReference(batch: DataFrame, ref: DataFrame, grpCol: String,
                     valCol: String, binWidth: Double,
                     eps: Double = 1e-6): DataFrame =
    psiOfShares(shares(ref),
      shares(referenceHistogram(batch, grpCol, valCol, binWidth)), eps)

  /** Two-sample Kolmogorov–Smirnov sup-gap of a batch against a
    * persisted reference histogram — the drift watch's distribution-
    * SHAPE companion to [[psiVsReference]] (PSI reads per-bin share
    * ratios and saturates on empty bins; KS reads the CDF and catches a
    * location/scale shift even when every bin stays populated). The KS
    * statistic of the BINNED distributions: both sides bin at the
    * reference's binWidth, the batch's histogram full-outer-joins the
    * reference's (bins-sized), cumulative sums run per group over bin
    * order, and D = max|cumP·nQ − cumQ·nP| / (nP·nQ) stays in exact
    * integer cross-multiplied form until the one final division — the
    * [[Metrics.ksTest]] tie-block contract applied to bins.
    *
    * Scale shape: the batch pays one partial agg to bins-sized form;
    * everything after is bins×groups rows. Degenerate sides (empty
    * reference or batch group) emit NULL ks_d. */
  def ksVsReference(batch: DataFrame, ref: DataFrame, grpCol: String,
                    valCol: String, binWidth: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = referenceHistogram(batch, grpCol, valCol, binWidth)
      .withColumnRenamed("n", "nq")
    val joined = ref.withColumnRenamed("n", "np")
      .join(b, Seq("grp", "bin"), "full_outer")
      .select(col("grp"), col("bin"),
        coalesce(col("np"), lit(0L)).as("np"),
        coalesce(col("nq"), lit(0L)).as("nq"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("grp"))
    joined
      .withColumn("cump", sum(col("np")).over(wCum))
      .withColumn("cumq", sum(col("nq")).over(wCum))
      .withColumn("tp", sum(col("np")).over(wAll))
      .withColumn("tq", sum(col("nq")).over(wAll))
      .groupBy(col("grp"))
      .agg(max(abs(col("cump") * col("tq") - col("cumq") * col("tp")))
          .as("dnum"),
        first(col("tp")).as("n_ref"), first(col("tq")).as("n_batch"))
      .select(col("grp"), col("n_ref"), col("n_batch"),
        when(col("n_ref") > 0 && col("n_batch") > 0,
          round(col("dnum").cast("double") /
            (col("n_ref").cast("double") * col("n_batch").cast("double")),
            6)).as("ks_d"))
  }
}
