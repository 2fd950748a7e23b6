package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fnv1a64Expr.fnv1a64
import graft.operators.TextAnalysis.tokens

/** In-engine classifier training for model-in-the-loop curation — the
  * fasttext-style quality/language filter trained ON the corpus it will
  * filter, without leaving the engine: full-batch logistic regression
  * over hashed binary token features (feature hashing à la Weinberger
  * et al. 2009; the same bucket space [[Dsir]] uses).
  *
  * Training is a fixed number of deterministic full-batch gradient
  * steps: margin_d = Σ_{b∈d} w_b, p_d = σ(margin), per-bucket gradient
  * mean g_b = Σ_{d∋b}(p_d − y_d)/N, w′ = w − lr·g. Each iteration is
  * two bounded aggregations — a doc-keyed margin agg over the feature
  * rows and a bucket-keyed gradient agg — with the (nBuckets+1)-row
  * weight vector broadcast back; nothing driver-side but the weights.
  *
  * Determinism contract (the pagerank precedent): every cross-row
  * double sum is rounded to 12 dp immediately — margins, gradient
  * means, and updated weights. Raw sums of ≤ ~10³ bounded terms agree
  * across engines/partitionings to ≪ 5·10⁻¹³, so the rounded values
  * are bit-identical and an oracle can replay training as unrolled
  * SQL. At much larger N the agreement bound loosens with row count —
  * drop to 9 dp rounding past ~10⁸ rows (same tolerance argument).
  */
object Classifier {

  /** Distinct hashed-unigram features per doc (binary presence), plus
    * the always-on bias feature b = −1. */
  private def features(df: DataFrame, textCol: String, idCol: String,
                       label: Column, nBuckets: Int): DataFrame = {
    val docs = df.select(col(idCol).as("id"), label.cast("long").as("y"),
      tokens(lower(col(textCol))).as("tk"))
    docs.select(col("id"), col("y"), explode(col("tk")).as("tok"))
      .select(col("id"), col("y"),
        fnv1a64(col("tok")).bitwiseAND(lit(nBuckets.toLong - 1)).as("b"))
      .distinct()
      .unionByName(docs.select(col("id"), col("y"), lit(-1L).as("b")))
  }

  /** Row-local form of [[features]] (r13, guide §2.3/§2.4): one row per
    * doc carrying its distinct bucket set as an ARRAY (bias −1 first,
    * then `array_distinct` over the hashed unigrams — the same set the
    * explode+distinct path shuffles). Margins become a per-row array
    * fold against the weight vector; only the bucket-keyed gradient
    * aggregation still crosses the network. */
  private def featureArr(df: DataFrame, textCol: String, idCol: String,
                         label: Column, nBuckets: Int): DataFrame =
    df.select(col(idCol).as("id"), label.cast("long").as("y"),
      concat(array(lit(-1L)),
        array_distinct(transform(tokens(lower(col(textCol))),
          t => fnv1a64(t).bitwiseAND(lit(nBuckets.toLong - 1))))).as("bs"))

  /** Weight vector as an O(1)-lookup array literal: index b+1 ↔ bucket
    * b (bias −1 at slot 0); absent buckets read 0. Bounded by
    * nBuckets — the same memory class the join path broadcast. */
  private def weightLit(w: scala.collection.Map[Long, Double],
                        nBuckets: Int): Column =
    array((0 to nBuckets).map(i =>
      lit(w.getOrElse(i.toLong - 1L, 0.0))): _*)

  /** The 12-dp margin of one doc's bucket array against a weight
    * literal — the row-local replacement for the join + doc-keyed agg. */
  private def marginCol(bs: Column, wLit: Column): Column =
    round(aggregate(bs, lit(0.0),
      (acc, b) => acc + get(wLit, (b + lit(1L)).cast("int"))), 12)

  /** Driver replica of Spark's `round(x, 12)` on DoubleType
    * (scala BigDecimal, HALF_UP) — bit-identical to the Column op. */
  private def r12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Row-local (id, y, margin) scoring frame shared by the evaluator
    * cards: collects the (nBuckets-bounded) weight vector once and
    * folds each doc's bucket array against it — no feature re-shuffle,
    * no label join (the label rides the feature row). */
  private def scoredPY(df: DataFrame, textCol: String, idCol: String,
                       label: Column, weights: DataFrame,
                       nBuckets: Int): DataFrame = {
    val wm = weights.select(col("bucket"), col("weight")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wLit = weightLit(wm, nBuckets)
    featureArr(Spread(df), textCol, idCol, label, nBuckets)
      .select(col("id"), col("y"), marginCol(col("bs"), wLit).as("margin"))
  }

  /** Train `iters` full-batch LR steps from w = 0 (or from `init` for
    * a warm start — the online-refinement path [[LrModel.refine]]
    * uses); returns the final (bucket, weight) vector (bucket −1 =
    * bias), 12-dp values. With a warm start, buckets seen only in the
    * new batch enter at 0 and trained buckets absent from the batch
    * keep their weight (no decay). */
  def trainLogReg(df: DataFrame, textCol: String, idCol: String,
                  label: Column, nBuckets: Int = 64, iters: Int = 3,
                  lr: Double = 1.0,
                  init: Option[DataFrame] = None): DataFrame = {
    require((nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a power of 2")
    // r13 shape (guide §2.3 "aggregate before you shuffle", §5 bounded
    // driver pulls): the weight vector is (nBuckets+1)-bounded — the
    // SAME vector every pre-r13 iteration collected into a broadcast —
    // so it lives on the driver, margins are row-local array folds
    // against its literal, and each iteration is ONE bucket-keyed
    // gradient aggregation (map-side combined) + one bounded collect.
    // The pre-r13 loop paid per iteration: a broadcast build of the
    // weights, a feature join + doc-keyed margin shuffle, a feature ⋈
    // margins join + bucket shuffle, and an eager localCheckpoint.
    // All rounding contracts unchanged (12 dp at margins, gradients,
    // weight updates — r12(), the bit-identical driver replica of
    // Spark's round, handles the update).
    val spark = df.sparkSession
    import spark.implicits._
    // Spread BELOW the tokenize+hash projection: the exchange moves the
    // (tiny at bench scale, absent at corpus scale) raw rows so the
    // expensive derivation itself runs on every core
    val featsArr = CacheScope.scratch(
      featureArr(Spread(df), textCol, idCol, label, nBuckets))
    val n = featsArr.count() // one row per doc — the old df.count()
    val w = scala.collection.mutable.Map[Long, Double]()
    init.foreach(_.select(col("bucket"), col("weight")).collect()
      .foreach(r => w(r.getLong(0)) = r12(r.getDouble(1))))
    // the present-bucket universe (old `zero` frame): every bucket of
    // every doc appears in each gradient aggregation, so iteration 1's
    // collect seeds the fresh buckets at 0 via getOrElse below
    for (_ <- 1 to iters) {
      val wLit = weightLit(w, nBuckets)
      val p = lit(1.0) /
        (lit(1.0) + exp(-marginCol(col("bs"), wLit)))
      val grows = featsArr
        .select(explode(col("bs")).as("b"), p.as("p"), col("y"))
        .groupBy(col("b"))
        .agg(round(lit(lr) * sum(col("p") - col("y")) / lit(n.toDouble), 12)
          .as("g"))
        .collect()
      // buckets absent from this batch (warm start) keep their weight —
      // the old left-join-with-zero-gradient contract
      grows.foreach { r =>
        val b = r.getLong(0)
        w(b) = r12(w.getOrElse(b, 0.0) - r.getDouble(1))
      }
    }
    w.toSeq.sortBy(_._1).toDF("bucket", "weight")
  }

  /** Score docs with a trained weight vector: the 12-dp margin (log
    * odds) per doc — threshold at 0 for the hard gate, or keep as a
    * soft curation signal. Map-only over the feature rows plus one
    * doc-keyed agg; weights broadcast. Buckets the model never saw
    * (OOV under a warm-started model) contribute 0. */
  def scoreLogReg(df: DataFrame, textCol: String, idCol: String,
                  weights: DataFrame, nBuckets: Int = 64): DataFrame = {
    val feats = features(df, textCol, idCol, lit(0L), nBuckets)
    feats.join(broadcast(weights.select(col("bucket").as("b"),
        col("weight").as("w"))), Seq("b"), "left")
      .groupBy(col("id"))
      .agg(round(sum(coalesce(col("w"), lit(0.0))), 12).as("margin"))
      .select(col("id"), col("margin"))
  }

  /** Reliability diagram (calibration curve) of a trained model on a
    * labeled frame: fixed-width probability bins of σ(margin) with per-
    * bin count, mean predicted probability, and observed positive rate.
    * A well-calibrated gate has mean_p ≈ obs_rate per bin — the check
    * that says whether the LR threshold means what it claims.
    *
    * One scan to score + one bins-sized aggregation. Bin ids are
    * floor(p·nBins) clamped to nBins−1; p is a deterministic function
    * of the 12-dp margin (a libm exp ULP flip across a bin edge needs
    * p within 1 ulp of a decimal boundary — measure-zero in practice,
    * same acceptance as the trainer's rounding contract). */
  def calibration(df: DataFrame, textCol: String, idCol: String,
                  label: Column, weights: DataFrame, nBuckets: Int = 64,
                  nBins: Int = 10): DataFrame = {
    scoredPY(df, textCol, idCol, label, weights, nBuckets)
      .select((lit(1.0) / (lit(1.0) + exp(-col("margin")))).as("p"),
        col("y"))
      .withColumn("bin",
        least(floor(col("p") * nBins).cast("long"), lit(nBins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), round(avg(col("p")), 4).as("mean_p"),
        round(avg(col("y")), 4).as("obs_rate"))
  }

  /** Brier score card of a trained model on a labeled frame: the
    * proper-scoring-rule summary the reliability diagram
    * ([[calibration]]) spreads across bins — mean squared probability
    * error, the base rate, and the Brier skill score
    * 1 − brier/(base·(1−base)) vs always-predict-the-base-rate
    * (> 0 = the model adds information). Squared errors quantize to
    * longs at 1e-12 before the corpus fold, so the score is
    * partition-invariant and exactly replayable.
    *
    * One scan to score + one 1-row agg. */
  def brier(df: DataFrame, textCol: String, idCol: String, label: Column,
            weights: DataFrame, nBuckets: Int = 64): DataFrame = {
    val agg = scoredPY(df, textCol, idCol, label, weights, nBuckets)
      .select((lit(1.0) / (lit(1.0) + exp(-col("margin")))).as("p"),
        col("y"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        // decimal accumulator: 1e12-scaled squared errors summed over
        // a 10k+-doc corpus pass 2^53 and a double sum would go
        // order-dependent exactly when it matters
        sum(floor((col("p") - col("y")) * (col("p") - col("y")) *
          lit(1e12) + lit(0.5)).cast("decimal(38,0)")).as("sq"))
    val base = col("n_pos").cast("double") / col("n")
    val br = col("sq").cast("double") / lit(1e12) / col("n")
    agg.select(col("n"), col("n_pos"), round(base, 6).as("base_rate"),
      round(br, 6).as("brier"),
      when(base > 0 && base < 1,
        round(lit(1.0) - br / (base * (lit(1.0) - base)), 6))
        .as("brier_skill"))
  }

  /** Expected calibration error of a trained model: the single-number
    * rollup of the reliability diagram — Σ_b (n_b/n)·|mean_p − obs|,
    * computed as EXACT integer bin sums (p quantized at 1e-12 into
    * decimal accumulators, the gap |Σp − Σy·1e12| is exact integer
    * arithmetic), plus the worst single-bin gap. */
  def ece(df: DataFrame, textCol: String, idCol: String, label: Column,
          weights: DataFrame, nBuckets: Int = 64,
          nBins: Int = 10): DataFrame = {
    val perBin = scoredPY(df, textCol, idCol, label, weights, nBuckets)
      .select((lit(1.0) / (lit(1.0) + exp(-col("margin")))).as("p"),
        col("y"))
      .withColumn("bin",
        least(floor(col("p") * nBins).cast("long"), lit(nBins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_b"),
        sum(floor(col("p") * lit(1e12) + lit(0.5)).cast("decimal(38,0)"))
          .as("spq"),
        sum(col("y")).as("sy"))
      .withColumn("gap_q",
        abs(col("spq") - col("sy").cast("decimal(38,0)") *
          lit(1000000000000L)))
    perBin.agg(sum(col("n_b")).as("n"),
        count(lit(1)).as("n_bins_nonempty"),
        sum(col("gap_q")).as("sgap"),
        max(col("gap_q").cast("double") / lit(1e12) /
          col("n_b")).as("maxg"))
      .select(col("n"), col("n_bins_nonempty"),
        round(col("sgap").cast("double") / lit(1e12) / col("n"), 6)
          .as("ece"),
        round(col("maxg"), 6).as("max_bin_gap"))
  }

  /** Split-conformal prediction card (Vovk; Lei et al. 2018) for the
    * binary gate: calibration docs (even ids) rank their true-class
    * nonconformity s = y ? 1−p : p, the threshold is the
    * ⌈(n+1)(1−α)⌉-th smallest score, and the held-out half reports
    * empirical coverage (should be ≥ 1−α) and mean prediction-set
    * size (1 = informative, 2 = vacuous). Scores quantize at 1e-12 so
    * ranking, threshold, and the coverage comparisons are integer-
    * exact cross-engine.
    *
    * Scale note: the threshold is a global order statistic over the
    * calibration half — swap the row_number window for the two-phase
    * range-partitioned rank (the gini path) past memory bounds. */
  def conformal(df: DataFrame, textCol: String, idCol: String,
                label: Column, weights: DataFrame, nBuckets: Int = 64,
                alpha: Double = 0.1): DataFrame = {
    val scored = scoredPY(df, textCol, idCol, label, weights, nBuckets)
      .select(col("id"), col("y"),
        (lit(1.0) / (lit(1.0) + exp(-col("margin")))).as("p"))
      .withColumn("sq", floor(
        when(col("y") === 1, lit(1.0) - col("p")).otherwise(col("p")) *
          lit(1e12) + lit(0.5)).cast("long"))
    val calib = scored.filter(pmod(col("id"), lit(2)) === 0)
    val test = scored.filter(pmod(col("id"), lit(2)) =!= 0)
    val nCal = calib.agg(count(lit(1)).as("n_calib"))
      .select(col("n_calib"),
        least(ceil((col("n_calib") + lit(1L)) * lit(1.0 - alpha))
          .cast("long"), col("n_calib")).as("k"))
    // k-th order statistic via the two-phase range-partitioned rank:
    // the calibration half is corpus-sized, and a partition-less
    // row_number window would funnel it through one task (r11 audit —
    // same class as the rfm/quantile-norm fix)
    val thr = Ranks.globalRank(calib, Seq(col("sq"), col("id")), "rk")
      .crossJoin(broadcast(nCal))
      .filter(col("rk") === col("k"))
      .select(col("n_calib"), col("sq").as("thr_q"))
    val sets = test.crossJoin(broadcast(thr))
      .agg(count(lit(1)).as("n_test"),
        first(col("n_calib")).as("n_calib"),
        first(col("thr_q")).as("thr_q"),
        sum(when(col("sq") <= col("thr_q"), 1L).otherwise(0L))
          .as("n_covered"),
        sum(when(floor((lit(1.0) - col("p")) * lit(1e12) + lit(0.5))
            .cast("long") <= col("thr_q"), 1L).otherwise(0L) +
          when(floor(col("p") * lit(1e12) + lit(0.5))
            .cast("long") <= col("thr_q"), 1L).otherwise(0L))
          .as("set_sz"))
    sets.select(col("n_calib"), col("n_test"),
      round(col("thr_q") / lit(1e12), 6).as("threshold"),
      round(col("n_covered").cast("double") / col("n_test"), 6)
        .as("coverage"),
      round(col("set_sz").cast("double") / col("n_test"), 6)
        .as("avg_set_size"))
  }

  /** Persisted LR model — the ELEVENTH operable artifact (text bands,
    * embedding buckets, PQ codes, drift histogram, LM counts, BM25
    * postings, DSIR reference, substring corpus hashes, cardinality
    * registers, media signatures, now classifier weights). Artifacts:
    * `weights/` parquet (bucket, weight) + `meta.properties` pinning
    * nBuckets so a probe can never hash into a different feature
    * space than the model was trained in. */
  final case class LrModel(weights: DataFrame, nBuckets: Int) {

    def save(path: String): Unit = {
      new java.io.File(path).mkdirs()
      weights.write.mode("overwrite").parquet(s"$path/weights")
      ArtifactMeta.store(path, "lr", Seq("nBuckets" -> nBuckets.toString),
        layout = Seq("weights" -> ""))
    }

    /** Margin (log-odds) per doc under the frozen weights. */
    def scoreOf(df: DataFrame, textCol: String, idCol: String): DataFrame =
      scoreLogReg(df, textCol, idCol, weights, nBuckets)

    /** Hard gate: keep rows whose margin exceeds `threshold`. Keeps
      * the input schema (the margin is internal to the decision). */
    def gate(df: DataFrame, textCol: String, idCol: String,
             threshold: Double = 0.0): DataFrame = {
      val kept = scoreOf(df, textCol, idCol)
        .filter(col("margin") > threshold).select(col("id"))
      df.join(kept, df(idCol) === kept("id"), "left_semi")
    }

    /** Online refinement: warm-start `iters` full-batch steps on a new
      * labeled batch, persisting back. Trained buckets absent from the
      * batch keep their weight; novel buckets enter at 0.
      * localCheckpoint materializes before overwriting the source. */
    def refine(path: String, newData: DataFrame, textCol: String,
               idCol: String, label: Column, iters: Int = 1,
               lr: Double = 1.0): LrModel = {
      val w2 = trainLogReg(newData, textCol, idCol, label, nBuckets,
        iters, lr, init = Some(weights)).localCheckpoint()
      val m = LrModel(w2, nBuckets)
      m.save(path)
      m
    }
  }

  object LrModel {
    def train(df: DataFrame, textCol: String, idCol: String, label: Column,
              nBuckets: Int = 64, iters: Int = 3,
              lr: Double = 1.0): LrModel =
      LrModel(trainLogReg(df, textCol, idCol, label, nBuckets, iters, lr),
        nBuckets)

    def load(spark: org.apache.spark.sql.SparkSession,
             path: String): LrModel = {
      val props = ArtifactMeta.load(path, "lr")
      LrModel(spark.read.parquet(s"$path/weights"),
        props.getProperty("nBuckets").toInt)
    }
  }

  /** Unbiased pass@k over per-task attempt outcomes (Chen et al. 2021,
    * "Evaluating Large Language Models Trained on Code", eq. 1):
    *   pass@k = 1 − C(n−c, k)/C(n, k)
    *          = 1 − Π_{i=0..k−1} (n−c−i)/(n−i),
    * the probability ≥1 of k sampled attempts passes, computed WITHOUT
    * enumerating k-subsets. The product form never touches a factorial
    * (C(n,k) overflows at modest n); each factor is one exact-integer
    * subtraction pair cast to double once, multiplied in fixed i order
    * — the identical association an external SQL replay writes.
    * n−c < k ⇒ the product hits a zero factor ⇒ pass@k = 1 exactly;
    * n < k ⇒ NULL (the estimator is undefined below k attempts).
    * One exact groupBy to (task, n, c); everything after is map-side. */
  def passAtK(attempts: DataFrame, taskCol: Column, correctCol: Column,
              ks: Seq[Int] = Seq(1, 5, 10)): DataFrame = {
    val base = attempts
      .groupBy(taskCol.as("task_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(correctCol, 1L).otherwise(0L)).as("c"))
    val passCols = ks.map { k =>
      val prod = (0 until k).foldLeft(lit(1.0): Column) { (acc, i) =>
        acc * ((col("n") - col("c") - lit(i)).cast("double") /
          (col("n") - lit(i)).cast("double"))
      }
      when(col("n") >= k, round(lit(1.0) - prod, 6)).as(s"pass_at_$k")
    }
    base.select(col("task_id") +: col("n") +: col("c") +: passCols: _*)
  }

  /** The SQL text of one pass@k product (shared with the oracle so the
    * factor association cannot drift). */
  def passAtKSql(k: Int): String = {
    val prod = (0 until k)
      .map(i => s"(CAST(n - c - $i AS DOUBLE) / CAST(n - $i AS DOUBLE))")
      .mkString(" * ")
    s"CASE WHEN n >= $k THEN round(1.0 - $prod, 6) END"
  }
}
