package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Train `iters` full-batch LR steps from w = 0; returns the final
    * (bucket, weight) vector (bucket −1 = bias), 12-dp values. */
  def trainLogReg(df: DataFrame, textCol: String, idCol: String,
                  label: Column, nBuckets: Int = 64, iters: Int = 3,
                  lr: Double = 1.0): DataFrame = {
    require((nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a power of 2")
    val feats = features(df, textCol, idCol, label, nBuckets)
      .localCheckpoint()
    val n = df.count()
    var wts = feats.select(col("b")).distinct()
      .withColumn("w", lit(0.0)).localCheckpoint()
    for (_ <- 1 to iters) {
      val pd = feats.join(broadcast(wts), Seq("b"))
        .groupBy(col("id"), col("y"))
        .agg(round(sum(col("w")), 12).as("m"))
        .select(col("id"), col("y"),
          (lit(1.0) / (lit(1.0) + exp(-col("m")))).as("p"))
      val grad = feats.join(pd.select(col("id"), col("y"), col("p")),
          Seq("id", "y"))
        .groupBy(col("b"))
        .agg(round(lit(lr) * sum(col("p") - col("y")) / lit(n.toDouble), 12)
          .as("g"))
      wts = wts.join(grad, Seq("b"))
        .select(col("b"), round(col("w") - col("g"), 12).as("w"))
        .localCheckpoint()
    }
    wts.select(col("b").as("bucket"), col("w").as("weight"))
  }

  /** Score docs with a trained weight vector: the 12-dp margin (log
    * odds) per doc — threshold at 0 for the hard gate, or keep as a
    * soft curation signal. Map-only over the feature rows plus one
    * doc-keyed agg; weights broadcast. */
  def scoreLogReg(df: DataFrame, textCol: String, idCol: String,
                  weights: DataFrame, nBuckets: Int = 64): DataFrame = {
    val feats = features(df, textCol, idCol, lit(0L), nBuckets)
    feats.join(broadcast(weights.select(col("bucket").as("b"),
        col("weight").as("w"))), Seq("b"))
      .groupBy(col("id"))
      .agg(round(sum(col("w")), 12).as("margin"))
      .select(col("id"), col("margin"))
  }
}
