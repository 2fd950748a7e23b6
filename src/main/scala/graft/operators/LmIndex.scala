package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis.{tokens, ngramsWithMultiplicity}

/** Persisted bigram language model — the FIFTH operable index (text
  * bands, embedding buckets, PQ codes, drift histogram, now LM counts):
  * the CCNet-style perplexity filter's production form. The in-query
  * [[TextAnalysis.bigramLogprob]] re-aggregates its own corpus every
  * run; a real curation pipeline trains the LM ONCE on a trusted
  * reference corpus, persists the count tables, and scores every new
  * batch against the frozen counts — the reference corpus is never
  * rescanned at probe time.
  *
  * Scale posture: the artifacts are (token, count) and (bigram, count)
  * tables — vocabulary-sized, not corpus-sized. Scoring a batch is two
  * single-key equi-joins (token) and one pair-key equi-join (bigram)
  * against the loaded tables; hot grams join ONE count row, so there is
  * no skew hazard. Append folds a new slice's counts in with gram-keyed
  * exact integer sums (order-independent), `localCheckpoint`ed before
  * overwriting the files it read from — the DriftRef append contract.
  *
  * Scoring on frozen counts needs defined out-of-vocabulary behavior
  * (the in-query operator never sees OOV by construction):
  * `ln(λ·c₁₂/c₁ + μ·(c₂+1)/(N+V))` — the context term drops to 0 when
  * the context is unseen, and the backoff is add-one-smoothed over the
  * reference vocabulary so an all-OOV document scores the finite floor
  * `ln(μ/(N+V))` instead of −∞.
  */
object Lm {

  private def grams(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("lm_id"), tokens(lower(col(textCol))).as("tk"))
      .select(col("lm_id"),
        explode(ngramsWithMultiplicity(col("tk"), 2)).as("gram"))
      .select(col("lm_id"),
        split(col("gram"), " ").getItem(0).as("w1"),
        split(col("gram"), " ").getItem(1).as("w2"))

  /** Unigram count table (w, uc) of a corpus. */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("uc"))

  /** Bigram count table (w1, w2, c) of a corpus. */
  def bigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(tokens(lower(col(textCol))).as("tk"))
      .select(explode(ngramsWithMultiplicity(col("tk"), 2)).as("gram"))
      .select(split(col("gram"), " ").getItem(0).as("w1"),
        split(col("gram"), " ").getItem(1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))

  final case class LmRef(uni: DataFrame, bi: DataFrame,
                         lambda: Double, residual: Double) {

    def save(path: String): Unit = {
      new java.io.File(path).mkdirs()
      uni.write.mode("overwrite").parquet(s"$path/uni")
      bi.write.mode("overwrite").parquet(s"$path/bi")
      ArtifactMeta.store(path, "lm",
        Seq("lambda" -> lambda.toString, "residual" -> residual.toString),
        layout = Seq("uni" -> "", "bi" -> ""))
    }

    /** Fold a new slice's counts into the saved tables (gram-keyed
      * exact integer sums). Checkpoints before overwriting sources. */
    def appendTo(path: String, newData: DataFrame, textCol: String): Unit = {
      val mu = uni.unionByName(unigramCounts(newData, textCol))
        .groupBy(col("w")).agg(sum(col("uc")).as("uc")).localCheckpoint()
      val mb = bi.unionByName(bigramCounts(newData, textCol))
        .groupBy(col("w1"), col("w2")).agg(sum(col("c")).as("c"))
        .localCheckpoint()
      mu.write.mode("overwrite").parquet(s"$path/uni")
      mb.write.mode("overwrite").parquet(s"$path/bi")
    }

    /** Score a batch against the frozen counts: per doc, the bigram
      * count and mean interpolated log-probability (OOV-smoothed as in
      * the object doc). Docs with <2 tokens report (0, 0.0). */
    def scoreOf(batch: DataFrame, textCol: String, idCol: String): DataFrame = {
      val tot = uni.agg(sum(col("uc")).cast("double").as("n_tok"),
        count(lit(1)).cast("double").as("v_size"))
      val perDoc = grams(batch, textCol, idCol)
        .join(bi, Seq("w1", "w2"), "left")
        .join(uni.select(col("w").as("w1"), col("uc").as("c1")), Seq("w1"), "left")
        .join(uni.select(col("w").as("w2"), col("uc").as("c2")), Seq("w2"), "left")
        .crossJoin(broadcast(tot))
        .select(col("lm_id"),
          log(lit(lambda) *
              when(col("c1").isNotNull && col("c").isNotNull,
                col("c") / col("c1")).otherwise(lit(0.0)) +
            lit(residual) * ((coalesce(col("c2"), lit(0L)) + lit(1L)) /
              (col("n_tok") + col("v_size")))).as("lp"))
        .groupBy(col("lm_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("lp")) / count(lit(1)), 4).as("avg_logprob"))
      batch.select(col(idCol))
        .join(perDoc, col(idCol) === col("lm_id"), "left")
        .select(col(idCol),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
    }
  }

  object LmRef {
    def build(df: DataFrame, textCol: String,
              lambda: Double = 0.7, residual: Double = 0.3): LmRef =
      LmRef(unigramCounts(df, textCol), bigramCounts(df, textCol),
        lambda, residual)

    def load(spark: SparkSession, path: String): LmRef = {
      val props = ArtifactMeta.load(path, "lm")
      LmRef(spark.read.parquet(s"$path/uni"), spark.read.parquet(s"$path/bi"),
        props.getProperty("lambda").toDouble,
        props.getProperty("residual").toDouble)
    }
  }
}
