package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis.{tokens, ngramsWithMultiplicity}
import graft.functions.Fnv1a64Expr.fnv1a64
import graft.functions.SplitMix64.splitmix64

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed n-gram features are under a target (high-quality)
  * distribution than under the raw pool, then sample proportionally to
  * the importance weight. The published recipe — hashed bigram bag
  * features, bag-of-buckets likelihoods with add-one smoothing, Gumbel
  * top-k for the proportional draw — maps onto Spark as two tiny
  * bucket-keyed aggregations (≤ nBuckets rows each, broadcast back)
  * plus one doc-keyed partial agg; nothing corpus-sized ever sits on
  * the driver, and the final draw is TakeOrdered-shaped, not a global
  * sort.
  *
  * Determinism contract: features hash with the shared FNV-1a fold
  * (oracle-replayable), and the Gumbel noise is the splitmix64(doc_id)
  * 53-bit uniform — the same bit-replayable draw the samplers use —
  * so selection is a pure function of the data.
  */
object Dsir {

  /** Hashed-bigram bucket stream: one row per bigram occurrence
    * (multiplicity kept — bag features, per the paper), tagged with the
    * target flag so BOTH distributions aggregate in one pass. */
  private def buckets(df: DataFrame, textCol: String, idCol: String,
                      isTarget: Column, nBuckets: Int): DataFrame =
    df.select(col(idCol).as("ds_id"), isTarget.as("is_tgt"),
        tokens(lower(col(textCol))).as("tk"))
      .select(col("ds_id"), col("is_tgt"),
        explode(ngramsWithMultiplicity(col("tk"), 2)).as("gram"))
      .select(col("ds_id"), col("is_tgt"),
        fnv1a64(col("gram")).bitwiseAND(lit(nBuckets.toLong - 1)).as("bucket"))

  /** Per-doc importance weight `log p_target(feats) − log p_raw(feats)`
    * over hashed bigram buckets, both bag-of-buckets models add-one
    * smoothed over the nBuckets feature space. `isTarget` marks the
    * rows of `df` forming the target distribution; the raw distribution
    * is the whole frame. Output: (id, n_feats, logw rounded 4 dp);
    * feature-less docs carry logw = 0. nBuckets must be a power of 2. */
  def importanceWeights(df: DataFrame, textCol: String, idCol: String,
                        isTarget: Column, nBuckets: Int = 256): DataFrame = {
    require((nBuckets & (nBuckets - 1)) == 0, "nBuckets must be a power of 2")
    val feats = buckets(df, textCol, idCol, isTarget, nBuckets)
    val cnt = feats.groupBy(col("bucket")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_tgt"), lit(1L)).otherwise(lit(0L))).as("ct"))
    val totals = cnt.agg(sum(col("cr")).as("tot_r"), sum(col("ct")).as("tot_t"))
    val ratio = cnt
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((col("ct") + lit(1L)) /
             (col("tot_t") + lit(nBuckets.toLong))) -
         log((col("cr") + lit(1L)) /
             (col("tot_r") + lit(nBuckets.toLong)))).as("lr"))
    val perDoc = feats
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(col("ds_id"))
      .agg(count(lit(1)).as("n_feats"), round(sum(col("lr")), 4).as("logw"))
    df.select(col(idCol))
      .join(perDoc, col(idCol) === col("ds_id"), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("logw"), lit(0.0)).as("logw"))
  }

  /** Gumbel key for the proportional-to-exp(logw) draw:
    * `logw − ln(−ln(u))` with `u = (splitmix64(id) >>> 11) · 2⁻⁵³`
    * (u ∈ (0,1): the all-zero draw maps to the smallest positive
    * 53-bit value so ln(u) stays finite). */
  private def gumbelKey(id: Column): Column = {
    val u53 = shiftrightunsigned(splitmix64(id.cast("long")), 11)
    val u = greatest(u53, lit(1L)).cast("double") / lit(9007199254740992.0)
    col("logw") - log(-log(u))
  }

  /** DSIR selection: top-`n` docs by `logw + Gumbel(doc)` — an exact,
    * deterministic importance resample (without replacement) of the raw
    * pool toward the target distribution. Keys round to 4 dp with id
    * tie-break so the ordering is engine-independent. */
  def select(df: DataFrame, textCol: String, idCol: String,
             isTarget: Column, n: Int, nBuckets: Int = 256): DataFrame = {
    val w = importanceWeights(df, textCol, idCol, isTarget, nBuckets)
    w.select(col(idCol), col("n_feats"), col("logw"),
        round(gumbelKey(col(idCol)), 4).as("gumbel_key"))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(n)
  }

  /** Persisted DSIR reference — the SEVENTH operable index (text bands,
    * embedding buckets, PQ codes, drift histogram, LM counts, BM25
    * postings, now DSIR bucket counts). [[importanceWeights]] re-derives
    * both distributions from its own pool every run; production DSIR
    * fits target/raw ONCE, freezes the bucket-count table (nBuckets
    * rows — it fits in a broadcast by construction), and scores every
    * incoming batch map-only against it.
    *
    * Scoring on the frozen counts needs defined behavior for buckets
    * the reference never saw (the in-query operator can't hit them):
    * the SAME add-one-smoothed formula with ct = cr = 0, which the
    * left-join + coalesce makes uniform rather than a special case.
    * Append folds a new slice in with bucket-keyed exact integer sums
    * (order-independent), `localCheckpoint`ed before overwriting its
    * own source files — the DriftRef/LmRef append contract. */
  final case class DsirRef(counts: DataFrame, nBuckets: Int) {

    def save(path: String): Unit = {
      new java.io.File(path).mkdirs()
      counts.write.mode("overwrite").parquet(s"$path/counts")
      ArtifactMeta.store(path, "dsir", Seq("nBuckets" -> nBuckets.toString),
        layout = Seq("counts" -> ""))
    }

    def appendTo(path: String, newData: DataFrame, textCol: String,
                 idCol: String, isTarget: Column): Unit = {
      val add = DsirRef.countsOf(newData, textCol, idCol, isTarget, nBuckets)
      val merged = counts.unionByName(add)
        .groupBy(col("bucket"))
        .agg(sum(col("cr")).as("cr"), sum(col("ct")).as("ct"))
        .localCheckpoint()
      merged.write.mode("overwrite").parquet(s"$path/counts")
    }

    /** Importance weight of every batch doc against the frozen
      * reference: one broadcast left join of the feature stream to the
      * count table, per-doc sum at 4 dp. Featureless docs carry 0. */
    def scoreOf(batch: DataFrame, textCol: String, idCol: String): DataFrame = {
      val t = counts.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt")).head()
      val (totR, totT) = (t.getLong(0), t.getLong(1))
      val feats = buckets(batch, textCol, idCol, lit(false), nBuckets)
      val perDoc = feats
        .join(broadcast(counts), Seq("bucket"), "left")
        .select(col("ds_id"),
          (log((coalesce(col("ct"), lit(0L)) + lit(1L)) /
               (lit(totT) + lit(nBuckets.toLong))) -
           log((coalesce(col("cr"), lit(0L)) + lit(1L)) /
               (lit(totR) + lit(nBuckets.toLong)))).as("lr"))
        .groupBy(col("ds_id"))
        .agg(count(lit(1)).as("n_feats"), round(sum(col("lr")), 4).as("logw"))
      batch.select(col(idCol))
        .join(perDoc, col(idCol) === col("ds_id"), "left")
        .select(col(idCol),
          coalesce(col("n_feats"), lit(0L)).as("n_feats"),
          coalesce(col("logw"), lit(0.0)).as("logw"))
    }
  }

  object DsirRef {
    private[operators] def countsOf(df: DataFrame, textCol: String,
        idCol: String, isTarget: Column, nBuckets: Int): DataFrame =
      buckets(df, textCol, idCol, isTarget, nBuckets)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cr"),
          sum(when(col("is_tgt"), lit(1L)).otherwise(lit(0L))).as("ct"))

    def build(df: DataFrame, textCol: String, idCol: String,
              isTarget: Column, nBuckets: Int = 256): DsirRef = {
      require((nBuckets & (nBuckets - 1)) == 0, "nBuckets must be a power of 2")
      DsirRef(countsOf(df, textCol, idCol, isTarget, nBuckets), nBuckets)
    }

    def load(spark: org.apache.spark.sql.SparkSession, path: String): DsirRef = {
      val props = ArtifactMeta.load(path, "dsir")
      DsirRef(spark.read.parquet(s"$path/counts"),
        props.getProperty("nBuckets").toInt)
    }
  }
}
