package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.operators.Dedup.NearDupCorpusIndex

/** Continual-ingest curation — the streaming composition of the batch
  * `curation_pipeline` stages, built for `foreachBatch`:
  *
  *   1. quality gate: the map-only multi-signal ensemble verdict
  *      ([[TextAnalysis.qualityEnsemble]]) drops rejects in the scan —
  *      no state, no shuffle, the cheapest filter runs first;
  *   2. in-batch exact dedup: first-occurrence by content hash (the
  *      groupBy-min + join shape, hot hashes absorbed map-side);
  *   3. corpus near-dup: survivors probe the PERSISTED band index
  *      ([[Dedup.dropNearDupsOfCorpus]]) — candidates come from the
  *      (band, hash) equi-join with partition pruning on the loaded
  *      form, never batch×corpus.
  *
  * The index is the only cross-batch state, and it lives on disk
  * (save/load — shared across daemons and restarts); the micro-batch
  * pipeline itself is stateless, so the composition scales exactly as
  * its stages do. Returns the accepted rows of the batch (original
  * columns). Scope note: batch-INTERNAL near-dups pass (only exact
  * in-batch dupes and batch-vs-corpus near-dups are dropped) — the
  * continual shape catches them one batch later, once survivors are
  * appended to the index offline (the same build-once/probe-many
  * discipline as the ANN index).
  */
object StreamingCuration {

  def curateBatch(batch: DataFrame, textCol: String, idCol: String,
                  idx: NearDupCorpusIndex,
                  minWords: Int = 10, maxWords: Int = 100000,
                  minEntropy: Double = 3.5, minScore: Double = 0.5,
                  nearDupThreshold: Double = 0.5,
                  minStopwords: Int = 2, maxSymbolRatio: Double = 0.1,
                  minAlphaFrac: Double = 0.8,
                  minMeanWordLen: Double = 3.0,
                  maxMeanWordLen: Double = 10.0): DataFrame = {
    // 1. quality gate (map-only)
    val verdict = TextAnalysis.qualityEnsemble(batch, textCol, idCol,
      minWords, maxWords, minEntropy, minScore,
      minStopwords, maxSymbolRatio, minAlphaFrac,
      minMeanWordLen, maxMeanWordLen)
    val passed = batch.join(
      verdict.filter(col("keep")).select(col(idCol)), Seq(idCol))
    // 2. in-batch exact dedup: first occurrence per content hash
    val hashed = passed.withColumn("__h",
      graft.functions.Fnv1a64Expr.fnv1a64(col(textCol)))
    val firsts = hashed.groupBy(col("__h"))
      .agg(min(col(idCol)).as("__keep_id"))
    val uniq = hashed.join(firsts, "__h")
      .filter(col(idCol) === col("__keep_id"))
      .drop("__h", "__keep_id")
    // 3. near-dup probe against the persisted corpus index
    Dedup.dropNearDupsOfCorpus(uniq, textCol, idCol, idx, nearDupThreshold)
  }

  /** Perplexity gate against the persisted reference LM
    * ([[graft.operators.Lm.LmRef]]) — the CCNet stage of the continual
    * pipeline: drop batch docs whose mean bigram log-probability under
    * the FROZEN reference counts falls below the floor (word soup, spam,
    * wrong-register text). Stateless per batch like the other stages —
    * the LM tables are the on-disk cross-batch state, loaded once and
    * reused across micro-batches. Docs with <2 tokens pass through
    * (length policy belongs to the quality-ensemble gate, not here). */
  def lmGate(batch: DataFrame, textCol: String, idCol: String,
             ref: graft.operators.Lm.LmRef,
             minAvgLogprob: Double): DataFrame =
    batch.join(
      ref.scoreOf(batch, textCol, idCol)
        .filter(col("n_bigrams") === 0 || col("avg_logprob") >= minAvgLogprob)
        .select(col(idCol)),
      Seq(idCol))

  /** DSIR gate against the persisted reference counts
    * ([[graft.operators.Dsir.DsirRef]]) — the data-selection stage of
    * the continual pipeline: keep batch docs whose importance weight
    * under the FROZEN target/raw bucket counts clears the floor (docs
    * that look like the target corpus survive; off-distribution text
    * drops). Stateless per batch; the nBuckets-row count table is the
    * on-disk cross-batch state, loaded once. Featureless docs pass
    * through (their weight is the uninformative 0). */
  def dsirGate(batch: DataFrame, textCol: String, idCol: String,
               ref: graft.operators.Dsir.DsirRef,
               minLogw: Double): DataFrame =
    batch.join(
      ref.scoreOf(batch, textCol, idCol)
        .filter(col("n_feats") === 0 || col("logw") >= minLogw)
        .select(col(idCol)),
      Seq(idCol))

  /** Blocklist gate: drop docs containing ANY blocklist phrase — one
    * Aho–Corasick pass per doc over the whole phrase list
    * ([[graft.functions.MultiPatternStats]]), O(len + matches) no
    * matter how many phrases. The only gate in the chain that is a
    * pure map-side FILTER (no self-join, no artifact): the phrase
    * list is a plan-time constant, so it needs no lineage truncation
    * and costs nothing at the exchange. */
  def blocklistGate(batch: DataFrame, textCol: String,
                    patterns: Seq[String]): DataFrame =
    if (patterns.isEmpty) batch
    else batch.filter(
      graft.functions.MultiPatternStats.multi_match(col(textCol), patterns)
        .getField("total_hits") === 0)

  /** Encoding-damage gate: drop docs carrying U+FFFD replacement
    * chars, stray C0 controls, or UTF-8-as-Latin-1 mojibake digraphs
    * ([[graft.operators.CleaningSignals]]) — the double-decode /
    * truncated-stream signature that poisons tokenizers downstream.
    * Like [[blocklistGate]], a pure map-side FILTER with plan-time
    * constant patterns: no self-join, no artifact, no lineage
    * truncation needed, zero exchange cost. */
  def encGate(batch: DataFrame, textCol: String): DataFrame =
    batch.filter(graft.operators.CleaningSignals.encClean(col(textCol)))

  /** Frequency-cap gate against the persisted CMS sketch
    * ([[graft.operators.FreqIndex.FreqRef]]): drop batch rows whose
    * (group, key) the corpus has already seen ≥ `maxCorpusCount`
    * times — the per-key rate limit / source-budget cap (a crawler
    * flooding one domain stops contributing once its budget is
    * spent). The CMS estimate is one-sided, so the cap can only trip
    * EARLY (conservative), never late. Stateless per batch; the
    * 24 KB-per-group counter tables are the on-disk cross-batch
    * state. */
  def freqGate(batch: DataFrame, grpCol: String, keyCol: String,
               ref: graft.operators.FreqIndex.FreqRef,
               maxCorpusCount: Long): DataFrame = {
    val ok = ref.estimateOf(batch, grpCol, keyCol)
      .filter(col("corpus_est") < maxCorpusCount)
      .select(col("grp").as("__fg"), col("key").as("__fk"))
    batch.withColumn("__fg", col(grpCol))
      .withColumn("__fk", col(keyCol).cast("string"))
      .join(ok, Seq("__fg", "__fk"))
      .drop("__fg", "__fk")
  }

  /** Exact-substring gate against the persisted window index
    * ([[Dedup.SubstrCorpusIndex]]): drop batch docs whose corpus-
    * verbatim token share exceeds `maxDupFrac` — the "mostly already in
    * the corpus" filter a near-dup probe can miss when a doc is a
    * mosaic of copied spans below the Jaccard threshold. Stateless per
    * batch; the window-hash set is the on-disk cross-batch state. */
  def substrGate(batch: DataFrame, textCol: String, idCol: String,
                 idx: graft.operators.Dedup.SubstrCorpusIndex,
                 maxDupFrac: Double): DataFrame =
    batch.join(
      idx.dupStatsOf(batch, textCol, idCol)
        .filter(col("dup_frac") <= maxDupFrac)
        .select(col(idCol)),
      Seq(idCol))
}
