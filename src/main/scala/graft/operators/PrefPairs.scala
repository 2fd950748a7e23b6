package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-pair (RLHF / DPO) training-data diagnostics: given
  * (pair, chosen, rejected) rows, compute the per-pair signals a
  * reward-model data pipeline gates on, and the corpus-level bias
  * summary that tells you whether the preference set will just teach
  * the model "longer is better".
  *
  * Per-pair: length of each side, length ratio, distinct-token Jaccard
  * overlap (near-identical pairs carry no preference signal), exact-dup
  * flag, and which side is longer. Corpus: pair count, fraction where
  * chosen is longer (the length-bias number reward-model papers
  * report), mean length ratio, mean overlap, exact-dup count.
  *
  * Scale shape: the per-pair stage is map-only codegen'd array/string
  * expressions — zero shuffles, rides the scan at any corpus size; the
  * summary is a single partial-agg fold. Ratios guard zero-length /
  * zero-union degenerate pairs with NULL rather than NaN.
  */
object PrefPairs {

  /** Distinct whitespace tokens (the same tokenization the vocab ops
    * use: trim, split on runs of whitespace, drop empties). */
  private def toks(c: Column): Column =
    array_distinct(filter(split(trim(c), "\\s+"), x => length(x) > 0))

  def pairStats(pairs: DataFrame, idCol: Column, chosenCol: Column,
                rejectedCol: Column): DataFrame = {
    val lc = length(chosenCol).cast("long")
    val lr = length(rejectedCol).cast("long")
    val tc = toks(chosenCol)
    val tr = toks(rejectedCol)
    val inter = size(array_intersect(tc, tr)).cast("long")
    val union = size(array_union(tc, tr)).cast("long")
    pairs.select(
      idCol.as("pair_id"),
      lc.as("len_chosen"),
      lr.as("len_rejected"),
      when(lr > 0, round(lc.cast("double") / lr.cast("double"), 4))
        .as("len_ratio"),
      inter.as("n_tok_inter"),
      union.as("n_tok_union"),
      when(union > 0, round(inter.cast("double") / union.cast("double"), 4))
        .as("tok_jaccard"),
      (chosenCol === rejectedCol).as("exact_dup"),
      (lc > lr).as("chosen_longer"))
  }

  /** One-row corpus bias summary over [[pairStats]] output. The
    * averaged ratios are MICRO-averaged (ratio of exact integer sums,
    * not mean of per-pair floats) so the fold is bit-deterministic
    * under any partitioning — and micro is the better-defined corpus
    * statistic anyway (long pairs shouldn't be diluted by short ones). */
  def biasSummary(stats: DataFrame): DataFrame =
    stats.agg(
      count(lit(1)).as("n_pairs"),
      round(sum(when(col("chosen_longer"), 1L).otherwise(0L))
        .cast("double") / count(lit(1)), 4).as("pct_chosen_longer"),
      round(sum(col("len_chosen")).cast("double") /
        sum(col("len_rejected")), 4).as("agg_len_ratio"),
      round(sum(col("n_tok_inter")).cast("double") /
        sum(col("n_tok_union")), 4).as("micro_jaccard"),
      sum(when(col("exact_dup"), 1L).otherwise(0L)).as("n_exact_dup"))
}
