package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BPE tokenizer — the TWELFTH operable artifact. The
  * mergeable form is the adjacent-pair COUNT table (not the merge
  * list): counts sum across corpus slices exactly, so `appendTo` folds
  * a new slice in without rescanning old data, and the top-N merge
  * table is DERIVED from the counts at use time (merge ranks are
  * global order statistics — persisting them directly would make
  * incremental growth impossible). Same build → save → load → probe →
  * appendTo contract as the other eleven; `wpindex bpe` CLI kind.
  *
  * Encoding applies the derived merges through the
  * [[graft.functions.BpeApply]] native expression — map-only over the
  * scan, the N-row merge table rides the plan (ANN-codebook
  * precedent).
  */
object Tokenizer {

  final case class TokenizerRef(counts: DataFrame) {

    def save(path: String): Unit = {
      new java.io.File(path).mkdirs()
      counts.write.mode("overwrite").parquet(s"$path/pair_counts")
      ArtifactMeta.store(path, "bpe", Nil,
        layout = Seq("pair_counts" -> ""))
    }

    /** Top-N merge table (n desc, then pair — the induction order). */
    def merges(topN: Int): Seq[(String, String)] =
      counts.orderBy(col("n").desc, col("tok_a"), col("tok_b"))
        .limit(topN).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq

    /** Encode: (id, n_tokens_in, n_tokens_out) under the frozen
      * tokenizer's top-N merges. */
    def encode(df: DataFrame, textCol: String, idCol: String,
               topN: Int = 50): DataFrame = {
      val m = merges(topN)
      df.select(col(idCol).as("id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_in"),
        size(graft.functions.BpeApply.bpe_apply(lower(col(textCol)), m))
          .cast("long").as("n_out"))
    }

    /** Fold a new slice's pair counts in (pair-keyed exact sum;
      * localCheckpoint materializes before overwriting sources). */
    def appendTo(path: String, newData: DataFrame,
                 textCol: String): TokenizerRef = {
      val merged = counts
        .unionByName(pairCounts(newData, textCol))
        .groupBy(col("tok_a"), col("tok_b")).agg(sum(col("n")).as("n"))
        .localCheckpoint()
      merged.write.mode("overwrite").parquet(s"$path/pair_counts")
      TokenizerRef(merged)
    }
  }

  /** Full adjacent-pair count table (the un-truncated
    * [[TextAnalysis.topBigramMerges]] aggregation). */
  def pairCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(TextAnalysis.tokens(lower(col(textCol))).as("t"))
      .select(explode(
        filter(
          transform(sequence(lit(0), greatest(size(col("t")) - 2, lit(0))),
            i => when(i + 2 <= size(col("t")),
              struct(element_at(col("t"), i + 1).as("a"),
                element_at(col("t"), i + 2).as("b")))),
          x => x.isNotNull)).as("p"))
      .groupBy(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
      .agg(count(lit(1)).as("n"))

  object TokenizerRef {
    def train(df: DataFrame, textCol: String): TokenizerRef =
      TokenizerRef(pairCounts(df, textCol))

    def load(spark: SparkSession, path: String): TokenizerRef = {
      ArtifactMeta.load(path, "bpe")
      TokenizerRef(spark.read.parquet(s"$path/pair_counts"))
    }
  }
}
