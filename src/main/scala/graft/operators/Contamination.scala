package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.udf

/** Benchmark-contamination detection: flag training documents whose
  * word n-grams overlap an evaluation/benchmark corpus (the standard
  * decontamination pass before pre-training).
  *
  * Scale shape: the benchmark side is small by construction (eval sets
  * are MBs even when the train corpus is 100 TB), so its exploded
  * shingle table is BROADCAST — the train corpus streams through a
  * map-side hash join keyed by shingle and is never shuffled. Overlap
  * counts then aggregate on (train_id, eval_id), bounded by the number
  * of contaminated pairs, not corpus size.
  */
object Contamination {

  /** Overlapping-n-gram pairs between `train` and `eval` docs:
    * (train_id, eval_id, n_overlap, overlap_ratio) where n_overlap is
    * the number of DISTINCT shared n-grams and overlap_ratio is the
    * fraction of the eval doc's n-grams found in the train doc.
    * Shingle sets come from `Dedup.shingleDf` (distinct per doc), so
    * the join-match count IS the intersection size. */
  def ngramOverlap(train: DataFrame, eval_ : DataFrame,
                   textCol: String, idCol: String,
                   n: Int = 3, minOverlap: Long = 1): DataFrame = {
    def exploded(df: DataFrame, outId: String) =
      Dedup.shingleDf(df, textCol, idCol, n, outId)
        .select(col(outId), explode_outer(col("shingles")).as("shingle"))
        .filter(col("shingle").isNotNull)
    val tSh = exploded(train, "train_id")
    val eSh = CacheScope.scratch(exploded(eval_, "eval_id"))
    val eSizes = eSh.groupBy(col("eval_id")).agg(count(lit(1)).as("eval_n"))
    tSh.join(broadcast(eSh), "shingle")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .join(broadcast(eSizes), "eval_id")
      .select(col("train_id"), col("eval_id"), col("n_overlap"),
        round(col("n_overlap").cast("double") / col("eval_n"), 4).as("overlap_ratio"))
  }

  /** Sketch-based contamination pre-filter — the cheapest 100-TB first
    * pass: a Bloom filter over the eval corpus's shingles (built once,
    * ~1.2 bytes/element at 1% fpp) rides the task closure, and each
    * train doc counts its shingle hits in a single map — NO join, NO
    * shuffle, nothing but the scan. One-sided error: every truly
    * overlapping doc is flagged (Bloom has no false negatives); the
    * DOC-level false-positive rate compounds per shingle —
    * 1-(1-fpp)^s for s shingles/doc — so fpp must sit well under
    * 1/s (the 1e-4 default ⇒ ~0.4% doc-level fp at s=40, ~2.9
    * bytes/element). `ngramOverlap` verifies the flagged survivors.
    *
    * The scan is ONE UDF over the raw text (tokenize + shingle + test
    * inside a single pass, semantics identical to `Dedup.shinglesOf` —
    * distinct shingles, whitespace tokens). Handing the UDF a computed
    * shingle-array column instead re-evaluates that whole expression
    * tree on the interpreted UDF-argument path: measured ~25×
    * slower on the sf0.1 corpus. */
  def ngramBloomFlag(train: DataFrame, eval_ : DataFrame,
                     textCol: String, idCol: String,
                     n: Int = 3, fpp: Double = 1e-4): DataFrame = {
    val eSh = Dedup.shingleDf(eval_, textCol, idCol, n, "eval_id")
      .select(explode_outer(col("shingles")).as("shingle"))
      .filter(col("shingle").isNotNull)
      .distinct()
    val expected = math.max(1L, eSh.count())
    val bloom = eSh.stat.bloomFilter("shingle", expected, fpp)
    val hits = udf((text: String) => {
      if (text == null) 0L
      else {
        val toks = text.trim.split("\\s+").filter(_.nonEmpty)
        val seen = new java.util.HashSet[String]()
        var i = 0
        var cnt = 0L
        while (i + n <= toks.length) {
          val sh = toks.slice(i, i + n).mkString(" ")
          if (seen.add(sh) && bloom.mightContainString(sh)) cnt += 1
          i += 1
        }
        cnt
      }
    })
    train.select(col(idCol).as("train_id"), hits(col(textCol)).as("n_flagged"))
      .filter(col("n_flagged") > 0)
  }

  /** Decontamination REPORT — the per-doc rollup of an overlap run:
    * how many eval docs each train doc collides with, its worst
    * overlap ratio, and the keep verdict (keep ⇔ zero hits). Same
    * consume-the-pairs posture as `Dedup.dedupKeepListFromPairs`: the
    * overlaps frame already exists (mined once), the rollup is a tiny
    * (train_id)-keyed agg, and the join back to the corpus carries
    * only ids. */
  def decontaminationReport(train: DataFrame, idCol: String,
                            overlaps: DataFrame): DataFrame = {
    val agg = overlaps.groupBy(col("train_id"))
      .agg(countDistinct(col("eval_id")).as("n_eval_hits"),
        max(col("overlap_ratio")).as("max_overlap_ratio"))
    train.select(col(idCol))
      .join(agg, train(idCol) === agg("train_id"), "left")
      .select(col(idCol),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        col("max_overlap_ratio"),
        col("train_id").isNull.as("keep"))
  }

  /** Decontamination APPLY — ship the clean corpus: anti-join the
    * train side against the contaminated ids. Left-anti on an 8-byte
    * key; the contaminated set is small (bounded by eval-set overlap),
    * so this broadcasts at any corpus scale. */
  def decontaminate(train: DataFrame, idCol: String,
                    overlaps: DataFrame): DataFrame =
    train.join(overlaps.select(col("train_id")).distinct(),
      train(idCol) === col("train_id"), "left_anti")

  /** EMBEDDING-space contamination — the paraphrase-robust complement
    * of [[ngramOverlap]]: a reworded benchmark answer shares no
    * 3-grams with its source but lands on (nearly) the same embedding,
    * so the flag is cosine ≥ threshold against ANY eval vector.
    * Returns the per-train-doc rollup (distinct eval hits + worst
    * cosine), the [[decontaminationReport]] shape.
    *
    * Scale shape: the same multi-table random-hyperplane buckets as
    * `Similarity.cosineNearDupPairs`, made ASYMMETRIC — the eval
    * side's bucket table and vectors are broadcast (eval sets stay
    * MBs at any train scale), so the train corpus streams through a
    * map-side (table, bucket) equi-join, candidates dedup as id
    * pairs before any vector work, and only candidates pay an exact
    * cosine. Buckets come from deterministic splitmix planes ⇒ the
    * oracle replays candidate generation bit-for-bit. */
  def embeddingContamination(train: DataFrame, eval_ : DataFrame,
                             vecCol: String, idCol: String, dim: Int,
                             threshold: Double = 0.95,
                             nBits: Int = 2, tables: Int = 8): DataFrame = {
    import graft.functions.VecDot.vec_dot
    val trBase = CacheScope.scratch(train.select(col(idCol).as("train_id"),
      col(vecCol).as("tv"), sqrt(vec_dot(col(vecCol), col(vecCol))).as("tn")))
    val evBase = CacheScope.scratch(eval_.select(col(idCol).as("eval_id"),
      col(vecCol).as("ev"), sqrt(vec_dot(col(vecCol), col(vecCol))).as("en")))
    def buckets(base: DataFrame, id: String, v: String) = base
      .withColumn("tb",
        explode(Similarity.tableBucketArray(col(v), dim, nBits, tables)))
      .select(col(id), col("tb.t").as("t"), col("tb.b").as("b"))
    val cands = buckets(trBase, "train_id", "tv")
      .join(broadcast(buckets(evBase, "eval_id", "ev")), Seq("t", "b"))
      .select(col("train_id"), col("eval_id")).distinct()
    cands.join(trBase, "train_id")
      .join(broadcast(evBase), "eval_id")
      .select(col("train_id"),
        round(vec_dot(col("tv"), col("ev")) / (col("tn") * col("en")), 6)
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("cos_sim")).as("max_cos_sim"))
  }
}
