package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SplitMix64.splitmix64

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Both variants key every decision off `splitmix64(id)` — a pure
  * function of the row id, so the sample is (a) reproducible across
  * runs, clusters, and engines (the DuckDB oracle recomputes the exact
  * same bits), (b) stable under repartitioning (no RNG-per-task state
  * like `df.sample`), and (c) map-only for the Bernoulli form: at
  * 100 TB the filter is pushed into the scan stage, zero shuffles.
  */
object Sampling {

  /** Uniform 53-bit integer in [0, 2^53) derived from the id — compare
    * against `floor(rate * 2^53)` for an exact-rational Bernoulli draw
    * (no float rounding ambiguity between engines). */
  def unitUniform53(id: Column): Column =
    shiftrightunsigned(splitmix64(id.cast("long")), 11)

  def thresholdFor(rate: Double): Long = (rate * (1L << 53)).toLong

  /** Stratified Bernoulli sample: per-stratum keep rates (e.g. balance
    * languages by downsampling the head). Map-only — no shuffle, no
    * state; rows not in `rates` use `defaultRate`. */
  def stratifiedBernoulli(df: DataFrame, idCol: String, stratumCol: String,
                          rates: Map[String, Double],
                          defaultRate: Double): DataFrame = {
    val thr = rates.foldLeft(lit(thresholdFor(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(thresholdFor(rate))).otherwise(acc)
    }
    df.filter(unitUniform53(col(idCol)) < thr)
  }

  /** Training-shard assignment + composition stats: shard =
    * splitmix64-uniform of the doc id mod nShards — the deterministic
    * global shuffle+shard step before training-data writes (pair with
    * `.write.partitionBy("shard")` so each shard lands as its own file
    * set; the hash gives ~equal shards at any corpus size and total
    * INDEPENDENCE from input order/partitioning). Map-only expression
    * plus one bounded agg (nShards rows). */
  def shardStats(df: DataFrame, textCol: String, idCol: String,
                 nShards: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        pmod(unitUniform53(col(idCol)), lit(nShards.toLong)).cast("int").as("shard"),
        graft.operators.TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))

  /** Exactly-N-per-stratum sample: rank rows inside each stratum by the
    * id hash (a deterministic shuffle order) and keep the first N.
    *
    * Two-phase so the final window never sees a whole stratum: each
    * input partition first streams out at most N rows per stratum
    * (sortWithinPartitions + a constant-memory scan — the global top-N
    * by (hash, id) is always a subset of the per-partition top-Ns),
    * then the exact rank runs over that pruned frame, whose per-stratum
    * size is ≤ N × #partitions regardless of corpus size. A one-phase
    * row_number window would buffer an entire hot stratum in one task
    * — the same funnel shape the dedup df-cap fix removed. */
  def stratifiedExactN(df: DataFrame, idCol: String, stratumCol: String,
                       n: Int): DataFrame = {
    val withRnd = df.withColumn("__rnd", unitUniform53(col(idCol)))
    val pruned = PartitionPrune.firstNPerKey(withRnd, stratumCol,
      Seq(col("__rnd"), col(idCol)), n)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("__rnd"), col(idCol))
    pruned.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
      .drop("__rnd")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir", IPL 97(5)): per item
    * draw u ∈ (0, 1] from the splitmix64 id hash and rank by
    * ln(u)/w — the top-n per stratum are an EXACT weighted sample
    * without replacement (the ln form is the monotone twin of the
    * paper's u^(1/w) key, and ln is the one transcendental both
    * engines already agree on bit-for-bit). The principled one-pass
    * "sample big docs more often, but never twice" selector the
    * Bernoulli/exact-N samplers can't express; deterministic ⇒
    * reproducible shards AND a DuckDB-replayable oracle.
    *
    * Scale shape: map-only key computation, per-stratum top-n via the
    * partition-pruned rank (frames bounded at n×#partitions per
    * stratum). Non-positive weights are excluded (never sampled). */
  def weightedSampleN(df: DataFrame, idCol: String, stratumCol: String,
                      weightCol: String, n: Int): DataFrame = {
    val u = (unitUniform53(col(idCol)) + 1).cast("double") /
      lit(9007199254740992.0) // 2^53; +1 => u in (0, 1], ln defined
    val keyed = df.filter(col(weightCol) > 0)
      .withColumn("__es_key", log(u) / col(weightCol).cast("double"))
    val pruned = PartitionPrune.firstNPerKey(keyed, stratumCol,
      Seq(col("__es_key").desc, col(idCol)), n)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("__es_key").desc, col(idCol))
    pruned.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
      .withColumn("es_key", round(col("__es_key"), 6))
      .drop("__es_key")
  }

  /** Domain-mixture weighting: the per-domain sampling/repeat factor
    * that reshapes the corpus's actual token distribution into a
    * target mixture (the step that decides how often each source is
    * seen during training). For each domain:
    *
    *   weight = target_share / actual_token_share
    *
    * where target shares come from `targets` (domains absent from the
    * map get `defaultTarget`) normalized over the domains actually
    * present. weight > 1 ⇒ the domain repeats (weight = effective
    * epochs over its tokens); weight < 1 ⇒ downsample.
    *
    * Scale shape: ONE partial aggregation on the domain key; the
    * unpartitioned windows run over the aggregated frame, whose row
    * count is the number of domains — constant for any corpus size. */
  def domainWeights(df: DataFrame, domainCol: String, nTokens: Column,
                    targets: Map[String, Double],
                    defaultTarget: Double): DataFrame = {
    // no orderBy ⇒ the frame is the whole (domains-sized) partition
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val tgtRaw = targets.foldLeft(lit(defaultTarget)) {
      case (acc, (domain, share)) =>
        when(col("domain") === domain, lit(share)).otherwise(acc)
    }
    df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(nTokens).as("n_tokens"))
      .withColumn("target_raw", tgtRaw)
      .withColumn("actual_share",
        col("n_tokens").cast("double") / sum(col("n_tokens")).over(w))
      .withColumn("target_share", col("target_raw") / sum(col("target_raw")).over(w))
      .withColumn("weight", col("target_share") / col("actual_share"))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        round(col("actual_share"), 6).as("actual_share"),
        round(col("target_share"), 6).as("target_share"),
        round(col("weight"), 6).as("weight"))
  }

  /** Temperature-scaled mixture weights — the no-hand-tuning
    * counterpart of [[domainWeights]] (the multilingual-sampling
    * rule of Lample & Conneau, arXiv:1901.07291 §3.1): sampling
    * probability q_i(α) = p_i^α / Σ_j p_j^α over the actual token
    * shares p. α = 1 keeps the natural distribution, α → 0
    * approaches uniform — one knob upsamples every low-resource
    * domain at once instead of a per-domain target map. Emits q for
    * each requested α as `q_aNN` (NN = 100α).
    *
    * Scale shape: identical to domainWeights — ONE partial
    * aggregation on the domain key; every window runs over the
    * aggregated domains-sized frame (constant for any corpus). */
  def temperatureWeights(df: DataFrame, domainCol: String, nTokens: Column,
                         alphas: Seq[Double]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    def qName(a: Double) = f"q_a${math.round(a * 100)}%02d"
    val base = df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(nTokens).as("n_tokens"))
      .withColumn("share",
        col("n_tokens").cast("double") / sum(col("n_tokens")).over(w))
    val withQ = alphas.foldLeft(base) { (acc, a) =>
      acc.withColumn(qName(a),
        pow(col("share"), lit(a)) / sum(pow(col("share"), lit(a))).over(w))
    }
    withQ.select(col("domain") +: col("n_docs") +: col("n_tokens") +:
      round(col("share"), 6).as("share") +:
      alphas.map(a => round(col(qName(a)), 6).as(qName(a))): _*)
  }

  /** UniMax epoch-capped mixture allocation (Chung et al., "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining", arXiv:2304.09151): split a token
    * budget as uniformly as possible across domains, except no domain
    * repeats more than `epochCap` epochs — the principled alternative
    * to temperature sampling when low-resource domains would otherwise
    * be over-epoched into memorization. Water-filling, closed form:
    * process domains by ascending capped size C·n_d; at step i the
    * uniform share of the remaining budget is (B − prefix)/(L − i + 1);
    * a domain whose full C·n_d fits under that share is capped (takes
    * C·n_d), and by monotonicity every later domain splits the
    * remainder evenly. All comparisons run on exact integers widened
    * to double, so the branch taken is engine-independent and the
    * DuckDB oracle replays the allocation bit-for-bit.
    *
    * Scale shape: identical to [[domainWeights]] — ONE partial
    * aggregation on the domain key; the water-filling windows run over
    * the aggregated domains-sized frame (constant for any corpus). */
  def unimaxAllocation(df: DataFrame, domainCol: String, nTokens: Column,
                       budgetTokens: Long, epochCap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy()
    val wAsc = Window.partitionBy().orderBy(col("n_full"), col("domain"))
    df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(nTokens).as("n_tokens"))
      .withColumn("n_full", lit(epochCap.toLong) * col("n_tokens"))
      .withColumn("idx", row_number().over(wAsc))
      .withColumn("prefix", coalesce(
        sum(col("n_full")).over(wAsc.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n_domains", count(lit(1)).over(wAll))
      .withColumn("share_cand",
        (lit(budgetTokens) - col("prefix")).cast("double") /
          (col("n_domains") - col("idx") + 1))
      .withColumn("capped", col("n_full").cast("double") <= col("share_cand"))
      .withColumn("capped_total",
        sum(when(col("capped"), col("n_full")).otherwise(lit(0L))).over(wAll))
      .withColumn("n_uncapped",
        sum(when(col("capped"), lit(0)).otherwise(lit(1))).over(wAll))
      .withColumn("alloc", when(col("capped"), col("n_full").cast("double"))
        .otherwise((lit(budgetTokens) - col("capped_total")).cast("double") /
          col("n_uncapped")))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        col("capped"),
        round(col("alloc"), 4).as("alloc_tokens"),
        round(col("alloc") / col("n_tokens"), 6).as("epochs"),
        round(col("alloc") / lit(budgetTokens).cast("double"), 6).as("weight"))
  }

  /** Leakage-safe train/eval split: the split key is the NEAR-DUP
    * CLUSTER, not the document, so two near-duplicate documents can
    * never straddle the boundary — the standard guard against eval
    * contamination that a per-doc random split silently violates
    * (a doc's near-twin in train inflates every eval metric).
    * `clusters` is a precomputed (doc, cluster) labeling (e.g.
    * [[graft.operators.Clustering.dupClusters]] over verified near-dup
    * pairs — the same consume-precomputed-pairs discipline as
    * `dedupKeepListFromPairs`); unlabeled docs are singleton clusters
    * of themselves. The draw is `splitmix64(cluster_id)` against an
    * exact-rational threshold, so membership is reproducible across
    * engines and runs and every cluster member draws the same side.
    *
    * Scale shape: one equi-join against the cluster labeling (only
    * docs that appear in a near-dup pair — typically a small fraction;
    * broadcast when small) + a map-only hash draw. No window, no
    * driver state. */
  def clusterSafeSplit(docs: DataFrame, idCol: String,
                       clusters: DataFrame, clusterDocCol: String,
                       clusterIdCol: String, evalRate: Double): DataFrame = {
    val c = clusters.select(col(clusterDocCol).as("__split_doc"),
      col(clusterIdCol).as("__split_cluster"))
    docs.join(c, docs(idCol) === col("__split_doc"), "left")
      .withColumn("cluster_id", coalesce(col("__split_cluster"), col(idCol)))
      .withColumn("split",
        when(unitUniform53(col("cluster_id")) < thresholdFor(evalRate),
          lit("eval")).otherwise(lit("train")))
      .drop("__split_doc", "__split_cluster")
  }

  /** Leakage-safe k-fold assignment: the whole near-dup cluster draws
    * ONE fold (splitmix64 of the cluster id, mod k), so a doc and its
    * near-twin can never land in different cross-validation folds —
    * the k-way generalization of [[clusterSafeSplit]]. Singletons fall
    * through to their own id. Map-only after the id-keyed cluster
    * join. */
  def clusterSafeFolds(docs: DataFrame, idCol: String,
                       clusters: DataFrame, clusterDocCol: String,
                       clusterIdCol: String, k: Int): DataFrame = {
    require(k > 1, "clusterSafeFolds: need k > 1")
    val c = clusters.select(col(clusterDocCol).as("__f_doc"),
      col(clusterIdCol).as("__f_cluster"))
    docs.join(c, docs(idCol) === col("__f_doc"), "left")
      .withColumn("cluster_id", coalesce(col("__f_cluster"), col(idCol)))
      .withColumn("u53_fold", unitUniform53(col("cluster_id")))
      // fold = ⌊u53·k / 2⁵³⌋ — exact integer range partition of the
      // 53-bit draw (a signed-pmod of the raw 64-bit mix would diverge
      // from the unsigned HUGEINT replay for k ∤ 2⁶⁴)
      .withColumn("fold",
        expr(s"(u53_fold * $k) DIV ${1L << 53}"))
      .drop("__f_doc", "__f_cluster", "u53_fold")
  }

  /** Token-budget corpus selection: per group (lang/source), keep the
    * highest-quality docs whose cumulative token count stays within
    * `frac` of the group's total — the "take the best N tokens" step
    * of a data-constrained training run. The scale-correct shape: NO
    * per-doc ranking window. Docs first collapse into (group, score)
    * buckets (score is the rounded-4 classifier output ⇒ ≤ 10⁴ buckets
    * per group regardless of corpus size); the cumulative sum runs
    * over that bounded bucket frame, and the kept set is "every bucket
    * whose running total fits the budget" — deterministic, exact, and
    * replayable by any engine. Returns per-group selection stats
    * (threshold score, docs and tokens kept).
    *
    * The bounded-bucket precondition is ENFORCED here, not trusted:
    * the score is re-rounded to 4 decimals before bucketing (identity
    * for already-rounded scores, so oracles are unaffected). Without
    * this, an unrounded double score makes every doc its own bucket
    * and the cumsum silently degenerates into the per-doc window this
    * operator exists to avoid. */
  def budgetSelect(scored: DataFrame, grpCol: String, scoreCol: String,
                   tokCol: String, frac: Double): DataFrame = {
    val sB = round(col(scoreCol).cast("double"), 4)
    val bk = scored.groupBy(col(grpCol).as("grp"), sB.as("s"))
      .agg(count(lit(1)).as("bn"), sum(col(tokCol)).as("btok"))
    val bud = scored.groupBy(col(grpCol).as("grp"))
      .agg((sum(col(tokCol)).cast("double") * frac).cast("long").as("budget"))
    // window over the bounded bucket frame only (≤ 10⁴ rows per group)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("s").desc)
    bk.withColumn("cumtok", sum(col("btok")).over(w))
      .join(bud, "grp")
      .filter(col("cumtok") <= col("budget"))
      .groupBy(col("grp"))
      .agg(min(col("s")).as("thr_score"),
        sum(col("bn")).as("n_selected"),
        sum(col("btok")).as("tokens_selected"))
  }

  /** Deterministic global training order — the example-shuffle step
    * before shard writes: every doc gets `(shard, pos)` where shard is
    * the splitmix64 draw mod nShards and pos ranks the draw inside the
    * shard. The order is a pure function of ids: reproducible across
    * runs/engines, independent of input partitioning, and resumable
    * (restart = skip pos ≤ checkpoint). Training jobs read shards
    * round-robin, giving the classic approximately-uniform interleave
    * without any global total-order sort: ordering is only ever
    * materialized PER SHARD (one rank window per shard partition,
    * corpus/nShards rows each — pick nShards so a shard fits an
    * executor's sort budget, then `repartition(shard) +
    * sortWithinPartitions(pos)` at write time). */
  /** Terminal write step: materialize a curated corpus as train-ready
    * shards — `<path>/shard=K/` parquet, rows inside each shard in
    * [[trainingOrder]] position order (parquet preserves row order
    * within a file, and each shard is repartitioned to its own
    * partition before the sorted write, so a reader streaming one
    * shard file sees exactly the deterministic example order; a
    * training job round-robins the shard dirs for the interleave).
    * One id-keyed join (order frame ← full rows), one shard-keyed
    * exchange, one sort bounded per shard. Rerunning on the same ids
    * reproduces the same bytes-order — resumable by construction. */
  def writeTrainingShards(df: DataFrame, idCol: String, path: String,
                          nShards: Int): Unit =
    trainingOrder(df.select(col(idCol)), idCol, nShards)
      .join(df, Seq(idCol))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  def trainingOrder(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__draw"), col(idCol))
    df.select(col(idCol),
        unitUniform53(col(idCol)).as("__draw"),
        pmod(unitUniform53(col(idCol)), lit(nShards.toLong)).cast("int")
          .as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__draw")
  }

  /** Weighted interleaved training schedule — STRIDE SCHEDULING over
    * domains (the classic fair-queueing discipline, Waldspurger &
    * Weihl, OSDI'94, applied to data mixing): each domain's k-th doc
    * takes virtual position (k − ½)/w_d, and the schedule is the
    * virtual-position order. Every prefix of the schedule then carries
    * domains in proportion to their weights (max deviation < 1 doc per
    * domain) — the property that makes a mixture weight ACTUALLY hold
    * batch-by-batch during training instead of only in expectation.
    * Composes with [[domainWeights]]/[[temperatureWeights]]/
    * [[unimaxAllocation]]: their `weight` column is this operator's
    * input map.
    *
    * Scale shape: same as [[trainingOrder]] — per-domain ranks are
    * splitmix-shuffled windows inside (shard, domain) partitions, the
    * final interleave sorts inside each shard only; no global sort, no
    * driver state. Fully deterministic ⇒ DuckDB-replayable. */
  def mixSchedule(df: DataFrame, domainCol: String, idCol: String,
                  weights: Map[String, Double], nShards: Int): DataFrame = {
    val wExpr = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (d, q)) => when(col("domain") === d, lit(q)).otherwise(acc)
    }
    val wDom = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("domain"))
      .orderBy(col("__draw"), col(idCol))
    val wShard = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("vpos"), col(idCol))
    df.select(col(idCol), col(domainCol).as("domain"),
        unitUniform53(col(idCol)).as("__draw"),
        pmod(unitUniform53(col(idCol)), lit(nShards.toLong)).cast("int")
          .as("shard"))
      .withColumn("w", wExpr)
      .filter(col("w").isNotNull)
      .withColumn("domain_rank", row_number().over(wDom).cast("long"))
      .withColumn("vpos",
        (col("domain_rank").cast("double") - 0.5) / col("w"))
      .withColumn("pos", row_number().over(wShard).cast("long"))
      .select(col("shard"), col("pos"), col(idCol), col("domain"),
        col("domain_rank"), round(col("vpos"), 6).as("vpos"))
  }

  /** Class-balanced undersampling card: every label keeps exactly the
    * minority class's row count, chosen in splitmix64(id) hash order
    * (deterministic, RNG-free) — the label-prior equalizer a
    * classifier-training set wants before [[stratifiedExactN]]'s
    * fixed-N variant applies. Returns the per-label audit (before /
    * kept / kept-id checksum) — the checksum pins the exact selection,
    * not just its size.
    *
    * Same two-phase prune as stratifiedExactN: per-partition top-n_min
    * first, so no task ever buffers a whole class; the minority count
    * is a 1-row bounded pull. */
  def classBalanceCard(df: DataFrame, idCol: String,
                       labelCol: String): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
        col(labelCol).as("lbl"))
      .withColumn("__u", unitUniform53(col("id")))
    val nMin = base.groupBy(col("lbl")).agg(count(lit(1)).as("n"))
      .agg(min(col("n"))).head().getLong(0)
    val pruned = PartitionPrune.firstNPerKey(base, "lbl",
      Seq(col("__u"), col("id")), nMin.toInt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lbl")).orderBy(col("__u"), col("id"))
    val kept = pruned.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= nMin)
    val before = base.groupBy(col("lbl")).agg(count(lit(1)).as("n_before"))
    kept.groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_kept"), sum(col("id")).as("sum_kept_ids"))
      .join(before, "lbl")
      .select(col("lbl").as("label"), col("n_before"), col("n_kept"),
        col("sum_kept_ids"))
  }
}
