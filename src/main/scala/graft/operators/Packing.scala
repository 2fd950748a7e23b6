package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget bins (the
  * step that assembles pre-training sequences from variable-length
  * docs). Greedy sequential packing in id order within each
  * (group, shard) cell:
  *
  *   - deterministic: bin assignment is a pure function of the sorted
  *     cell contents, reproducible across engines (recursive-CTE
  *     oracle) and runs;
  *   - scale shape: one repartition on (group, shard) co-locates each
  *     cell, sortWithinPartitions orders it, and a constant-memory
  *     mapPartitions scan does the packing — no per-group
  *     collect, no memory proportional to cell size. `shards`
  *     bounds cell size (pick shards so a cell ≈ one task's worth);
  *     parallelism = #groups × shards regardless of corpus size.
  *
  * mapPartitions is the honest tool here: the scan is inherently
  * sequential per cell (bin state carries across rows), which no
  * window/aggregate expresses without a recursive prefix scan.
  */
object Packing {

  /** Pack rows into bins of at most `budget` tokens (a doc larger than
    * the budget gets its own bin). Output: (id, grp, shard, n_tokens,
    * bin_id, offset) with bin_id counted from 0 within each
    * (grp, shard) and offset = the doc's token offset within its bin
    * (where its tokens land in the assembled training sequence). */
  def packGreedy(df: DataFrame, idCol: String, grpCol: String, nCol: String,
                 budget: Long, shards: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(grpCol).cast("string").as("grp"),
        pmod(col(idCol), lit(shards)).cast("int").as("shard"),
        col(nCol).cast("long").as("n"))
      .repartition(col("grp"), col("shard"))
      .sortWithinPartitions(col("grp"), col("shard"), col("id"))
      .as[(Long, String, Int, Long)]
      .mapPartitions { it =>
        var curGrp: String = null
        var curShard = -1
        var bin = 0L
        var fill = 0L
        it.map { case (id, grp, shard, n) =>
          var off = 0L
          if (grp != curGrp || shard != curShard) {
            curGrp = grp; curShard = shard; bin = 0L; fill = n
          } else if (fill + n > budget) {
            bin += 1; fill = n
          } else { off = fill; fill += n }
          (id, grp, shard, n, bin, off)
        }
      }
      .toDF("id", "grp", "shard", "n_tokens", "bin_id", "offset")
  }

  /** Bin-utilization stats over a packed frame: per group, how many
    * bins the packing produced and how full they are against the token
    * budget — the measure of padding waste a training job would see.
    * Two partial-aggregate exchanges, both on low-cardinality keys.
    *
    * Numeric contract (cross-engine exactness): the aggregates are kept
    * as exact BIGINTs (`sum_fill`, `capped_fill`) and each derived ratio
    * is ONE IEEE-754 division of those exact integers — no `avg`, no
    * intermediate rounding — so any engine replaying the same integers
    * produces bit-identical doubles (integers < 2^53 convert exactly;
    * a single division is correctly-rounded per IEEE 754). `round(avg)`
    * here previously diverged from DuckDB on a rounding boundary. */
  def binStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("grp"), col("shard"), col("bin_id"))
      .agg(sum(col("n_tokens")).as("fill"), count(lit(1)).as("k"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("k")).as("n_docs"),
        sum(col("fill")).as("sum_fill"),
        sum(least(col("fill"), lit(budget))).as("capped_fill"))
      .withColumn("avg_fill",
        col("sum_fill").cast("double") / col("n_bins"))
      .withColumn("utilization",
        col("capped_fill").cast("double") / (col("n_bins") * budget))

  /** Fill-in-the-middle transform (Bavarian et al. 2022, PSM order):
    * deterministically split each doc into prefix/middle/suffix at two
    * splitmix64-drawn character pivots and re-render as
    * `<|fim_prefix|>P<|fim_suffix|>S<|fim_middle|>M` — the training-
    * data rewrite that teaches infilling. Docs shorter than `minChars`
    * pass through untransformed (null pivots).
    *
    * Pivot contract: p1 ∈ [1, n/3], span ∈ [1, n/3] (so the middle is
    * never empty and the suffix keeps ≥ a third), each from an
    * independent splitmix64 stream keyed off the doc id — map-only,
    * reproducible on any engine that can replay splitmix64 (the DuckDB
    * oracle does, in HUGEINT). */
  def fimTransform(df: DataFrame, textCol: String, idCol: String,
                   minChars: Int = 20): DataFrame = {
    import graft.functions.SplitMix64.splitmix64
    val n = length(col(textCol)).cast("long")
    val third = greatest(expr(s"CAST(length($textCol) AS BIGINT) DIV 3"),
      lit(1L))
    val u1 = shiftrightunsigned(splitmix64(col(idCol) * 2 + 1), 11)
    val u2 = shiftrightunsigned(splitmix64(col(idCol) * 2 + 2), 11)
    val long = n >= minChars
    df.select(col(idCol), col(textCol), n.as("n_chars"),
        when(long, pmod(u1, third) + 1L).as("p1"),
        when(long, pmod(u1, third) + pmod(u2, third) + 2L).as("p2"))
      .withColumn("fim_text", when(col("p1").isNotNull,
          concat(lit("<|fim_prefix|>"),
            expr(s"substring($textCol, 1, CAST(p1 AS INT))"),
            lit("<|fim_suffix|>"),
            expr(s"substring($textCol, CAST(p2 + 1 AS INT))"),
            lit("<|fim_middle|>"),
            expr(s"substring($textCol, CAST(p1 + 1 AS INT), CAST(p2 - p1 AS INT))")))
        .otherwise(col(textCol)))
      .select(col(idCol), col("n_chars"), col("p1"), col("p2"),
        col("fim_text"))
  }
}
