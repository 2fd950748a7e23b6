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
}
