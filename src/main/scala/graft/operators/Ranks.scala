package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe replacements for the unpartitioned rank/ntile/cumsum
  * windows (`Window.orderBy(...)` with no partition) that funnel an
  * entire scan through ONE task.
  *
  * The two-phase shape shared by everything here:
  *   1. `repartitionByRange` on the sort key — each task holds one
  *      contiguous key range (~n/#partitions rows);
  *   2. rank/cumulate LOCALLY inside each range (a window partitioned
  *      by `spark_partition_id()` — never unpartitioned);
  *   3. add the cumulative total of all EARLIER ranges, computed on
  *      the per-range totals frame — #shuffle-partitions rows,
  *      broadcast back.
  * The offset cascade itself windows over that bounded totals frame
  * partitioned by a constant column: one task is the POINT there (the
  * frame is `spark.sql.shuffle.partitions` rows), and declaring the
  * partition keeps every WindowExec in the plan explicitly
  * partitioned — the plan gates assert no `No Partition Defined`
  * window survives in any scan-sized subtree.
  *
  * Results are identical to the single-task window for any UNIQUE
  * sort key (callers append a tiebreak id), regardless of where the
  * range sampler drew its boundaries.
  *
  * The ranged frame is scratch-cached, and that cache is LOAD-BEARING,
  * not an optimization: the local-rank subtree and the offsets subtree
  * both read it, and as two separate plan subtrees they prune to
  * different column sets, canonicalize differently, and therefore
  * instantiate TWO range exchanges whose partitioners sample
  * boundaries with different seeds — the offsets then describe a
  * different partitioning than the ranks and the result is silently
  * garbage (caught by a 5-run determinism probe; exchange reuse only
  * saves the special case where both subtrees need identical columns).
  * Materializing the ranged frame once fixes the boundaries and the
  * partition ids for every consumer.
  *
  * NTILE is derived from the global rank by the standard SQL bucket
  * formula (first n mod b buckets get ⌈n/b⌉ rows, the rest ⌊n/b⌋),
  * so it is bit-identical to `ntile()` in any engine given the same
  * deterministic order. Integer-valued doubles stay exact through the
  * divisions below 2^52 rows — comfortably past 100 TB of rows.
  */
object Ranks {

  /** Per-range totals of `weight` with the exclusive prefix (`__off`)
    * and grand total (`__n`) attached — (#partitions)-row frame keyed
    * by `__pid`, for broadcasting back onto the ranged frame. */
  private def rangeOffsets(parts: DataFrame, weight: Column): DataFrame = {
    // constant-but-not-foldable partition key: a literal alias gets
    // constant-folded out of the window spec by the optimizer, landing
    // right back at an unpartitioned WindowExec — pmod(__pid, 1) is 0
    // on every row but rides as an attribute expression
    val konst = pmod(col("__pid"), lit(1))
    val offW = Window.partitionBy(konst).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.partitionBy(konst)
    parts.groupBy(col("__pid"))
      .agg(sum(weight).cast("long").as("__pc"))
      .withColumn("__off", coalesce(sum(col("__pc")).over(offW), lit(0L)))
      .withColumn("__n", sum(col("__pc")).over(totW))
      .select(col("__pid"), col("__off"), col("__n"))
  }

  /** Standard SQL ntile bucket from a 1-based unique global rank `r`
    * out of `n` rows in `b` buckets (longs in, long out). */
  def ntileFromRank(r: Column, n: Column, b: Int): Column = {
    val bl = lit(b.toLong)
    val rem = pmod(n, bl)
    val q = ((n - rem) / bl).cast("long") // exact: b | (n − rem)
    val cut = (q + lit(1L)) * rem // rows held by the ⌈n/b⌉-sized buckets
    when(r <= cut, ((r - lit(1L)) / (q + lit(1L))).cast("long") + lit(1L))
      .otherwise(rem + ((r - cut - lit(1L)) / q).cast("long") + lit(1L))
  }

  /** Global `row_number()` over `sortCols` (must be unique per row),
    * appended as `rankName`; also appends the total row count as
    * `totalName` when given (both long). */
  def globalRank(df: DataFrame, sortCols: Seq[Column], rankName: String,
                 totalName: Option[String] = None): DataFrame = {
    val parts = CacheScope.scratch(df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id()))
    val local = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val withLocal = parts.withColumn("__lr",
      row_number().over(local).cast("long"))
    val offs = rangeOffsets(parts, lit(1L))
    val joined = withLocal.join(broadcast(offs), Seq("__pid"))
      .withColumn(rankName, col("__off") + col("__lr"))
    val named = totalName.fold(joined.drop("__n"))(t =>
      joined.withColumnRenamed("__n", t))
    named.drop("__pid", "__lr", "__off")
  }

  /** Global EXCLUSIVE running sum of `weight` (long) over `sortCols`
    * (unique per row), appended as `name` — the scale-safe form of
    * `sum(w).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    * -1))`. */
  def globalCumSumExcl(df: DataFrame, sortCols: Seq[Column],
                       weight: Column, name: String): DataFrame = {
    val parts = CacheScope.scratch(df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id()))
    val local = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = parts.withColumn("__lc",
      coalesce(sum(weight).over(local).cast("long"), lit(0L)))
    val offs = rangeOffsets(parts, weight)
    withLocal.join(broadcast(offs), Seq("__pid"))
      .withColumn(name, col("__off") + col("__lc"))
      .drop("__pid", "__lc", "__off", "__n")
  }

  /** One-pass combination of [[globalRank]] and [[globalCumSumExcl]]:
    * global row_number AND global exclusive prefix-sum of `weight`
    * over the same unique sort order — one range shuffle, one scratch
    * cache, one bounded offsets broadcast carrying both cascades. */
  def globalRankAndCumSumExcl(df: DataFrame, sortCols: Seq[Column],
                              weight: Column, rankName: String,
                              cumName: String): DataFrame = {
    val parts = CacheScope.scratch(df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id()))
    val localOrd = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val localCum = localOrd.rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = parts
      .withColumn("__lr", row_number().over(localOrd).cast("long"))
      .withColumn("__lc",
        coalesce(sum(weight).over(localCum).cast("long"), lit(0L)))
    val konst = pmod(col("__pid"), lit(1))
    val offW = Window.partitionBy(konst).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parts.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__pc"), sum(weight).cast("long").as("__pw"))
      .withColumn("__offr", coalesce(sum(col("__pc")).over(offW), lit(0L)))
      .withColumn("__offw", coalesce(sum(col("__pw")).over(offW), lit(0L)))
      .select(col("__pid"), col("__offr"), col("__offw"))
    withLocal.join(broadcast(offs), Seq("__pid"))
      .withColumn(rankName, col("__offr") + col("__lr"))
      .withColumn(cumName, col("__offw") + col("__lc"))
      .drop("__pid", "__lr", "__lc", "__offr", "__offw")
  }

  /** Global `ntile(b)` over `sortCols` (unique per row), appended as
    * `name` (long, 1-based). */
  def globalNtile(df: DataFrame, sortCols: Seq[Column], b: Int,
                  name: String): DataFrame =
    globalRank(df, sortCols, "__gr", Some("__gn"))
      .withColumn(name, ntileFromRank(col("__gr"), col("__gn"), b))
      .drop("__gr", "__gn")

  /** Per-group `ntile(b)`: the scale-safe form of `ntile(b).over(
    * Window.partitionBy(grp).orderBy(...))` when single groups can be
    * scan-proportional (a hot event type, a dominant source). Range
    * partitions on (group, sort) so a hot group SPANS partitions; the
    * offset cascade runs per group over the (|groups| ×
    * #partitions)-row totals frame, which must stay broadcastable —
    * the operating envelope is "groups in the thousands, any group
    * size", the exact opposite of the per-group window's "any group
    * count, groups that fit one task". `sortCols` must be unique per
    * row within a group. */
  def groupedNtile(df: DataFrame, grpCols: Seq[String],
                   sortCols: Seq[Column], b: Int, name: String): DataFrame = {
    val gc = grpCols.map(col)
    val parts = CacheScope.scratch(
      df.repartitionByRange((gc ++ sortCols): _*)
        .withColumn("__pid", spark_partition_id()))
    val local = Window.partitionBy(gc :+ col("__pid"): _*)
      .orderBy(sortCols: _*)
    val withLocal = parts.withColumn("__lr",
      row_number().over(local).cast("long"))
    val offW = Window.partitionBy(gc: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.partitionBy(gc: _*)
    val offs = parts.groupBy(gc :+ col("__pid"): _*)
      .agg(count(lit(1)).as("__pc"))
      .withColumn("__off", coalesce(sum(col("__pc")).over(offW), lit(0L)))
      .withColumn("__n", sum(col("__pc")).over(totW))
      .select((grpCols ++ Seq("__pid", "__off", "__n")).map(col): _*)
    withLocal.join(broadcast(offs), grpCols :+ "__pid")
      .withColumn(name,
        ntileFromRank(col("__off") + col("__lr"), col("__n"), b))
      .drop("__pid", "__lr", "__off", "__n")
  }
}
