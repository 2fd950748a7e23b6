package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators — the unglamorous half of running a
  * 100 TB corpus: continual ingest (wpcurate daemon, index appends)
  * accretes small parquet files, and unsorted writes leave row-group
  * min/max stats useless for scan pruning. Both fixes are layout-only
  * rewrites; neither changes a single row.
  */
object Maintenance {

  /** Total bytes of the parquet files under `path` (recursive). */
  def bytesUnder(spark: SparkSession, path: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(new org.apache.hadoop.fs.Path(path)).getLength
  }

  /** Compact a parquet directory to ~`targetBytes` files: one read,
    * one round-robin repartition to the computed file count, one
    * write. At corpus scale run it per partition directory (the write
    * is a full shuffle of the data being compacted — that is the cost
    * of compaction on any engine; the small-file READ overhead it
    * removes is paid on every query forever). */
  def compactParquet(spark: SparkSession, in: String, out: String,
                     targetBytes: Long = 128L << 20): Unit = {
    val n = math.max(1L, (bytesUnder(spark, in) + targetBytes - 1) / targetBytes)
    spark.read.parquet(in).repartition(n.toInt)
      .write.mode("overwrite").parquet(out)
  }

  /** Rewrite sorted by `sortCols` into `nFiles` range partitions: each
    * output file covers a disjoint key range, so parquet row-group
    * min/max stats (and Spark's file-level stats) prune point/range
    * scans to one file instead of all of them. The global sort is a
    * range-partitioned exchange (the terasort shape — sampled bounds,
    * no single-reducer funnel). */
  def writeSorted(df: DataFrame, sortCols: Seq[String], nFiles: Int,
                  out: String): Unit =
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(out)

  /** Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative long columns — a in the even positions, b in the
    * odd. Locality in z-value ⇒ locality in BOTH dimensions, which is
    * what makes [[zOrderWrite]]'s per-file min/max stats prunable on
    * either column. Pure integer bit ops, engine-replayable. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Rewrite range-partitioned and sorted by the Morton key of
    * (`colA` & 2^bits−1, `colB` & 2^bits−1): each output file covers a
    * small RECTANGLE of the (a, b) plane instead of a slab, so
    * point/range predicates on EITHER column prune to a few files —
    * the multi-dimensional generalization of [[writeSorted]] (which
    * prunes only on its leading column). Same terasort exchange shape;
    * the masked key is a map-side expression. */
  def zOrderWrite(df: DataFrame, colA: String, colB: String, nFiles: Int,
                  out: String, bits: Int = 16): Unit = {
    val mask = (1L << bits) - 1
    df.withColumn("__z", zValue(col(colA).bitwiseAND(lit(mask)),
        col(colB).bitwiseAND(lit(mask)), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(out)
  }
}
