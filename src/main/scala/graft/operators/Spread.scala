package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, SubqueryAlias}

/** Scale-adaptive parallelism floor for CPU-heavy derivations (r13,
  * guide §1.2 step 1 / §2.6 idle capacity).
  *
  * A tiny parquet input (one file, one row group) arrives as ONE scan
  * split, so every expensive narrow derivation chained on it —
  * shingling, tokenizing, hashing, per-row model math — runs on one
  * core while the other N−1 idle. AQE cannot help: it only re-plans
  * post-shuffle stages, and file-split knobs cannot split a single row
  * group.
  *
  * [[Spread.apply]] inserts a round-robin repartition to the session's
  * default parallelism ONLY when (a) the frame is scan-shaped — leaves
  * plus Project/Filter/alias nodes, nothing that induces an exchange —
  * and (b) the scan arrives in fewer splits than the session has
  * cores. (a) is load-bearing twice over: a derived frame's partition
  * count is an AQE-runtime quantity, so even ASKING for it
  * (`rdd.getNumPartitions`) executes the upstream stages eagerly —
  * measured as a full double-execution of the curation pipeline's
  * dedup subtree; and a post-shuffle frame's layout was already chosen
  * by AQE. For scan-shaped plans the partition count is static file
  * metadata and free. At corpus scale inputs carry ≥ cores splits and
  * this is the identity — the exchange exists exactly where the data
  * is small enough for it to be ~free (and the deterministic
  * sort-before-repartition assignment keeps retried tasks stable).
  * Results are unaffected by partitioning per the operators' quantized
  * / rounded determinism contracts (DeterminismSpec pins 5 partition
  * counts across the query surface).
  */
object Spread {
  private def scanShaped(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case pr: Project => scanShaped(pr.child)
    case f: Filter => scanShaped(f.child)
    case a: SubqueryAlias => scanShaped(a.child)
    case _ => false
  }

  def apply(df: DataFrame): DataFrame = {
    if (!scanShaped(df.queryExecution.analyzed)) df
    else {
      val par = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < par) df.repartition(par) else df
    }
  }
}
