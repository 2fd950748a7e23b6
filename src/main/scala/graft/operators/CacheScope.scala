package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry for QUERY-SCOPED scratch caches.
  *
  * Several operators persist an intermediate frame that feeds multiple
  * consumers inside one query DAG (a shingle table read by both sides
  * of a self-join, a (doc,term) partial agg feeding three re-aggs).
  * The persist is correct — but the operator returns a LAZY frame, so
  * it cannot unpersist before the caller consumes the result, and a
  * harness that runs many queries in one JVM (the bench runs ~90, ×3
  * passes) would otherwise accumulate one leaked cache per call.
  *
  * Contract: operators route scratch persists through [[scratch]];
  * harnesses call [[drain]] AFTER consuming a query's result to
  * release every scratch cache created since the previous drain.
  * Long-lived state (e.g. a near-dup corpus index held across
  * streaming batches) must NOT register here — it owns its lifecycle.
  *
  * Why not materialize-and-unpersist inside each operator: an eager
  * `localCheckpoint` would cut the lineage to an RDD scan, destroying
  * the plan the PlanQualitySpec shape pins assert on, and composing
  * operators (banding inside estimator-error) would checkpoint
  * mid-pipeline. Draining after consumption keeps plans fully lazy and
  * inspectable while still bounding cache growth.
  */
object CacheScope {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for the next [[drain]]. */
  def scratch(df: DataFrame): DataFrame = { df.persist(); tracked.add(df); df }

  /** Unpersist (non-blocking) every frame registered since the last
    * drain. Safe to call at any query boundary; a no-op when empty. */
  def drain(): Unit = {
    var d = tracked.poll()
    while (d != null) { d.unpersist(false); d = tracked.poll() }
  }
}
