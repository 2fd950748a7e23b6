package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph clustering over near-duplicate pair edges — the step that turns
  * pairwise dedup output into actionable keep/drop decisions: each
  * connected component is one duplicate cluster, its minimum doc id the
  * canonical representative.
  */
object Clustering {

  /** Connected components by iterative min-label propagation
    * ("hash-to-min"): every node repeatedly adopts the minimum label in
    * its closed neighborhood until a fixpoint.
    *
    * Scale shape: each iteration is one equi-join (edges ⋈ labels) +
    * one aggregation — all hash exchanges on the node id, no driver
    * state beyond the changed-count. Convergence takes
    * O(max component diameter) rounds; near-dup clusters are
    * near-cliques (diameter ≲ 3), so 3-4 rounds settle real corpora.
    * Lineage is truncated per iteration via localCheckpoint so plans stay
    * bounded. For adversarial long-chain graphs swap the iteration body
    * for large-star/small-star — interface unchanged.
    *
    * Input: edge list (aCol, bCol). Output: (id, cluster_id) for every
    * node that appears in an edge; cluster_id = min node id reachable.
    */
  def connectedComponents(edges0: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    // materialize the (possibly expensive) edge pipeline ONCE: the
    // symmetric union below consumes it twice, and every iteration
    // joins against it
    val edges = edges0.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst")).localCheckpoint()
    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym.join(labels, col("dst") === col("id"))
        .groupBy(col("src").as("nid"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      // the convergence flag rides the same projection — counting it on
      // the checkpointed frame is a cheap scan, not a second join job
      val next = labels.join(nbrMin, col("id") === col("nid"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"),
          (coalesce(col("nbr_min"), col("cluster_id")) < col("cluster_id"))
            .as("__changed"))
        .localCheckpoint()
      changed = next.filter(col("__changed")).count()
      labels = next.drop("__changed")
      iter += 1
    }
    sym.unpersist()
    edges.unpersist()
    labels
  }

  /** Duplicate clusters with membership counts: (doc_id, cluster_id,
    * n_members), cluster_id = canonical (minimum) member. */
  def dupClusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
    comp.withColumn("n_members", count(lit(1)).over(w).cast("long"))
      .select(col("id").as("doc_id"), col("cluster_id"), col("n_members"))
  }
}
