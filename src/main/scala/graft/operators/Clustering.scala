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

  /** Connected components by alternating large-star/small-star edge
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14): each round rewires edges toward local
    * minima, converging in O(log² n) rounds on ANY graph shape — the
    * variant to reach for when components can be long chains (e.g.
    * transitive near-dup threads), where min-label propagation needs
    * O(diameter) rounds.
    *
    *   - large-star: every node u sends its strictly-larger neighbors
    *     to m = min(N(u) ∪ {u});
    *   - small-star: every node u rewires its smaller-or-equal
    *     neighbors (and itself) onto its minimum neighbor.
    *
    * Scale shape per round: two (groupBy-min + equi-join) pairs over
    * the edge list, all exchanges hash-partitioned on the node id — no
    * driver state beyond the convergence counts; edges stay distinct
    * so the set can only shrink toward the star forest. Same interface
    * and output as [[connectedComponents]]: (id, cluster_id) for every
    * node appearing in an edge, cluster_id = component minimum. */
  def connectedComponentsStar(edges0: DataFrame, aCol: String, bCol: String,
                              maxIter: Int = 50): DataFrame = {
    val raw = edges0.select(col(aCol).cast("long").as("u"),
      col(bCol).cast("long").as("v")).localCheckpoint()
    // canonical orientation u > v; self-loops carry no connectivity
    var e = raw.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint()
    var eCnt = e.count()
    var converged = eCnt == 0
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star over the symmetric view: (v, m) for v ∈ N(u), v > u
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // small-star on the (u > v)-oriented result: every smaller
      // neighbor v — and u itself, via the v == m row — rewires to the
      // minimum neighbor m
      val sMins = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = large.join(sMins, "u")
        .select(when(col("v") === col("m"), col("u")).otherwise(col("v")).as("u"),
          col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint()
      val sCnt = small.count()
      // fixpoint: identical edge set (set-shrink ⇒ count equality after
      // a union-distinct catches any rewire)
      converged = sCnt == eCnt && small.union(e).distinct().count() == eCnt
      e = small
      eCnt = sCnt
      iter += 1
    }
    // at the fixpoint e is a star forest: every edge points at its
    // component minimum; nodes only ever seen in self-loops (or absent
    // from the contracted set) label themselves
    val nodes = raw.select(col("u").as("id"))
      .union(raw.select(col("v").as("id"))).distinct()
    val stars = e.select(col("u").as("id"), col("v").as("cid"))
      .union(e.select(col("v").as("id"), col("v").as("cid")))
      .groupBy(col("id")).agg(min(col("cid")).as("cid"))
    val out = nodes.join(stars, Seq("id"), "left")
      .select(col("id"), coalesce(col("cid"), col("id")).as("cluster_id"))
    raw.unpersist()
    out
  }

  /** Duplicate clusters with membership counts: (doc_id, cluster_id,
    * n_members), cluster_id = canonical (minimum) member. */
  def dupClusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    withMemberCounts(connectedComponents(pairs, aCol, bCol))

  /** [[dupClusters]] on the star-contraction components — same output,
    * round count bounded by O(log² n) instead of component diameter. */
  def dupClustersStar(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    withMemberCounts(connectedComponentsStar(pairs, aCol, bCol))

  /** Duplicate-cluster SIZE histogram — the "how duplicated is this
    * corpus" publication card: for each cluster size, how many
    * clusters and docs, with the unclustered remainder reported as
    * size-1 rows (dup-cluster labels only cover docs that appear in
    * an edge, so singletons are total − clustered). Input `labels` =
    * [[dupClusters]] output.
    *
    * Scale shape: the label frame is already the bounded output of
    * clustering; the histogram is two tiny aggs on it plus a 1-row
    * broadcast corpus total — nothing rescans text or pairs. */
  def clusterSizeProfile(labels: DataFrame, corpus: DataFrame,
                         idCol: String): DataFrame = {
    val total = broadcast(corpus.agg(count(lit(1)).as("n_total")))
    val hist = labels.select(col("cluster_id"), col("n_members")).distinct()
      .groupBy(col("n_members").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
    val singles = labels.agg(count(lit(1)).as("n_clustered")).crossJoin(total)
      .select(lit(1L).as("cluster_size"),
        (col("n_total") - col("n_clustered")).as("n_clusters"))
      .withColumn("n_docs", col("n_clusters"))
      .filter(col("n_clusters") > 0)
    hist.unionByName(singles).crossJoin(total)
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        round(col("n_docs").cast("double") / col("n_total"), 6).as("doc_share"))
  }

  private def withMemberCounts(comp: DataFrame): DataFrame = {
    // groupBy-count + join back, not count-over-window: a mega-cluster
    // (every page identical — dedup's own worst case) would funnel all
    // its members through one window task; the partial agg absorbs them
    // map-side and the join probe streams
    val sizes = comp.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members"))
    comp.join(sizes, "cluster_id")
      .select(col("id").as("doc_id"), col("cluster_id"), col("n_members"))
  }
}
