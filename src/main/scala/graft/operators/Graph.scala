package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-iterated graph scoring. [[Clustering]] answers "which nodes
  * belong together"; this answers "which nodes matter" — the authority
  * prior web-corpus curation attaches to a domain before trusting its
  * documents (the public pipelines weight crawl frontiers and quality
  * gates by exactly such link-graph centrality scores).
  *
  * Scale shape per iteration: one hash equi-join of the normalized edge
  * list against the current rank frame plus one destination-keyed
  * partial aggregation — the same exchange pattern at 20 nodes or 10⁹.
  * The edge normalization (out-weight sums) is computed once and
  * persisted; rank frames are `localCheckpoint`ed every iteration so
  * the lineage stays O(1) deep. No driver-side state beyond the node
  * count scalar.
  *
  * Determinism: the per-node in-mass is INTEGER mass accounting — each
  * rank·p term quantizes to a long at 10⁻¹⁵ resolution and the longs
  * sum exactly (long addition is associative, so the result is
  * bit-identical under ANY partitioning or merge order; total mass ≤ 1
  * keeps the sum < 10¹⁵, far inside long range and exact-double
  * range). Ranks then round to 12 dp per iteration. A double sum here
  * is NOT partition-invariant at scale: the RoundingScaleSmoke caught
  * a 12-dp boundary straddle at 10⁵ nodes (one node's last digit
  * flipped between 8- and 32-partition runs) — the quantized form is
  * what makes an external engine's replay, and any re-partitioning,
  * reproduce the scores bit-for-bit.
  */
object Graph {

  /** Damped PageRank over a weighted UNDIRECTED edge list, fixed
    * iteration count. `nodes` supplies the full vertex set (isolated
    * nodes keep the base score). `base` is passed as an explicit
    * literal rather than computed as `1 - damping` — the computed
    * double differs from the literal an external replay writes.
    * No dangling-mass redistribution: undirected edges mean every
    * connected node has out-weight, and isolated nodes hold the base
    * score by construction. Output: (node, pr). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               wCol: String, nodes: DataFrame, nodeCol: String,
               iters: Int = 10, damping: Double = 0.85,
               base: Double = 0.15): DataFrame = {
    val dir = edges.select(col(srcCol).as("u"), col(dstCol).as("v"),
      col(wCol).cast("double").as("w"))
    val sym = dir.union(dir.select(col("v").as("u"), col("u").as("v"),
      col("w"))).localCheckpoint()
    val outw = sym.groupBy(col("u")).agg(sum(col("w")).as("wout"))
    val norm = sym.join(outw, "u")
      .select(col("u"), col("v"), (col("w") / col("wout")).as("p"))
      .persist()
    val n = nodes.select(col(nodeCol).as("node")).distinct().localCheckpoint()
    val nCount = n.count() // one scalar to the driver: the vertex count
    var pr = n.select(col("node"), (lit(1.0) / lit(nCount)).as("pr"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      // floor(x + 0.5) ≡ round-HALF_UP for the non-negative mass terms
      // here (pr, p ≥ 0; magnitude ≤ 1e15 < 2^51 keeps the +0.5 sum
      // exactly representable) — but floor stays in whole-stage codegen
      // as primitive double math and yields the long directly, where
      // Round on DoubleType allocates a BigDecimal PER EDGE PER
      // ITERATION (the cost RoundingScaleSmoke's partition-invariance
      // fix introduced in r9; this fusion keeps the contract and
      // removes the allocation).
      val inMass = norm.join(pr.withColumnRenamed("node", "u"), "u")
        .groupBy(col("v"))
        .agg((sum(floor(col("pr") * col("p") * lit(1e15) + lit(0.5))) /
          lit(1e15)).as("inmass"))
      // full-vertex left join ONLY on the final iteration (r13, guide
      // §2.4): mid-iteration, a node absent from inMass has no in-edge
      // — undirected edges mean it has no out-edge either, so the next
      // round's norm-join drops it regardless of its score. Isolated
      // nodes re-enter the output exactly once, at the end, with the
      // same coalesced base score. One join + exchange saved per round;
      // scores are bit-identical (the mass a dropped node would have
      // contributed is floor(0·p·1e15 + 0.5) = 0).
      val next =
        if (i == iters)
          n.join(inMass.withColumnRenamed("v", "node"), Seq("node"), "left")
            .select(col("node"),
              round(lit(base) / lit(nCount) +
                lit(damping) * coalesce(col("inmass"), lit(0.0)), 12).as("pr"))
        else
          inMass.select(col("v").as("node"),
            round(lit(base) / lit(nCount) +
              lit(damping) * col("inmass"), 12).as("pr"))
      // checkpoint every 3rd iteration (and the last): each eager
      // localCheckpoint is a full job, and a 3-deep join lineage is
      // still O(1) — this cut the 10-iteration wall clock ~2×
      pr = if (i % 3 == 0 || i == iters) next.localCheckpoint() else next
    }
    norm.unpersist()
    pr
  }

  /** HITS hubs/authorities (Kleinberg, JACM 1999) over a DIRECTED
    * weighted edge list with INTEGER weights, fixed iteration count,
    * L1 normalization. On an event-transition graph: authorities are
    * the types flows converge INTO, hubs the types that route flow
    * toward them — the two-sided centrality a single PageRank score
    * conflates.
    *
    * Determinism contract (same regime as [[pageRank]]): edge weights
    * cast to long and normalized ONCE by the exact long total (two
    * exact operands ⇒ one reproducible double division); each power
    * step quantizes every score·p term to a long at 10⁻¹⁵, sums longs
    * (associative ⇒ partition-invariant), L1-normalizes by the exact
    * long total of the raw masses, and rounds to 12 dp. An external
    * engine replaying these steps reproduces hub/authority bit-for-bit.
    *
    * Scale shape per iteration: two hash equi-joins of the normalized
    * edge frame against the current score frame + two key-keyed partial
    * aggs + two 1-long bounded total pulls (the kCore precedent).
    * Scores `localCheckpoint` on a 3-iteration cadence. Driver state:
    * the node count and one L1-total scalar per half-step.
    * Output: (node, hub, auth), 12 dp. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           wCol: String, iters: Int = 8): DataFrame = {
    val el = edges.select(col(srcCol).as("u"), col(dstCol).as("v"),
      col(wCol).cast("long").as("w"))
    val tot = el.agg(sum(col("w")).as("wt"))
    val norm = el.crossJoin(broadcast(tot))
      .select(col("u"), col("v"),
        (col("w").cast("double") / col("wt")).as("p"))
      .persist()
    val nodes = el.select(col("u").as("node"))
      .union(el.select(col("v").as("node"))).distinct().localCheckpoint()
    val nCount = nodes.count() // one scalar to the driver: the node count
    var hub = nodes.select(col("node"), (lit(1.0) / lit(nCount)).as("hub"))
      .localCheckpoint()
    var auth: DataFrame = null
    // one quantized, L1-renormalized mass step (shared by both sides).
    // `raw` is MATERIALIZED (nodes-sized, cheap): the frame feeds both
    // the total and the join — left as lineage, Catalyst re-expands it
    // per reference and the plan tree grows 4× per iteration (75 s of
    // pure planning at 8 iterations; the DuckDB-CTE lesson, engine
    // side)
    def step(scores: DataFrame, scoreCol: String, inCol: String,
             outCol: String, newCol: String, last: Boolean): DataFrame = {
      val raw = norm.join(scores.withColumnRenamed("node", inCol), inCol)
        .groupBy(col(outCol))
        .agg(sum(floor(col(scoreCol) * col("p") * lit(1e15) + lit(0.5)))
          .as("raw"))
        .localCheckpoint(false) // lazy: the tot pull materializes it
      // the L1 total is ONE long — pull it (the kCore bounded-pull
      // precedent; r13, guide §2.4): the pre-r13 shape built a
      // broadcast exchange + nested-loop join per half-step just to
      // attach this scalar, which with AQE cost 3-4 extra stage-jobs
      // per half-step on a 16-half-step chain. The sum of exact longs
      // is partition-invariant, so the pulled scalar equals the old
      // broadcast column bit-for-bit.
      val totRow = raw.agg(sum(col("raw")).as("tot")).collect()(0)
      val tot: java.lang.Long =
        if (totRow.isNullAt(0)) null else totRow.getLong(0)
      // full-node left join ONLY on the final step (r13, guide §2.4):
      // a node absent from `raw` has no in-edge on this side, scores 0,
      // and a 0 score contributes floor(0·p·1e15 + 0.5) = 0 mass to the
      // next half-step — dropping the row mid-iteration changes no sum
      // and no rounding. The final step re-attaches every node with the
      // same coalesced 0. One join saved per half-step.
      if (last)
        nodes.join(raw.withColumnRenamed(outCol, "node"), Seq("node"), "left")
          .select(col("node"),
            round(coalesce(col("raw"), lit(0L)).cast("double") / lit(tot),
              12).as(newCol))
      else
        raw.withColumnRenamed(outCol, "node")
          .select(col("node"),
            round(col("raw").cast("double") / lit(tot), 12).as(newCol))
    }
    for (i <- 1 to iters) {
      auth = step(hub, "hub", "u", "v", "auth", i == iters)
      val nextHub = step(auth, "auth", "v", "u", "hub", i == iters)
      hub = if (i % 3 == 0 || i == iters) nextHub.localCheckpoint()
            else nextHub
      if (i == iters) auth = auth.localCheckpoint()
    }
    norm.unpersist()
    hub.join(auth, "node")
  }

  /** Stationary distribution of the row-stochastic Markov chain built
    * from an INTEGER-weighted directed edge list (counts): π·P power
    * iteration with per-step L1 renormalization (sink states leak
    * mass; renormalizing redistributes it proportionally — the
    * teleport-free analogue of the PageRank dangling fix, and exactly
    * replayable, unlike a random-jump vector). P(u,·) = w(u,·)/w(u,*)
    * — both operands exact longs, one reproducible division. Same
    * quantized-long mass accounting as [[hits]]/[[pageRank]].
    * Output: (node, pi), 12 dp. */
  def stationary(edges: DataFrame, srcCol: String, dstCol: String,
                 wCol: String, iters: Int = 12): DataFrame = {
    val el = edges.select(col(srcCol).as("u"), col(dstCol).as("v"),
      col(wCol).cast("long").as("w"))
    val outw = el.groupBy(col("u")).agg(sum(col("w")).as("wout"))
    val norm = el.join(outw, "u")
      .select(col("u"), col("v"),
        (col("w").cast("double") / col("wout")).as("p"))
      .persist()
    val nodes = el.select(col("u").as("node"))
      .union(el.select(col("v").as("node"))).distinct().localCheckpoint()
    val nCount = nodes.count() // one scalar: the state count
    var pi = nodes.select(col("node"), (lit(1.0) / lit(nCount)).as("pi"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      // materialized for the same double-reference reason as hits.step
      val raw = norm.join(pi.withColumnRenamed("node", "u"), "u")
        .groupBy(col("v"))
        .agg(sum(floor(col("pi") * col("p") * lit(1e15) + lit(0.5)))
          .as("raw"))
        .localCheckpoint(false) // lazy: the tot pull materializes it
      // the L1 total is ONE long — bounded pull, exactly as [[hits]]
      // (r13): replaces a per-round broadcast exchange + nested-loop
      // join; the exact-long sum is partition-invariant so the scalar
      // equals the old broadcast column bit-for-bit.
      val totRow = raw.agg(sum(col("raw")).as("tot")).collect()(0)
      val tot: java.lang.Long =
        if (totRow.isNullAt(0)) null else totRow.getLong(0)
      // same final-step-only node re-attachment as [[hits]]/[[pageRank]]
      // (r13): a state absent from `raw` has no in-edge, π = 0, and
      // contributes zero mass — mid-iteration presence is irrelevant.
      val next =
        if (i == iters)
          nodes.join(raw.withColumnRenamed("v", "node"), Seq("node"), "left")
            .select(col("node"),
              round(coalesce(col("raw"), lit(0L)).cast("double") / lit(tot),
                12).as("pi"))
        else
          raw.withColumnRenamed("v", "node")
            .select(col("node"),
              round(col("raw").cast("double") / lit(tot), 12).as("pi"))
      pi = if (i % 3 == 0 || i == iters) next.localCheckpoint() else next
    }
    norm.unpersist()
    pi
  }

  /** Degree distribution of an undirected graph: per-degree node
    * counts with shares — the hub/skew profile that decides whether
    * the wedge join ([[triangleStats]]) or a per-key equi-join needs
    * salting. Canonical distinct edges, one degree agg, one
    * histogram agg on the degrees frame. */
  def degreeHistogram(edges: DataFrame, aCol: String,
                      bCol: String): DataFrame = {
    val canon = edges
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val deg = canon.select(col("lo").as("v"))
      .unionAll(canon.select(col("hi").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val h = deg.groupBy(col("d").as("degree"))
      .agg(count(lit(1)).as("n_nodes"))
    h.crossJoin(broadcast(h.agg(sum(col("n_nodes")).as("n_total"))))
      .select(col("degree"), col("n_nodes"),
        round(col("n_nodes").cast("double") / col("n_total"), 6)
          .as("share"))
  }

  /** Triangle count + global clustering coefficient over an undirected
    * graph: canonicalize each edge to (lo, hi), enumerate wedges by
    * joining edges on the shared middle vertex with the a < b < c
    * orientation (every triangle counted exactly once), and close them
    * against the edge set with a third equi-join. C = 3·Δ / #wedges
    * with #wedges = Σ deg·(deg−1)/2 — exact integers, one division.
    *
    * Scale shape: the wedge join is the standard bottleneck and is
    * bounded by Σ deg² — on power-law graphs, pre-orienting edges from
    * lower to higher id caps the join fan-out at the canonical
    * orientation's out-degree (the classic Suri–Vassilvitskii trick;
    * full degree-ordering is the next refinement when hubs dominate).
    * Three equi-joins, zero cartesians. */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val canon = edges
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val deg = canon.select(col("lo").as("v"))
      .unionAll(canon.select(col("hi").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val wedgeTotals = deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("d")) / 2).cast("long").as("n_edges"),
      sum(col("d") * (col("d") - 1) / 2).cast("long").as("n_wedges"))
    // wedge (a < b < c) through middle b: (a,b) ⋈ (b,c); close with (a,c)
    val ab = canon.select(col("lo").as("a"), col("hi").as("b"))
    val bc = canon.select(col("lo").as("b"), col("hi").as("c"))
    val ac = canon.select(col("lo").as("a"), col("hi").as("c"))
    val tri = ab.join(bc, Seq("b")).join(ac, Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    wedgeTotals.crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        round(when(col("n_wedges") > 0,
          lit(3.0) * col("n_triangles") / col("n_wedges"))
          .otherwise(lit(0.0)), 4).as("clustering_coeff"))
  }

  private def undirectedDegrees(e: DataFrame): DataFrame =
    e.select(col("lo").as("v"))
      .unionAll(e.select(col("hi").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))

  /** k-core by synchronous peeling: rounds of "drop every vertex with
    * degree < k, keep edges between survivors" until a round removes
    * nothing (the true Seidman 1983 core; Batagelj–Zaveršnik peeling
    * made bulk-synchronous for a distributed engine), then the
    * surviving vertices with their core degree. Convergence is
    * REQUIRED within `iters` rounds — a long peel cascade on a bigger
    * graph raises instead of silently returning degree-<k vertices as
    * core members, and an unrolled `iters`-round SQL replay stays
    * exactly identical because post-convergence rounds are no-ops in
    * both engines.
    *
    * Scale: each round is one degree aggregation + two semi-joins on
    * the monotonically SHRINKING edge frame — all equi-plans; lineage
    * is cut per round with a localCheckpoint that the convergence
    * count materializes (the Catalyst version of the MATERIALIZED-CTE
    * lesson: un-cut, every round re-expands the previous round's tree
    * into each of its two semi-join probes and the plan grows
    * 4×/round). The per-round pull is the 1-row edge count — the
    * documented bounded-pull contract; this operator is eager by
    * nature (the round count IS data-dependent). */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
            iters: Int): DataFrame = {
    // round 1 reads the mined edge frame from three subtrees (degrees
    // + both semi-join probes) — scratch-cache so the mine runs once
    var canon = CacheScope.scratch(edges
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct())
    var prev = canon.count()
    var converged = false
    var round = 0
    while (!converged && round < iters) {
      val keep = undirectedDegrees(canon).filter(col("d") >= k)
        .select(col("v"))
      canon = canon
        .join(keep.withColumnRenamed("v", "lo"), Seq("lo"), "left_semi")
        .join(keep.withColumnRenamed("v", "hi"), Seq("hi"), "left_semi")
        .select(col("lo"), col("hi"))
        .localCheckpoint(false)
      val cnt = canon.count()
      // the edge frame only shrinks, so an unchanged count means an
      // unchanged edge set means a fixed point
      converged = cnt == prev
      prev = cnt
      round += 1
    }
    require(converged,
      s"kCore(k=$k): peeling did not converge within $iters rounds " +
        s"($prev edges still shrinking) — raise iters")
    undirectedDegrees(canon)
  }

  /** Synchronous label-propagation communities (Raghavan–Albert–Kumara
    * 2007, made deterministic): labels start as the node id; each
    * round every node adopts its neighbors' most frequent label, ties
    * broken toward the SMALLEST label. The contract is exactly-`iters`
    * synchronous rounds — asynchronous random-order LPA converges
    * faster but is irreproducible by design, and reproducibility is
    * what lets the result replay as unrolled SQL. Communities differ
    * from [[graft.operators.Clustering]]'s connected components: LPA
    * splits a connected graph along its density structure.
    *
    * Scale: per round one equi-join (adjacency ⋈ labels), one count
    * groupBy, one per-node window rank on the bounded (node, label)
    * frame; lineage cut per round (lazy localCheckpoint). */
  def lpaCommunities(edges: DataFrame, aCol: String, bCol: String,
                     iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val canon = edges
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
    // every round joins the SAME adjacency — scratch-cache it or each
    // of the `iters` rounds re-mines the edge frame from the scan
    // (caught at bench: 9 s → the cost of one mine + tiny rounds)
    val adj = CacheScope.scratch(
      canon.select(col("lo").as("m"), col("hi").as("x"))
        .unionAll(canon.select(col("hi").as("m"), col("lo").as("x"))))
    var labels = adj.select(col("m").as("v")).distinct()
      .withColumn("lbl", col("v"))
    for (_ <- 1 to iters) {
      val cnt = adj
        .join(labels.select(col("v").as("x"), col("lbl").as("nl")),
          Seq("x"))
        .groupBy(col("m"), col("nl")).agg(count(lit(1)).as("c"))
      val wR = Window.partitionBy(col("m"))
        .orderBy(col("c").desc, col("nl"))
      labels = cnt.withColumn("rk", row_number().over(wR))
        .filter(col("rk") === 1)
        .select(col("m").as("v"), col("nl").as("lbl"))
        .localCheckpoint(false)
    }
    labels.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_nodes"))
  }

  /** Link prediction over an undirected graph: for every non-adjacent
    * pair at distance 2 — common-neighbor count, Jaccard
    * CN/(d_a+d_b−CN), and the Resource-Allocation index Σ_w 1/deg(w)
    * (Zhou–Lü–Zhang, EPJ B 2009). RA is the log-free cousin of
    * Adamic–Adar, chosen deliberately: 1/d is ONE correctly-rounded
    * IEEE division in any engine, while ln(d) is libm-dependent —
    * the documented cross-engine contract. Each RA term quantizes to
    * a long at 1e-9 before the sum, so partial-agg order can't move
    * the result. Returns the global top `topN` by
    * (cn, ra, a, b) — a deterministic total order, TakeOrdered shape.
    *
    * Scale: the wedge self-join is bounded by Σ deg² (same contract
    * as [[triangleStats]]); existing edges leave via one anti-join. */
  def linkPrediction(edges: DataFrame, aCol: String, bCol: String,
                     topN: Int): DataFrame = {
    // the mined edge frame feeds degrees, both wedge sides, and the
    // anti-join — scratch-cache so the mine runs once
    val canon = CacheScope.scratch(edges
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct())
    val deg = undirectedDegrees(canon)
    val adj = canon.select(col("lo").as("m"), col("hi").as("x"))
      .unionAll(canon.select(col("hi").as("m"), col("lo").as("x")))
    val wedges = adj.select(col("m"), col("x").as("a"))
      .join(adj.select(col("m"), col("x").as("b")), Seq("m"))
      .filter(col("a") < col("b"))
    val cand = wedges
      .join(deg.select(col("v").as("m"), col("d").as("dm")), Seq("m"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"),
        sum(floor(lit(1e9) / col("dm") + lit(0.5)).cast("long")).as("raq"))
      .join(canon.select(col("lo").as("a"), col("hi").as("b")),
        Seq("a", "b"), "left_anti")
    cand
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      // rank on the EXACT quantized raq, not its 6-dp readout — two
      // sums rounding to the same display value must still cut the
      // top-N boundary deterministically
      .orderBy(col("cn").desc, col("raq").desc, col("a"), col("b"))
      .limit(topN)
      .select(col("a"), col("b"), col("cn"),
        round(col("cn").cast("double") /
          (col("da") + col("db") - col("cn")), 6).as("jaccard"),
        round(col("raq").cast("double") / lit(1e9), 6).as("ra"))
  }
}
