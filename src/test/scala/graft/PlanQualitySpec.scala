package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Physical-plan quality gates: the properties that matter at 100 TB must
  * be visible in the plan, not assumed — filter/column pushdown into the
  * parquet scan, broadcast joins for dims, TakeOrderedAndProject for
  * top-k (no full sort), and no nested-loop joins in dedup operators. */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("filter query pushes predicates and prunes columns at the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = SparkEntry.queries("q_filter_pushdown")(spark, sf)
    val scan = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("EqualTo(l_returnflag,R)"), pushed)
    // column pruning: 7 of 11 lineitem columns needed
    val cols = scan.requiredSchema.fieldNames.toSet
    assert(!cols.contains("l_partkey") && !cols.contains("l_tax") &&
      !cols.contains("l_linestatus"), cols.mkString(","))
  }

  test("dimension joins broadcast the small side") {
    val p = plan("q_broadcast_dims")
    assert(p.contains("BroadcastHashJoin"), "dims should broadcast")
    assert(!p.contains("BroadcastNestedLoopJoin"), "no BNLJ expected")
  }

  test("top-k uses TakeOrderedAndProject, not a global sort") {
    val p = plan("q_join_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("ip_range_lookup query runs through RangeLookupExec") {
    val p = plan("ip_range_lookup")
    assert(p.contains("RangeLookup"), p.take(800))
  }

  test("join-compiled OML enrich is a BroadcastHashJoin, no driver collect") {
    val p = plan("oml_sql_enrich_join")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("exact cosine pairs is a block equi-join, not a cartesian product") {
    val p = plan("dedup_embedding_pairs")
    // all-pairs work is O(n^2) by definition, but the plan must
    // distribute it: a shuffled/broadcast equi-join on the block key,
    // never Spark's single-partition-pair CartesianProduct/BNLJ
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(800))
  }

  test("salted agg: phase-1 shuffle keys include the salt") {
    val p = plan("q_skew_salted_agg")
    // the first (wide) exchange partitions on (key, salt) so a hot key
    // spreads over 8 reducers; the phase-2 exchange is over partials
    assert("hashpartitioning\\([^)]*__salt".r.findFirstIn(p).isDefined, p.take(1200))
  }

  test("KnowDb.fromDim guardrail rejects over-sized dims") {
    import graft.oml.KnowDb
    val big = spark.range(0, 200000).selectExpr("id", "repeat('x', 100) AS pad")
    val e = intercept[IllegalArgumentException] {
      KnowDb.fromDim("big", big, maxBytes = 64 * 1024)
    }
    assert(e.getMessage.contains("guardrail") && e.getMessage.contains("SqlEnrichJoin"))
    // small dim passes
    val (_, tbl) = KnowDb.fromDim("small", spark.range(0, 10).selectExpr("id"))
    assert(tbl.rows.size == 10)
  }

  test("dedup operators plan without nested-loop joins") {
    for (q <- Seq("dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q has a quadratic join")
    }
  }

  test("multimodal decode queries stay on the expression path (no RDD hop)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    for (q <- Seq("multimodal_bmp_decode", "multimodal_wav_decode", "multimodal_meta",
                  "multimodal_gif_decode")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Scan ExistingRDD"), s"$q decodes through an RDD hop")
    }
    // the synth+decode pipeline needs only doc_id from the scan
    val scan = SparkEntry.queries("multimodal_bmp_decode")(spark, sf)
      .queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }.head
    assert(scan.requiredSchema.fieldNames.toSeq == Seq("doc_id"),
      s"scan reads ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("incremental dedup: hash-keyed joins only, no quadratic joins") {
    val p = plan("dedup_incremental")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
    // the corpus side must aggregate to distinct hashes before joining
    assert(p.contains("HashAggregate"), p.take(1200))
    // first-occurrence must be a groupBy-min + join, never min-over-window:
    // a window funnels every copy of a hyper-duplicated hash into one task
    assert(!p.contains("Window"), s"dedup_incremental buffers hot hashes in a window:\n${p.take(1200)}")
  }

  test("shingle df-cap is a partial aggregation, not a window over the exploded frame") {
    // a count-over-window on the shingle key buffers every occurrence of a
    // hot boilerplate shingle in one task — the cap must instead be a
    // groupBy-count (map-side partials absorb hot keys) + semi-join back
    for (q <- Seq("dedup_ngram_jaccard", "dedup_minhash_lsh")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q caps doc-frequency with a window:\n${p.take(1200)}")
      assert(p.contains("HashAggregate"), p.take(1200))
    }
  }

  test("segment dedup: partial-agg keeper join, no quadratic joins, no RDD hop") {
    val p = plan("segment_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
    assert(!p.contains("Scan ExistingRDD"), "segment_dedup left the expression path")
    // the keeper lookup must be a partial (map-side) aggregation on the
    // segment text — the hot-boilerplate safety property
    assert(p.contains("HashAggregate"), p.take(1200))
  }

  test("PII scan and int8 quantize are map-only (single output-sort exchange)") {
    for (q <- Seq("pii_scan", "emb_quantize", "sample_stratified", "doc_chunk",
                  "emb_project", "gopher_rules", "char_entropy")) {
      val p = plan(q)
      val exchanges = "Exchange".r.findAllIn(p).size
      // the only exchange allowed is the ORDER BY's range partition —
      // the operator itself must ride the scan stage
      assert(exchanges <= 1, s"$q has $exchanges exchanges:\n${p.take(1200)}")
      assert(!p.contains("Scan ExistingRDD"), s"$q left the expression path")
    }
  }

  test("contamination check broadcasts the eval side (train never shuffles to join)") {
    val p = plan("contamination_ngram")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("IVF cells written partitionBy prune the scan at read") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(e, "embedding", "vec_id", k = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.ivfAssign(e, "embedding", cents)
      .write.partitionBy("ivf_cell").mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("ivf_cell") === 1)
    val scan = back.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    // the cell predicate must land in PartitionFilters (directory
    // pruning), NOT as a data filter — that is what makes bucket-probe
    // ANN a per-cell read instead of a full scan at 100 TB
    assert(scan.partitionFilters.nonEmpty, scan.metadata.toString)
    assert(back.count() > 0)
  }

  test("as-of join compiles to a window pass — zero join operators") {
    val p = plan("q_asof_join")
    assert(p.contains("Window"), p.take(800))
    assert(!p.contains("Join"), s"as-of should be join-free:\n${p.take(1200)}")
  }

  test("new r4 queries plan without quadratic joins over data rows") {
    for (q <- Seq("semantic_dedup", "knn_label_vote")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q has a quadratic join:\n${p.take(1200)}")
    }
    // ann_recall: the scalar scan×hits combine is a 1-row×1-row cross
    // (constant cost, legitimate BNLJ); the DATA paths must be a
    // TakeOrderedAndProject top-k and a hash-join intersection
    val ar = plan("ann_recall")
    assert(ar.contains("TakeOrderedAndProject"), ar.take(1200))
    assert(ar.contains("BroadcastHashJoin"), ar.take(1200))
    assert(!ar.contains("CartesianProduct"), ar.take(1200))
    // source_stats: the corpus total rides a single-row broadcast cross
    // (constant cost, same scalar-combine shape); the dup-share is a
    // partial agg + join, never a window over content hashes
    val ss = plan("source_stats")
    assert(!ss.contains("Window"), ss.take(1200))
    assert(!ss.contains("CartesianProduct"), ss.take(1200))
    assert(ss.contains("BroadcastExchange") && ss.contains("HashAggregate"), ss.take(1200))
  }

  test("r5 production variants: no all-blocks replication, no quadratic joins") {
    // knn_label_vote_lsh: candidates come from the multi-table LSH
    // bucket equi-join — the plan must NOT contain the exact anchor's
    // explode(sequence(...)) right-side replication, and the per-key
    // top-k must ride the PartitionPrune mapPartitions bound before the
    // rank window
    val kv = plan("knn_label_vote_lsh")
    assert(!kv.contains("sequence("), s"all-blocks replication leaked in:\n${kv.take(1200)}")
    assert(!kv.contains("CartesianProduct") && !kv.contains("BroadcastNestedLoopJoin"),
      kv.take(1200))
    assert(kv.contains("MapPartitions") || kv.contains("mapPartitions"),
      s"PartitionPrune bound missing before the rank window:\n${kv.take(1200)}")
    // the nprobe PAIR SEARCH (the production path — the registered
    // metrics query also embeds the exact baseline to measure recall
    // against, so pin the search function alone): each vector
    // replicates to nprobe cells via explode over a SLICED ranking
    // array, never to all blocks via explode(sequence(...))
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val np = graft.operators.Similarity.semanticDupPairsNprobe(
      e, "embedding", "vec_id", k = 8, iters = 2, threshold = 0.4, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!np.contains("sequence("),
      s"all-blocks sequence replication leaked in:\n${np.take(1200)}")
    assert(np.contains("slice("), s"nprobe slice missing:\n${np.take(1200)}")
    assert(!np.contains("CartesianProduct") && !np.contains("BroadcastNestedLoopJoin"),
      np.take(1200))
  }

  test("r5 additions: tfidf/shard/outliers keep their scale shapes") {
    // tfidf (r7 slimmed shape): doc length is map-side — NO doc-length
    // re-aggregation join and NO PartitionPrune pass remain; the rank
    // window's partition is one doc's vocabulary (inherently bounded).
    // Corpus size rides a broadcast; no quadratic joins.
    val tk = plan("tfidf_keywords")
    assert(!tk.contains("MapPartitions"),
      s"redundant PartitionPrune pass reappeared:\n${tk.take(1200)}")
    assert(tk.contains("Window"), tk.take(1200))
    assert(tk.contains("BroadcastExchange"), tk.take(1200))
    // (the 1-row corpus-size combine legitimately rides a broadcast
    // nested-loop; a data×data cartesian is what must never appear)
    assert(!tk.contains("CartesianProduct"), tk.take(1200))
    // shard_stats: map-only expression + one bounded agg — no window,
    // no join at all
    val ss = plan("shard_stats")
    assert(!ss.contains("Window") && !ss.contains("Join"), ss.take(1200))
    // emb_outliers: global top-N via TakeOrderedAndProject, not a sort
    val eo = plan("emb_outliers")
    assert(eo.contains("TakeOrderedAndProject"), eo.take(1200))
    assert(!eo.contains("Join"), eo.take(1200))
  }

  test("r5 curation batch: novelty/classifier/card/dim-stats scale shapes") {
    // ngram_novelty: shingle first-occurrence is agg+equi-join, never a
    // window (a hot boilerplate shingle must not funnel one task) and
    // never a data×data product
    val nv = plan("ngram_novelty")
    assert(!nv.contains("Window"), nv.take(1200))
    assert(!nv.contains("CartesianProduct") &&
      !nv.contains("BroadcastNestedLoopJoin"), nv.take(1200))
    // quality_classifier: map-only scan-side filter — no join, no
    // aggregate, no window; the only exchange is the output ordering
    val qc = plan("quality_classifier")
    assert(!qc.contains("Join") && !qc.contains("Window") &&
      !qc.contains("HashAggregate"), qc.take(1200))
    assert(qc.sliding("Exchange".length).count(_ == "Exchange") <= 1,
      qc.take(1200))
    // dataset_card: no window, no join; distinct-count rides the
    // two-exchange expand with a partial agg absorbing dup texts
    val dc = plan("dataset_card")
    assert(!dc.contains("Window") && !dc.contains("Join"), dc.take(1200))
    // emb_dim_stats: dim-keyed partial agg — no window/join, and the
    // post-shuffle agg keyed by dim (cardinality = dim) stays tiny
    val ds = plan("emb_dim_stats")
    assert(!ds.contains("Window") && !ds.contains("Join"), ds.take(1200))
    assert(ds.contains("partial"), s"map-side combine missing:\n${ds.take(1200)}")
    // cross-corpus near-dup: candidates via the (band, band_hash)
    // equi-join; survivors via LeftAnti — no batch×corpus product
    val cc = plan("dedup_crosscorpus_lsh")
    assert(!cc.contains("CartesianProduct") &&
      !cc.contains("BroadcastNestedLoopJoin"), cc.take(1500))
    assert(cc.contains("LeftAnti"), cc.take(1500))
    // minhash estimator error: candidates stay on the banding
    // equi-join; the est/exact comparison adds joins but never a
    // data×data product or a window
    val me = plan("minhash_est_error")
    assert(!me.contains("CartesianProduct") &&
      !me.contains("BroadcastNestedLoopJoin") && !me.contains("Window"),
      me.take(1500))
  }

  test("r7 PQ family: map-only encode, equi-join-only IVF-PQ search") {
    // pq_encode: all m·k codewords ride the scan stage as codegen'd
    // constants — the encode itself must be map-only (the codebook
    // builds run at plan-construction time, not in this plan)
    val pe = plan("pq_encode")
    assert(!pe.contains("Join") && !pe.contains("Window") &&
      !pe.contains("HashAggregate"), pe.take(1200))
    assert(pe.sliding("Exchange".length).count(_ == "Exchange") <= 1,
      pe.take(1200))
    // ann_ivfpq_topk: candidates via the (cell) equi-join, ADC via a
    // BROADCAST HASH join on (q_id, sub, code) — never a query×corpus
    // product. The single allowed nested-loop is the LUT build's
    // queries×(m·k codewords) crossJoin, whose right side is a
    // constant-size local relation (64 rows), not data.
    val pq = plan("ann_ivfpq_topk")
    assert(!pq.contains("CartesianProduct"), pq.take(1500))
    assert("BroadcastNestedLoopJoin".r.findAllIn(pq).size <= 1, pq.take(1500))
    assert(pq.contains("BroadcastHashJoin"), pq.take(1500))
    assert(pq.contains("MapPartitions") || pq.contains("mapPartitions"),
      s"PartitionPrune bound missing before the rank window:\n${pq.take(1200)}")
  }

  test("star-contraction clustering plans without quadratic joins") {
    val p = plan("dedup_clusters_star")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
  }

  test("dup clustering plans without quadratic joins") {
    val p = plan("dedup_clusters")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    // member counts are a groupBy+join, never a count-over-window (a
    // mega-cluster would funnel through one window task)
    assert(!p.contains("Window"), p.take(1200))
  }

  test("curation pipeline: first-occurrence dedup is agg+join, not a window funnel") {
    val p = plan("curation_pipeline")
    assert(!p.contains("Window"), p.take(1200))
    assert(p.contains("HashAggregate"), p.take(1200))
  }

  test("IVF k-means query: top-k without a cartesian product") {
    val p = plan("ann_ivf_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("salted aggregation matches unsalted results") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val salted = graft.operators.Skew.saltedAgg(
      li, col("l_returnflag"), col("l_orderkey"), salts = 8,
      partialAggs = Seq(sum("l_quantity").as("pq"), count(lit(1)).as("pc")),
      finalAggs = Seq(round(sum("pq"), 2).as("qty"), sum("pc").as("n")))
      .orderBy("__key").collect()
    val plain = li.groupBy(col("l_returnflag").as("__key"))
      .agg(round(sum("l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
      .orderBy("__key").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      plain.map(r => (r.getString(0), r.getLong(2))).toSeq)
  }

  test("bucketed tables join without a shuffle exchange") {
    import org.apache.spark.sql.functions._
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    o.write.mode("overwrite").option("path", s"$wh/orders_b")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    li.write.mode("overwrite").option("path", s"$wh/lineitem_b")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    // force sort-merge so the bucket co-location (not a broadcast) is
    // what satisfies the join's distribution requirement
    val joined = spark.table("lineitem_b").hint("merge")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    val p = joined.queryExecution.executedPlan.toString
    // co-located: the join itself must need no Exchange (only the final
    // groupBy shuffles)
    val joinSection = p.substring(p.indexOf("Join"))
    val exchangesBelowJoin = joinSection.sliding("Exchange".length)
      .count(_ == "Exchange")
    assert(exchangesBelowJoin == 0, p.take(2000))
  }

  test("custom RangeLookup operator: LogicalPlan+Strategy+SparkPlan, narrow") {
    import org.apache.spark.sql.functions._
    import graft.knowdb.RangeLookup
    val ranges = Array(
      RangeLookup.Range(0, 49, "low"),
      RangeLookup.Range(50, 99, "mid"),
      RangeLookup.Range(100, 999, "high"))
    val df = spark.range(0, 200).toDF("k")
    val out = RangeLookup.lookupPlanned(df, col("k"), ranges, "tier")
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("RangeLookup"), p.take(500))
    assert(!p.contains("Exchange"), "custom operator must stay narrow")
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows(10L) == "low" && rows(75L) == "mid" && rows(150L) == "high")
    // columns resolve through the custom node (analyzer sees its output)
    assert(out.filter(col("tier") === "mid").count() == 50)
  }

  test("parse pipeline is a narrow map (no exchange before extraction)") {
    val parsed = graft.engine.WplEngine.parse(
      spark.read.parquet(s"$sf/documents.parquet")
        .selectExpr("text as line"), "line",
      "package /t { rule r { (chars:all) } }")
    val p = parsed.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "parse should not shuffle")
  }

  test("r8 queries plan without quadratic joins over data rows") {
    for (q <- Seq("dedup_keep_list_containment", "decontaminate_report")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q has a quadratic join:\n${p.take(1200)}")
      graft.operators.CacheScope.drain()
    }
    // ann_ivfpq_recall: the exact anchor broadcasts the (tiny) query set
    // against the embeddings relation by design — forbid only a true
    // cartesian; the ADC side must stay equi-join shaped
    assert(!plan("ann_ivfpq_recall").contains("CartesianProduct"))
    graft.operators.CacheScope.drain()
  }

  test("r8 session-3 queries keep their scale shapes") {
    // contamination_emb: eval side broadcasts; candidates are an
    // equi-join on (table, bucket) — no quadratic join anywhere
    val ce = plan("contamination_emb")
    assert(ce.contains("BroadcastHashJoin") || ce.contains("BroadcastExchange"),
      s"contamination_emb lost its broadcast eval side:\n${ce.take(1200)}")
    assert(!ce.contains("CartesianProduct") &&
      !ce.contains("BroadcastNestedLoopJoin"),
      s"contamination_emb has a quadratic join:\n${ce.take(1200)}")
    graft.operators.CacheScope.drain()
    // intradoc_dedup / active users: equi-joins only
    for (q <- Seq("intradoc_dedup", "q_events_active_users")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q has a quadratic join:\n${p.take(1200)}")
      graft.operators.CacheScope.drain()
    }
    // dup_cluster_sizes crossJoins a 1-ROW broadcast total by design
    // (the ann_ivfpq_recall precedent) — forbid only a true cartesian
    assert(!plan("dup_cluster_sizes").contains("CartesianProduct"))
    graft.operators.CacheScope.drain()
    // sample_exact_n: the pre-window prune must be present (the global
    // rank never sees a whole stratum)
    val sn = plan("sample_exact_n")
    assert(sn.contains("SortWithinPartitions") || sn.contains("Sort "),
      s"sample_exact_n lost its per-partition prune phase:\n${sn.take(1200)}")
    graft.operators.CacheScope.drain()
    // q_events_psi: the only non-equi join is the 1-ROW bounds
    // broadcast; the share/psi joins are hash equi-joins
    val ps = plan("q_events_psi")
    assert(!ps.contains("CartesianProduct"),
      s"q_events_psi has a cartesian:\n${ps.take(1200)}")
    graft.operators.CacheScope.drain()
    // lang_confusion / rolling stats: equi-joins only, no quadratic work
    for (q <- Seq("lang_confusion", "q_events_rolling_stats",
        "source_overlap_matrix")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q has a quadratic join:\n${p.take(1200)}")
      graft.operators.CacheScope.drain()
    }
  }

  test("r8 session-4 queries keep their scale shapes") {
    // q_interval_join: the whole point of the bucketized encoding is
    // that the containment predicate compiles to a hash EQUI-join on
    // the bucket id — a raw BETWEEN theta-join would plan as BNLJ.
    // The only nested-loop allowed is the 1-ROW stats broadcast.
    val ij = plan("q_interval_join")
    assert(!ij.contains("CartesianProduct"),
      s"q_interval_join has a cartesian:\n${ij.take(1200)}")
    assert(ij.contains("SortMergeJoin") || ij.contains("BroadcastHashJoin") ||
      ij.contains("ShuffledHashJoin"),
      s"q_interval_join lost its bucket equi-join:\n${ij.take(1200)}")
    graft.operators.CacheScope.drain()
    // pmi_collocations: top-N must be a TakeOrdered, not a global sort;
    // totals ride as 1-row broadcasts (no true cartesian)
    val pm = plan("pmi_collocations")
    assert(pm.contains("TakeOrderedAndProject"),
      s"pmi_collocations sorts globally for its top-N:\n${pm.take(1200)}")
    assert(!pm.contains("CartesianProduct"))
    graft.operators.CacheScope.drain()
    // bigram_lm: count-table joins are hash equi-joins on the gram/word
    // keys; only the 1-row total broadcast is nested-loop shaped
    val bl = plan("bigram_lm")
    assert(!bl.contains("CartesianProduct"),
      s"bigram_lm has a cartesian:\n${bl.take(1200)}")
    graft.operators.CacheScope.drain()
    // corpus_diff: one id-keyed full-outer join over digests — digests,
    // not bodies, cross the exchange; no quadratic joins
    val cd = plan("corpus_diff")
    assert(!cd.contains("CartesianProduct") &&
      !cd.contains("BroadcastNestedLoopJoin"),
      s"corpus_diff has a quadratic join:\n${cd.take(1200)}")
    graft.operators.CacheScope.drain()
    // q_interval_overlap: session×window overlap must ride the shared-
    // bucket equi-join (only the 1-row stats broadcast is nested-loop)
    val io = plan("q_interval_overlap")
    assert(!io.contains("CartesianProduct"),
      s"q_interval_overlap has a cartesian:\n${io.take(1200)}")
    assert(io.contains("SortMergeJoin") || io.contains("BroadcastHashJoin") ||
      io.contains("ShuffledHashJoin"),
      s"q_interval_overlap lost its bucket equi-join:\n${io.take(1200)}")
    graft.operators.CacheScope.drain()
    // lm_score_index: frozen-count scoring is gram-keyed equi-joins;
    // the only nested-loop is the 1-ROW totals broadcast (the
    // dup_cluster_sizes precedent) — forbid a true cartesian
    val lm = plan("lm_score_index")
    assert(!lm.contains("CartesianProduct"),
      s"lm_score_index has a cartesian:\n${lm.take(1200)}")
    graft.operators.CacheScope.drain()
    // q_hot_keys: the SpaceSaving aggregate must run partial → final
    // (capacity-bounded summaries cross the exchange, not raw keys);
    // a groupBy-count rewrite would lose the bounded-memory property
    val hk = plan("q_hot_keys")
    assert(hk.contains("ObjectHashAggregate") || hk.contains("SortAggregate"),
      s"q_hot_keys lost its imperative aggregate:\n${hk.take(1200)}")
    assert(hk.contains("partial_heavy_hitters") || hk.contains("partial heavy_hitters")
      || hk.toLowerCase.contains("heavy_hitters"),
      s"q_hot_keys no longer runs the SpaceSaving aggregate:\n${hk.take(1200)}")
    graft.operators.CacheScope.drain()
    // source_pagerank: the post-checkpoint rank plan (edge mining is
    // gated via the minhash family's own tests) stays equi-join only
    val pg = plan("source_pagerank")
    assert(!pg.contains("CartesianProduct") &&
      !pg.contains("BroadcastNestedLoopJoin"),
      s"source_pagerank has a quadratic join:\n${pg.take(1200)}")
    graft.operators.CacheScope.drain()
    // url_dedup_stats: the blocklist joins broadcast on the equi-key
    val ud = plan("url_dedup_stats")
    assert(ud.contains("BroadcastHashJoin"),
      s"url_dedup_stats lost its broadcast blocklist join:\n${ud.take(1200)}")
    assert(!ud.contains("CartesianProduct") &&
      !ud.contains("BroadcastNestedLoopJoin"))
    graft.operators.CacheScope.drain()
  }

  test("r8 session-5 queries keep their scale shapes") {
    // bm25_topk: postings ⋈ query terms and ⋈ df both BROADCAST (the
    // query dim and the pruned df table are tiny); rank is a window
    // over per-query groups, no global sort
    val bm = plan("bm25_topk")
    assert(bm.contains("BroadcastHashJoin"),
      s"bm25_topk lost its broadcast query-term join:\n${bm.take(1200)}")
    assert(!bm.contains("CartesianProduct"))
    graft.operators.CacheScope.drain()
    // bm25_index_topk: the probe reads the bucket-partitioned postings
    // with a partition filter on the query terms' buckets
    val bi = plan("bm25_index_topk")
    assert(bi.contains("PartitionFilters: [bucket"),
      s"bm25_index_topk probe lost partition pruning:\n${bi.take(1500)}")
    graft.operators.CacheScope.drain()
    // dsir: the nBuckets-row ratio table broadcasts; the only nested-
    // loop shape allowed is the 1-row totals broadcast
    val dw = plan("dsir_weights")
    assert(dw.contains("BroadcastHashJoin"),
      s"dsir_weights lost its broadcast ratio join:\n${dw.take(1200)}")
    assert(!dw.contains("CartesianProduct"))
    graft.operators.CacheScope.drain()
    // dsir_select: the top-n draw is a TakeOrdered, not a global sort
    val ds = plan("dsir_select")
    assert(ds.contains("TakeOrderedAndProject"),
      s"dsir_select sorts globally:\n${ds.take(1200)}")
    graft.operators.CacheScope.drain()
    // exact-substring family: window-hash equi-joins only — a regression
    // to a text-keyed or nested-loop candidate search is a scale killer
    for (q <- Seq("exact_substring_spans", "exact_substring_index",
        "exact_substring_apply")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q has a quadratic join:\n${p.take(1200)}")
      graft.operators.CacheScope.drain()
    }
    // q_quantile_sketch: two-phase aggregate — partial summaries, not
    // rows, cross the exchange
    val qp = plan("q_quantile_sketch")
    assert(qp.contains("partial_quantile_sketch") ||
      qp.contains("ObjectHashAggregate"),
      s"q_quantile_sketch lost its partial aggregation:\n${qp.take(1200)}")
    graft.operators.CacheScope.drain()
  }

  test("r8 session-6 queries keep their scale shapes") {
    // q_hll_distinct: the sketches run as TWO-PHASE aggregation —
    // 512-byte register arrays, not key sets, cross the exchange
    val hll = plan("q_hll_distinct")
    assert(hll.contains("partial_hll_distinct") ||
      hll.contains("ObjectHashAggregate"),
      s"q_hll_distinct lost its partial aggregation:\n${hll.take(1200)}")
    graft.operators.CacheScope.drain()
    // q_pivot: one aggregation pass over the scan, no join
    val pv = plan("q_pivot")
    assert(!pv.contains("Join") && !pv.contains("CartesianProduct"),
      s"q_pivot should be a single aggregation:\n${pv.take(1200)}")
    graft.operators.CacheScope.drain()
    // retrieval_maxsim: one partial aggregation + TakeOrdered — the
    // chunks×queries cross join this operator exists to avoid must
    // never reappear
    val ms = plan("retrieval_maxsim")
    assert(!ms.contains("Join") && !ms.contains("CartesianProduct"),
      s"retrieval_maxsim re-grew a join:\n${ms.take(1200)}")
    assert(ms.contains("TakeOrderedAndProject"),
      s"retrieval_maxsim sorts globally:\n${ms.take(1200)}")
    graft.operators.CacheScope.drain()
    // split_cluster_safe: the split draw is a hash expression, not a
    // window or RNG — no Window node, no quadratic join
    val sp = plan("split_cluster_safe")
    assert(!sp.contains("CartesianProduct") &&
      !sp.contains("BroadcastNestedLoopJoin"),
      s"split_cluster_safe has a quadratic join:\n${sp.take(1200)}")
    graft.operators.CacheScope.drain()
    // mix_unimax: ONE partial aggregation on the domain key; windows
    // run over the domains-sized aggregated frame only
    val ux = plan("mix_unimax")
    assert(!ux.contains("Join") && !ux.contains("CartesianProduct"),
      s"mix_unimax should be agg+window only:\n${ux.take(1200)}")
    graft.operators.CacheScope.drain()
  }

  test("r8 session-6 media/cardinality queries keep their scale shapes") {
    // image_dhash / audio_fingerprint: map-only signature scans — the
    // only UDF allowed is the synthetic-media GENERATOR (test-data
    // side); the hash kernels themselves are codegen expressions
    for (q <- Seq("image_dhash", "audio_fingerprint", "video_fingerprint")) {
      val p = plan(q)
      assert(!p.contains("Join") && !p.contains("CartesianProduct"),
        s"$q should be a map-only signature scan:\n${p.take(1200)}")
      graft.operators.CacheScope.drain()
    }
    // image_dhash_pairs: 16-bit block equi-join only — the quadratic
    // all-pairs hamming compare must never appear as a plan shape
    val ip = plan("image_dhash_pairs")
    assert(!ip.contains("CartesianProduct") &&
      !ip.contains("BroadcastNestedLoopJoin"),
      s"image_dhash_pairs has a quadratic join:\n${ip.take(1200)}")
    graft.operators.CacheScope.drain()
    // corpus_novelty: register aggregation is two-phase (512-byte
    // buffers through the exchange); the register-pair work joins two
    // groups-sized frames — never a cartesian
    val cn = plan("corpus_novelty")
    assert(cn.contains("ObjectHashAggregate"),
      s"corpus_novelty lost its partial register aggregation:\n${cn.take(1200)}")
    assert(!cn.contains("CartesianProduct"),
      s"corpus_novelty grew a cartesian:\n${cn.take(1200)}")
    graft.operators.CacheScope.drain()
  }

  test("r8 session-6 closing queries keep their scale shapes") {
    // q_asof_forward: union + ONE window pass — a range-join regression
    // would appear as a BNLJ/cartesian
    val af = plan("q_asof_forward")
    assert(!af.contains("CartesianProduct") &&
      !af.contains("BroadcastNestedLoopJoin"),
      s"q_asof_forward grew a range join:\n${af.take(1200)}")
    graft.operators.CacheScope.drain()
    // mix_schedule: per-(shard, domain) windows only — no join, no
    // global (empty-partition) sort window
    val ms = plan("mix_schedule")
    assert(!ms.contains("Join") && !ms.contains("CartesianProduct"),
      s"mix_schedule should be windows over the scan only:\n${ms.take(1200)}")
    graft.operators.CacheScope.drain()
    // q_equidepth_hist: two-phase grouped ntile — range-partitioned
    // local window + ONE broadcast join of the bounded per-range
    // offsets frame + one aggregation; never a shuffle join or
    // cartesian, and (r11) never an unpartitioned window
    val eh = plan("q_equidepth_hist")
    assert(eh.contains("BroadcastHashJoin") &&
      !eh.contains("SortMergeJoin") && !eh.contains("CartesianProduct"),
      s"q_equidepth_hist should broadcast its offsets frame:\n${eh.take(1200)}")
    graft.operators.CacheScope.drain()
  }

  test("session-7 additions: fusion/linkage/transition plan shapes") {
    // hybrid_retrieval_rrf: the only joins are the broadcast query-term
    // dims, the tiny anchor cross join, and the top-m×top-m full-outer
    // fusion — never corpus×corpus (no nested-loop join except the
    // 3-row broadcast anchor product)
    val hr = plan("hybrid_retrieval_rrf")
    assert(!hr.contains("CartesianProduct"),
      s"hybrid_retrieval_rrf grew a cartesian:\n${hr.take(1500)}")
    assert(hr.contains("SortMergeJoin") || hr.contains("ShuffledHashJoin"),
      s"hybrid fusion should full-outer join the two rankings:\n${hr.take(1500)}")
    graft.operators.CacheScope.drain()
    // fuzzy_match_names: pairs mined over the distinct-name dictionary
    // via a block equi-join — no cartesian, no nested loop
    val fz = plan("fuzzy_match_names")
    assert(!fz.contains("CartesianProduct") &&
      !fz.contains("BroadcastNestedLoopJoin"),
      s"fuzzy_match_names must block-equi-join the dictionary:\n${fz.take(1500)}")
    assert(fz.contains("HashAggregate"),
      s"fuzzy_match_names should aggregate to the distinct-name dim first:\n${fz.take(1500)}")
    graft.operators.CacheScope.drain()
    // q_events_transitions: one lag window over the scan + a types²
    // aggregation — no join anywhere
    val tr = plan("q_events_transitions")
    assert(!tr.contains("Join") && !tr.contains("CartesianProduct"),
      s"q_events_transitions should be window+agg only:\n${tr.take(1200)}")
    graft.operators.CacheScope.drain()
    // score_auc: one corpus agg + the two-phase cumulative over the
    // distinct-scores frame — range-partitioned local window + ONE
    // broadcast join of the bounded offsets frame (r11: continuous
    // scores make distinct ≈ n, so no single-task cumulative window)
    val au = plan("score_auc")
    assert(au.contains("BroadcastHashJoin") &&
      !au.contains("SortMergeJoin") && !au.contains("CartesianProduct"),
      s"score_auc should broadcast its offsets frame:\n${au.take(1200)}")
    graft.operators.CacheScope.drain()
    // classifier_metrics / quality_lr_train: classes²- and bucket-sized
    // joins only (1-row aggregates ride broadcast NLJ — documented
    // precedent); never a cartesian on the scan
    for (q <- Seq("classifier_metrics", "quality_lr_train",
        "lr_calibration")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q grew a cartesian:\n${p.take(1500)}")
      graft.operators.CacheScope.drain()
    }
    // q_events_paths: two lags over one per-user window + types³ agg +
    // top-k — TakeOrdered, no join
    val ep = plan("q_events_paths")
    assert(!ep.contains("Join") && ep.contains("TakeOrderedAndProject"),
      s"q_events_paths should be window+agg+TakeOrdered:\n${ep.take(1200)}")
    graft.operators.CacheScope.drain()
    // q_events_survival: user-keyed agg + 1-row horizon broadcast +
    // duration-frame windows — the only join is the broadcast NLJ on
    // the 1-row censor aggregate
    val km = plan("q_events_survival")
    assert(!km.contains("CartesianProduct") &&
      !km.contains("SortMergeJoin"),
      s"q_events_survival must not join beyond the 1-row broadcast:\n${km.take(1500)}")
    graft.operators.CacheScope.drain()
    // q_profile_lineitem: ONE aggregation pass (the multi-distinct
    // Expand), no join, no per-column rescans
    val pf = plan("q_profile_lineitem")
    assert(!pf.contains("Join") && !pf.contains("Union"),
      s"q_profile_lineitem must profile in one pass, not unioned scans:\n${pf.take(1500)}")
    graft.operators.CacheScope.drain()
    // fim_transform / q_events_smoothing: map-only or agg-only — no join
    for (q <- Seq("fim_transform", "q_events_smoothing")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q grew a join:\n${p.take(1200)}")
      graft.operators.CacheScope.drain()
    }
    // basket rules / cohort LTV / triangles: equi-joins only (1-row
    // aggregates ride broadcast NLJ — documented precedent)
    for (q <- Seq("q_basket_rules", "q_events_cohort_ltv",
        "graph_triangles")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q grew a cartesian:\n${p.take(1500)}")
      graft.operators.CacheScope.drain()
    }
    // the closing scan-side queries: aggregations (+ the documented
    // 1-row broadcast) — no real join, no cartesian
    for (q <- Seq("q_benford", "q_gini_revenue", "corpus_diversity",
        "q_events_robust_stats", "q_events_seasonality", "q_zorder_key")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("SortMergeJoin"),
        s"$q should not shuffle-join:\n${p.take(1500)}")
      graft.operators.CacheScope.drain()
    }
    // split_kfold: the id-keyed cluster join is the one legitimate
    // shuffle — forbid only a cartesian
    val kf = plan("split_kfold")
    assert(!kf.contains("CartesianProduct"),
      s"split_kfold grew a cartesian:\n${kf.take(1200)}")
    graft.operators.CacheScope.drain()
  }

  test("r9c surface: single-Window ACF/SFT, equi-join linkage, no UDFs") {
    // acf: ALL lead columns share one window spec → exactly ONE Window
    // operator (the doc-comment claim, pinned); sft_pack likewise has
    // only the turn-indexing window
    for (q <- Seq("q_events_acf", "sft_pack")) {
      val p = plan(q)
      assert("(?m)^\\s*.*Window".r.findAllIn(p).length == 1,
        s"$q should run exactly one Window operator:\n${p.take(1500)}")
      assert(!p.contains("CartesianProduct"))
    }
    // fuzzy linkage: blocked DICTIONARY equi-joins — never a cartesian
    // or BNLJ, and the JW/DL kernels are native expressions, not UDFs
    for (q <- Seq("fuzzy_match_jw", "fuzzy_match_dl", "q_k_anonymity",
        "pref_pair_stats", "pref_pair_bias")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q grew a non-equi join:\n${p.take(1500)}")
      assert(!p.contains("ScalaUDF"),
        s"$q carries a Scala UDF:\n${p.take(1500)}")
    }
  }

  test("r10 surface: partitioned SNM window, scan-side stats, no rogue joins") {
    // sorted-neighborhood: ONE Window operator and it is PARTITIONED
    // (never a global single-partition sort) — the doc-comment claim
    val snm = plan("linkage_sorted_nbhd")
    assert("(?m)^\\s*.*Window".r.findAllIn(snm).length == 1,
      s"SNM should run exactly one Window pass:\n${snm.take(1500)}")
    assert(snm.contains("windowspecdefinition(part"),
      s"SNM window must partition by the block key:\n${snm.take(1500)}")
    // map-only scan-side shapes: no exchange beyond the final sort/agg
    for (q <- Seq("script_mix", "cleaning_signals")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("ScalaUDF"),
        s"$q lost its map-only shape:\n${p.take(1500)}")
    }
    // stats battery: equi-only, no UDFs, no cartesian blowup (the BH
    // windows are unpartitioned BY DESIGN on a groups-sized frame)
    for (q <- Seq("q_events_anova", "q_events_mwu_fdr", "battle_winrates",
        "bigram_lm_kn", "line_boilerplate")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q grew a cartesian product:\n${p.take(1500)}")
      assert(!p.contains("ScalaUDF"), s"$q carries a Scala UDF:\n${p.take(1500)}")
    }
    // HLL overlap: the register-merge UDF is EXPLICITLY allowed (it
    // runs on the groups² frame, never the data path) — gate instead
    // that the corpus is scanned once per registersOf (no re-scan per
    // pair) by counting scans
    import org.apache.spark.sql.execution.FileSourceScanExec
    val ov = SparkEntry.queries("source_vocab_overlap_hll")(spark, sf)
    val scans = ov.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f }.length
    assert(scans <= 2, s"HLL overlap re-scans the corpus per pair: $scans scans")
  }

  test("r10c additions: equi-joins only, no cartesians, no UDFs") {
    // HITS/stationary/ALS iterate equi-joins; item-CF self-joins on
    // the order key; seq-pattern fans out on the user key; the caliper
    // match equi-joins on exploded covariate buckets. The only
    // nested-loop shapes allowed are the deliberate 1-row broadcast
    // totals (BNLJ over a broadcast singleton) — a CartesianProduct
    // anywhere means a join key was lost.
    for (q <- Seq("graph_hits", "q_events_markov_stationary",
        "item_cf_topk", "seq_pattern_3", "q_events_psm_att",
        "rake_keywords", "als_rank1")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q has a cartesian:\n${p.take(1200)}")
      assert(!p.contains("ScalaUDF"), s"$q carries a UDF")
      graft.operators.CacheScope.drain()
    }
  }

  test("r10c top-k queries avoid global sorts where a TakeOrdered fits") {
    // itemNeighbors ranks per item inside a window (rank filter, no
    // global sort of the catalog); the final orderBy of the QUERY is
    // over the k-per-item frame. RAKE/seq-pattern end in
    // TakeOrderedAndProject.
    for (q <- Seq("rake_keywords", "seq_pattern_3", "textrank_keywords")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q should TakeOrdered its top-k:\n${p.take(1000)}")
      graft.operators.CacheScope.drain()
    }
  }

  test("r10d operators: equi-joins only, no UDFs in the new shapes") {
    // kCore peels via semi-joins, link-pred/LPA wedge through equi-joins
    // on the shared middle vertex, Markov attribution's only join is the
    // per-user window frame, stickiness fans out MAP-SIDE (sequence
    // explode + one broadcast semi-join — a range join here would BNLJ).
    for (q <- Seq("graph_kcore", "graph_link_pred", "graph_lpa",
        "markov_attribution", "q_events_stickiness", "q_t_closeness",
        "q_events_cliffs_delta", "q_hhi_concentration",
        "retrieval_map", "emb_davies_bouldin")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q has a cartesian:\n${p.take(1200)}")
      assert(!p.contains("ScalaUDF"), s"$q carries a UDF")
      graft.operators.CacheScope.drain()
    }
  }

  test("r10d link prediction cuts its top-N with TakeOrdered") {
    val p = plan("graph_link_pred")
    assert(p.contains("TakeOrderedAndProject"), p.take(1000))
    graft.operators.CacheScope.drain()
  }

  test("r10d second wave: equi-joins only, no UDFs") {
    // hurst/holt-winters/runs are window+fold shapes; price index,
    // theil and rank migration are grouped equi-joins; the
    // class-balanced sampler rides the two-phase prune; trigram LM is
    // count-frame equi-joins; interval union is one partitioned sweep.
    for (q <- Seq("q_events_hurst", "q_events_holt_winters",
        "q_price_index", "q_events_mad", "q_theil_inequality",
        "trigram_lm", "gate_overlap_matrix", "q_interval_union",
        "q_events_runs", "q_events_streaks", "sample_class_balanced",
        "q_rank_migration", "q_events_cohens_d", "paragraph_dup_stats",
        "dsir_ess", "corpus_distinct_n", "lexical_diversity",
        "markdown_profile", "q_events_ewma", "q_events_pacf")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q has a cartesian:\n${p.take(1200)}")
      assert(!p.contains("ScalaUDF"), s"$q carries a UDF")
      graft.operators.CacheScope.drain()
    }
  }

  test("r11: no unpartitioned WindowExec in the ex-ntile / rank-sum plans") {
    // rfm / quantile-norm / equi-depth-hist / score_auc used to run
    // global (or per-hot-group) ntile / cumulative windows over
    // scan-proportional frames — ONE task at 100×. They now ride the
    // two-phase Ranks machinery; the gate pins that NO WindowExec in
    // these plans is partition-less (the offset cascades declare a
    // constant partition over their bounded #partitions-row frames).
    import org.apache.spark.sql.execution.window.WindowExec
    // vocab top-k now rides TakeOrderedAndProject, not a global rank
    for (q <- Seq("vocab_divergence", "vocab_zipf")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q should TakeOrdered its vocabulary top-k:\n${p.take(1000)}")
      graft.operators.CacheScope.drain()
    }
    for (q <- Seq("q_customer_rfm", "feature_quantile_norm",
        "q_equidepth_hist", "score_auc", "vocab_divergence", "vocab_zipf",
        "lr_conformal")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val bad = df.queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$q has ${bad.size} unpartitioned window(s):\n${bad.headOption}")
      graft.operators.CacheScope.drain()
    }
  }

  test("r11: rankSumAuc distributes 1e6 distinct continuous scores") {
    // the library contract accepts continuous scores (distinct ≈ n);
    // the cumulative must range-partition, not sort n rows in 1 task
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 1000000)
      .select((col("id") * 0.001 + (col("id") % 7) * 1e-9).as("s"),
        (col("id") % 3 === 0).cast("int").as("y"))
    val auc = graft.operators.Metrics.rankSumAuc(df, "s", col("y"))
    val bad = auc.queryExecution.sparkPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, s"unpartitioned window:\n${bad.headOption}")
    val r = auc.head()
    assert(r.getLong(0) == 333334L && r.getLong(1) == 666666L, r.toString)
    // exact integer rank sums until the one final division, and the
    // construction is symmetric — AUC is exactly 0.5 (verified against
    // the single-task window reference)
    assert(r.getDouble(2) == 0.5, r.toString)
  }

  test("dedup signature kernels are native expressions — no ScalaUDF in the plan") {
    // SimHash and MinHash signatures used to be Scala UDFs: the only
    // opaque scan-side projections left outside whole-stage codegen,
    // and a column-pruning blind spot at 100 TB scan speed
    for (q <- Seq("dedup_simhash", "dedup_minhash_lsh", "minhash_est_error")) {
      val p = plan(q)
      assert(!p.contains("ScalaUDF"),
        s"$q still carries a Scala UDF projection:\n${p.take(1500)}")
      graft.operators.CacheScope.drain()
    }
  }
}
