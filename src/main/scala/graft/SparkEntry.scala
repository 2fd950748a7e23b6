package graft

import org.apache.spark.sql.{SparkSession, DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{TextAnalysis, Dedup, Similarity, Skew, Funnel}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is a self-contained (SparkSession, sfDir) =>
  * DataFrame; `oracleSql` holds the DuckDB-equivalent SQL for the driver's
  * correctness gate. Column names/types are aligned on both sides (the
  * driver sorts columns by name before hashing). Aggregates over doubles
  * are rounded on both sides to absorb FP summation-order differences.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    // events.ts has shipped as both TIMESTAMP(NANOS) (read as ns-long
    // via spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS)
    // (read as timestamp_ntz) across testdata generations — normalize
    // either to a session-TZ (UTC) timestamp. The ns case converts with
    // exact integer division (ns > 2^53 ⇒ double division would lose
    // precision); the ntz case is a plain cast (UTC session ⇒ same
    // instant).
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
    else df
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Relational core (TPC-H-ish) — exercises agg / join / window / setop /
  // rollup / topk with scale-aware physical shapes (broadcast dims, single
  // shuffle per agg, TakeOrderedAndProject for top-k).
  // ---------------------------------------------------------------------

  private def q1(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private def qFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_discount") > 0.05 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private def qJoinTopk(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer"); val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy(col("o_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private def qBroadcastDims(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem"); val sup = t(s, dir, "supplier")
    val n = t(s, dir, "nation"); val r = t(s, dir, "region")
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private def qWindowTopn(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    t(s, dir, "lineitem")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  private def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is not unique in the data — order on the
    // full row so the running sum is deterministic across engines.
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_partkey"), col("l_suppkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .withColumn("running_qty", round(sum(col("l_quantity")).over(w), 2))
      .select(col("l_orderkey"), col("l_linenumber"), col("running_qty"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("running_qty"))
  }

  private def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").select(col("c_custkey").as("k"))
    val buyers = t(s, dir, "orders").select(col("o_custkey").as("k"))
    val inter = cust.intersect(buyers).withColumn("set_op", lit("intersect"))
    val excpt = cust.except(buyers).withColumn("set_op", lit("except"))
    inter.unionByName(excpt).orderBy(col("set_op"), col("k"))
  }

  private def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Scalar string-function surface (upper/substr/lpad/translate/instr/
    * levenshtein — all codegen'd builtins, semantics shared with the
    * oracle engine). */
  private def qStringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 10).as("name10"),
        length(col("p_type")).cast("long").as("type_len"),
        levenshtein(col("p_brand"), lit("Brand#11")).cast("long").as("lev"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        instr(col("p_type"), "BRASS").cast("long").as("brass_at"),
        translate(col("p_brand"), "#", "-").as("brand_t"))
      .orderBy(col("p_partkey"))

  private def qDateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        date_add(to_date(col("o_orderdate")), 30).as("due"),
        datediff(to_date(lit("1998-01-01")), to_date(col("o_orderdate")))
          .cast("long").as("age_days"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .orderBy(col("o_orderkey"))

  private def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))

  /** Sessionization: a new session starts after a >30 min gap per user —
    * lag + cumulative sum over an event-time window (no state store
    * needed in batch; the streaming analogue is session_window). */
  private def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(byUser))
      .withColumn("new_sess", when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("sec")).as("sess_start_sec"),
        max(col("sec")).as("sess_end_sec"))
      .orderBy(col("user_id"), col("session_id"))
  }

  private def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
    c.join(o.filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
    o.join(li.filter(col("l_quantity") > 45), col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** KnowDB-style lookup enrichment (reference: OML `select … from table
    * where key = read(x)`, crates/wp-oml sql_prm.rs) as broadcast joins. */
  private def qKnowdbLookup(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation"); val r = t(s, dir, "region")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------------
  // Events (time-series / JSON props)
  // ---------------------------------------------------------------------

  private def qEventsHourly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Per-user feature rollup — the feature-store build step: recency /
    * frequency / monetary / activity-span per user in one partial-agg
    * shuffle. Monetary sums in EXACT integer cents (each double is
    * rounded per-row before the sum), so cross-engine summation order
    * can't flip a hash — the same discipline as the µs-integer
    * attribution deltas. */
  private def qUserFeatures(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"),
        min(unix_micros(col("ts"))).as("first_ts_us"),
        max(unix_micros(col("ts"))).as("last_ts_us"),
        countDistinct(to_date(col("ts"))).as("n_active_days"))
      .orderBy(col("user_id"))

  /** Near-dup contamination per SOURCE — the curation diagnostic that
    * tells you WHICH feed is pumping duplicates: the keep-list verdicts
    * joined back to the doc's source (8-byte keys), rolled up to a
    * per-source duplicate fraction. */
  private def qSourceNearDupStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val kl = Dedup.dedupKeepList(d, "text", "doc_id", n = 3, threshold = 0.5)
      .select(col("doc_id"), col("keep"))
    d.select(col("doc_id"), col("source")).join(kl, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_near_dups"))
      .withColumn("near_dup_frac",
        round(col("n_near_dups").cast("double") / col("n_docs"), 4))
      .orderBy(col("source"))
  }

  /** Two-phase salted aggregation over the (skew-prone) event_type key:
    * phase-1 partials spread each key over 8 salts, phase-2 combines —
    * results are EXACTLY the plain GROUP BY (oracle), the plan just has
    * no single hot reducer. */
  private def qSkewSaltedAgg(s: SparkSession, dir: String): DataFrame =
    Skew.saltedAgg(t(s, dir, "events"),
      key = col("event_type"), saltSource = col("event_id"), salts = 8,
      partialAggs = Seq(count(lit(1)).as("pn"), sum(col("value")).as("psum")),
      finalAggs = Seq(sum(col("pn")).as("n"), round(sum(col("psum")), 2).as("sum_value")))
      .withColumnRenamed("__key", "event_type")
      .orderBy(col("event_type"))

  /** Adaptive salted join: SpaceSaving detects the hot event types,
    * only those salt (dim rows replicate per salt); results are
    * EXACTLY the unsalted equi-join's, which is what makes the
    * adaptive exchange shape oracle-able by the plain SQL join. */
  private def qSkewAdaptiveJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val dim = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_type"))
    val (f, d, cond) = Skew.adaptiveSaltedJoin(
      ev, dim, "event_type", salts = 8, saltSource = col("event_id"),
      k = 16, capacity = 256)
    f.join(d, cond)
      .groupBy(f("event_type"))
      .agg(count(lit(1)).as("n"), first(col("n_type")).as("n_type"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(f("event_type"))
  }

  private def qEventsJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  private def qEventsLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("prev_sec", lag(col("sec"), 1).over(w))
      .withColumn("gap_sec", col("sec") - col("prev_sec"))
      .select(col("user_id"), col("event_id"), col("gap_sec"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Strictly-ordered conversion funnel signup→view→click→purchase:
    * per-stage user counts + conversion vs stage 1. Aggregation
    * cascade keyed on user_id throughout — no windows, no per-user
    * history lists (see [[graft.operators.Funnel.orderedFunnel]]). */
  private def qEventsFunnel(s: SparkSession, dir: String): DataFrame =
    Funnel.orderedFunnel(t(s, dir, "events"),
        Seq("signup", "view", "click", "purchase"))
      .orderBy(col("stage_idx"))

  /** Weekly cohort retention triangle: cohort = ISO week of first
    * `signup`; active = any event in cohort_week+w (pre-signup activity
    * clipped). Two shuffles on user_id + a (cohort,offset) rollup. */
  private def qEventsRetention(s: SparkSession, dir: String): DataFrame =
    Funnel.cohortRetention(t(s, dir, "events"), cohortType = Some("signup"))
      .orderBy(col("cohort_week"), col("week_offset"))

  // ---------------------------------------------------------------------
  // Training-data ops: dedup / text analysis / similarity
  // ---------------------------------------------------------------------

  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("keep_id"))

  /** Incremental dedup: the top doc_id 20% plays the daily delta, the
    * rest the historical corpus. */
  private def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    Dedup.incremental(d.filter(col("doc_id") % 10 >= 8),
        d.filter(col("doc_id") % 10 < 8), "text", "doc_id")
      .orderBy(col("doc_id"))
  }

  private def qTextQuality(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select((col("doc_id") +: TextAnalysis.qualityColumns(col("text"))): _*)
      .orderBy(col("doc_id"))
  }

  private def qTokenStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Corpus statistics: exact token-count percentiles + cardinalities
    * (the per-corpus profile a training-data pipeline reports). */
  private def qCorpusStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        round(expr("percentile(n_tok, 0.5)"), 4).as("p50_tokens"),
        round(expr("percentile(n_tok, 0.9)"), 4).as("p90_tokens"),
        min(col("n_tok")).as("min_tokens"),
        max(col("n_tok")).as("max_tokens"))
      .orderBy(col("lang"))

  /** Heavy hitters: global top-25 tokens by frequency — explode + count
    * (map-side combine) + TakeOrdered; the classic combiner-friendly
    * corpus scan. */
  private def qTopTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(25)

  private def qNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, dir, "documents"), "text", "doc_id",
        n = 3, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  /** MinHash-LSH banding + exact Jaccard verification: candidates come
    * from the bounded banding equi-join, each verified exactly — so the
    * result (and oracle) is identical to `dedup_ngram_jaccard` while
    * the pair-generation cost is the LSH one. DedupSpec pins the
    * equality on the real corpus. */
  private def qMinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshJaccardPairs(t(s, dir, "documents"), "text", "doc_id",
        n = 3, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  private def qSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(t(s, dir, "documents"), "text", "doc_id", maxDist = 3)
      .orderBy(col("id_a"), col("id_b"))

  private def qLangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextSignals.lang_id(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))

  private def qFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextSignals.doc_fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** Exact embedding-cosine near-dup pairs (brute-force baseline of the
    * LSH variant): block-keyed equi-join all-pairs, double-precision
    * cosine — DuckDB-oracled exactly. */
  private def qEmbPairs(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.exactCosinePairs(e, "embedding", "vec_id", 0.4)
      .orderBy("id_a", "id_b")
  }

  private def qAnnTopk(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding")).head()
      .getSeq[Float](0).map(_.toDouble)
    Similarity.bruteForceTopK(e, "embedding", "vec_id", q, 10)
  }

  /** THE IVF query: real distributed-k-means centroid build (Lloyd,
    * deterministic init, only k·dim values ever reach the driver), cell
    * assignment via the codegen sqdist kernel, then an all-cells probe —
    * exact by construction, so the oracle is plain brute-force SQL. The
    * cell-pruned variant (2 probes) is `ann_ivf_kmeans_topk`, with
    * recall pinned in SimilaritySpec. */
  private def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val cents = Similarity.kmeansCentroids(e, "embedding", "vec_id", k = 4, iters = 3)
    val q = e.filter(col("vec_id") === 1).select(col("embedding")).head()
      .getSeq[Float](0).map(_.toDouble)
    val assigned = Similarity.ivfAssign(e, "embedding", cents)
    assigned.filter(col("ivf_cell").isin(cents.indices: _*)) // probe ALL cells
      .select(col("vec_id"),
        round(Similarity.cosineToConst(col("embedding"), q), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(10)
  }

  /** IVF with a REAL centroid build: distributed Lloyd k-means (k=4,
    * 3 iters, deterministic first-k-by-id init), then cell-pruned search
    * probing the 2 cells nearest the query. Approximate by design (the
    * synthetic embeddings are unclustered, so no pruned search is exact
    * on them) — recall and convergence are pinned by SimilaritySpec; the
    * driver records a rows-only check like the other engine-internal ANN
    * variants. */
  /** IVF on the real distributed-k-means build, probing ALL cells: the
    * full assign/probe machinery runs end-to-end and the union of every
    * cell is provably the whole corpus, so the result is EXACT top-k —
    * which is what lets DuckDB oracle this query (runtime centroids
    * can't be replayed in SQL, but all-cells doesn't depend on them).
    * The pruned nprobe<k path — same machinery, recall measured — is
    * pinned by SimilaritySpec ("ivf pruned search") and AnnScaleSmoke. */
  private def qAnnIvfKmeans(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val cents = Similarity.kmeansCentroids(e, "embedding", "vec_id", k = 4, iters = 3)
    val q = e.filter(col("vec_id") === 2).select(col("embedding")).head()
      .getSeq[Float](0).map(_.toDouble)
    val assigned = Similarity.ivfAssign(e, "embedding", cents)
    val allCells = cents.indices
    assigned.filter(col("ivf_cell").isin(allCells: _*))
      .select(col("vec_id"),
        round(Similarity.cosine(col("embedding"),
          array(q.map(lit): _*)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(10)
  }

  // ---------------------------------------------------------------------
  // Training-data ops, round 3: PII scrub, benchmark contamination,
  // dup clustering, deterministic sampling, repetition quality, int8
  // quantization. All oracled.
  // ---------------------------------------------------------------------

  /** PII scrub: the corpus itself is clean word soup, so PII is injected
    * on deterministic doc_id schedules (email %3, ipv4 %5, phone %7,
    * card %11) — the oracle reconstructs the same text and recomputes
    * counts + redaction with byte-identical RE2-safe regexes, so any
    * drift in pattern or replacement order hash-mismatches. */
  private def qPiiScan(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pii
    val d = t(s, dir, "documents")
    val withPii = d.select(col("doc_id"), concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" from 10."), col("doc_id") % 250, lit(".0."), col("doc_id") % 200)).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit(" call 555-123-4567")).otherwise(lit("")),
      when(col("doc_id") % 11 === 0, lit(" card 4111 1111 1111 1111")).otherwise(lit(""))
    ).as("text"))
    withPii.select((col("doc_id") +: Pii.scanColumns(col("text")) :+
        Pii.redact(col("text")).as("redacted")): _*)
      .orderBy(col("doc_id"))
  }

  /** Benchmark contamination: docs on the %50 schedule act as the eval
    * set; flag train docs sharing >= 2 distinct 3-gram shingles. The
    * eval side is broadcast — the train corpus never shuffles. */
  private def qContamination(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Contamination
    val d = t(s, dir, "documents")
    Contamination.ngramOverlap(
        d.filter(col("doc_id") % 50 =!= 0), d.filter(col("doc_id") % 50 === 0),
        "text", "doc_id", n = 3, minOverlap = 2)
      .orderBy(col("train_id"), col("eval_id"))
  }

  /** Decontamination report — the apply-side rollup of the overlap
    * run: per train doc, distinct eval hits, worst overlap ratio, and
    * the keep verdict. Consumes the mined overlap pairs (never
    * re-scans text); the clean-corpus ship is the left-anti twin
    * ([[graft.operators.Contamination.decontaminate]]). */
  private def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Contamination
    val d = t(s, dir, "documents")
    val train = d.filter(col("doc_id") % 50 =!= 0)
    val ov = Contamination.ngramOverlap(train,
      d.filter(col("doc_id") % 50 === 0), "text", "doc_id",
      n = 3, minOverlap = 2)
    Contamination.decontaminationReport(train, "doc_id", ov)
      .orderBy(col("doc_id"))
  }

  /** Two-phase contamination — the 100-TB shape end-to-end: the Bloom
    * pre-filter flags candidate train docs in a pure scan pass (no
    * join), then the exact n-gram overlap verifies only the flagged
    * survivors. Bloom has NO false negatives, so the verified output
    * is provably identical to `contamination_ngram` — the two queries
    * share one oracle (the dedup_minhash_lsh pattern). */
  private def qContaminationBloom(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Contamination
    val d = t(s, dir, "documents")
    val eval_ = d.filter(col("doc_id") % 50 === 0)
    val train = d.filter(col("doc_id") % 50 =!= 0)
    val flagged = Contamination.ngramBloomFlag(train, eval_, "text", "doc_id", n = 3)
      .select(col("train_id").as("doc_id"))
    Contamination.ngramOverlap(train.join(flagged, "doc_id"), eval_,
        "text", "doc_id", n = 3, minOverlap = 2)
      .orderBy(col("train_id"), col("eval_id"))
  }

  /** Near-dup clusters: connected components (min-label propagation)
    * over the exact Jaccard pair edges; cluster_id = canonical (min)
    * member. Oracle = recursive-CTE transitive closure over the same
    * pair SQL. */
  /** The mined pair set is an ARTIFACT, not something you re-mine per
    * consumer (the dedupKeepListFromPairs discipline, and at 100 TB the
    * production posture): the cluster/star/split queries all consume
    * the SAME persisted n-gram-Jaccard pairs, computed once per
    * (JVM, sf dir) — the ann_ivfpq memoized-build precedent. Results
    * are unchanged (the mining is deterministic); only the repeated
    * shingle joins disappear. */
  private val ngramPairsPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def minedNgramPairs(s: SparkSession, dir: String): DataFrame = {
    val p = ngramPairsPaths.computeIfAbsent(dir, { _ =>
      val path = java.nio.file.Files
        .createTempDirectory("graft_ngram_pairs").toString
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "text", "doc_id",
          n = 3, threshold = 0.5)
        .write.mode("overwrite").parquet(path)
      path
    })
    s.read.parquet(p)
  }

  /** The banded-miner twin of [[minedNgramPairs]] (output-identical at
    * these params — DedupSpec pins it): consumers that want the
    * banded-join provenance share ONE persisted sweep. The
    * `dedup_minhash_lsh` query itself still mines live — the miner is
    * its subject. */
  private val bandedPairsPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def minedBandedPairs(s: SparkSession, dir: String): DataFrame = {
    val p = bandedPairsPaths.computeIfAbsent(dir, { _ =>
      val path = java.nio.file.Files
        .createTempDirectory("graft_banded_pairs").toString
      Dedup.minhashLshJaccardPairs(t(s, dir, "documents"), "text",
          "doc_id", n = 3, threshold = 0.5)
        .write.mode("overwrite").parquet(path)
      graft.operators.CacheScope.drain()
      path
    })
    s.read.parquet(p)
  }

  private def qDedupClusters(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Clustering
    Clustering.dupClusters(minedNgramPairs(s, dir), "id_a", "id_b")
      .orderBy(col("doc_id"))
  }

  /** Same clusters via large-star/small-star contraction — the
    * diameter-independent scale path (O(log² n) rounds on any graph
    * shape); shares `dedup_clusters`' oracle because the output is
    * identical by construction. */
  private def qDedupClustersStar(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Clustering
    Clustering.dupClustersStar(minedNgramPairs(s, dir), "id_a", "id_b")
      .orderBy(col("doc_id"))
  }

  /** Deterministic stratified Bernoulli sample over languages: keep
    * decisions are pure splitmix64(doc_id) threshold tests, so the
    * oracle recomputes the identical 53-bit draws in HUGEINT SQL. */
  private val sampleRates = Map(
    "en" -> 0.5, "de" -> 0.75, "es" -> 0.25, "fr" -> 1.0, "zh" -> 0.1)
  private val sampleDefaultRate = 0.05

  private def qSampleStratified(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    Sampling.stratifiedBernoulli(t(s, dir, "documents"), "doc_id", "lang",
        sampleRates, sampleDefaultRate)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Domain-mixture weighting: per-language token shares vs the target
    * training mixture → sampling/repeat weight per domain. */
  private def qMixWeights(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val d = t(s, dir, "documents").select(col("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    Sampling.domainWeights(d, "lang", col("n_tokens"),
      mixTargets, mixDefaultTarget).orderBy(col("domain"))
  }

  /** Target mixture for `mix_weights`: upweight zh/es, downweight en. */
  private val mixTargets = Map("en" -> 0.2, "zh" -> 0.3, "es" -> 0.2)
  private val mixDefaultTarget = 0.1

  /** Fixed-token chunking: 64-token windows at stride 48 (overlapping
    * pretraining contexts) over every document. */
  private def qDocChunk(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkTokens(t(s, dir, "documents"), "text", "doc_id",
        chunkSize = 64, stride = 48)
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Segment-level dedup (boilerplate removal): 8-token segments, keep
    * the first corpus occurrence, rejoin survivors per doc. */
  private def qSegmentDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.segmentDedup(t(s, dir, "documents"), "text", "doc_id", segTokens = 8)
      .orderBy(col("doc_id"))

  /** Vocabulary coverage per language: share of the token stream the
    * top-40 vocabulary captures (tokenizer-fit proxy). */
  private def qVocabCoverage(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(t(s, dir, "documents"), "text", "lang", topN = 40)
      .select(col("grp").as("lang"), col("n_tokens"), col("n_distinct"),
        col("coverage"))
      .orderBy(col("lang"))

  /** One BPE merge-selection round over the corpus: top-20 adjacent
    * token pairs by occurrence count (tokenizer induction's inner
    * loop, run at corpus scale). */
  private def qBpeTopMerges(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.topBigramMerges(t(s, dir, "documents"), "text", topN = 20)

  private def qTextLogprob(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLogprob(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id"))

  /** Snapshot diff between two derived corpus versions: the "old"
    * snapshot drops `doc_id % 13 = 5` (docs that arrive later), the
    * "new" one drops `doc_id % 17 = 3` (docs since removed) and
    * revises the text of `doc_id % 11 = 7`. Statuses come from hash
    * comparison inside one engine, so only collision-freedom — not
    * cross-engine digest parity — is load-bearing. */
  private def qCorpusDiff(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusDiff
    val d = t(s, dir, "documents")
    val oldSnap = d.filter(col("doc_id") % 13 =!= 5)
    val newSnap = d.filter(col("doc_id") % 17 =!= 3)
      .withColumn("text", when(col("doc_id") % 11 === 7,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
    CorpusDiff.diffStats(oldSnap, newSnap, "doc_id", "text", "source")
      .orderBy(col("source"), col("status"))
  }

  /** URL canonicalization + URL-keyed dedup + domain blocklist over a
    * deterministically-messy URL column: each doc contributes two raw
    * variants of the same canonical page URL (mixed-case authority,
    * explicit :443, `www.`, trailing slash, `utm_*` params, fragment —
    * and for `doc_id % 3 = 1` a REAL `page=2` param the normalizer must
    * keep, so those variants stay distinct). The blocklist is the
    * full hosts `src(N).example.com` where N % 7 = 0, matched through
    * the suffix-expansion equi-join (the oracle replays it as plain
    * host equality, which is equivalent here because every blocklist
    * entry is a full host; the subdomain-blocking behavior itself is
    * spec-pinned in R8cOpsSpec). */
  private def qUrlDedupStats(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.UrlOps
    val d = t(s, dir, "documents")
    val idStr = col("doc_id").cast("string")
    val v1 = concat(lit("https://www."), col("source"),
      lit(".Example.COM:443/"), col("lang"), lit("/doc/"), idStr, lit("/"))
    val v2 = concat(lit("HTTPS://"), col("source"), lit(".example.com/"),
      col("lang"), lit("/doc/"), idStr,
      when(col("doc_id") % 3 === 1, lit("?page=2&utm_source=feed"))
        .otherwise(lit("?utm_source=feed")),
      when(col("doc_id") % 5 === 0, lit("#frag")).otherwise(lit("")))
    val urls = d.select(col("source"), explode(array(v1, v2)).as("raw"))
    val block = d.select(col("source")).distinct()
      .filter(regexp_extract(col("source"), "([0-9]+)", 1).cast("int") % 7 === 0)
      .select(concat(col("source"), lit(".example.com")).as("domain"))
    UrlOps.urlDedupStats(urls, "raw", "source", block).orderBy(col("source"))
  }

  private def qPmiCollocations(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiCollocations(t(s, dir, "documents"), "text",
      minCount = 5, topN = 50)

  private def qBigramLm(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLogprob(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id"))

  /** Kneser–Ney-smoothed bigram scorer (D = 0.75) — continuation-
    * probability backoff, the n-gram quality scorer that actually
    * ships. */
  private def qBigramLmKn(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLogprobKn(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id"))

  private def qTrainingOrder(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    Sampling.trainingOrder(t(s, dir, "documents"), "doc_id", nShards = 8)
      .orderBy(col("shard"), col("pos"))
  }

  /** The end-to-end curation capstone: quality gate → exact-dedup keep
    * → deterministic stratified sample → sequence packing, one oracled
    * query. Every stage is one of the individually-oracled operators;
    * the composition stays a linear pipeline (scan-stage filters, one
    * window for dedup, map-only sample, one exchange for packing). */
  private def qCurationPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Sampling, Packing}
    val d = t(s, dir, "documents")
    val scored = d.select(col("doc_id"), col("lang"), col("text"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 5 && col("n_tokens") <= 400)
    // first-occurrence via groupBy-min + join (hot identical-content
    // hashes absorbed map-side — the Dedup.incremental pattern), not a
    // min-over-window funnel
    val hashed = scored.withColumn("__h", md5(col("text")))
    val firsts = hashed.groupBy(col("__h")).agg(min(col("doc_id")).as("keep_id"))
    val kept = hashed.join(firsts, "__h")
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("lang"), col("text"), col("n_tokens"))
    // near-dup stage: the keep-list APPLY step consumes a precomputed
    // pairs frame — the real-pipeline shape where verified pairs already
    // exist and 100 TB of text is never re-mined to apply a keep-list.
    // Miner = the banded MinHash join (the corpus-scale generator; equal
    // to the exact shingle self-join at these params — DedupSpec pins
    // it — and 2.3× cheaper at sf0.1)
    val pairs = graft.operators.Dedup.minhashLshJaccardPairs(kept, "text",
      "doc_id", n = 3, threshold = 0.5, maxDocFreq = 100)
    val keepers = graft.operators.Dedup
      .dedupKeepListFromPairs(kept, "doc_id", pairs)
      .filter(col("keep")).select(col("doc_id"))
    val deduped = kept.join(keepers, "doc_id")
      .select(col("doc_id"), col("lang"), col("n_tokens"))
    val sampled = Sampling.stratifiedBernoulli(deduped, "doc_id", "lang",
      sampleRates, sampleDefaultRate)
    Packing.packGreedy(sampled, "doc_id", "lang", "n_tokens", budget = 256, shards = 4)
      .select(col("id").as("doc_id"), col("grp").as("lang"), col("shard"),
        col("n_tokens"), col("bin_id"))
      .orderBy(col("doc_id"))
  }

  private def qTextRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id"))

  /** JL random projection 64 → 8 dims; components as columns so the
    * oracle hash-compares scalars (the array is the operator's API). */
  private def qEmbProject(s: SparkSession, dir: String): DataFrame = {
    val reduced = Similarity.projectRandom(t(s, dir, "embeddings"),
      "embedding", dim = 64, k = 8)
    val cols = (0 until 8).map(j =>
      round(element_at(col("reduced"), j + 1), 6).as(s"r$j"))
    reduced.select((col("vec_id") +: cols): _*).orderBy(col("vec_id"))
  }

  private def qEmbQuantize(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(t(s, dir, "embeddings"), "embedding", "vec_id")
      .orderBy(col("vec_id"))

  /** As-of join: each event gets the user's most recent (<= event time)
    * purchase value — union + single window pass, no range-join
    * explosion; oracle is DuckDB's native ASOF LEFT JOIN. */
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pv"))
    AsOfJoin.asOf(e, purchases, Seq("user_id"), "ts", "ts", Seq("pv"))
      .select(col("event_id"), col("user_id"),
        round(col("pv"), 2).as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** Forward as-of: every event's NEXT purchase value per user
    * (inclusive at the same instant) — the "label at horizon" join. */
  private def qAsofForward(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pv"))
    AsOfJoin.asOfForward(e, purchases, Seq("user_id"), "ts", "ts", Seq("pv"))
      .select(col("event_id"), col("user_id"),
        round(col("pv"), 2).as("next_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** Point-in-interval join via the bucketized equi-join encoding
    * ([[graft.operators.IntervalJoin]]) — a raw `ts BETWEEN lo AND hi`
    * predicate would plan as BroadcastNestedLoopJoin (quadratic).
    * Intervals here are the "busy windows": every hour bucket whose
    * event count is ≥1.5× the per-hour mean (pure integer comparison —
    * `2·c·H ≥ 3·N` — so both engines agree exactly), widened to
    * [start−15 min, start+75 min]. Windows of adjacent busy hours
    * overlap, so an event can land in several windows; the per-window
    * rollup counts it in each. 30-minute join buckets ⇒ each 90-minute
    * window ships ≤4 copies, every shuffle is a hash equi-join. */
  private def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.IntervalJoin
    val ev = t(s, dir, "events")
      .select(unix_micros(col("ts")).as("tsus"), col("user_id"), col("value"))
    val hours = ev
      .select((col("tsus") - pmod(col("tsus"), lit(3600000000L))).as("hstart"))
      .groupBy(col("hstart")).agg(count(lit(1)).as("c"))
    val stats = hours.agg(sum(col("c")).as("n_total"), count(lit(1)).as("n_hours"))
    val busy = hours.crossJoin(broadcast(stats))
      .filter(col("c") * col("n_hours") * 2 >= col("n_total") * 3)
      .select((col("hstart") - 900000000L).as("ws"),
        (col("hstart") + 4500000000L).as("we"))
    IntervalJoin.pointInInterval(ev, "tsus", busy, "ws", "we", 1800000000L)
      .groupBy(col("ws"), col("we"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("ws"))
  }

  /** Interval×interval overlap via the bucketized encoding: per-user
    * gap sessions (the q_events_sessionize intervals, in seconds)
    * overlap-joined against the busy windows — "which sessions touched
    * a traffic spike". Each overlapping pair is emitted exactly once
    * (the first-shared-bucket dedup in
    * [[graft.operators.IntervalJoin.intervalOverlap]]). */
  private def qIntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.IntervalJoin
    val ev = t(s, dir, "events").withColumn("sec", unix_timestamp(col("ts")))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = ev
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("sec")).as("s_lo"), max(col("sec")).as("s_hi"))
    val hours = ev.select((col("sec") - pmod(col("sec"), lit(3600L))).as("hstart"))
      .groupBy(col("hstart")).agg(count(lit(1)).as("c"))
    val stats = hours.agg(sum(col("c")).as("n_total"), count(lit(1)).as("n_hours"))
    val busy = hours.crossJoin(broadcast(stats))
      .filter(col("c") * col("n_hours") * 2 >= col("n_total") * 3)
      .select((col("hstart") - 900L).as("ws"), (col("hstart") + 4500L).as("we"))
    IntervalJoin.intervalOverlap(sess, "s_lo", "s_hi", busy, "ws", "we", 1800L)
      .groupBy(col("ws"), col("we"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("ws"))
  }

  /** Contrastive-training triplet mining: (anchor, positive, negative)
    * rows for embedding/reranker training — positives are the verified
    * near-dup pairs (the banded MinHash miner), negatives a
    * deterministic splitmix64 draw over the id space (dense [0, N) ids
    * are this query's contract, true for the corpus; a sparse-id corpus
    * would join through a precomputed id index instead). Collisions
    * with the anchor/positive resolve by stepping forward — two steps
    * suffice for N ≥ 3 — so both engines derive the identical negative
    * with no retry loop. Map-only after the pair mining; the N scalar
    * rides a 1-row broadcast. */
  private def qContrastiveTriplets(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val d = t(s, dir, "documents")
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val pairs = minedBandedPairs(s, dir)
    val draw = Sampling.unitUniform53(col("id_a") * 1000003L + col("id_b"))
    pairs.crossJoin(broadcast(nDocs))
      .withColumn("neg0", pmod(draw, col("n_docs")))
      .withColumn("neg1",
        when(col("neg0") === col("id_a") || col("neg0") === col("id_b"),
          pmod(col("neg0") + 1, col("n_docs"))).otherwise(col("neg0")))
      .withColumn("negative",
        when(col("neg1") === col("id_a") || col("neg1") === col("id_b"),
          pmod(col("neg1") + 1, col("n_docs"))).otherwise(col("neg1")))
      .select(col("id_a").as("anchor"), col("id_b").as("positive"),
        col("negative"), col("jaccard"))
      .orderBy(col("anchor"), col("positive"))
  }

  /** SpaceSaving hot-key report over event types. With capacity ≥ the
    * distinct-key count no eviction ever fires, so the summary is EXACT
    * (err 0) and the aggregate becomes oracle-able — the same operator
    * that runs approximately when the key space exceeds capacity
    * (spec-pinned in R8cOpsSpec). */
  private def qHotKeys(s: SparkSession, dir: String): DataFrame =
    Skew.hotKeys(t(s, dir, "events").select(col("event_type")),
        "event_type", k = 3, capacity = 64)
      .orderBy(col("count_hi").desc, col("key"))

  private val lmIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Bigram-LM scoring SERVED FROM the persisted index: train on the
    * even-id half of the corpus, save → load, score EVERY doc against
    * the frozen counts (the odd half's novel bigrams exercise the OOV
    * smoothing the in-query `bigram_lm` never faces). The oracle
    * replays the frozen-count formula from the same split. */
  private def qLmScoreIndex(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Lm
    val d = t(s, dir, "documents")
    val path = lmIndexPaths.computeIfAbsent(dir, { _ =>
      val p = java.nio.file.Files.createTempDirectory("graft_lm_idx").toString
      Lm.LmRef.build(d.filter(col("doc_id") % 2 === 0), "text").save(p)
      p
    })
    Lm.LmRef.load(s, path).scoreOf(d, "text", "doc_id").orderBy(col("doc_id"))
  }

  /** Fixed BM25 query set (query_id, term): three multi-term topical
    * queries over the corpus vocabulary. */
  private val bm25QueryTerms: Seq[(String, String)] = Seq(
    "wq1" -> "spark", "wq1" -> "window", "wq1" -> "agg",
    "wq2" -> "customer", "wq2" -> "query", "wq2" -> "table",
    "wq3" -> "vector", "wq3" -> "scan", "wq3" -> "slow")

  private def bm25QueryDf(s: SparkSession): DataFrame = {
    import s.implicits._
    bm25QueryTerms.toDF("query_id", "term")
  }

  /** BM25 top-5 per query, computed in-query over the whole corpus
    * (idf/tf-norm constants written so both engines fold the same
    * doubles; scores round to 4 dp with doc-id rank tie-break). */
  private def qBm25TopK(s: SparkSession, dir: String): DataFrame =
    graft.operators.Retrieval.bm25TopK(t(s, dir, "documents"), "text",
        "doc_id", bm25QueryDf(s), k = 5)
      .orderBy(col("query_id"), col("rank"))

  /** Ranker evaluation of the BM25 top-5 against corpus-recomputable
    * graded relevance (rel = #distinct query terms in the doc):
    * nDCG@5 vs the corpus-wide ideal ranking, MRR, precision@5.
    * Discount constants interpolated as literals on both engines. */
  private def qRetrievalNdcg(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Retrieval
    val docs = t(s, dir, "documents")
    val rels = Retrieval.gradedRels(docs, "text", "doc_id", bm25QueryDf(s))
    val bm25 = Retrieval.bm25TopK(docs, "text", "doc_id",
        bm25QueryDf(s), k = 5)
      .withColumnRenamed("doc_id", "id")
    // id-order baseline: first 5 matching docs by doc id — the naive
    // ranker the BM25 numbers are read against
    val wId = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("id"))
    val naive = rels.withColumn("rank", row_number().over(wId))
      .where(col("rank") <= 5).select(col("query_id"), col("rank"), col("id"))
    Retrieval.evalTopK(bm25, rels, 5).withColumn("ranker", lit("bm25"))
      .unionByName(
        Retrieval.evalTopK(naive, rels, 5).withColumn("ranker", lit("id_order")))
      .select(col("ranker"), col("query_id"), col("ndcg"), col("mrr"),
        col("p_at_k"))
      .orderBy(col("ranker"), col("query_id"))
  }

  private val bm25IndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** BM25 SERVED FROM the persisted postings index: build on the
    * even-id half (frozen vocabulary + totals), save → load, probe with
    * the same query set. The probe's postings scan prunes to the query
    * terms' hash buckets; the odd half's absence pins that scoring uses
    * ONLY frozen index state. The oracle replays the even-half stats. */
  private def qBm25IndexTopK(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Retrieval
    val d = t(s, dir, "documents")
    val path = bm25IndexPaths.computeIfAbsent(dir, { _ =>
      val p = java.nio.file.Files.createTempDirectory("graft_bm25_idx").toString
      Retrieval.Bm25Index.build(d.filter(col("doc_id") % 2 === 0),
        "text", "doc_id").save(p)
      p
    })
    Retrieval.Bm25Index.load(s, path).topK(bm25QueryDf(s), k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hybrid retrieval: reciprocal-rank fusion (c=60) of the BM25
    * sparse ranking and a dense cosine ranking whose per-query anchor
    * is a designated corpus embedding (more-like-this grounded by
    * keywords). Both sides top-20, fused top-10. The dense side here
    * is the exact brute-force baseline so the oracle can replay it; at
    * corpus scale it swaps for the persisted IVF-PQ probe —
    * `rrfFuse` is ranking-source-agnostic. */
  private def qHybridRrf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Retrieval
    val sparse = Retrieval.bm25TopK(t(s, dir, "documents"), "text",
      "doc_id", bm25QueryDf(s), k = 20)
    val anchorMap = Seq(("wq1", 0L), ("wq2", 1L), ("wq3", 2L))
      .toDF("query_id", "anchor")
    val anchors = t(s, dir, "embeddings")
      .join(broadcast(anchorMap), col("vec_id") === col("anchor"))
      .select(col("query_id"), col("embedding").as("qv"))
    val dense = Retrieval.denseTopK(t(s, dir, "embeddings"), "embedding",
      "vec_id", anchors, k = 20, idOut = "doc_id")
    Retrieval.rrfFuse(sparse, dense, "doc_id", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Blocked-Levenshtein record linkage over the part-name dictionary:
    * distinct names (with row counts) block on their last token, pairs
    * verify with edit distance ≤ 3. Dictionary-first — the only
    * quadratic work is within-block distinct-name pairs. */
  private def qFuzzyMatchNames(s: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyLink.blockedPairs(t(s, dir, "part"), "p_name",
        regexp_extract(col("name"), "[^ ]+$", 0), maxDist = 3)
      .orderBy(col("name_a"), col("name_b"))

  /** Consecutive same-lang documents as synthetic (chosen, rejected)
    * preference pairs — the fixture for the RLHF pair diagnostics. */
  private def prefPairsOf(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val a = d.select(col("doc_id"), col("lang"), col("text").as("chosen"))
    val b = d.select((col("doc_id") - 1).as("doc_id"), col("lang"),
      col("text").as("rejected"))
    a.join(b, Seq("doc_id", "lang"))
  }

  /** Per-pair RLHF diagnostics: lengths, ratio, token overlap, dup. */
  private def qPrefPairStats(s: SparkSession, dir: String): DataFrame =
    graft.operators.PrefPairs.pairStats(prefPairsOf(s, dir),
        col("doc_id"), col("chosen"), col("rejected"))
      .orderBy(col("pair_id"))

  /** Corpus-level preference-set bias summary (length bias, micro
    * overlap, exact-dup mass). */
  private def qPrefPairBias(s: SparkSession, dir: String): DataFrame =
    graft.operators.PrefPairs.biasSummary(
      graft.operators.PrefPairs.pairStats(prefPairsOf(s, dir),
        col("doc_id"), col("chosen"), col("rejected")))

  /** Deterministic model-comparison battles between SOURCES: adjacent
    * docs (doc_id, doc_id+1) from different sources fight; the longer
    * text wins (ties to the lexicographically smaller source). A
    * synthetic-but-faithful stand-in for arena/preference judgment
    * streams, shared by the win-rate and Bradley–Terry queries. */
  private def battleCellsOf(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val a = d.select(col("doc_id"), col("source").as("ma"),
      col("n_chars").as("ca"))
    val b = d.select((col("doc_id") - 1).as("doc_id"),
      col("source").as("mb"), col("n_chars").as("cb"))
    val fights = a.join(b, "doc_id").filter(col("ma") =!= col("mb"))
      .withColumn("a_won", col("ca") > col("cb") ||
        (col("ca") === col("cb") && col("ma") < col("mb")))
    graft.operators.Battles.cells(fights, col("ma"), col("mb"), col("a_won"))
  }

  /** Per-matchup win rates with Wilson 95% intervals. */
  private def qBattleWinrates(s: SparkSession, dir: String): DataFrame =
    graft.operators.Battles.winRateWilson(battleCellsOf(s, dir))
      .orderBy(col("model_a"), col("model_b"))

  /** Bradley–Terry strengths over the same battle cells (20 quantized
    * Zermelo rounds — the oracle replays them as unrolled CTEs). */
  private def qBtStrength(s: SparkSession, dir: String): DataFrame =
    graft.operators.Battles.btStrengths(battleCellsOf(s, dir), iters = 20)
      .orderBy(col("strength").desc, col("model"))

  /** One-way ANOVA of event value by event type. */
  private def qEventsAnova(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.anovaOneWay(t(s, dir, "events"),
      col("event_type"), col("value"))

  /** Pairwise source vocabulary overlap via HLL inclusion–exclusion:
    * one token-sketch pass over the corpus (512-byte registers per
    * source), then |A∩B| and Jaccard estimates on the 190-pair frame.
    * The oracle replays registers RELATIONALLY — (grp, j, max rho)
    * rows — and pair-merges them with a join, the same elementwise-max
    * the binary merge performs. */
  private def qSourceVocabOverlapHll(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Cardinality
    val toks = t(s, dir, "documents").select(col("source"),
      explode(filter(split(trim(col("text")), "\\s+"),
        x => length(x) > 0)).as("tok"))
    Cardinality.pairOverlap(
        Cardinality.registersOf(toks, "source", "tok", p = 9), p = 9)
      .withColumnRenamed("grp_a", "source_a")
      .withColumnRenamed("grp_b", "source_b")
      .orderBy(col("source_a"), col("source_b"))
  }

  /** The MWU battery with multiple-comparisons control: per-segment
    * z → two-sided p (shared A&S erf polynomial — the p contract is
    * the polynomial, not libm's Φ) → Benjamini–Hochberg adjusted p +
    * significance at q = 0.05. */
  private def qEventsMwuFdr(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Metrics
    val mwu = Metrics.mannWhitney(t(s, dir, "events"),
      col("event_type"), (col("user_id") % 2).cast("int"), col("value"))
    Metrics.bhAdjust(
        mwu.filter(col("z").isNotNull)
          .select(col("g"), Metrics.zTwoSidedP(col("z")).as("p")),
        col("g"), col("p"))
      .select(col("k").as("event_type"),
        round(col("p"), 6).as("p_value"),
        round(col("p_adj"), 6).as("p_adj"),
        (col("p_adj") < 0.05).as("significant"))
      .orderBy(col("event_type"))
  }

  /** Top principal component of the embedding corpus by 8 power-
    * iteration rounds — per-dim loadings + variance share (the
    * anisotropy diagnostic). Oracle replays the quantized rounds as
    * unrolled MATERIALIZED CTEs. */
  private def qEmbPcaPower(s: SparkSession, dir: String): DataFrame =
    graft.operators.Pca.powerTopComponent(t(s, dir, "embeddings"),
      "vec_id", "embedding", iters = 8)

  /** Two deflated principal components + the spectral ratio λ₂/λ₁ —
    * "how one-dimensional is this embedding space, and what's next". */
  private def qEmbPca2(s: SparkSession, dir: String): DataFrame =
    graft.operators.Pca.powerTwoComponents(t(s, dir, "embeddings"),
      "vec_id", "embedding", iters = 8)

  /** Corpus-level line-boilerplate profile with deterministic repeated
    * footer/banner injection by doc_id residue (the cleaning_signals
    * noise-injection precedent) so the cross-doc repeated-line path is
    * exercised on the synthetic corpus. */
  private def qLineBoilerplate(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CleaningSignals
    val aug = t(s, dir, "documents").withColumn("t2",
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          lit("\n(c) example corp all rights reserved")).otherwise(lit("")),
        when(col("doc_id") % 5 === 1,
          lit("\nsubscribe to our newsletter")).otherwise(lit(""))))
    CleaningSignals.lineBoilerplate(aug, "t2", "doc_id", minDocs = 3)
      .withColumnRenamed("bp_id", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Per-doc Unicode script mix over deterministically multilingual-
    * augmented text (Han/Cyrillic/Arabic snippets by doc_id residue). */
  private def qScriptMix(s: SparkSession, dir: String): DataFrame = {
    val aug = t(s, dir, "documents").withColumn("t2",
      concat(col("text"),
        when(col("doc_id") % 7 === 2, lit(" \u4e2d\u6587\u6d4b\u8bd5\u6587\u672c")).otherwise(lit("")),
        when(col("doc_id") % 11 === 4, lit(" \u0440\u0443\u0441\u0441\u043a\u0438\u0439 \u0442\u0435\u043a\u0441\u0442")).otherwise(lit("")),
        when(col("doc_id") % 13 === 6, lit(" \u0646\u0635 \u0639\u0631\u0628\u064a")).otherwise(lit(""))))
    TextAnalysis.scriptMix(aug, "t2", "doc_id").orderBy(col("doc_id"))
  }

  /** Sorted-neighborhood linkage pass over part names: first-char
    * partitions, name sort order, window 3, edit distance ≤ 2 —
    * the equality-block-free complement to `fuzzy_match_*`. */
  private def qLinkageSortedNbhd(s: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyLink.sortedNeighborhoodPairs(t(s, dir, "part"),
        "p_name", substring(col("name"), 1, 1), col("name"),
        window = 3, maxDist = 4)
      .orderBy(col("name_a"), col("name_b"))

  /** Text-cleaning damage signals over documents with deterministic
    * noise injection (HTML chrome / mojibake / code lines by doc_id
    * residue — replayed verbatim by the oracle) so every signal path
    * is exercised on the clean synthetic corpus. */
  private def qCleaningSignals(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CleaningSignals
    val aug = t(s, dir, "documents").withColumn("t2",
      concat(col("text"),
        when(col("doc_id") % 5 === 0, lit(
          " <div class=\"x\">see <a href=\"http://example.com/a\">link</a></div>"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 3, lit(
          " Ã© broken â€™ text �"))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 5, lit(
          "\n    if (x == 1) { return y; }\n\ttotal += 1;"))
          .otherwise(lit(""))))
    aug.select(col("doc_id") +: CleaningSignals.signals(col("t2")): _*)
      .orderBy(col("doc_id"))
  }

  /** Damerau–Levenshtein-gated linkage pairs (last-token blocking) —
    * emits both distances so `lev - dl` is the transposition mass. */
  private def qFuzzyMatchDl(s: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyLink.dlPairs(t(s, dir, "part"), "p_name",
        regexp_extract(col("name"), "[^ ]+$", 0), maxDist = 3)
      .orderBy(col("name_a"), col("name_b"))

  /** k-anonymity / l-diversity audit of customer under
    * (nation, segment) quasi-identifiers with the account-balance
    * thousand-bucket as the sensitive attribute. */
  private def qKAnonymity(s: SparkSession, dir: String): DataFrame =
    graft.operators.Pii.kAnonymity(
      t(s, dir, "customer")
        .withColumn("bal_bucket", floor(col("c_acctbal") / 1000)),
      Seq("c_nationkey", "c_mktsegment"), "bal_bucket", k = 10)

  /** Per-event-type daily-count autocorrelation at lags 1..7 — weekly
    * structure shows as a lag-7 peak. */
  private def qEventsAcf(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.acf(t(s, dir, "events"),
        col("event_type"), col("ts"), maxLag = 7)
      .orderBy(col("k"), col("lag"))

  /** CUSUM drift watch over per-type daily volumes: max drift
    * statistic, peak day, first h-sigma alarm day — the sequential
    * complement to the retrospective changepoint query. */
  private def qEventsCusum(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.cusumDrift(t(s, dir, "events"),
        col("event_type"), col("ts"))
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type"))

  /** Jaro–Winkler-scored linkage pairs (first-token blocking) — the
    * transposition-tolerant score next to fuzzy_match_names' pure edit
    * distance; the native expression replays DuckDB's builtin. */
  private def qFuzzyMatchJw(s: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyLink.jwScoredPairs(t(s, dir, "part"), "p_name",
        regexp_extract(col("name"), "^[^ ]+", 0), maxDist = 4)
      .orderBy(col("name_a"), col("name_b"))

  /** First-order Markov transition matrix over per-user event
    * sequences (count + row-normalized P(next | prev)). */
  private def qEventsTransitions(s: SparkSession, dir: String): DataFrame =
    Funnel.transitionMatrix(t(s, dir, "events"))
      .orderBy(col("prev_type"), col("next_type"))

  /** Classifier evaluation: confusion-matrix metrics (per-class P/R/F1,
    * accuracy, Cohen's κ) of the native lang_id expression against the
    * labeled lang column — the scorecard for any model-in-the-loop
    * curation gate. All integer counts until the final divisions. */
  private def qClassifierMetrics(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.classifierMetrics(
        t(s, dir, "documents")
          .select(col("lang"),
            graft.functions.TextSignals.lang_id(col("text")).as("pred")),
        "lang", "pred")
      .orderBy(col("label"))

  /** Tie-corrected Mann–Whitney AUC of the English-stopword-count
    * signal ranking English docs above the rest — exact integer
    * rank-sum arithmetic, one final division. */
  private def qScoreAuc(s: SparkSession, dir: String): DataFrame = {
    val en10 = Seq("the", "and", "of", "to", "in", "is", "that", "it",
      "for", "with")
    val score = size(filter(
      graft.operators.TextAnalysis.tokens(lower(col("text"))),
      tok => tok.isInCollection(en10))).cast("long")
    graft.operators.Metrics.rankSumAuc(
      t(s, dir, "documents").select(score.as("s"),
        (col("lang") === "en").as("y")),
      "s", col("y"))
  }

  /** Average precision of the same stopword-count scorer — the PR-side
    * twin of `score_auc` (class imbalance is the norm for quality
    * classifiers, where ROC saturates and AP still moves). One
    * two-phase rank+cumsum pass; ties break on doc_id so the oracle
    * walks the identical permutation. */
  private def qScoreAvgPrecision(s: SparkSession, dir: String): DataFrame = {
    val en10 = Seq("the", "and", "of", "to", "in", "is", "that", "it",
      "for", "with")
    val score = size(filter(
      graft.operators.TextAnalysis.tokens(lower(col("text"))),
      tok => tok.isInCollection(en10))).cast("long")
    graft.operators.Metrics.averagePrecision(
      t(s, dir, "documents").select(score.as("s"),
        (col("lang") === "en").as("y"), col("doc_id")),
      "s", col("y"), col("doc_id"))
  }

  /** In-engine LR training: 3 deterministic full-batch gradient steps
    * over hashed binary unigram features (64 buckets + bias), label =
    * lang=='en'. The oracle replays training as 3 unrolled SQL
    * iterations under the 12-dp per-step rounding contract. */
  private def qQualityLrTrain(s: SparkSession, dir: String): DataFrame =
    graft.operators.Classifier.trainLogReg(t(s, dir, "documents"), "text",
        "doc_id", col("lang") === "en", nBuckets = 64, iters = 3, lr = 1.0)
      .orderBy(col("bucket"))

  /** Calibration curve of the trained LR: probability-decile bins with
    * mean predicted p vs observed positive rate. The oracle scores with
    * the same replayed weights (shared training CTE chain). */
  private def qLrCalibration(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Classifier
    val d = t(s, dir, "documents")
    val w = Classifier.trainLogReg(d, "text", "doc_id",
      col("lang") === "en", nBuckets = 64, iters = 3, lr = 1.0)
    Classifier.calibration(d, "text", "doc_id", col("lang") === "en", w,
        nBuckets = 64, nBins = 10)
      .orderBy(col("bin"))
  }

  /** Top-10 most common 3-step event-type paths (sequence mining over
    * per-user order; two lags + a types³ agg + TakeOrdered). */
  private def qEventsPaths(s: SparkSession, dir: String): DataFrame =
    Funnel.topPaths(t(s, dir, "events"), k = 10)

  /** Kaplan–Meier time-to-first-purchase curve (hour granularity,
    * right-censored at the corpus horizon). */
  private def qEventsSurvival(s: SparkSession, dir: String): DataFrame =
    graft.operators.Survival.kaplanMeier(t(s, dir, "events"), "purchase")
      .orderBy(col("dur_h"))

  /** Experiment readout: two-proportion z-test under a deterministic
    * A/B assignment (user parity). Conversion = "heavy purchaser"
    * (>= 14 purchase events) — a has-any flag saturates at this event
    * density (P(no purchase) ~ 4e-7 per user), degenerating the pooled
    * SE to 0. */
  private def qEventsAb(s: SparkSession, dir: String): DataFrame = {
    val units = t(s, dir, "events").groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        >= 14L).cast("long").as("conv"))
    graft.operators.Metrics.twoProportionZ(units, col("user_id") % 2,
      col("conv"))
  }

  /** Mann–Whitney U per event type: did the A arm's value distribution
    * shift vs B, nonparametrically (tie-corrected rank-sum z). */
  private def qEventsMwu(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.mannWhitney(t(s, dir, "events"),
        col("event_type"), (col("user_id") % 2).cast("int"), col("value"))
      .select(col("g").as("event_type"), col("n_a"), col("n_b"),
        col("u"), col("z"))
      .orderBy(col("event_type"))

  /** Kendall tau-b between daily purchase revenue (exact integer
    * cents — per-item rounding, so cross-engine comparisons never sit
    * on a float knife-edge) and daily active users. */
  private def qEventsKendall(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(when(col("event_type") === "purchase",
          round(col("value") * 100, 0).cast("long")).otherwise(0L))
          .as("rev_cents"),
        countDistinct(col("user_id")).as("dau"))
    graft.operators.Metrics.kendallTau(daily, col("d"),
      col("rev_cents"), col("dau"))
  }

  /** Theil–Sen robust trend of each event type's daily volume (median
    * of pairwise slopes over the calendar-bounded daily series). */
  private def qEventsTheilSen(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.theilSen(t(s, dir, "events"),
        col("event_type"), col("ts"), count(lit(1)))
      .select(col("k").as("event_type"), col("n_pairs"), col("sen_slope"))
      .orderBy(col("event_type"))

  /** Two-sample KS distance of the value distribution between A/B arms
    * per event type — the shape-level experiment readout (exact integer
    * sup-gap via tie-block cumulative windows). */
  private def qEventsKs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.ksTest(t(s, dir, "events"),
        col("event_type"), (col("user_id") % 2).cast("int"), col("value"))
      .select(col("g").as("event_type"), col("n_a"), col("n_b"),
        col("ks_d"), col("ks_stat"))
      .orderBy(col("event_type"))

  /** Two-arm log-rank test on time-to-first-purchase under the
    * `user_id % 2` assignment — the censoring-correct "did arm A
    * convert on a different clock" readout (hour granularity, same
    * duration spec as `q_events_survival`). */
  private def qEventsLogrank(s: SparkSession, dir: String): DataFrame =
    graft.operators.Survival.logRank(t(s, dir, "events"), "purchase",
      col("user_id") % 2)

  /** Wald SPRT trace on the daily purchase-share stream (H0 p=0.18 vs
    * H1 p=0.22, α=β=0.05): the early-stopping monitor, one decision
    * row per calendar day. */
  private def qEventsSprt(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.sprtBernoulli(t(s, dir, "events"),
        to_date(col("ts")), col("event_type") === "purchase",
        p0 = 0.18, p1 = 0.22)
      .withColumnRenamed("period", "day")
      .orderBy(col("day"))

  /** Spearman rank correlation between event value and event time per
    * event type — "is spend drifting monotonically over the window",
    * outlier-immune where raw Pearson is not (ranks via the MWU
    * tie-block windows; scan-sized, unlike O(n²) Kendall). */
  private def qEventsSpearman(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.spearman(t(s, dir, "events"),
        col("event_type"), col("value"), unix_micros(col("ts")))
      .select(col("g").as("event_type"), col("n"), col("rho"))
      .orderBy(col("event_type"))

  /** Poisson-bootstrap 95% CI of mean per-user spend by event type —
    * all 64 replicates ride one explode + one partial agg (the
    * Chamandy one-pass bootstrap); weights draw deterministically from
    * splitmix64 against integer Poisson(1) CDF thresholds, so the
    * oracle replays every replicate bit-for-bit. */
  private def qBootstrapCi(s: SparkSession, dir: String): DataFrame = {
    val units = t(s, dir, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("ucents"))
    graft.operators.Metrics.poissonBootstrapCI(units,
        col("event_type"), col("user_id"), col("ucents"))
      .select(col("g").as("event_type"), col("n_units"),
        round(col("mean_c") / 100.0, 4).as("mean_v"),
        col("n_rep"),
        round(col("ci_lo") / 100.0, 4).as("ci_lo"),
        round(col("ci_hi") / 100.0, 4).as("ci_hi"))
      .orderBy(col("event_type"))
  }

  /** Single changepoint per event type: the day whose split maximizes
    * the between-segment SSE reduction over the daily volume series —
    * the level-shift alarm the hourly z-score can't localize. */
  private def qEventsChangepoint(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.changepoint(t(s, dir, "events"),
        col("event_type"), col("ts"), count(lit(1)))
      .select(col("k").as("event_type"), col("cp_day"), col("n_days"),
        col("gain"), col("mean_before"), col("mean_after"))
      .orderBy(col("event_type"))

  /** Which event type moved total value period-over-period: exact
    * cents deltas at the window's own date midpoint, share of the total
    * move, magnitude rank. */
  private def qEventsContribution(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.periodContribution(t(s, dir, "events"),
        col("event_type"), col("ts"),
        round(col("value") * 100, 0).cast("long"))
      .select(col("seg").as("event_type"), col("rev_p1"), col("rev_p2"),
        col("delta"), col("share_of_move"), col("seg_rank"))
      .orderBy(col("seg_rank"))

  /** Pearson chi-square independence of event_type x A/B variant
    * (full-grid expected counts; one contingency agg over the scan). */
  private def qEventsChi2(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.chiSquare(t(s, dir, "events"),
      col("event_type"), (col("user_id") % 2).cast("int"))

  /** Triangle count + clustering coefficient of the fuzzy-name pair
    * graph (a<b<c oriented wedge join closed against the edge set). */
  private def qGraphTriangles(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.operators.FuzzyLink.blockedPairs(t(s, dir, "part"),
      "p_name", regexp_extract(col("name"), "[^ ]+$", 0), maxDist = 3)
    graft.operators.Graph.triangleStats(pairs, "name_a", "name_b")
  }

  /** Degree distribution of the fuzzy-name pair graph (hub/skew
    * profile; decides when per-key joins need salting). */
  private def qGraphDegrees(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.operators.FuzzyLink.blockedPairs(t(s, dir, "part"),
      "p_name", regexp_extract(col("name"), "[^ ]+$", 0), maxDist = 3)
    graft.operators.Graph.degreeHistogram(pairs, "name_a", "name_b")
      .orderBy(col("degree"))
  }

  /** Fill-in-the-middle rewrite over the documents corpus (PSM render,
    * splitmix pivots replayed by the oracle in HUGEINT). */
  private def qFimTransform(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.fimTransform(t(s, dir, "documents"), "text",
        "doc_id", minChars = 20)
      .orderBy(col("doc_id"))

  /** Per-type exponential smoothing of hourly event volume (alpha=0.3;
    * the one-step forecast level; list_reduce-replayable fold). */
  private def qEventsSmoothing(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.expSmoothing(t(s, dir, "events"))
      .orderBy(col("event_type"))

  /** Market-basket association rules over order baskets (top-20 by
    * lift at support >= 3). */
  private def qBasketRules(s: SparkSession, dir: String): DataFrame =
    graft.operators.Basket.associationRules(t(s, dir, "lineitem"),
      "l_orderkey", "l_partkey", minSupport = 3, topK = 20)

  /** Cohort LTV matrix: purchase revenue accumulated over cohort age. */
  private def qEventsCohortLtv(s: SparkSession, dir: String): DataFrame =
    Funnel.cohortLtv(t(s, dir, "events"))
      .orderBy(col("cohort_day"), col("age_d"))

  /** Revenue concentration: Gini coefficient over per-customer order
    * revenue (cents-exact values ranked deterministically). */
  private def qGiniRevenue(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
    graft.operators.Metrics.gini(rev, "revenue", "o_custkey")
  }

  /** Pareto concentration of customer revenue: the share held by the
    * top 1/5/10/20 percent of customers. */
  private def qParetoRevenue(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
    graft.operators.Metrics.topShares(rev, "revenue", "o_custkey")
  }

  /** Zipf rank-frequency profile of the corpus vocabulary (flat slope
    * flags templated/synthetic text). */
  private def qVocabZipf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipfProfile(t(s, dir, "documents"), "text", topN = 100)

  /** Corpus mixture diversity: Shannon entropy, Simpson index, and the
    * effective source count of the documents source distribution. */
  private def qCorpusDiversity(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.diversity(t(s, dir, "documents"), "source")

  /** Morton (Z-order) layout key over (orderkey, partkey) low 16 bits
    * — the multi-column-pruning sort key, exact integer interleave. */
  private def qZorderKey(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Maintenance
    val a = col("l_orderkey").bitwiseAND(lit(65535L))
    val b = col("l_partkey").bitwiseAND(lit(65535L))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        Maintenance.zValue(a, b).as("z"))
      .orderBy(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("z"))
  }

  /** Benford first-digit profile of order totals (exact-integer-cents
    * digit extraction; flags synthetic/clamped amount generators). */
  private def qBenford(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.benfordProfile(t(s, dir, "orders"),
        "o_totalprice")
      .orderBy(col("d"))

  /** Leakage-safe k-fold assignment over near-dup clusters (k=5; the
    * cluster-keyed generalization of split_cluster_safe, consuming the
    * shared mined pairs). */
  private def qSplitKfold(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Clustering, Sampling}
    val d = t(s, dir, "documents")
    val clusters = Clustering.dupClusters(minedNgramPairs(s, dir),
      "id_a", "id_b")
    Sampling.clusterSafeFolds(d.select(col("doc_id")), "doc_id",
        clusters, "doc_id", "cluster_id", k = 5)
      .select(col("doc_id"), col("cluster_id"), col("fold"))
      .orderBy(col("doc_id"))
  }

  /** Robust center/scale per event type: exact nearest-rank-lower
    * median and MAD (median absolute deviation) via order statistics
    * on the per-group sorted array (groups are type-bounded; swap the
    * KLL sketch past memory bounds). */
  private def qEventsRobustStats(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "events").filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("value").cast("double"))).as("v"),
        count(lit(1)).as("n"))
    val idx = (floor(lit(0.5) * (col("n") - 1)) + 1).cast("int")
    val withM = g.withColumn("m", element_at(col("v"), idx))
    withM
      .withColumn("dv", sort_array(transform(col("v"),
        x => abs(x - col("m")))))
      .select(col("event_type"), col("n"),
        round(col("m"), 4).as("median"),
        round(element_at(col("dv"), idx), 4).as("mad"))
      .orderBy(col("event_type"))
  }

  /** Hour-of-day × day-of-week volume seasonality profile. */
  private def qEventsSeasonality(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "events")
      .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"))
    c.crossJoin(broadcast(c.agg(sum(col("n")).as("n_total"))))
      .select(col("dow"), col("hod"), col("n"),
        round(col("n").cast("double") / col("n_total"), 6).as("share"))
      .orderBy(col("dow"), col("hod"))
  }

  /** Funnel transition-latency distribution (p50/p90 seconds per
    * adjacent stage pair over the earliest-completion chain). */
  private def qFunnelLatency(s: SparkSession, dir: String): DataFrame =
    Funnel.funnelStageLatency(t(s, dir, "events"),
      Seq("signup", "view", "click", "purchase"))

  /** Cross-dataset enrichment: event stream joined to the customer
    * dimension (user_id = c_custkey, broadcast) — engagement and
    * conversion per market segment. */
  private def qEventsBySegment(s: SparkSession, dir: String): DataFrame = {
    val seg = t(s, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    t(s, dir, "events").join(broadcast(seg), Seq("user_id"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        round(sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0))), 2).as("purchase_value"))
      .orderBy(col("c_mktsegment"))
  }

  /** One-pass Deequ-style numeric column profile of lineitem
    * (completeness / cardinality / range / mean per column). */
  private def qProfileLineitem(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.numericProfile(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy(col("column"))

  /** DSIR importance weights (Xie et al. 2023): hashed-bigram
    * log-likelihood ratio of each doc under the English slice (target)
    * vs the whole pool (raw), add-one smoothed over 256 buckets. */
  private def qDsirWeights(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dsir.importanceWeights(t(s, dir, "documents"), "text",
        "doc_id", col("lang") === "en", nBuckets = 256)
      .orderBy(col("doc_id"))

  /** DSIR selection: top-100 docs by `logw + Gumbel(splitmix64(id))` —
    * the deterministic importance resample toward the English target. */
  private def qDsirSelect(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dsir.select(t(s, dir, "documents"), "text", "doc_id",
      col("lang") === "en", n = 100, nBuckets = 256)

  private val dsirRefPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** DSIR scoring SERVED FROM the persisted reference: fit the bucket
    * counts on the even-id half (target = its English slice), save →
    * load, score EVERY doc against the frozen counts — odd-half docs
    * can hit buckets the reference never saw, exercising the uniform
    * ct=cr=0 smoothing the in-query operator can't reach. The oracle
    * replays the even-half counts. */
  private def qDsirScoreIndex(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dsir
    val d = t(s, dir, "documents")
    val path = dsirRefPaths.computeIfAbsent(dir, { _ =>
      val p = java.nio.file.Files.createTempDirectory("graft_dsir_ref").toString
      Dsir.DsirRef.build(d.filter(col("doc_id") % 2 === 0), "text", "doc_id",
        col("lang") === "en", nBuckets = 256).save(p)
      p
    })
    Dsir.DsirRef.load(s, path).scoreOf(d, "text", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Exact-substring duplicate spans: maximal repeated token spans at
    * any offset (8-token sliding windows, global first occurrence
    * keeps). The oracle replays windows/first-occurrence/islands on the
    * window STRINGS — agreeing with the Spark hash-keyed run unless an
    * FNV collision fabricates a span. */
  private def qExactSubstrSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.exactSubstrSpans(t(s, dir, "documents"), "text", "doc_id",
        winTokens = 8)
      .orderBy(col("doc_id"), col("span_start"))

  private val substrIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val memberIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Exact-membership probe served from the persisted Bloom + hash-set
    * index ([[graft.operators.MemberIndex]]): corpus = events with
    * event_id % 5 != 0 (member keys frozen on disk), batch = the % 5 == 0
    * slice; result = the batch rows whose (user, type, props) key the
    * corpus has never seen — novel-key detection with the
    * majority-novel traffic resolved map-side against the broadcast
    * bit array and only bloom candidates paying the confirm join. The
    * verdict is exact (no false negatives; false positives die at the
    * confirm), so the oracle is a plain NOT IN on the key. */
  private def qMemberNovelKeys(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.MemberIndex
    val keyed = t(s, dir, "events").select(col("event_id"),
      concat(col("user_id").cast("string"), lit(":"), col("event_type"),
        lit(":"), col("props")).as("member_key"))
    val path = memberIndexPaths.computeIfAbsent(dir, { _ =>
      val p = java.nio.file.Files.createTempDirectory("graft_member_idx").toString
      MemberIndex.MemberRef.build(keyed.filter(col("event_id") % 5 =!= 0),
        col("member_key"), mExp = 16, k = 6).save(p)
      p
    })
    MemberIndex.MemberRef.load(s, path)
      .novelOf(keyed.filter(col("event_id") % 5 === 0), col("member_key"))
      .select(col("event_id"), col("member_key"))
      .orderBy(col("event_id"))
  }

  /** Exact-substring spans SERVED FROM the persisted window index:
    * corpus = even-id docs (hashes frozen on disk), batch = odd-id
    * docs; the probe semi-joins the loaded hash set and reports which
    * batch spans exist verbatim in the corpus. The oracle replays the
    * window-set membership on strings. */
  private def qExactSubstrIndex(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val path = substrIndexPaths.computeIfAbsent(dir, { _ =>
      val p = java.nio.file.Files.createTempDirectory("graft_substr_idx").toString
      Dedup.SubstrCorpusIndex.build(d.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", winTokens = 8).save(p)
      p
    })
    Dedup.SubstrCorpusIndex.load(s, path)
      .spansOf(d.filter(col("doc_id") % 2 === 1), "text", "doc_id")
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** Dedup-aware sampling weights: weight 1/|near-dup cluster| per doc,
    * so duplicated content is trained once in expectation instead of
    * |cluster| times — the multi-epoch counterpart of the keep-list
    * (which drops; this reweights). Unclustered docs are singletons. */
  private def qDedupWeights(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Clustering
    val d = t(s, dir, "documents")
    val comp = Clustering.dupClusters(minedBandedPairs(s, dir),
        "id_a", "id_b")
      .select(col("doc_id").as("cw_id"), col("n_members"))
    d.select(col("doc_id"))
      .join(comp, col("doc_id") === col("cw_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_members"), lit(1L)).as("cluster_size"),
        round(lit(1.0) / coalesce(col("n_members"), lit(1L)), 6)
          .as("sample_weight"))
      .orderBy(col("doc_id"))
  }

  /** Heap's-law vocabulary growth: cumulative distinct token types vs
    * cumulative token count over doc-id deciles of the corpus — the
    * "is more data still adding vocabulary" curve. First occurrence per
    * type is a min-decile agg (no global token ordering, no prefix
    * sort); the cumulative window runs over the TEN decile rows. */
  private def qVocabGrowth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents")
    val n = d.count()
    // exact integer floor-div (the IntervalJoin form): subtract the
    // Euclidean remainder so the decimal division is exact
    val a = col("doc_id") * 10
    val decile = ((a - pmod(a, lit(n))).cast("decimal(38,0)") / lit(n))
      .cast("long")
    val toks = d.select(decile.as("decile"),
      explode(TextAnalysis.tokens(lower(col("text")))).as("tok"))
    val perDec = toks.groupBy(col("decile")).agg(count(lit(1)).as("n_toks"))
    val newTypes = toks.groupBy(col("tok"))
      .agg(min(col("decile")).as("first_decile"))
      .groupBy(col("first_decile")).agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDec
      .join(newTypes, col("decile") === col("first_decile"), "left")
      .select(col("decile"), col("n_toks"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("n_tokens_cum", sum(col("n_toks")).over(w))
      .withColumn("vocab_cum", sum(col("n_new")).over(w))
      .select(col("decile"), col("n_tokens_cum"), col("vocab_cum"),
        round(col("vocab_cum").cast("double") / col("n_tokens_cum"), 6)
          .as("type_token_ratio"))
      .orderBy(col("decile"))
  }

  /** Token-level decontamination: spans of TRAINING docs verbatim in
    * the eval slice (doc_id % 50 = 0, the `contamination_*` family's
    * split) are cut out of the training text — the surgical alternative
    * to dropping whole contaminated docs. 4-token windows so short
    * verbatim quotes are caught. */
  private def qDecontamSpansApply(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val eval = d.filter(col("doc_id") % 50 === 0)
    val train = d.filter(col("doc_id") % 50 =!= 0)
    Dedup.exactSubstrApply(train, "text", "doc_id",
        Dedup.substrSpansVsCorpus(train, eval, "text", "doc_id", winTokens = 4))
      .orderBy(col("doc_id"))
  }

  /** Per-type value quantiles via the mergeable bounded-memory sketch —
    * capacity 16384 ≥ any sf0.01 group, so the summary never compacts
    * and reports the EXACT nearest-rank-lower order statistic (the same
    * operator runs approximately when groups exceed capacity;
    * spec-pinned in QuantileSketchSpec). */
  private def qQuantileSketch(s: SparkSession, dir: String): DataFrame =
    graft.stats.Stats.quantileProfile(
        t(s, dir, "events").filter(col("value").isNotNull),
        "event_type", "value", qs = Seq(0.5, 0.9, 0.99), capacity = 16384)
      .orderBy(col("event_type"), col("q"))

  /** The exact-substring APPLY step: every doc's text rebuilt with the
    * duplicated spans cut out (later occurrences removed, first kept).
    * Composes the span miner with the span consumer — the pair a real
    * pipeline runs. */
  private def qExactSubstrApply(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    Dedup.exactSubstrApply(d, "text", "doc_id",
        Dedup.exactSubstrSpans(d, "text", "doc_id", winTokens = 8))
      .orderBy(col("doc_id"))
  }

  /** Sequence packing: greedy 256-token bins per (lang, doc_id%4 shard)
    * cell in doc_id order — deterministic, so the oracle replays the
    * same scan with a recursive CTE. */
  private def qSeqPack(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Packing
    val d = t(s, dir, "documents").select(col("doc_id"), col("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    Packing.packGreedy(d, "doc_id", "lang", "n_tokens", budget = 256, shards = 4)
      .select(col("id").as("doc_id"), col("grp").as("lang"), col("shard"),
        col("n_tokens"), col("bin_id"), col("offset"))
      .orderBy(col("doc_id"))
  }

  /** Bin-utilization stats over the packed corpus: per language, bins
    * produced, docs packed, mean fill and fraction of the 256-token
    * budget actually used (the padding-waste measure). */
  private def qPackingStats(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Packing
    val d = t(s, dir, "documents").select(col("doc_id"), col("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val packed = Packing.packGreedy(d, "doc_id", "lang", "n_tokens",
      budget = 256, shards = 4)
    Packing.binStats(packed, budget = 256)
      .select(col("grp").as("lang"), col("n_bins"), col("n_docs"),
        col("sum_fill"), col("capped_fill"), col("avg_fill"), col("utilization"))
      .orderBy(col("lang"))
  }

  /** Multi-table LSH embedding near-dup pairs — the scale path of
    * `dedup_embedding_pairs`, oracled: every bucket table is
    * deterministic, so DuckDB recomputes the same (table, bucket)
    * equi-join union and exact in-bucket cosine. */
  private def qEmbLshPairs(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), "embedding", "vec_id",
        dim = 64, threshold = 0.4, nBits = 2, tables = 8)
      .orderBy(col("id_a"), col("id_b"))

  private def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding")).head()
      .getSeq[Float](0).map(_.toDouble)
    Similarity.lshTopK(e, "embedding", "vec_id", q, 10, dim = q.length,
      nBits = 8, probes = 2, tables = 8)
  }

  /** ANN quality measurement — the APPROXIMATE path made
    * CORRECTNESS-visible: one query computes the pruned LSH search AND
    * its brute-force ground truth over the same scan, and emits
    * (n_scanned, n_total, scanned_fraction, n_hits, recall_at_k). The
    * LSH buckets are deterministic splitmix64 planes, so the oracle
    * replays the identical pruning in SQL — any drift in the bucket
    * math, the probe expansion, or the top-k tie-breaking shows up as
    * a hash mismatch, not just a recall estimate. Ratios are single
    * IEEE divisions of exact counts (bit-identical cross-engine). */
  private def qAnnRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding")).head()
      .getSeq[Float](0).map(_.toDouble)
    val k = 10
    val cond = Similarity.lshCandidateCond(col("embedding"), q, dim = q.length,
      nBits = 6, probes = 2, tables = 2)
    val brute = Similarity.bruteForceTopK(e, "embedding", "vec_id", q, k)
      .select(col("vec_id"))
    val pruned = Similarity.bruteForceTopK(e.filter(cond), "embedding", "vec_id", q, k)
      .select(col("vec_id").as("p_id"))
    val scan = e.agg(sum(when(cond, 1L).otherwise(0L)).as("n_scanned"),
      count(lit(1)).as("n_total"))
    val hits = brute.join(pruned, col("vec_id") === col("p_id"))
      .agg(count(lit(1)).as("n_hits"))
    scan.crossJoin(hits).select(
      lit(k).as("k"), col("n_scanned"), col("n_total"), col("n_hits"),
      (col("n_scanned").cast("double") / col("n_total")).as("scanned_fraction"),
      (col("n_hits").cast("double") / k).as("recall_at_k"))
  }

  /** Recall@k of the IVF-PQ ADC path against the exact squared-L2
    * top-k on the same query set — the quality metric that justifies
    * the compressed-domain ANN's cost model. The exact side is a
    * broadcast(queries)×corpus compare (same ≡0 mod 41 query set as
    * the top-k row; the exact anchor is nq×corpus over the small
    * embeddings relation);
    * both sides rank on a 6-dp-rounded distance, so the verdict is
    * bit-replayable cross-engine. */
  private def qAnnIvfPqRecall(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "embeddings")
    val k = 10
    val qpred = col("vec_id") % 41 === 0
    // served from the session-shared LOADED index (identical results to
    // the inline build — deterministic quantizers + bit-exact parquet
    // round-trip, pinned by AnnIndexSpec)
    val approx = annIndexFor(s, dir, e)
      .probe(e.filter(qpred), "embedding", "vec_id", nprobe = 2, topK = k)
      .select(col("q_id"), col("vec_id"))
    val queries = e.filter(qpred)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val d2 = aggregate(
      zip_with(col("embedding"), col("qv"), (x, y) => {
        val dd = x.cast("double") - y.cast("double"); dd * dd
      }), lit(0.0), (acc, x) => acc + x)
    val dists = e.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(queries))
      .select(col("q_id"), col("vec_id"), round(d2, 6).as("d2"))
    val pruned = graft.operators.PartitionPrune.firstNPerKey(dists, "q_id",
      Seq(col("d2").asc, col("vec_id").asc), k)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("d2").asc, col("vec_id").asc)
    val exact = pruned.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k).select(col("q_id"), col("vec_id"))
    val nq = queries.agg(count(lit(1)).as("n_queries"))
    val hits = exact.join(approx, Seq("q_id", "vec_id"))
      .agg(count(lit(1)).as("n_hits"))
    nq.crossJoin(hits).select(lit(k).as("k"), col("n_queries"), col("n_hits"),
      (col("n_hits").cast("double") / (col("n_queries") * k)).as("recall_at_k"))
  }

  /** Content-defined chunk dedup: chunk boundaries anchored to token
    * content (FNV low bits), so shifted near-copies keep matching —
    * the edit-robust sibling of `segment_dedup`. */
  private def qCdcDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.cdcDedup(t(s, dir, "documents"), "text", "doc_id", maskBits = 3)
      .orderBy(col("doc_id"))

  /** Duplicated-span profile per document: longest contiguous run of
    * corpus-duplicated 8-token segments (near-copy detector — one long
    * run = a copied doc with a novel header; scattered runs =
    * boilerplate). */
  private def qSpanDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.dupSpans(t(s, dir, "documents"), "text", "doc_id", segTokens = 8)
      .orderBy(col("doc_id"))

  /** Per-source curation stats: the corpus-level keep/drop/reweight
    * signal (doc/token counts, corpus-wide exact-dup share, token
    * share). Ratios follow the exact-BIGINT + single-division numeric
    * contract. */
  private def qSourceStats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceStats(t(s, dir, "documents"), "text", "source")
      .orderBy(col("source"))

  /** Cross-corpus near-dup dedup — the continual-training shape: a new
    * batch (odd ids) is deduped against an existing corpus index (even
    * ids) via the MinHash-LSH band equi-join + exact Jaccard verify.
    * The banded index is the bounded state; the batch never joins the
    * corpus directly. Survivors = batch docs with no corpus neighbor at
    * Jaccard ≥ 0.5. Oracle equivalence (plain batch×corpus Jaccard
    * relation) is data-dependent, not structural: with nPerm=64/bands=8
    * a pair at exactly J=0.5 is missed w.p. (1−0.5⁸)⁸ ≈ 0.97, but the
    * generator plants only near-identical (J ≳ 0.95, P[miss] ≤ 4e-6)
    * or disjoint pairs, so no pair falls in the recall gap. Production
    * tunes (nPerm, bands) to the threshold via minhashEstimateError. */
  /** The near-dup corpus index builds+persists once per (JVM, sf dir)
    * and every invocation serves from the LOADED artifact — the
    * production continual-ingest shape (and the ann_ivfpq precedent):
    * an index you probe is an index you saved, not one you rebuild per
    * batch. */
  private val neardupIdxPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def qCrossCorpusLsh(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val path = neardupIdxPaths.computeIfAbsent(dir, { _ =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_neardup_idx").toString
      Dedup.nearDupCorpusIndex(docs.filter(col("doc_id") % 2 === 0),
        "text", "doc_id").save(p)
      graft.operators.CacheScope.drain()
      p
    })
    val idx = Dedup.NearDupCorpusIndex.load(s, path)
    Dedup.dropNearDupsOfCorpus(batch, "text", "doc_id", idx, threshold = 0.5)
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Cross-corpus EMBEDDING near-dup dedup — the semantic twin of
    * [[qCrossCorpusLsh]]: a new batch (odd ids) dropped against an
    * existing corpus's embedding-LSH bucket index (even ids) via the
    * multi-table (t, b) equi-join + exact cosine verify; the batch
    * never joins the corpus directly. The bucket derivation is
    * data-independent (splitmix hyperplanes), so the oracle replays
    * buckets, candidate join, round-6 cosine verify, and anti-join
    * EXACTLY — including any recall misses. */
  private def qCrossCorpusEmb(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") % 2 === 0)
    val batch = e.filter(col("vec_id") % 2 === 1)
    val idx = Similarity.embCorpusIndex(corpus, "embedding", "vec_id", dim = 64)
    Similarity.dropNearDupsOfEmbCorpus(batch, "embedding", "vec_id", idx,
        threshold = 0.4)
      .select(col("vec_id")).orderBy(col("vec_id"))
  }

  /** Replays [[qCrossCorpusEmb]]: same splitmix hyperplane buckets per
    * side, same (t, b) candidate join, same round-6 cosine ≥ threshold,
    * same anti-join. */
  private def crossCorpusEmbOracle(dim: Int, nBits: Int, tables: Int,
                                   threshold: Double): String = {
    val planes = graft.operators.Similarity.hyperplanes(dim, nBits * tables)
    def side(name: String) = (0 until tables).map { t =>
      val expr = (0 until nBits).map { i =>
        val p = planes(t * nBits + i)
        s"(CASE WHEN list_dot_product(v, [${p.mkString(",")}]) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, v, $t AS t, $expr AS b FROM $name"
    }.mkString(" UNION ALL ")
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        corpus AS (SELECT * FROM base WHERE vec_id % 2 = 0),
        batch AS (SELECT * FROM base WHERE vec_id % 2 = 1),
        cb AS (${side("corpus")}),
        bb AS (${side("batch")}),
        dup AS (SELECT DISTINCT b.vec_id
          FROM bb b JOIN cb c ON b.t = c.t AND b.b = c.b
          WHERE round(list_dot_product(b.v, c.v) /
            (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(c.v, c.v))), 6)
            >= $threshold)
        SELECT vec_id FROM batch
        WHERE vec_id NOT IN (SELECT vec_id FROM dup)
        ORDER BY vec_id"""
  }

  /** MinHash estimator error per LSH candidate pair (est vs exact
    * Jaccard) — the config-tuning measurement for (nPerm, bands). */
  private def qMinhashEstError(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashEstimateError(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("id_a"), col("id_b"))

  /** Per-doc n-gram novelty profile (share of shingles first seen in
    * this doc) — dedup-adjacent curation signal; join+partial-agg only. */
  private def qNgramNovelty(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramNovelty(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id"))

  /** Logistic quality filter with baked-in weights (map-only scan-side
    * keep/drop decision). */
  private def qQualityClassifier(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityClassify(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id"))

  /** Token-budget selection: per lang, best-quality docs within 60% of
    * the lang's token total (bucketed cumsum — no per-doc window). */
  private def qBudgetSelect(s: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityClassify(t(s, dir, "documents"), "text", "doc_id")
      .join(t(s, dir, "documents").select(col("doc_id"), col("lang")), "doc_id")
    graft.operators.Sampling.budgetSelect(scored, "lang", "quality_score", "q_tokens", frac = 0.6)
      .withColumnRenamed("grp", "lang")
      .orderBy(col("lang"))
  }

  /** Per-(source, lang) dataset card rollup. */
  private def qDatasetCard(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.datasetCard(t(s, dir, "documents"), "text", "source", "lang")
      .orderBy(col("source"), col("lang"))

  /** Per-dimension embedding distribution stats (dim-keyed partial agg). */
  private def qEmbDimStats(s: SparkSession, dir: String): DataFrame =
    Similarity.embDimStats(t(s, dir, "embeddings"), "embedding")
      .orderBy(col("dim"))

  /** Gopher-style hard-gate rule battery: per-doc named rule flags +
    * conjunctive keep. Map-only scan-side shape (zero exchanges). */
  private def qGopherRules(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id"))

  /** Per-doc char-entropy (compression-ratio proxy) via the codegen'd
    * CharEntropy expression — map-only; the oracle replays it with
    * DuckDB's log₂ `entropy()` aggregate over exploded codepoints. */
  private def qCharEntropy(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.charEntropy(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id"))

  /** Topic-cluster cards over the deterministic k-means cells: per-cell
    * count/share/tightness + majority label purity — the corpus
    * composition read a mixture designer takes before reweighting.
    * Map-only assignment (centroids broadcast as codegen'd literals),
    * (cell,label) partial agg, k·|labels|-row rollup; the oracle replays
    * the identical fixed-point k-means and the struct-max tie-break
    * (votes desc → label asc). */
  private def qTopicClusters(s: SparkSession, dir: String): DataFrame =
    Similarity.clusterCards(t(s, dir, "embeddings"), "embedding", "vec_id",
        "label", k = 8, iters = 2)
      .orderBy(col("cell"))

  /** Product-quantization encode: 4 subspace codebooks (k=16, 2 Lloyd
    * iters each, deterministic fixed-point) → per-vector 4-byte code
    * vector + total quantization distortion. Map-only encode; the
    * oracle replays all four codebook builds and the (s, cell)
    * assignment tie-break. */
  private def qPqEncode(s: SparkSession, dir: String): DataFrame =
    Similarity.pqEncode(t(s, dir, "embeddings"), "embedding", "vec_id",
        dim = 64, m = 4, k = 16, iters = 2)
      .orderBy(col("vec_id"))

  /** IVF-PQ ANN top-k — the compressed-domain production ANN: coarse
    * deterministic-IVF prunes to nprobe=2 cells, ADC distances against
    * the PQ codes rank candidates; every query (vec_id ≡ 0 mod 41)
    * gets its exact-replayable top-10. Ranking keys on the rounded
    * distance so cross-engine FP ulps can't flip ties.
    *
    * Served THROUGH the persisted index (build → save → load → probe):
    * the query-time plan reads the partitionBy(cell) codes parquet with
    * the probed cells as PartitionFilters and never re-runs Lloyd —
    * the 100-TB serving shape, exercised by the oracle itself. Doubles
    * round-trip parquet bit-exactly, so this equals the in-memory
    * [[Similarity.annIvfPqTopK]] bit-for-bit (AnnIndexSpec pins it). */
  /** Build+save happens once per (JVM, sf dir) — deterministic
    * quantizers make rebuilds byte-identical, so the memo only skips
    * redundant Lloyd runs; every invocation still loads and probes the
    * on-disk index (the steady-state serving cost). */
  private val annIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The session-shared loaded index (build+save on first use). */
  private def annIndexFor(s: SparkSession, dir: String,
                          emb: DataFrame): Similarity.AnnIndex = {
    val path = annIndexPaths.computeIfAbsent(dir, { _ =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_ann_idx").toString
      Similarity.AnnIndex.build(emb, "embedding", "vec_id", dim = 64,
        coarseK = 8, coarseIters = 2, m = 4, k = 16, iters = 2).save(p)
      p
    })
    Similarity.AnnIndex.load(s, path)
  }

  private def qAnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    annIndexFor(s, dir, emb)
      .probe(emb.filter(col("vec_id") % 41 === 0), "embedding", "vec_id",
        nprobe = 2, topK = 10)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** k-NN label-vote propagation over the embeddings (weak-supervision
    * auto-labeling): majority label of the 5 exact-cosine nearest
    * neighbors per vector. Exact variant = block equi-join + bounded
    * per-vector top-k; the oracle replays ranks and votes with the
    * identical tie-breaks (cos desc → neighbor id asc; votes desc →
    * label asc). */
  /** The exact anchors run on the deterministic even-id HALF of the
    * corpus: their O(n²) compare work is a correctness fixture, not the
    * performance path, so the bench shouldn't be dominated by it — the
    * production variants (`knn_label_vote_lsh`) carry the full corpus,
    * and the full-corpus exact pair relation stays oracled via
    * `dedup_embedding_pairs`. */
  private def halfEmb(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").filter(col("vec_id") % 2 === 0)

  private def qKnnLabelVote(s: SparkSession, dir: String): DataFrame =
    Similarity.knnLabelVote(halfEmb(s, dir), "embedding", "vec_id",
        "label", k = 5)
      .select(col("id").as("vec_id"), col("label"), col("pred_label"), col("n_votes"))
      .orderBy(col("vec_id"))

  /** The PRODUCTION (near-linear) k-NN vote: neighbor candidates from
    * the multi-table LSH bucket equi-join instead of the exact
    * all-pairs sweep. The hyperplanes are data-independent splitmix64
    * constants, so the oracle replays the bucket assignment, candidate
    * join, rank, and vote exactly — approximation does not mean
    * unverifiable. Vectors with no bucket-mate get no row. */
  private def qKnnLabelVoteLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.knnLabelVoteLsh(t(s, dir, "embeddings"), "embedding", "vec_id",
        "label", k = 5, dim = 64, nBits = 6, tables = 4)
      .select(col("id").as("vec_id"), col("label"), col("pred_label"), col("n_votes"))
      .orderBy(col("vec_id"))

  /** The PRODUCTION (nprobe) semantic dedup: each vector probes only
    * its 2 nearest of 8 k-means cells (4× less replication than the
    * all-cells probe), reported as (pairs found, recall vs the exact
    * pair relation). Exactly oracle-able because the centroids come
    * from the DETERMINISTIC k-means (fixed-point integer sums — bit-
    * reproducible at any partitioning, in any engine), so DuckDB
    * replays the same Lloyd iterations and lands on the identical
    * candidate set. */
  private def qSemanticDedupNprobe(s: SparkSession, dir: String): DataFrame = {
    // half corpus: the RECALL BASELINE embedded here is the exact
    // all-pairs anchor — the measurement stays exact on the half while
    // the bench isn't re-dominated by the n² baseline the nprobe path
    // exists to avoid
    val e = halfEmb(s, dir)
    val np = Similarity.semanticDupPairsNprobe(e, "embedding", "vec_id",
      k = 8, iters = 2, threshold = 0.4, nprobe = 2)
    val ex = Similarity.exactCosinePairs(e, "embedding", "vec_id", 0.4)
    val nPairs = np.agg(count(lit(1)).as("n_pairs"))
    val nExact = ex.agg(count(lit(1)).as("n_exact"))
    val nHits = np.select("id_a", "id_b")
      .join(ex.select("id_a", "id_b"), Seq("id_a", "id_b"))
      .agg(count(lit(1)).as("n_hits"))
    nPairs.crossJoin(nExact).crossJoin(nHits).select(
      lit(8).as("k"), lit(2).as("nprobe"),
      col("n_pairs"), col("n_exact"), col("n_hits"),
      // zero-exact-pairs edge: Spark's double 0/0 is NaN while DuckDB's
      // is NULL — both engines must agree on NULL
      when(col("n_exact") === 0, lit(null).cast("double"))
        .otherwise(col("n_hits").cast("double") / col("n_exact")).as("recall"))
  }

  /** Semantic dedup end-to-end — the composition query: distributed
    * Lloyd k-means builds real IVF cells, the exact cosine pair search
    * runs with the CELL as its home block (all-cells probe ⇒ exact
    * output independent of the learned centroids — the same trick that
    * oracles `ann_ivf_topk`), and connected components turn the pairs
    * into duplicate clusters. Oracle: brute-force pair SQL + recursive
    * transitive closure. */
  private def qSemanticDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Clustering
    val pairs = Similarity.semanticDupPairs(halfEmb(s, dir),
      "embedding", "vec_id", k = 4, iters = 3, threshold = 0.4)
    Clustering.dupClusters(pairs, "id_a", "id_b")
      .select(col("doc_id").as("vec_id"), col("cluster_id"), col("n_members"))
      .orderBy(col("vec_id"))
  }

  // ---------------------------------------------------------------------
  // WPL parse engine end-to-end: build log lines deterministically from
  // driver tables (invertible), parse them back with the WPL engine, and
  // let the oracle reconstruct the fields directly. Exercises the full
  // mapPartitions parse path (multi-rule routing, scope/quote formats,
  // CLF time, http/request struct, kvarr, json).
  // ---------------------------------------------------------------------

  import graft.engine.WplEngine
  import graft.sources.Syslog

  private val nginxWpl =
    """package /example/simple {
       rule nginx {
        (ip:sip,2*_,time:recv_time<[,]>,http/request",http/status,digit,chars",http/agent",_")
       }
      }"""

  private def qWplNginx(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val lines = o.select(col("o_orderkey"),
      concat(
        lit("10.0."), col("o_custkey") % 250 + 1, lit("."), col("o_orderkey") % 250 + 1,
        lit(" - - ["), date_format(col("o_orderdate"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000] \""),
        when(col("o_orderstatus") === "O", "GET")
          .when(col("o_orderstatus") === "F", "POST").otherwise("PUT"),
        lit(" /order/"), col("o_orderkey"), lit(" HTTP/1.1\" "),
        lit(200) + (col("o_orderkey") % 4) * 100, lit(" "),
        floor(col("o_totalprice")).cast("long"), lit(" \"http://ref.example.com/"),
        col("o_custkey"), lit("\" \"Agent/"), col("o_orderpriority"), lit("\" \"-\"")
      ).as("line"))
    val parsed = WplEngine.parseWith(lines, "line", nginxWpl, Seq("o_orderkey"))
    WplEngine.successes(parsed).select(
      col("o_orderkey"),
      WplEngine.extractString("sip").as("sip"),
      WplEngine.extractTimestamp("recv_time").as("recv_time"),
      WplEngine.extractJsonField("http/request", "method").as("method"),
      WplEngine.extractJsonField("http/request", "uri").as("uri"),
      WplEngine.extractLong("http/status").as("status"),
      WplEngine.extractLong("digit").as("bytes"),
      WplEngine.extractString("chars").as("referer"),
      WplEngine.extractString("http/agent").as("agent"))
      .orderBy(col("o_orderkey"))
  }

  private def qWplKvarr(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val lines = e.select(col("event_id"),
      concat(lit("id="), col("event_id"), lit(" type="), col("event_type"),
        lit(" user="), col("user_id"), lit(" k="),
        get_json_object(col("props"), "$.k")).as("line"))
    val parsed = WplEngine.parseWith(lines, "line", "package /kv { rule r { (kvarr) } }",
      Seq("event_id"))
    WplEngine.successes(parsed).select(
      col("event_id"),
      WplEngine.extractString("type").as("etype"),
      WplEngine.extractLong("user").as("user_id"),
      WplEngine.extractLong("k").as("k"))
      .orderBy(col("event_id"))
  }

  private def qWplJson(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val parsed = WplEngine.parseWith(e, "props",
      "package /j { rule r { (json(digit@k)) } }", Seq("event_id"))
    WplEngine.successes(parsed)
      .select(col("event_id"), WplEngine.extractLong("k").as("k"))
      .orderBy(col("event_id"))
  }

  /** `+geo()/+zone()/+device()` parse-time enrichment — the VERBATIM rule
    * from the reference fixture tests/json_test/rule.wpl:1, loaded through
    * the bare rule-conf format. geo/zone are IPv4-range knowledge tables
    * (built from the nation dim), device an exact-match table; lookups run
    * inside the parse expression (broadcast-analogue: the enricher ships
    * with the compiled parser). */
  private def qWplGeoEnrich(s: SparkSession, dir: String): DataFrame = {
    import graft.wpl.Enricher
    val e = t(s, dir, "events")
    val nation = t(s, dir, "nation")
    // knowledge tables from the 25-row nation dim (driver-side build, like
    // the reference loading its GeoIP csv into KnowDB)
    val nationRows = nation.select(col("n_nationkey"), col("n_name")).collect()
    def ip(a: Long, b: Long, c: Long, d: Long): Long = (a << 24) | (b << 16) | (c << 8) | d
    val geoRows = nationRows.toSeq.map { r =>
      val k = r.get(0).asInstanceOf[Number].longValue
      (ip(10, 0, k, 0), ip(10, 0, k, 255), r.getString(1))
    }
    val zoneRows = (0L until 4L).map(z => (ip(10, 1, z, 0), ip(10, 1, z, 255), s"zone-$z"))
    val devRows = (0 until 10).map(d => s"dev$d" -> s"vendor-${d % 3}").toMap
    val enricher = new Enricher(Map(
      "geo" -> new Enricher.IpRangeTable(geoRows),
      "zone" -> new Enricher.IpRangeTable(zoneRows),
      "device" -> new Enricher.ExactTable(devRows)))
    val lines = e.select(col("event_id"),
      to_json(struct(
        concat(lit("10.0."), col("user_id") % 25, lit("."), col("event_id") % 250).as("src-ip"),
        concat(lit("10.1."), col("event_id") % 4, lit(".5")).as("dst-ip"),
        concat(lit("dev"), col("event_id") % 10).as("dev-name"))).as("line"))
    val wpl = // tests/json_test/rule.wpl:1 verbatim
      "json_test : (json( @src-ip +geo(city_name),@dst-ip +zone(zone_name),@dev-name+device(device_val)))"
    val parsed = WplEngine.parseWith(lines, "line", wpl, Seq("event_id"), enricher)
    WplEngine.successes(parsed).select(
      col("event_id"),
      WplEngine.extractString("src-ip").as("src_ip"),
      WplEngine.extractString("city_name").as("city_name"),
      WplEngine.extractString("zone_name").as("zone_name"),
      WplEngine.extractString("device_val").as("device_val"))
      .orderBy(col("event_id"))
  }

  private def qSyslogNorm(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val lines = e.select(col("event_id"),
      concat(lit("<"), col("event_id") % 192, lit(">May 15 07:09:12 host"),
        col("user_id"), lit(" app"), col("event_id") % 10, lit(": event "),
        col("event_type")).as("line"))
    lines.select(col("event_id"), Syslog.parseSyslog(col("line")).as("h"))
      .select(col("event_id"), col("h.pri").as("pri"), col("h.facility").as("facility"),
        col("h.severity").as("severity"), col("h.host").as("host"),
        col("h.app").as("app"), col("h.message").as("message"))
      .orderBy(col("event_id"))
  }

  // Full pipeline: WPL parse → OML transform (match/fmt/take/defaults) in
  // one mapPartitions pass (reference dataflow, SURVEY §3.1).
  private def qOmlTransform(s: SparkSession, dir: String): DataFrame = {
    import graft.engine.Pipeline
    val e = t(s, dir, "events")
    val lines = e.select(col("event_id"),
      concat(lit("id="), col("event_id"), lit(" type="), col("event_type"),
        lit(" user="), col("user_id"), lit(" k="),
        get_json_object(col("props"), "$.k")).as("line"))
    val oml =
      """name : ev
        rule : /kv/*
        ---
        etype : chars = take(option:[type]) ;
        level = match read(etype) {
          chars(error) => chars(high) ;
          chars(purchase) | chars(signup) => chars(mid) ;
          _ => chars(low) ;
        } ;
        msg = fmt("{}:{}", @etype, read(user)) ;
        kk : digit = take(option:[k]) { _ : digit(0) } ;
      """
    val out = Pipeline.run(lines, "line", "package /kv { rule r { (kvarr) } }",
      Seq(oml), keep = Seq("event_id"))
    out.filter(col("status") === "ok").select(
      col("event_id"),
      WplEngine.extractString("etype").as("etype"),
      WplEngine.extractString("level").as("level"),
      WplEngine.extractString("msg").as("msg"),
      WplEngine.extractLong("kk").as("kk"))
      .orderBy(col("event_id"))
  }

  /** OML breadth: multi-source match tuples, nested object construction
    * (JSON-canonical sval), collect-to-array — all oracle-checked. */
  private def qOmlObjects(s: SparkSession, dir: String): DataFrame = {
    import graft.engine.Pipeline
    val e = t(s, dir, "events")
    val lines = e.select(col("event_id"),
      concat(lit("id="), col("event_id"), lit(" type="), col("event_type"),
        lit(" user="), col("user_id"), lit(" k="),
        get_json_object(col("props"), "$.k")).as("line"))
    val oml =
      """name : ev2
        rule : /kv/*
        ---
        sev = match (read(type), read(k)) {
          (chars(error), digit(0)) => chars(zero_error) ;
          (chars(error), !digit(0)) => chars(real_error) ;
          _ => chars(normal) ;
        } ;
        info : obj = object {
          u : digit = read(user) ;
          t : chars = read(type) ;
        } ;
        pair : array = collect read(keys:[id, k]) ;
      """
    val out = Pipeline.run(lines, "line", "package /kv { rule r { (kvarr) } }",
      Seq(oml), keep = Seq("event_id"))
    out.filter(col("status") === "ok").select(
      col("event_id"),
      WplEngine.extractString("sev").as("sev"),
      WplEngine.extractString("info").as("info"),
      WplEngine.extractString("pair").as("pair"))
      .orderBy(col("event_id"))
  }

  // OML SQL enrichment against a KnowDB dimension (broadcast lookup).
  private def qOmlSqlEnrich(s: SparkSession, dir: String): DataFrame = {
    import graft.engine.Pipeline
    import graft.oml.KnowDb
    val nation = t(s, dir, "nation")
    // guardrailed driver-side dim build (KnowDb.fromDim throws past 8 MB,
    // pointing at the SqlEnrichJoin broadcast path)
    val db = new KnowDb(Map(KnowDb.fromDim("nation", nation)))
    val c = t(s, dir, "customer")
    val lines = c.select(col("c_custkey"),
      concat(lit("ckey="), col("c_custkey"), lit(" nkey="), col("c_nationkey")).as("line"))
    val oml =
      """name : enrich
        rule : /c/*
        ---
        ckey : digit = take(option:[ckey]) ;
        n_name = select n_name from nation where n_nationkey = read(nkey) ;
      """
    val out = Pipeline.run(lines, "line", "package /c { rule r { (kvarr) } }",
      Seq(oml), keep = Seq("c_custkey"), knowDb = db)
    out.filter(col("status") === "ok").select(
      col("c_custkey"),
      WplEngine.extractString("n_name").as("n_name"))
      .orderBy(col("c_custkey"))
  }

  /** The same enrich compiled to a real BroadcastHashJoin — the scale
    * path for dims past the KnowDb driver guardrail (SURVEY §7.4): the
    * dim stays distributed, Catalyst broadcasts it, zero driver collect. */
  private def qOmlSqlEnrichJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.oml.SqlEnrichJoin
    val nation = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val lines = c.select(col("c_custkey"),
      concat(lit("ckey="), col("c_custkey"), lit(" nkey="), col("c_nationkey")).as("line"))
    val parsed = WplEngine.parseWith(lines, "line",
      "package /c { rule r { (kvarr) } }", Seq("c_custkey"))
    val withKey = WplEngine.successes(parsed)
      .select(col("c_custkey"), WplEngine.extractLong("nkey").as("nkey"))
    SqlEnrichJoin.enrich(withKey, col("nkey"), nation, "n_nationkey",
      Seq("n_name" -> "n_name"))
      .select(col("c_custkey"), col("n_name"))
      .orderBy(col("c_custkey"))
  }

  /** IP-range lookup: custom codegen expression ip4_to_int + broadcast
    * sorted-array binary search (reference ip_geo KnowDB pattern). */
  private def qIpRange(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Ip4ToInt.ip4_to_int
    import graft.knowdb.RangeLookup
    val n = t(s, dir, "nation")
    val dim = n.select(
      (lit(167772160L) + col("n_nationkey").cast("long") * 65536).as("r_start"),
      (lit(167772160L) + col("n_nationkey").cast("long") * 65536 + 65535).as("r_end"),
      col("n_name").as("zone"))
    val sorted = RangeLookup.ranges(dim, "r_start", "r_end", "zone")
    val c = t(s, dir, "customer")
      .withColumn("ip", concat(lit("10."), col("c_nationkey"), lit("."),
        col("c_custkey") % 256, lit(".1")))
      .withColumn("ip_int", ip4_to_int(col("ip")))
    // whole-operator path: RangeLookupJoin LogicalPlan -> Strategy ->
    // RangeLookupExec (the custom-plan route CORRECTNESS exercises)
    RangeLookup.lookupPlanned(c, col("ip_int"), sorted, "zone")
      .select(col("c_custkey"), col("ip"), col("ip_int"), col("zone"))
      .orderBy(col("c_custkey"))
  }

  /** Multimodal metadata over a MIXED corpus of real containers: BMP /
    * PNG / WAV synthesized per doc_id schedule, plus raw text bytes on
    * the %4==3 slot exercising the deterministic unknown-blob fallback
    * — one query covers real sniffing of three container families AND
    * the fallback path, all closed-form for the oracle. (PNG byte size
    * is encoder-dependent, so n_bytes is not part of this contract.) */
  private def qMultimodal(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        when(col("doc_id") % 4 === 0, Multimodal.synthBmpUdf(col("doc_id"),
            (col("doc_id") % 8 + 1).cast("int"), (col("doc_id") % 6 + 1).cast("int")))
          .when(col("doc_id") % 4 === 1, Multimodal.synthPngUdf(col("doc_id"),
            (col("doc_id") % 9 + 1).cast("int"), (col("doc_id") % 4 + 1).cast("int")))
          .when(col("doc_id") % 4 === 2, Multimodal.synthWavUdf(col("doc_id"),
            lit(2), (col("doc_id") % 16 + 4).cast("int")))
          .otherwise(col("text").cast("binary")).as("media"))
    Multimodal.decode(d, "media").select(
      col("doc_id"),
      col("media_meta.format").as("format"),
      col("media_meta.width").as("width"),
      col("media_meta.height").as("height"),
      col("media_meta.n_frames").as("n_frames"),
      col("media_meta.ok").as("ok"))
      .orderBy(col("doc_id"))
  }

  /** Multimodal REAL decode: synthesize genuine 24-bit BMP containers
    * (headers, BGR order, bottom-up rows, 4-byte padding) per document,
    * decode them with the BmpCodec pixel decoder, and report per-channel
    * means — the oracle recomputes the closed-form pixel values in SQL,
    * so a decoder bug (offset, padding, channel order) hash-mismatches. */
  private def qMultimodalBmp(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MediaMeta.media_meta
    import graft.functions.MediaChannelMeans.media_channel_means
    import graft.operators.Multimodal
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        Multimodal.synthBmpUdf(col("doc_id"),
          (col("doc_id") % 8 + 1).cast("int"),
          (col("doc_id") % 6 + 1).cast("int")).as("media"))
    d.select(col("doc_id"),
        media_meta(col("media")).as("m"),
        media_channel_means(col("media")).as("ch"))
      .select(col("doc_id"),
        col("m.format").as("format"),
        col("m.width").as("width"),
        col("m.height").as("height"),
        round(col("ch").getItem(0), 4).as("r_mean"),
        round(col("ch").getItem(1), 4).as("g_mean"),
        round(col("ch").getItem(2), 4).as("b_mean"))
      .orderBy(col("doc_id"))
  }

  /** Multimodal PNG decode: genuine DEFLATE-compressed PNG containers
    * (built with the JDK encoder), decoded back through the ImageIO
    * codec path — PNG is lossless, so the closed-form pixel formula
    * oracles the decoded channel means exactly. */
  private def qMultimodalPng(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MediaMeta.media_meta
    import graft.functions.MediaChannelMeans.media_channel_means
    import graft.operators.Multimodal
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        Multimodal.synthPngUdf(col("doc_id"),
          (col("doc_id") % 9 + 1).cast("int"),
          (col("doc_id") % 4 + 1).cast("int")).as("media"))
    d.select(col("doc_id"),
        media_meta(col("media")).as("m"),
        media_channel_means(col("media")).as("ch"))
      .select(col("doc_id"),
        col("m.format").as("format"),
        col("m.width").as("width"),
        col("m.height").as("height"),
        round(col("ch").getItem(0), 4).as("r_mean"),
        round(col("ch").getItem(1), 4).as("g_mean"),
        round(col("ch").getItem(2), 4).as("b_mean"))
      .orderBy(col("doc_id"))
  }

  /** Multimodal GIF decode: genuine palette-indexed GIF containers
    * (LZW-compressed by the JDK writer), decoded through the ImageIO
    * GIF reader. The synth palette makes GIF lossless here (≤256
    * distinct colors by construction), so the closed-form formula
    * oracles the decoded channel means exactly — and since r6, JPEG is
    * oracled too, via the in-repo exact-integer baseline decoder
    * (multimodal_jpeg_decode). */
  private def qMultimodalGif(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MediaMeta.media_meta
    import graft.functions.MediaChannelMeans.media_channel_means
    import graft.operators.Multimodal
    // dims start at 5×5: the JDK GIF writer/reader round-trip corrupts
    // rows past the first on images under ~25 px (measured; palette
    // index 0 bleed) — real corpora never ship 8-pixel GIFs, so the
    // synth stays inside the codec's sound envelope
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        Multimodal.synthGifUdf(col("doc_id"),
          (col("doc_id") % 6 + 5).cast("int"),
          (col("doc_id") % 4 + 5).cast("int")).as("media"))
    d.select(col("doc_id"),
        media_meta(col("media")).as("m"),
        media_channel_means(col("media")).as("ch"))
      .select(col("doc_id"),
        col("m.format").as("format"),
        col("m.width").as("width"),
        col("m.height").as("height"),
        round(col("ch").getItem(0), 4).as("r_mean"),
        round(col("ch").getItem(1), 4).as("g_mean"),
        round(col("ch").getItem(2), 4).as("b_mean"))
      .orderBy(col("doc_id"))
  }

  /** Multimodal WAV decode: genuine RIFF/PCM-16 containers, per-channel
    * mean + RMS from the real sample decoder, closed-form oracle. */
  private def qMultimodalWav(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MediaMeta.media_meta
    import graft.functions.MediaChannelMeans.media_channel_means
    import graft.functions.MediaChannelRms.media_channel_rms
    import graft.operators.Multimodal
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        Multimodal.synthWavUdf(col("doc_id"), lit(2),
          (col("doc_id") % 16 + 4).cast("int")).as("media"))
    d.select(col("doc_id"),
        media_meta(col("media")).as("m"),
        media_channel_means(col("media")).as("mu"),
        media_channel_rms(col("media")).as("rm"))
      .select(col("doc_id"),
        col("m.format").as("format"),
        col("m.width").as("sample_rate"),
        col("m.height").as("channels"),
        col("m.n_frames").as("n_frames"),
        round(col("mu").getItem(0), 4).as("ch0_mean"),
        round(col("mu").getItem(1), 4).as("ch1_mean"),
        round(col("rm").getItem(0), 4).as("ch0_rms"),
        round(col("rm").getItem(1), 4).as("ch1_rms"))
      .orderBy(col("doc_id"))
  }

  /** Multimodal JPEG decode through graft's OWN exact-integer baseline
    * decoder (JpegBaseline: Annex K Huffman decode, dequantize,
    * fixed-point LLM IDCT, fixed-point BT.601 RGB) — no ImageIO in the
    * loop. The synth content is block-flat YCbCr with unit quant
    * tables, so the lossy format becomes bit-exact here (a flat block
    * is a lone integral DC coefficient; the IDCT descale rounding
    * cancels), and the oracle replays pattern→YCbCr→RGB closed-form in
    * SQL, down to the `//65536` fixed-point shift. A decoder bug
    * anywhere — Huffman tables, byte unstuffing, zig-zag, IDCT, color
    * convert — hash-mismatches. */
  private def qMultimodalJpeg(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MediaMeta.media_meta
    import graft.functions.MediaChannelMeans.media_channel_means
    import graft.operators.Multimodal
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        Multimodal.synthJpegUdf(col("doc_id"),
          ((col("doc_id") % 3 + 1) * 8).cast("int"),
          ((col("doc_id") % 2 + 1) * 8).cast("int")).as("media"))
    d.select(col("doc_id"),
        media_meta(col("media")).as("m"),
        media_channel_means(col("media")).as("ch"))
      .select(col("doc_id"),
        col("m.format").as("format"),
        col("m.width").as("width"),
        col("m.height").as("height"),
        round(col("ch").getItem(0), 4).as("r_mean"),
        round(col("ch").getItem(1), 4).as("g_mean"),
        round(col("ch").getItem(2), 4).as("b_mean"))
      .orderBy(col("doc_id"))
  }

  /** MP4 sample decode: a REAL ISO-BMFF container (two chunks, stsc
    * run table, per-sample stsz sizes) built per document, then the
    * codec walks stsz+stsc+stco to slice each sample's exact byte
    * extent from mdat — the deterministic part of video decode (codec
    * entropy decode needs external libs; byte extents don't). The
    * oracle recomputes the closed-form per-sample byte sums. */
  private def qMultimodalMp4(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MediaMeta.media_meta
    import graft.functions.MediaChannelMeans.media_channel_means
    import graft.functions.MediaChannelRms.media_channel_rms
    import graft.operators.Multimodal
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        Multimodal.synthMp4Udf(col("doc_id"),
          (col("doc_id") % 7 + 3).cast("int"), lit(64), lit(48)).as("media"))
    d.select(col("doc_id"),
        media_meta(col("media")).as("m"),
        media_channel_means(col("media")).as("mu"),
        media_channel_rms(col("media")).as("rm"))
      .select(col("doc_id"),
        col("m.format").as("format"),
        col("m.width").as("width"),
        col("m.height").as("height"),
        col("m.n_frames").as("n_samples"),
        round(col("mu").getItem(0), 4).as("mean_sample_bytesum"),
        round(col("mu").getItem(1), 4).as("mean_sample_size"),
        round(col("rm").getItem(0), 4).as("rms_sample_bytesum"))
      .orderBy(col("doc_id"))
  }

  /** Embedding outlier scan: top-50 farthest-from-centroid vectors
    * (deterministic k-means ⇒ the approximate-clustering outlier list
    * is exactly oracled, like the nprobe path). */
  private def qEmbOutliers(s: SparkSession, dir: String): DataFrame =
    Similarity.embOutliers(t(s, dir, "embeddings"), "embedding", "vec_id",
        k = 8, iters = 2, topN = 50)
      .orderBy(col("dist2").desc, col("vec_id"))

  /** Per-doc top-3 TF-IDF keywords. */
  private def qTfidfKeywords(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfKeywords(t(s, dir, "documents"), "text", "doc_id", topK = 3)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rnk"))
      .orderBy(col("doc_id"), col("rnk"))

  /** Training-shard assignment stats (16 shards). */
  private def qShardStats(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.shardStats(t(s, dir, "documents"), "text", "doc_id",
        nShards = 16)
      .orderBy(col("shard"))

  /** Multi-signal curation verdict with named first-failing gate. */
  private def qQualityEnsemble(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityEnsemble(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id"))

  /** Perplexity-bucket mixture card per language (0.5-wide logprob
    * floors — map-side buckets, no quantile sort). */
  private def qPplBuckets(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.logprobBuckets(t(s, dir, "documents"), "text", "doc_id", "lang")
      .orderBy(col("lang"), col("ppl_bucket"))

  /** Directional containment pairs over MinHash-LSH candidates. */
  /** Containment sweep artifacts (pairs + capped-shingle sizes),
    * memoized per (JVM, sf dir) like the n-gram pair set — the sweep is
    * one persisted artifact, its consumers (the pairs query and the
    * superset keep-list) load it. */
  private val containPaths =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def minedContainment(s: SparkSession,
                               dir: String): (DataFrame, DataFrame) = {
    val (pp, sp) = containPaths.computeIfAbsent(dir, { _ =>
      val base = java.nio.file.Files
        .createTempDirectory("graft_contain").toString
      val (pairs, sizes) = Dedup.containmentArtifacts(
        t(s, dir, "documents"), "text", "doc_id", n = 3, threshold = 0.8)
      pairs.write.mode("overwrite").parquet(s"$base/pairs")
      sizes.write.mode("overwrite").parquet(s"$base/sizes")
      graft.operators.CacheScope.drain()
      (s"$base/pairs", s"$base/sizes")
    })
    (s.read.parquet(pp), s.read.parquet(sp))
  }

  private def qDedupContainment(s: SparkSession, dir: String): DataFrame =
    minedContainment(s, dir)._1
      .orderBy(col("id_a"), col("id_b"))

  /** Dedup apply step: per-doc keep/drop + cluster representative. */
  private def qDedupKeepList(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupKeepListFromPairs(t(s, dir, "documents"), "doc_id",
        minedBandedPairs(s, dir))
      .orderBy(col("doc_id"))

  /** Containment-aware keep-list: within a containment component the
    * representative is the superset doc (max capped-shingle count,
    * ties min id) — keep the container, drop the contained. */
  private def qDedupKeepListContainment(s: SparkSession, dir: String): DataFrame = {
    val (pairs, sizes) = minedContainment(s, dir)
    Dedup.dedupKeepListContainmentFromPairs(
        t(s, dir, "documents").select(col("doc_id")), "doc_id", pairs, sizes)
      .orderBy(col("doc_id"))
  }

  /** Last-touch attribution: purchases attributed to the latest
    * view/click by the same user within 7 days. */
  private def qEventsAttribution(s: SparkSession, dir: String): DataFrame =
    Funnel.lastTouchAttribution(t(s, dir, "events"),
        touchTypes = Seq("view", "click"), convType = "purchase",
        windowMicros = 7L * 24 * 3600 * 1000000L)
      .orderBy(col("event_id"))

  /** Hourly volume anomalies per event type (trailing-24-observed-hours
    * z-score). */
  private def qEventsAnomaly(s: SparkSession, dir: String): DataFrame =
    Funnel.hourlyAnomaly(t(s, dir, "events"), zThresh = 3.0)
      .orderBy(col("event_type"), col("hour"))

  /** Tokenizer fertility per language (BPE-ish tokens per word,
    * chars per token). */
  private def qTokenizerFertility(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenizerFertility(t(s, dir, "documents"), "text", "lang")
      .orderBy(col("lang"))

  /** Embedding-space contamination report: train docs whose embedding
    * sits within cosine 0.4 of any eval-split vector — the
    * paraphrase-robust complement of `contamination_ngram` (same
    * deterministic multi-table hyperplane buckets as
    * `dedup_embedding_lsh`, made asymmetric: the eval side broadcasts). */
  private def qContaminationEmb(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Contamination
    val e = t(s, dir, "embeddings")
    Contamination.embeddingContamination(
        e.filter(col("vec_id") % 20 =!= 0), e.filter(col("vec_id") % 20 === 0),
        "embedding", "vec_id", dim = 64, threshold = 0.4, nBits = 2, tables = 8)
      .orderBy(col("train_id"))
  }

  /** Within-doc repeated-segment removal (2-token segments — sized to
    * the synthetic corpus's vocabulary so intra-page repeats exist;
    * production pages use 8-token nav/boilerplate blocks). */
  private def qIntraDocDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.intraDocSegmentDedup(t(s, dir, "documents"), "text", "doc_id",
        segTokens = 2)
      .orderBy(col("doc_id"))

  /** Temperature-scaled language mixture (α = 0.3 and 0.7): the
    * one-knob upsampling rule over actual token shares. */
  private def qMixTemperature(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val d = t(s, dir, "documents").select(col("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    Sampling.temperatureWeights(d, "lang", col("n_tokens"), Seq(0.3, 0.7))
      .orderBy(col("domain"))
  }

  /** Power-of-two sequence-length histogram with cumulative token
    * share — the context-window-fit card. */
  private def qSeqLenHistogram(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.seqLenHistogram(t(s, dir, "documents"), "text")
      .orderBy(col("bucket_lo"))

  /** Near-dup cluster-size histogram incl. the singleton remainder —
    * the corpus duplication profile over `dedup_clusters`' components.
    * Pairs come from the banded MinHash miner (output-identical to the
    * direct shingle join at these params — DedupSpec pins it — at the
    * LSH generation cost; the curation_pipeline precedent). */
  private def qDupClusterSizes(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Clustering
    val d = t(s, dir, "documents")
    Clustering.clusterSizeProfile(
        Clustering.dupClusters(minedBandedPairs(s, dir), "id_a", "id_b"),
        d, "doc_id")
      .orderBy(col("cluster_size"))
  }

  /** Exactly-7-per-language deterministic sample — the two-phase
    * (partition-pruned) exact-N variant of `sample_stratified`; rank
    * order is the splitmix64 draw, replayed by the oracle. */
  private def qSampleExactN(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    Sampling.stratifiedExactN(t(s, dir, "documents"), "doc_id", "lang", n = 7)
      .select(col("doc_id"), col("lang"), col("sample_rank"))
      .orderBy(col("lang"), col("sample_rank"))
  }

  /** Weighted sample without replacement (Efraimidis–Spirakis): 8 docs
    * per lang, weight = n_chars — big docs sampled more often, never
    * twice; ln-key ranking deterministic from the splitmix id hash. */
  private def qSampleWeighted(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedSampleN(t(s, dir, "documents"),
        "doc_id", "lang", "n_chars", n = 8)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("es_key"), col("sample_rank"))
      .orderBy(col("lang"), col("sample_rank"))

  /** Subword vocabulary seeding: top-50 within-token substrings by
    * count·(len−1) compression gain — the unigram-LM seed vocabulary
    * next to bpe_top_merges' bottom-up view. */
  private def qSubwordVocab(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.subwordVocab(t(s, dir, "documents"), "text")

  /** One-pass Pearson correlation matrix over the lineitem numerics —
    * the multicollinearity card; exact decimal moments at cent scale. */
  private def qCorrMatrix(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.corrMatrix(t(s, dir, "lineitem"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))

  /** Mutual information between event type and hour-of-day — "how
    * predictive is the clock of what users do", the strength companion
    * to the chi-square independence test. */
  private def qEventsMi(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.mutualInformation(t(s, dir, "events"),
      col("event_type"), hour(col("ts")))

  /** DAU / 7-day WAU / stickiness per day over the events stream. */
  private def qEventsActiveUsers(s: SparkSession, dir: String): DataFrame =
    Funnel.activeUsers(t(s, dir, "events"), "ts", "user_id", windowDays = 7)
      .orderBy(col("day"))

  /** Cross-source near-dup overlap matrix — which FEEDS duplicate each
    * other (syndication detection; the pairwise twin of
    * `source_neardup_stats`): near-dup pair edges mapped to an
    * unordered (source, source) cell with pair count + mean Jaccard.
    * Id-keyed equi-joins onto the (already bounded) pair relation. */
  private def qSourceOverlapMatrix(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val src = d.select(col("doc_id"), col("source"))
    // the shared banded-sweep artifact (output-identical to the direct
    // shingle join at these params — DedupSpec)
    minedBandedPairs(s, dir)
      .join(src.select(col("doc_id").as("id_a"), col("source").as("src_a")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("src_b")), "id_b")
      .select(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"),
        col("jaccard"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("jaccard")), 4).as("avg_jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Source-authority PageRank over the syndication graph: nodes are
    * sources, edges weight the cross-source near-dup pair counts from
    * the banded MinHash miner (same relation as the overlap matrix,
    * self-pairs excluded), 10 damped iterations. The per-iteration
    * 12-dp rounding in [[graft.operators.Graph.pageRank]] is what
    * makes the recurrence replayable bit-for-bit by the oracle's
    * unrolled CTE chain. */
  private def qSourcePagerank(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Graph
    val d = t(s, dir, "documents")
    val src = d.select(col("doc_id"), col("source"))
    val edges = minedBandedPairs(s, dir)
      .join(src.select(col("doc_id").as("id_a"), col("source").as("src_a")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("src_b")), "id_b")
      .filter(col("src_a") =!= col("src_b"))
      .select(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).cast("double").as("weight"))
    Graph.pageRank(edges, "source_a", "source_b", "weight",
        d.select(col("source")), "source", iters = 10)
      .select(col("node").as("source"), round(col("pr"), 6).as("pagerank"))
      .orderBy(col("pagerank").desc, col("source"))
  }

  /** Directed event-type transition edge list with long count weights
    * — shared input of [[qGraphHits]] and [[qEventsMarkovStationary]]
    * (same lag spec as `q_events_transitions`). */
  private def transitionEdges(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** HITS hubs/authorities over the directed event-type transition
    * graph: which types route flow (hubs) vs which types flow
    * converges into (authorities) — the two-sided centrality the
    * symmetric source PageRank cannot separate. 8 quantized
    * L1-normalized power steps; the oracle replays every step as
    * unrolled CTEs under the shared integer-mass contract. */
  private def qGraphHits(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Graph
    Graph.hits(transitionEdges(s, dir), "prev_type", "next_type", "n",
        iters = 8)
      .select(col("node").as("event_type"),
        round(col("hub"), 6).as("hub"),
        round(col("auth"), 6).as("authority"))
      .orderBy(col("authority").desc, col("event_type"))
  }

  /** Stationary distribution of the event-type Markov chain (12
    * renormalized quantized power steps) side-by-side with the
    * empirical visit share — where user flow settles long-run vs
    * where events actually concentrate today. */
  private def qEventsMarkovStationary(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Graph
    val ev = t(s, dir, "events")
    val share = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_ev"))
      .crossJoin(broadcast(ev.agg(count(lit(1)).as("n_tot"))))
      .select(col("event_type"),
        round(col("n_ev").cast("double") / col("n_tot"), 6).as("share_observed"))
    Graph.stationary(transitionEdges(s, dir), "prev_type", "next_type",
        "n", iters = 12)
      .select(col("node").as("event_type"),
        round(col("pi"), 6).as("pi_stationary"))
      .join(share, Seq("event_type"))
      .orderBy(col("pi_stationary").desc, col("event_type"))
  }

  /** Rank-1 ALS over customer×part quantity ratings: top-20 item
    * factors on the dominant taste axis + the observed-cell RMSE. */
  private def qAlsRank1(s: SparkSession, dir: String): DataFrame = {
    val ratings = t(s, dir, "lineitem")
      .join(t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
    graft.operators.Factorize.alsRank1(ratings, "o_custkey", "l_partkey",
        "qty", iters = 3)
      .select(col("i").as("l_partkey"), round(col("v"), 6).as("factor"),
        col("n_cells"), col("rmse"))
      .orderBy(col("factor").desc, col("l_partkey").asc)
      .limit(20)
  }

  /** Rank-2 regularized ALS over the same rating matrix: does a
    * second taste axis cut the reconstruction error vs `als_rank1`. */
  private def qAlsRank2(s: SparkSession, dir: String): DataFrame = {
    val ratings = t(s, dir, "lineitem")
      .join(t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
    graft.operators.Factorize.alsRank2(ratings, "o_custkey", "l_partkey",
        "qty", iters = 2)
      .select(col("i").as("l_partkey"), round(col("v1"), 6).as("v1"),
        round(col("v2"), 6).as("v2"), col("n_cells"), col("rmse"))
      .orderBy(col("v1").desc, col("l_partkey").asc)
      .limit(20)
  }

  /** Poisson trend GLM per event type: Newton-fit daily growth rate
    * exp(β1) over the calendar. */
  private def qEventsPoissonTrend(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.poissonTrend(t(s, dir, "events"),
        col("event_type"), col("ts"), iters = 3)
      .select(col("k").as("event_type"), col("n_days"), col("b0"),
        col("b1"), col("daily_rate_ratio"))
      .orderBy(col("event_type"))

  /** Brier score card of the trained lang-id LR — the proper-scoring
    * summary next to `lr_calibration`'s reliability bins. */
  private def qLrBrier(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Classifier
    val d = t(s, dir, "documents")
    val w = Classifier.trainLogReg(d, "text", "doc_id",
      col("lang") === "en", nBuckets = 64, iters = 3, lr = 1.0)
    Classifier.brier(d, "text", "doc_id", col("lang") === "en", w,
      nBuckets = 64)
  }

  /** Expected calibration error of the trained LR: integer-exact bin
    * gaps + the worst bin. */
  private def qLrEce(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Classifier
    val d = t(s, dir, "documents")
    val w = Classifier.trainLogReg(d, "text", "doc_id",
      col("lang") === "en", nBuckets = 64, iters = 3, lr = 1.0)
    Classifier.ece(d, "text", "doc_id", col("lang") === "en", w,
      nBuckets = 64, nBins = 10)
  }

  /** Split-conformal prediction card of the trained LR: calibration
    * threshold, held-out coverage, mean prediction-set size. */
  private def qLrConformal(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Classifier
    val d = t(s, dir, "documents")
    val w = Classifier.trainLogReg(d, "text", "doc_id",
      col("lang") === "en", nBuckets = 64, iters = 3, lr = 1.0)
    Classifier.conformal(d, "text", "doc_id", col("lang") === "en", w,
      nBuckets = 64, alpha = 0.1)
  }

  /** Language-parity audit of the Gopher quality gate: per-language
    * keep rates vs pooled with the four-fifths disparity flag — the
    * "is my quality filter a language filter" card. */
  private def qGateParityAudit(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val j = TextAnalysis.qualityEnsemble(d, "text", "doc_id")
      .select(col("doc_id"), col("keep"))
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
    val per = j.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("keep").cast("long")).as("n_keep"))
    val pooled = j.agg(count(lit(1)).as("nt"),
      sum(col("keep").cast("long")).as("kt"))
    val rate = col("n_keep").cast("double") / col("n")
    val pooledRate = col("kt").cast("double") / col("nt")
    per.crossJoin(broadcast(pooled))
      .select(col("lang"), col("n"), col("n_keep"),
        round(rate, 6).as("keep_rate"),
        round(rate / pooledRate, 6).as("rate_ratio"),
        (rate < pooledRate * lit(0.8)).as("four_fifths_flag"))
      .orderBy(col("lang"))
  }

  /** Heaps'-law OLS fit over the cumulative vocabulary-growth curve:
    * growth exponent β, scale k, and fit r². */
  private def qVocabHeapsFit(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.heapsFit(qVocabGrowth(s, dir), "n_tokens_cum",
      "vocab_cum")

  /** Gapped 3-sequence mining: top-20 a→b→c subsequence patterns by
    * user support (arbitrary gaps — the non-contiguous complement of
    * `q_events_paths`). */
  private def qSeqPattern3(s: SparkSession, dir: String): DataFrame =
    Funnel.gappedSeq3Support(t(s, dir, "events"), topK = 20)

  /** Arrival burstiness per event type: within-day inter-arrival CV²
    * plus the hourly-count Fano factor. */
  private def qEventsBurstiness(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.burstiness(t(s, dir, "events"),
        col("event_type"), col("ts"), col("event_id"))
      .select(col("k").as("event_type"), col("n_gaps"), col("n_buckets"),
        col("mean_gap_s"), col("cv2"), col("fano_hourly"))
      .orderBy(col("event_type"))

  /** Feed-coverage audit per event type: observed vs spanned hourly
    * buckets and the longest hole. */
  private def qDqTimeseriesGaps(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.gapAudit(t(s, dir, "events"),
        col("event_type"), col("ts"))
      .select(col("k").as("event_type"), col("n_observed"), col("span"),
        col("max_gap"), col("coverage"))
      .orderBy(col("event_type"))

  /** Decile quantile-normalization card: each source's n_chars deciles
    * mapped onto the pooled distribution. */
  private def qFeatureQuantileNorm(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.quantileNormalize(t(s, dir, "documents"),
        col("source"), col("n_chars"), col("doc_id"))
      .select(col("g").as("source"), col("decile"), col("n"),
        col("src_upper"), col("pooled_upper"))
      .orderBy(col("source"), col("decile"))

  /** UCB1 bandit policy replay over daily per-type reward (event
    * value): which arm the policy would pull each day. */
  private def qEventsUcbPolicy(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.ucbPolicy(t(s, dir, "events"),
        col("event_type"), col("ts"), col("value"))
      .orderBy(col("day"))

  /** Caliper-matched ATT of the parity "treatment" on second-half
    * purchase revenue, matching on first-half activity (±2 events) —
    * the matching-based causal readout next to CUPED's adjusted
    * difference. */
  private def qEventsPsmAtt(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val us = unix_micros(col("ts"))
    val bounds = ev.agg(min(us).as("lo"), max(us).as("hi"))
      .select(expr("(lo + hi) DIV 2").as("mid"))
    val units = ev.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(sum(when(us <= col("mid"), 1L).otherwise(0L)).as("cov"),
        sum(when(us > col("mid") && col("event_type") === "purchase",
          round(col("value") * 100, 0).cast("long")).otherwise(0L))
          .as("ycents"))
    graft.operators.Metrics.caliperAtt(units, col("user_id") % 2,
      col("cov"), col("ycents"), caliper = 2)
  }

  /** Cramér's V of returnflag×linestatus — is the association between
    * the two lineitem states material, not just significant. */
  private def qCramersV(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.cramersV(t(s, dir, "lineitem"),
      col("l_returnflag"), col("l_linestatus"))

  /** Discount→quantity response per return flag: exact-integer OLS
    * (slope, intercept, r²) of quantity on discount percent — does a
    * deeper discount actually move volume. */
  private def qDiscountElasticity(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.olsByGroup(t(s, dir, "lineitem"),
        col("l_returnflag"), round(col("l_discount") * 100, 0),
        col("l_quantity"))
      .select(col("g").as("l_returnflag"), col("n"), col("slope"),
        col("intercept"), col("r2"))
      .orderBy(col("l_returnflag"))

  /** Ship-delay SLA card per order priority: exact nearest-rank
    * p50/p90/p99 of order→ship days + the >30-day breach share. */
  private def qShipDelaySla(s: SparkSession, dir: String): DataFrame = {
    val j = t(s, dir, "lineitem")
      .join(t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("g"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("delay"))
    val perc = graft.operators.Metrics.exactPercentilesByGroup(j,
      col("g"), col("delay"), Seq(50, 90, 99))
    val share = j.groupBy(col("g"))
      .agg(round(sum(when(col("delay") > 30, 1L).otherwise(0L))
        .cast("double") / count(lit(1)), 6).as("share_gt_30"))
    perc.join(share, "g")
      .select(col("g").as("o_orderpriority"), col("n"), col("p50"),
        col("p90"), col("p99"), col("share_gt_30"))
      .orderBy(col("o_orderpriority"))
  }

  /** Sequential basket rules: part a in an earlier order → part b in
    * a later order of the same customer, by distinct-customer
    * support and confidence. */
  private def qBasketSequelRules(s: SparkSession, dir: String): DataFrame =
    graft.operators.Basket.sequentialRules(t(s, dir, "lineitem"),
      t(s, dir, "orders"), minSupport = 2, topK = 20)

  /** Winsorized per-type value summary: exact nearest-rank p05/p95
    * clips + robust mean, all-integer cents until the final
    * divisions. */
  private def qEventsWinsorized(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.winsorizedStats(t(s, dir, "events"),
        col("event_type"), col("value"))
      .select(col("g").as("event_type"), col("n"), col("p05"),
        col("p95"), col("mean"), col("winsorized_mean"))
      .orderBy(col("event_type"))

  /** Neyman-optimal allocation of a 1000-doc labeling budget across
    * sources (n_h ∝ N_h·S_h on n_chars, largest-remainder
    * integerization). */
  private def qSampleNeymanAlloc(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.neymanAllocation(t(s, dir, "documents"),
        col("source"), col("n_chars"), budget = 1000L)
      .select(col("h").as("source"), col("n_pop"), col("std"),
        col("n_alloc"), col("sampling_fraction"))
      .orderBy(col("source"))

  /** Holt–Winters additive weekly-seasonal smoothing per event type —
    * level/trend/next-step forecast + seasonal amplitude. */
  private def qEventsHoltWinters(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.holtWinters(t(s, dir, "events"),
        col("event_type"), col("ts"))
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type"))

  /** MAD modified-z outlier card per event type over daily counts —
    * the robust detector a spike can't hide from. */
  private def qEventsMad(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.madOutliers(t(s, dir, "events"),
        col("event_type"), col("ts"))
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type"))

  /** Laspeyres/Paasche/Fisher price indices per ship year vs the first
    * year, matched part basket — the cross-snapshot inflation card. */
  private def qPriceIndex(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.priceIndices(t(s, dir, "lineitem"),
        col("l_partkey"), year(col("l_shipdate")),
        round(col("l_extendedprice") * 100, 0).cast("long"),
        round(col("l_quantity"), 0).cast("long"))
      .orderBy(col("period"))

  /** Hurst exponent per event type (aggregated-variance method over
    * block sizes 1/2/4/8) — long-range-dependence readout. */
  private def qEventsHurst(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.hurstAggVar(t(s, dir, "events"),
        col("event_type"), col("ts"))
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type"))

  /** Paragraph-duplicate profile per source over docs planted with
    * shared licence/newsletter paragraphs — the granularity between
    * line boilerplate and whole-doc dedup. */
  private def qParagraphDupStats(s: SparkSession, dir: String): DataFrame = {
    val aug = t(s, dir, "documents").select(col("doc_id"), col("source"),
      concat(col("text"),
        when(col("doc_id") % 4 === 0,
          lit("\n\n(c) example corp all rights reserved"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 2,
          lit("\n\nsubscribe to our newsletter today"))
          .otherwise(lit(""))).as("t2"))
    graft.operators.CleaningSignals
      .paragraphDupStats(aug, "t2", "doc_id", "source")
      .withColumnRenamed("src", "source")
      .orderBy(col("source"))
  }

  /** Class-balanced undersampling audit over the embeddings labels —
    * every label keeps the minority count in splitmix hash order;
    * the kept-id checksum pins the exact selection. */
  private def qSampleClassBalanced(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.classBalanceCard(
        t(s, dir, "embeddings"), "vec_id", "label")
      .orderBy(col("label"))

  /** Sample-ratio-mismatch check of the parity assignment per event
    * type — the sanity gate every A/B readout assumes. */
  private def qEventsSrm(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.srmCheck(t(s, dir, "events"),
        col("event_type"), col("user_id"), col("user_id") % 2)
      .withColumnRenamed("g", "event_type")
      .orderBy(col("event_type"))

  /** Interrupted-time-series effect per event type — pre-midpoint
    * linear trend extrapolated as the counterfactual, actual vs
    * predicted post-period mass. */
  private def qEventsIts(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.interruptedTimeSeries(t(s, dir, "events"),
        col("event_type"), col("ts"))
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type"))

  /** Cohen's d / Hedges' g between the parity arms per event type —
    * the parametric effect size next to Cliff's delta. */
  private def qEventsCohensD(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.cohensD(t(s, dir, "events"),
        col("event_type"), col("user_id") % 2,
        round(col("value") * 100, 0).cast("long"))
      .withColumnRenamed("g", "event_type")
      .orderBy(col("event_type"))

  /** Top-20 part leaderboard migration across the shipdate-midpoint
    * split — who entered, dropped, or moved. */
  private def qRankMigration(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // l_shipdate reads as TIMESTAMP_NTZ; the UTC session cast matches
    // DuckDB's epoch_us over the same naive timestamp
    val us = unix_micros(col("l_shipdate").cast("timestamp"))
    val bounds = li.agg(min(us).as("lo"), max(us).as("hi"))
      .select(expr("(lo + hi) DIV 2").as("mid"))
    val units = li.crossJoin(broadcast(bounds))
      .select((us > col("mid")).as("p"), col("l_partkey"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100,
          0).cast("long").as("cents"))
    graft.operators.Metrics.rankMigration(units, col("p"),
        col("l_partkey"), col("cents"), k = 20)
      .withColumnRenamed("key", "p_partkey")
      .orderBy(col("status"), col("p_partkey"))
  }

  /** Per-user daily-activity streaks — longest and most recent runs of
    * consecutive active days. */
  private def qEventsStreaks(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.activityStreaks(t(s, dir, "events"),
        col("user_id"), col("ts"))
      .withColumnRenamed("u", "user_id")
      .orderBy(col("user_id"))

  /** Dedup threshold-tuning curve over the exact 3-gram Jaccard pairs
    * mined at a 0.3 floor — pairs surviving and docs dropped per
    * candidate threshold. */
  private def qDedupThresholdCurve(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.thresholdCurve(
        graft.operators.Dedup.ngramJaccardPairs(t(s, dir, "documents"),
          "text", "doc_id", n = 3, threshold = 0.3),
        Seq(0.3, 0.5, 0.7, 0.8, 0.9))
      .orderBy(col("threshold"))

  /** Theil T inequality of supplier revenue decomposed between/within
    * nations — "is the inequality between nations or inside them". */
  private def qTheilInequality(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_suppkey"),
      round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
        .cast("long").as("cents"))
    val sup = t(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val units = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("s_suppkey"))
      .agg(sum(col("cents")).as("v"))
    graft.operators.Metrics.theilDecomposition(units,
      col("s_nationkey"), col("v"))
  }

  /** Effective sample size of the DSIR importance weights per source
    * — how many docs the reweighted corpus is really worth. */
  private def qDsirEss(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val w = graft.operators.Dsir.importanceWeights(docs, "text",
      "doc_id", col("lang") === "en", nBuckets = 256)
    graft.operators.Metrics.essCard(
        w.join(docs.select(col("doc_id"), col("source")), "doc_id"),
        col("source"), col("logw"))
      .withColumnRenamed("g", "source")
      .orderBy(col("source"))
  }

  /** Per-user interval-union coverage over per-type activity spans —
    * merged active time vs horizon, overlap counted once. */
  private def qIntervalUnion(s: SparkSession, dir: String): DataFrame = {
    val us = unix_micros(col("ts"))
    val iv = t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(us).as("s"), max(us).as("e"))
    graft.operators.IntervalJoin.intervalUnion(iv, col("user_id"),
        col("s"), col("e"))
      .withColumnRenamed("k", "user_id")
      .orderBy(col("user_id"))
  }

  /** Wald–Wolfowitz runs test per event type — random vs trending vs
    * oscillating daily counts, distribution-free. */
  private def qEventsRuns(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.runsTest(t(s, dir, "events"),
        col("event_type"), col("ts"))
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type"))

  /** Interpolated trigram LM scorer per doc — the order-3 fluency
    * companion to bigram_lm / bigram_lm_kn. */
  private def qTrigramLm(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.trigramLogprob(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id"))

  /** Pairwise co-failure matrix of the four hard quality gates —
    * "four filters or one filter written four times". */
  private def qGateOverlapMatrix(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gateOverlapMatrix(t(s, dir, "documents"), "text")
      .orderBy(col("gate_a"), col("gate_b"))

  /** Cliff's delta between the parity arms per event type — the
    * ordinal effect-size readout next to q_events_mwu's z. */
  private def qEventsCliffsDelta(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.cliffsDelta(t(s, dir, "events"),
        col("event_type"), col("user_id") % 2,
        round(col("value") * 100, 0).cast("long"))
      .withColumnRenamed("g", "event_type")
      .orderBy(col("event_type"))

  /** Brown–Forsythe variance-homogeneity test across event types —
    * the precondition ANOVA/pooled-σ readouts silently assume. */
  private def qEventsLevene(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.brownForsythe(t(s, dir, "events"),
      col("event_type"), col("value"))

  /** Distinct-1/2/3 n-gram diversity per source — the template-spam /
    * decode-collapse detector for generated corpora. */
  private def qCorpusDistinctN(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.distinctN(t(s, dir, "documents"),
        "text", col("source"))
      .withColumnRenamed("g", "source")
      .orderBy(col("source"), col("n"))

  /** Markov removal-effect attribution over user journeys (absorbing
    * chain; 12 quantized value-iteration rounds) — the data-driven
    * credit model next to q_events_attribution's last-touch. */
  private def qMarkovAttribution(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.markovAttribution(t(s, dir, "events"),
        convType = "purchase", channels = markovChannels, rounds = 12)
      .orderBy(col("channel"))

  /** Label-propagation communities of the co-purchase graph after 5
    * synchronous min-tie-break rounds. */
  private def qGraphLpa(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.lpaCommunities(coPurchaseEdges(s, dir),
        "pa", "pb", iters = 5)
      .orderBy(col("n_nodes").desc, col("community"))

  private val markovChannels = Seq("click", "error", "signup", "view")

  /** PACF at lags 1–3 per event type (Durbin–Levinson over the exact
    * ACF moments) — the AR-order cutoff readout next to q_events_acf. */
  private def qEventsPacf(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.pacf(t(s, dir, "events"),
        col("event_type"), col("ts"))
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type"))

  /** Markdown/structure profile over documents planted with known
    * constructs per doc_id residue — heading/fence/list/link counts
    * and the 0–4 signal score routing docs to a cleaning path. */
  private def qMarkdownProfile(s: SparkSession, dir: String): DataFrame = {
    val aug = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 6 === 0,
          lit("\n# heading one\n## heading two")).otherwise(lit("")),
        when(col("doc_id") % 6 === 1,
          lit("\n```\ncode block\n```")).otherwise(lit("")),
        when(col("doc_id") % 6 === 2,
          lit("\n- item one\n- item two\n* item three")).otherwise(lit("")),
        when(col("doc_id") % 6 === 3,
          lit(" see [link](http://example.com) and [two](http://x.y)"))
          .otherwise(lit(""))).as("t2"))
    graft.operators.TextAnalysis.markdownProfile(aug, "t2", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Supplier revenue concentration per nation: HHI, top-supplier
    * share, effective competitor count over discounted revenue. */
  private def qHhiConcentration(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_suppkey"),
      round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
        .cast("long").as("cents"))
    val sup = t(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    graft.operators.Metrics.hhi(
        li.join(sup, col("l_suppkey") === col("s_suppkey")),
        col("s_nationkey"), col("s_suppkey"), col("cents"))
      .withColumnRenamed("g", "s_nationkey")
      .orderBy(col("s_nationkey"))
  }

  /** MAP@5 ranker eval over the same BM25-vs-id-order framing as
    * retrieval_ndcg — AP punishes every late relevant hit. */
  private def qRetrievalMap(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Retrieval
    val docs = t(s, dir, "documents")
    val rels = Retrieval.gradedRels(docs, "text", "doc_id", bm25QueryDf(s))
    val bm25 = Retrieval.bm25TopK(docs, "text", "doc_id",
        bm25QueryDf(s), k = 5)
      .withColumnRenamed("doc_id", "id")
    val wId = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("id"))
    val naive = rels.withColumn("rank", row_number().over(wId))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("id"))
    Retrieval.evalMap(bm25, rels, 5).withColumn("ranker", lit("bm25"))
      .unionByName(Retrieval.evalMap(naive, rels, 5)
        .withColumn("ranker", lit("id_order")))
      .select(col("ranker"), col("query_id"), col("n_rel_topk"),
        col("n_rel_total"), col("ap"))
      .orderBy(col("ranker"), col("query_id"))
  }

  /** Davies–Bouldin over the deterministic k-means cells — the
    * compactness/separation partner to cluster_silhouette. */
  private def qEmbDaviesBouldin(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.daviesBouldin(
      t(s, dir, "embeddings"), "embedding", "vec_id", k = 8, iters = 2)

  /** EWMA control chart per event type over daily counts — alarm
    * count, first alarm index, final smoothed level vs ±3σ limits. */
  private def qEventsEwma(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.ewmaControl(t(s, dir, "events"),
        col("event_type"), col("ts"))
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type"))

  /** t-closeness over the same release framing as q_k_anonymity —
    * per (nation, segment) class, EMD of its balance-bucket mix vs the
    * global mix; the worst class is the table's t. */
  private def qTCloseness(s: SparkSession, dir: String): DataFrame =
    graft.operators.Pii.tCloseness(
      t(s, dir, "customer")
        .withColumn("bal_bucket", floor(col("c_acctbal") / 1000)),
      Seq("c_nationkey", "c_mktsegment"), "bal_bucket")

  /** Functional-dependency audit over four candidate FDs — two that
    * hold by schema (nation→region, partkey→brand) and two that don't
    * (nation→segment, customer→priority), exact verdicts each. */
  private def qDqFunctionalDeps(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DataQuality.{FdSpec, fdAudit}
    fdAudit(Seq(
      FdSpec("nation.n_nationkey->n_regionkey", t(s, dir, "nation"),
        Seq("n_nationkey"), "n_regionkey"),
      FdSpec("part.p_partkey->p_brand", t(s, dir, "part"),
        Seq("p_partkey"), "p_brand"),
      FdSpec("customer.c_nationkey->c_mktsegment", t(s, dir, "customer"),
        Seq("c_nationkey"), "c_mktsegment"),
      FdSpec("orders.o_custkey->o_orderpriority", t(s, dir, "orders"),
        Seq("o_custkey"), "o_orderpriority")))
      .orderBy(col("fd"))
  }

  /** Lexical-diversity card per source: token/type mass, TTR, hapax
    * share, Yule's K — the size-robust repetitiveness readout. */
  private def qLexicalDiversity(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.lexicalDiversity(
        t(s, dir, "documents"), "text", col("source"))
      .withColumnRenamed("g", "source")
      .orderBy(col("source"))

  /** Co-purchase part graph: parts sharing an order, kept when they
    * co-occur in ≥2 orders — the noise floor that keeps the graph
    * sparse at scale. Per-order baskets are bounded, so the pair
    * explode is linear in lineitem, never quadratic in parts. */
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    items.join(items.select(col("o"), col("p").as("p2")), Seq("o"))
      .filter(col("p") < col("p2"))
      .groupBy(col("p").as("pa"), col("p2").as("pb"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select(col("pa"), col("pb"))
  }

  /** 3-core of the co-purchase part graph. `iters` is a generous
    * SAFETY CEILING, decoupled from the oracle's unroll depth: the
    * engine early-exits at the fixed point (reached in ≤12 rounds at
    * every verified SF — which the 12-round-unrolled SQL oracle itself
    * re-verifies, since post-convergence rounds are no-ops), and a
    * deeper peel cascade on a larger corpus keeps converging instead
    * of aborting (r11 ADVICE: don't tune the abort bound to the
    * oracle's depth). */
  private def qGraphKcore(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.kCore(coPurchaseEdges(s, dir), "pa", "pb",
        k = 3, iters = 48)
      .select(col("v").as("p_partkey"), col("d").as("degree"))
      .orderBy(col("p_partkey"))

  /** Top-25 predicted co-purchase links (distance-2 non-edges scored
    * by common neighbors / Jaccard / Resource-Allocation). */
  private def qGraphLinkPred(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.linkPrediction(coPurchaseEdges(s, dir),
      "pa", "pb", topN = 25)

  /** Mann–Kendall monotone-trend test per event type over daily counts
    * — "is there a trend at all" next to Theil–Sen's "how steep". */
  private def qEventsMannKendall(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.mannKendallTrend(t(s, dir, "events"),
        col("event_type"), col("ts"))
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type"))

  /** Rolling DAU/WAU/MAU stickiness per day — the engagement-ratio
    * card (map-side bounded fan-out, no sliding distinct window). */
  private def qEventsStickiness(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.stickiness(t(s, dir, "events"),
        col("user_id"), col("ts"))
      .orderBy(col("d"))

  /** Two-proportion power card per market segment: baseline
    * positive-balance share, +10% relative MDE, per-arm n at
    * α=0.05 / power=0.8 — "how long must this experiment run". */
  private def qPowerAnalysis(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.powerTwoProportion(t(s, dir, "customer"),
        col("c_mktsegment"), col("c_acctbal") > 0)
      .withColumnRenamed("g", "c_mktsegment")
      .orderBy(col("c_mktsegment"))

  /** Difference-in-differences of the parity "treatment" on per-user
    * purchase cents across the time-midpoint split — the
    * parallel-trends causal readout beside CUPED and matching. */
  private def qEventsDid(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val us = unix_micros(col("ts"))
    val bounds = ev.agg(min(us).as("lo"), max(us).as("hi"))
      .select(expr("(lo + hi) DIV 2").as("mid"))
    val cents = round(col("value") * 100, 0).cast("long")
    val perUser = ev.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(sum(when(us <= col("mid") && col("event_type") === "purchase",
          cents).otherwise(0L)).as("y1"),
        sum(when(us > col("mid") && col("event_type") === "purchase",
          cents).otherwise(0L)).as("y2"))
    val units = perUser
      .select(col("user_id"), lit(1).as("pd"), col("y1").as("y"))
      .unionAll(perUser
        .select(col("user_id"), lit(2).as("pd"), col("y2").as("y")))
    graft.operators.Metrics.diffInDiff(units, col("user_id") % 2,
      col("pd"), col("y"))
  }

  /** Dunning G² collocations — the evidence-weighted replacement for
    * PMI's rare-pair explosions. */
  private def qCollocationsLlr(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.llrCollocations(t(s, dir, "documents"), "text",
      minCount = 5, topN = 30)

  /** Embedding isotropy card: exact mean pairwise cosine via
    * ‖Σn̂‖² − n (no pair join) + norm statistics. */
  private def qEmbIsotropy(s: SparkSession, dir: String): DataFrame =
    Similarity.embIsotropy(t(s, dir, "embeddings"), "embedding",
      "vec_id")

  /** Holt level+trend smoothing of hourly event counts per type —
    * the trend-aware one-step forecast next to `q_events_smoothing`'s
    * flat level. */
  private def qEventsHolt(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.holtSmoothing(t(s, dir, "events"))
      .orderBy(col("event_type"))

  /** Item-item collaborative-filtering neighbors over order baskets:
    * per-part top-5 co-purchased parts by co-occurrence cosine. */
  private def qItemCfTopk(s: SparkSession, dir: String): DataFrame =
    graft.operators.Basket.itemNeighbors(t(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", minSupport = 2, k = 5)
      .orderBy(col("item"), col("rank"))

  /** Referential-integrity audit across the seven TPC-H-shaped FK
    * relationships: child cardinality, orphan count, orphan rate. */
  private def qDqReferential(s: SparkSession, dir: String): DataFrame =
    graft.operators.DataQuality.tpchAudit(s, name => t(s, dir, name))
      .orderBy(col("relation"))

  /** HBOS density outliers over the first 8 embedding components —
    * the multi-modal complement to the centroid-distance outlier
    * list. */
  private def qHbosOutliers(s: SparkSession, dir: String): DataFrame =
    Similarity.hbosOutliers(t(s, dir, "embeddings"), "embedding",
      "vec_id", dims = 8, binWidth = 0.25, topN = 20)

  /** Corpus-level RAKE keyphrases: top-25 stopword-free phrase runs by
    * degree/frequency word scores (quantized-long phrase sums). */
  private def qRakeKeywords(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.rakeKeywords(t(s, dir, "documents"), "text", "doc_id",
      topK = 25)

  /** TextRank keywords: quantized PageRank over the adjacent-content-
    * word co-occurrence graph, top-30. */
  private def qTextrankKeywords(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.textRank(t(s, dir, "documents"), "text", topK = 30,
      iters = 10, minCount = 2)

  /** Per-type daily event counts with trailing 7-day moving average
    * and week-over-week ratio. */
  private def qEventsRollingStats(s: SparkSession, dir: String): DataFrame =
    Funnel.rollingEventStats(t(s, dir, "events"), "ts", "event_type")
      .orderBy(col("event_type"), col("day"))

  /** Value-distribution drift (PSI) per event type between the first
    * and second half of the observed time range — fixed-width bins,
    * ε-clamped shares, exact time-midpoint split. */
  private def qEventsPsi(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Drift
    Drift.psi(t(s, dir, "events"), "event_type", "value", "ts",
        binWidth = 20.0)
      .select(col("grp").as("event_type"), col("n_bins"), col("psi"))
      .orderBy(col("event_type"))
  }

  /** Lang-id confusion matrix vs the labeled `lang` column — the
    * classifier-eval card for the native lang_id expression (which
    * labeled languages it can and cannot separate; zh has no Latin
    * stopwords ⇒ lands on 'und' by design). Window runs over the
    * (langs × preds)-sized agg frame. */
  private def qLangConfusion(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
    t(s, dir, "documents")
      .select(col("lang"),
        graft.functions.TextSignals.lang_id(col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share_of_actual",
        round(col("n_docs").cast("double") / sum(col("n_docs")).over(w), 4))
      .orderBy(col("lang"), col("lang_pred"))
  }

  /** HLL distinct-cardinality profile per event type, BOTH branches of
    * the estimator exercised in one query: user_id (~150 distinct ⇒
    * the small-range linear-counting branch) and event_id (~2000
    * distinct ⇒ the raw harmonic branch). `reg_sum` pins every
    * register exactly; `exact_users` is the ground-truth countDistinct
    * the sketch replaces at scale. */
  private def qHllDistinct(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.HllSketch.hll_distinct
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(hll_distinct(col("user_id").cast("string"), 9).as("hu"),
        hll_distinct(col("event_id").cast("string"), 9).as("he"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"),
        round(col("hu.est"), 4).as("est_users"),
        col("hu.reg_sum").as("reg_sum_users"),
        col("hu.nonzero").cast("long").as("nonzero_users"),
        round(col("he.est"), 4).as("est_events"),
        col("he.reg_sum").as("reg_sum_events"),
        col("exact_users"))
      .orderBy(col("event_type"))
  }

  /** Count–Min point-frequency estimates for the exact top-10 users:
    * one `cms_sketch` pass builds the 3×1024 counter table (the only
    * sketch whose merge is exactly elementwise ⇒ the table is
    * bit-identical under any partitioning), the 1-row table broadcasts,
    * and the probe estimates are plain `element_at` + splitmix/fnv
    * Column math — no custom probe kernel. `overestimate ≥ 0` is the
    * CMS one-sided guarantee; the oracle rebuilds the identical table
    * from per-key counts and replays the min-over-rows reads. */
  private def qCmsFreq(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.CmsSketch.{cms_sketch, cmsEstimate}
    val ev = t(s, dir, "events")
    val sketch = ev.agg(
      cms_sketch(col("user_id").cast("string"), 3, 10).as("cms"))
    val top = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id")).limit(10)
    top.crossJoin(broadcast(sketch))
      .select(col("user_id"), col("exact_cnt"),
        cmsEstimate(col("cms"), col("user_id").cast("string"), 3, 10)
          .as("est_cnt"))
      .withColumn("overestimate", col("est_cnt") - col("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id"))
  }

  /** The demo blocklist: phrases from the synthetic vocabulary (some
    * present, one never), including an overlapping-prefix pair — the
    * shapes that separate Aho–Corasick from naive scans. */
  private val blocklistPhrases = Seq(
    "slow scan", "big query", "table table", "value table part",
    "fast key", "quantum blockchain")

  /** Aho–Corasick blocklist scan over documents: ONE automaton pass
    * per doc counts leftmost-non-overlapping occurrences of every
    * blocklist phrase — O(len + matches) per doc no matter how large
    * the blocklist, where per-phrase scans are O(len × phrases). The
    * oracle replays the counts as replace() arithmetic and the
    * first-hit phrase as min-by-(position, list-order). */
  private def qBlocklistHits(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MultiPatternStats.multi_match
    t(s, dir, "documents")
      .select(col("doc_id"),
        multi_match(col("text"), blocklistPhrases).as("m"))
      .select(col("doc_id"),
        col("m.total_hits").as("total_hits"),
        col("m.n_patterns").as("n_patterns"),
        col("m.first_pattern").as("first_pattern"),
        (col("m.total_hits") > 0).as("blocked"))
      .orderBy(col("doc_id"))
  }

  /** ARI readability per document — count-only inputs (chars / words /
    * sentence-punctuation runs), so both engines compute from the same
    * integers; the readability gate next to the Gopher length rules. */
  private def qTextReadability(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.readability(t(s, dir, "documents"), "text")

  /** Vocabulary-distribution divergence between the even/odd doc_id
    * halves: KL both ways + Jensen–Shannon over the union top-100
    * vocab, add-one smoothed, per-term contributions quantized to
    * longs at 1e-12 (the PageRank integer-mass contract) so the sums
    * are partition-invariant and DuckDB-replayable. */
  private def qVocabDivergence(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabDivergence(t(s, dir, "documents"), "text",
      col("doc_id") % 2 === 0, topN = 100)

  /** Simplified silhouette over the deterministic k-means cells —
    * cluster-quality card; 1e-9 long quantization keeps the per-cell
    * means partition-invariant and oracle-replayable. */
  private def qClusterSilhouette(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.clusterSilhouette(
      t(s, dir, "embeddings"), "embedding", "vec_id", k = 8, iters = 2)

  /** k-distance outliers: the 20 most isolated embeddings by 5-NN
    * cosine — the density outlier view next to emb_outliers'
    * centroid-distance view. Even-id half as the exact anchor (the
    * knn_label_vote convention — the full-corpus path swaps in the
    * LSH/IVF pair miners, same downstream shape). */
  private def qEmbKnnOutliers(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.knnDistOutliers(
      t(s, dir, "embeddings").filter(col("vec_id") % 2 === 0),
      "embedding", "vec_id", k = 5, topN = 20)

  /** CMS join-cardinality estimate: |A ⋈ B on user_id| between the
    * even/odd event_id halves from two 24 KB sketches — the CM
    * inner-product estimator (one-sided, exact integer math), i.e.
    * the broadcast-vs-salt decision WITHOUT executing the join. The
    * exact size rides along for the comparison. */
  private def qJoinSizeEst(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.CmsSketch.{cms_sketch, cmsInnerProduct}
    val ev = t(s, dir, "events")
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 =!= 0)
    val sa = a.agg(cms_sketch(col("user_id").cast("string"), 3, 10).as("ta"))
    val sb = b.agg(cms_sketch(col("user_id").cast("string"), 3, 10).as("tb"))
    val est = sa.crossJoin(broadcast(sb))
      .select(cmsInnerProduct(col("ta"), col("tb"), 3, 10)
        .as("est_join_size"))
    val exact = a.groupBy(col("user_id")).agg(count(lit(1)).as("ca"))
      .join(b.groupBy(col("user_id")).agg(count(lit(1)).as("cb")), "user_id")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))
        .as("exact_join_size"))
    est.crossJoin(broadcast(exact))
      .select(col("est_join_size"), col("exact_join_size"),
        (col("est_join_size") - col("exact_join_size")).as("overestimate"))
  }

  /** CMS heavy-change detection between the two halves of the event
    * stream (time midpoint split): one sketch per window built in the
    * same pass shape as `q_cms_freq`, probed for the top keys —
    * |est_after − est_before| ranks the movers. The sketches never see
    * each other's raw keys; at corpus scale the probe set comes from
    * the SpaceSaving hot-key report instead of the exact top
    * (hotKeyList — this query probes the exact top-12 so the oracle
    * can replay it). */
  private def qCmsHeavyChange(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.CmsSketch.{cms_sketch, cmsEstimate}
    val ev = t(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tt"))
    val mid = ev.agg(((min(col("tt")) + max(col("tt"))) / 2)
      .cast("long").as("mid"))
    val w = ev.crossJoin(broadcast(mid))
    val s1 = w.filter(col("tt") <= col("mid"))
      .agg(cms_sketch(col("user_id").cast("string"), 3, 10).as("c1"))
    val s2 = w.filter(col("tt") > col("mid"))
      .agg(cms_sketch(col("user_id").cast("string"), 3, 10).as("c2"))
    val probes = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("total"))
      .orderBy(col("total").desc, col("user_id")).limit(12)
    probes.crossJoin(broadcast(s1)).crossJoin(broadcast(s2))
      .select(col("user_id"), col("total"),
        cmsEstimate(col("c1"), col("user_id").cast("string"), 3, 10)
          .as("est_before"),
        cmsEstimate(col("c2"), col("user_id").cast("string"), 3, 10)
          .as("est_after"))
      .withColumn("delta", col("est_after") - col("est_before"))
      .orderBy(abs(col("delta")).desc, col("user_id"))
  }

  /** CUPED variance-reduced A/B readout over the events stream:
    * pre/post split at the integer time midpoint, per-user integer
    * cents, arms = user parity — raw vs adjusted means plus the
    * variance-reduction ratio. */
  private def qEventsCuped(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.cuped(t(s, dir, "events"), col("ts"),
      col("user_id"), col("user_id") % 2, col("value"))

  /** Good–Turing missing mass + Chao1 richness per language — the
    * "is this source's vocabulary exhausted" crawl-planning card. */
  private def qVocabMissingMass(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabMissingMass(t(s, dir, "documents"), "lang", "text")

  /** Embedding-space drift: PSI per JL-projected component between the
    * vec_id halves — the encoder-drift / corpus-shift monitor in
    * embedding space (projection compresses 64 dims to 8 oracled
    * components; PSI over fixed-width bins per component). Composes
    * two already-oracled kernels: projectRandom + Drift.psiBetween. */
  private def qEmbDriftPsi(s: SparkSession, dir: String): DataFrame = {
    val proj = Similarity.projectRandom(t(s, dir, "embeddings"),
        "embedding", dim = 64, k = 8, "reduced")
      .select(col("vec_id"), posexplode(col("reduced")).as(Seq("comp", "x")))
    graft.operators.Drift.psiBetween(
        proj.filter(col("vec_id") % 2 === 0),
        proj.filter(col("vec_id") % 2 =!= 0),
        "comp", "x", binWidth = 0.5)
      .select(col("grp").cast("int").as("comp"), col("n_bins"), col("psi"))
      .orderBy(col("comp"))
  }

  /** Relational pivot: daily event counts spread to one column per
    * type (`groupBy(day).pivot(type, values).count()` — explicit value
    * list so the plan is a single pass, no distinct-values pre-query). */
  private def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("ts").cast("date").as("day"), col("event_type"))
      .groupBy(col("day"))
      .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("day"))

  /** Relational unpivot (melt): the per-flag measure columns back to
    * (flag, measure, value) long form via Dataset.unpivot. */
  private def qUnpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))

  /** UniMax epoch-capped allocation over languages: budget = 1.5× the
    * corpus tokens, cap = 2 epochs — at this corpus shape every
    * low-resource language caps at 2 epochs and `en` absorbs the
    * remainder (mixed regime: both water-filling branches taken). */
  private def qMixUnimax(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val d = t(s, dir, "documents").select(col("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val total = d.agg(sum(col("n_tokens"))).head().getLong(0)
    Sampling.unimaxAllocation(d, "lang", col("n_tokens"),
      budgetTokens = total + total / 2, epochCap = 2)
      .orderBy(col("domain"))
  }

  /** Leakage-safe train/eval split: near-dup clusters (3-gram Jaccard
    * ≥ 0.5 pairs → connected components) draw ONE splitmix64 side per
    * cluster, so no near-duplicate pair straddles the boundary. */
  private def qSplitClusterSafe(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Clustering, Sampling}
    val d = t(s, dir, "documents")
    val clusters = Clustering.dupClusters(minedNgramPairs(s, dir),
      "id_a", "id_b")
    Sampling.clusterSafeSplit(d.select(col("doc_id")), "doc_id",
        clusters, "doc_id", "cluster_id", evalRate = 0.1)
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Late-interaction MaxSim retrieval: 4 query vectors vs label-grouped
    * chunk sets — one partial aggregation with a max(cos) column per
    * query vector, fixed-association final sum (see
    * [[graft.operators.Retrieval.maxSimTopK]]). */
  private def qRetrievalMaxsim(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Retrieval
    val e = t(s, dir, "embeddings")
    val qs: Seq[Seq[Double]] = e.filter(col("vec_id") < 4)
      .orderBy(col("vec_id")).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    Retrieval.maxSimTopK(e, "label", "embedding", qs, k = 5)
      .select(col("label").cast("long").as("doc_group"), col("maxsim_score"))
  }

  /** Perceptual dHash of every synthetic BMP (real encode → real pixel
    * decode → integer luma → 9×8 grid difference bits); the oracle
    * replays the known pixel formula through the identical integer
    * pipeline. Hash published as two 32-bit halves (bit 63 would
    * overflow a signed SQL BIGINT built by Σ 2^k). */
  private def qImageDhash(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MediaDHash.media_dhash
    import graft.operators.Multimodal
    t(s, dir, "documents")
      .select(col("doc_id"),
        Multimodal.synthBmpUdf(col("doc_id"),
          (col("doc_id") % 8 + 1).cast("int"),
          (col("doc_id") % 6 + 1).cast("int")).as("media"))
      .select(col("doc_id"), media_dhash(col("media")).as("sig"))
      .select(col("doc_id"),
        shiftrightunsigned(col("sig"), 32).as("hash_hi"),
        col("sig").bitwiseAND(lit(0xFFFFFFFFL)).as("hash_lo"))
      .orderBy(col("doc_id"))
  }

  /** Image near-dup pairs over the ≥4×4 synthetic BMPs (below that the
    * 9-point sample grid collapses and every tiny image hashes to ~0 —
    * trivially "identical"; the resolution floor keeps the pair set
    * meaningful, mirrored in the oracle). Same-dimension classes with
    * constant luma shifts produce genuine near-dup structure: dHash is
    * a DIFFERENCE hash, so a uniform brightness shift only flips bits
    * where the mod-256 pixel wrap lands on a sampled cell. */
  private def qImageDhashPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val imgs = t(s, dir, "documents")
      .filter(col("doc_id") % 8 >= 3 && col("doc_id") % 6 >= 3)
      .select(col("doc_id"),
        Multimodal.synthBmpUdf(col("doc_id"),
          (col("doc_id") % 8 + 1).cast("int"),
          (col("doc_id") % 6 + 1).cast("int")).as("media"))
    Multimodal.imageDHashPairs(imgs, "media", "doc_id", maxDist = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Sign-of-derivative audio fingerprint of every synthetic WAV (real
    * RIFF encode → real PCM decode → 65-anchor waveform-shape hash);
    * the oracle replays the known sample formula — the −1024 DC shift
    * cancels in the comparisons, so only the mod-2048 ramp matters. */
  private def qAudioFingerprint(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MediaAudioFp.media_audio_fp
    import graft.operators.Multimodal
    t(s, dir, "documents")
      .select(col("doc_id"),
        Multimodal.synthWavUdf(col("doc_id"),
          (col("doc_id") % 2 + 1).cast("int"),
          (col("doc_id") % 40 + 25).cast("int")).as("media"))
      .select(col("doc_id"), media_audio_fp(col("media")).as("sig"))
      .select(col("doc_id"),
        shiftrightunsigned(col("sig"), 32).as("hash_hi"),
        col("sig").bitwiseAND(lit(0xFFFFFFFFL)).as("hash_lo"))
      .orderBy(col("doc_id"))
  }

  private val cardIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Batch novelty SERVED FROM the persisted cardinality profile (the
    * ninth index): registers built on the even-id half, saved → loaded,
    * probed with the odd-id half — est(union) − est(corpus) per source
    * is "how many of the batch's texts are NEW". The oracle replays all
    * three register pipelines (corpus / batch / union) literally. */
  private def qCorpusNovelty(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Cardinality
    val d = t(s, dir, "documents")
    val path = cardIndexPaths.computeIfAbsent(dir, { _ =>
      val p = java.nio.file.Files.createTempDirectory("graft_card_idx").toString
      Cardinality.CardRef.build(d.filter(col("doc_id") % 2 === 0),
        "source", "text", p = 9).save(p)
      p
    })
    Cardinality.CardRef.load(s, path)
      .noveltyOf(d.filter(col("doc_id") % 2 === 1), "source", "text")
      .select(col("grp").as("source"),
        round(col("est_corpus"), 4).as("est_corpus"),
        round(col("est_batch"), 4).as("est_batch"),
        round(col("est_union"), 4).as("est_union"),
        round(col("novelty"), 4).as("novelty"))
      .orderBy(col("source"))
  }

  /** Explicit GROUPING SETS (the general form cube/rollup specialize):
    * per-flag totals, per-status totals, and the grand total in ONE
    * aggregation pass over the scan — not three unioned scans. */
  private def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Per-sample byte-sum shape hash of every synthetic MP4 (real
    * ISO-BMFF encode → real stsz/stsc/stco sample-table walk → 65-anchor
    * difference hash); the oracle replays the closed-form per-sample
    * byte sums. 16–65 samples per doc so the anchor grid has real
    * structure to bite on. */
  private def qVideoFingerprint(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MediaVideoFp.media_video_fp
    import graft.operators.Multimodal
    t(s, dir, "documents")
      .select(col("doc_id"),
        Multimodal.synthMp4Udf(col("doc_id"),
          (col("doc_id") % 50 + 16).cast("int"), lit(64), lit(48)).as("media"))
      .select(col("doc_id"), media_video_fp(col("media")).as("sig"))
      .select(col("doc_id"),
        shiftrightunsigned(col("sig"), 32).as("hash_hi"),
        col("sig").bitwiseAND(lit(0xFFFFFFFFL)).as("hash_lo"))
      .orderBy(col("doc_id"))
  }

  /** Equi-depth (ntile) value histogram per event type — the
    * data-dependent-boundary profile that the fixed-width PSI bins and
    * the quantile sketch bracket from either side. Deterministic
    * binning: ordered by (value, event_id), so ties split identically
    * in any engine. Binning is the two-phase grouped ntile
    * ([[graft.operators.Ranks.groupedNtile]]): a HOT event type spans
    * range partitions instead of funnelling its whole value
    * distribution through one sort task; the KLL sketch
    * (`q_quantile_sketch`) remains the approximate bracket when even
    * exact grouped ranking is too much. */
  private def qEquidepthHist(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"))
    graft.operators.Ranks.groupedNtile(base, Seq("event_type"),
        Seq(col("value"), col("event_id")), 10, "bin")
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 4).as("lo"),
        round(max(col("value")), 4).as("hi"),
        round(avg(col("value")), 4).as("mean"))
      .orderBy(col("event_type"), col("bin"))
  }

  /** Stride-scheduled weighted mixing order over 4 shards: the
    * schedule every prefix of which carries languages in proportion to
    * the (config) mixture weights. */
  private def qMixSchedule(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    Sampling.mixSchedule(t(s, dir, "documents"), "lang", "doc_id",
        mixScheduleWeights, nShards = 4)
      .orderBy(col("shard"), col("pos"))
  }

  private val mixScheduleWeights: Map[String, Double] = Map(
    "en" -> 0.3, "zh" -> 0.25, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15)

  /** SFT chat-template render + assistant loss-mask spans over events
    * treated as dialog turns (conv = user, turn order = ts). */
  private def qSftPack(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SftPack
    val turns = SftPack.renderTurns(t(s, dir, "events"),
      col("user_id"), col("ts"), col("event_id"),
      when(col("event_id") % 2 === 0, lit("assistant"))
        .otherwise(lit("user")),
      concat(col("event_type"), lit("#"), col("event_id")))
    SftPack.conversationCards(turns).orderBy(col("conv"))
  }

  /** Unbiased pass@k over synthetic per-task attempts: tasks from
    * doc_id residue, correctness a deterministic integer predicate the
    * oracle replays verbatim. */
  private def qEvalPassAtK(s: SparkSession, dir: String): DataFrame = {
    val attempts = t(s, dir, "documents").select(
      (col("doc_id") % 40).as("task"),
      ((col("doc_id") * 2654435761L) % 5 === 0).as("ok"))
    graft.operators.Classifier.passAtK(attempts, col("task"), col("ok"),
        ks = Seq(1, 5, 10))
      .orderBy(col("task_id"))
  }

  /** SFT dialog-shape gates over the same rendered turn stream as
    * `sft_pack`: role alternation, empty turns, user-first /
    * assistant-last, conjunctive valid flag. */
  private def qSftValidate(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SftPack
    val turns = SftPack.renderTurns(t(s, dir, "events"),
      col("user_id"), col("ts"), col("event_id"),
      when(col("event_id") % 2 === 0, lit("assistant"))
        .otherwise(lit("user")),
      concat(col("event_type"), lit("#"), col("event_id")))
    SftPack.dialogChecks(turns)
      .withColumnRenamed("conv", "user_id")
      .orderBy(col("user_id"))
  }

  /** Top TF-IDF terms per deterministic k-means cell — the "what IS
    * cluster 3" card beside topic_cluster_stats. */
  private def qClusterLabels(s: SparkSession, dir: String): DataFrame =
    Similarity.clusterTopTerms(t(s, dir, "embeddings"), "embedding",
        "vec_id", t(s, dir, "documents"), "doc_id", "text",
        k = 8, iters = 2, topN = 3)
      .orderBy(col("cell"), col("rank"))

  /** Classic RFM segmentation over orders (recency/frequency/monetary
    * quintiles + named segments). */
  private def qCustomerRfm(s: SparkSession, dir: String): DataFrame =
    graft.operators.Metrics.rfm(t(s, dir, "orders"), col("o_custkey"),
        col("o_orderdate"), col("o_totalprice"))
      .orderBy(col("custkey"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ip_range_lookup" -> (qIpRange _),
    "emb_outliers" -> (qEmbOutliers _),
    "tfidf_keywords" -> (qTfidfKeywords _),
    "shard_stats" -> (qShardStats _),
    "multimodal_meta" -> (qMultimodal _),
    "multimodal_mp4_decode" -> (qMultimodalMp4 _),
    "multimodal_bmp_decode" -> (qMultimodalBmp _),
    "multimodal_png_decode" -> (qMultimodalPng _),
    "multimodal_jpeg_decode" -> (qMultimodalJpeg _),
    "multimodal_gif_decode" -> (qMultimodalGif _),
    "multimodal_wav_decode" -> (qMultimodalWav _),
    "oml_transform" -> (qOmlTransform _),
    "oml_objects" -> (qOmlObjects _),
    "oml_sql_enrich" -> (qOmlSqlEnrich _),
    "oml_sql_enrich_join" -> (qOmlSqlEnrichJoin _),
    "wpl_nginx_parse" -> (qWplNginx _),
    "wpl_kvarr_parse" -> (qWplKvarr _),
    "wpl_json_parse" -> (qWplJson _),
    "wpl_geo_enrich" -> (qWplGeoEnrich _),
    "syslog_normalize" -> (qSyslogNorm _),
    "q1_pricing_summary" -> (q1 _),
    "q_filter_pushdown" -> (qFilter _),
    "q_join_topk" -> (qJoinTopk _),
    "q_broadcast_dims" -> (qBroadcastDims _),
    "q_window_topn" -> (qWindowTopn _),
    "q_window_running" -> (qWindowRunning _),
    "q_set_ops" -> (qSetOps _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_events_sessionize" -> (qSessionize _),
    "q_anti_join" -> (qAntiJoin _),
    "q_semi_join" -> (qSemiJoin _),
    "knowdb_lookup" -> (qKnowdbLookup _),
    "q_events_hourly" -> (qEventsHourly _),
    "user_features" -> (qUserFeatures _),
    "source_neardup_stats" -> (qSourceNearDupStats _),
    "q_events_json" -> (qEventsJson _),
    "q_skew_salted_agg" -> (qSkewSaltedAgg _),
    "q_skew_adaptive_join" -> (qSkewAdaptiveJoin _),
    "q_events_lag" -> (qEventsLag _),
    "dedup_exact" -> (qDedupExact _),
    "dedup_incremental" -> (qDedupIncremental _),
    "text_quality" -> (qTextQuality _),
    "corpus_stats" -> (qCorpusStats _),
    "corpus_top_tokens" -> (qTopTokens _),
    "token_stats" -> (qTokenStats _),
    "dedup_ngram_jaccard" -> (qNgramJaccard _),
    "dedup_minhash_lsh" -> (qMinhashLsh _),
    "dedup_simhash" -> (qSimhash _),
    "lang_id" -> (qLangId _),
    "doc_fingerprint" -> (qFingerprint _),
    "dedup_embedding_pairs" -> (qEmbPairs _),
    "dedup_embedding_lsh" -> (qEmbLshPairs _),
    "ann_cosine_topk" -> (qAnnTopk _),
    "ann_ivf_topk" -> (qAnnIvf _),
    "ann_ivf_kmeans_topk" -> (qAnnIvfKmeans _),
    "ann_lsh_topk" -> (qAnnLsh _),
    "pii_scan" -> (qPiiScan _),
    "contamination_ngram" -> (qContamination _),
    "contamination_bloom" -> (qContaminationBloom _),
    "decontaminate_report" -> (qDecontaminate _),
    "dedup_clusters" -> (qDedupClusters _),
    "dedup_clusters_star" -> (qDedupClustersStar _),
    "sample_stratified" -> (qSampleStratified _),
    "mix_weights" -> (qMixWeights _),
    "vocab_coverage" -> (qVocabCoverage _),
    "doc_chunk" -> (qDocChunk _),
    "segment_dedup" -> (qSegmentDedup _),
    "text_repetition" -> (qTextRepetition _),
    "emb_quantize" -> (qEmbQuantize _),
    "emb_project" -> (qEmbProject _),
    "seq_pack" -> (qSeqPack _),
    "packing_stats" -> (qPackingStats _),
    "q_asof_join" -> (qAsofJoin _),
    "q_interval_join" -> (qIntervalJoin _),
    "q_interval_overlap" -> (qIntervalOverlap _),
    "lm_score_index" -> (qLmScoreIndex _),
    "text_logprob" -> (qTextLogprob _),
    "pmi_collocations" -> (qPmiCollocations _),
    "bigram_lm" -> (qBigramLm _),
    "corpus_diff" -> (qCorpusDiff _),
    "url_dedup_stats" -> (qUrlDedupStats _),
    "training_order" -> (qTrainingOrder _),
    "curation_pipeline" -> (qCurationPipeline _),
    "ann_recall" -> (qAnnRecall _),
    "ann_ivfpq_recall" -> (qAnnIvfPqRecall _),
    "semantic_dedup" -> (qSemanticDedup _),
    "source_stats" -> (qSourceStats _),
    "knn_label_vote" -> (qKnnLabelVote _),
    "knn_label_vote_lsh" -> (qKnnLabelVoteLsh _),
    "semantic_dedup_nprobe" -> (qSemanticDedupNprobe _),
    "bpe_top_merges" -> (qBpeTopMerges _),
    "span_dedup" -> (qSpanDedup _),
    "cdc_dedup" -> (qCdcDedup _),
    "dedup_crosscorpus_lsh" -> (qCrossCorpusLsh _),
    "dedup_crosscorpus_emb" -> (qCrossCorpusEmb _),
    "minhash_est_error" -> (qMinhashEstError _),
    "budget_select" -> (qBudgetSelect _),
    "ngram_novelty" -> (qNgramNovelty _),
    "quality_classifier" -> (qQualityClassifier _),
    "dataset_card" -> (qDatasetCard _),
    "emb_dim_stats" -> (qEmbDimStats _),
    "q_events_funnel" -> (qEventsFunnel _),
    "q_events_retention" -> (qEventsRetention _),
    "topic_cluster_stats" -> (qTopicClusters _),
    "gopher_rules" -> (qGopherRules _),
    "char_entropy" -> (qCharEntropy _),
    "pq_encode" -> (qPqEncode _),
    "ann_ivfpq_topk" -> (qAnnIvfPq _),
    "quality_ensemble" -> (qQualityEnsemble _),
    "ppl_buckets" -> (qPplBuckets _),
    "dedup_containment" -> (qDedupContainment _),
    "dedup_keep_list" -> (qDedupKeepList _),
    "dedup_keep_list_containment" -> (qDedupKeepListContainment _),
    "q_events_attribution" -> (qEventsAttribution _),
    "q_events_anomaly" -> (qEventsAnomaly _),
    "tokenizer_fertility" -> (qTokenizerFertility _),
    "contamination_emb" -> (qContaminationEmb _),
    "intradoc_dedup" -> (qIntraDocDedup _),
    "mix_temperature" -> (qMixTemperature _),
    "seqlen_histogram" -> (qSeqLenHistogram _),
    "dup_cluster_sizes" -> (qDupClusterSizes _),
    "sample_exact_n" -> (qSampleExactN _),
    "sample_weighted" -> (qSampleWeighted _),
    "subword_vocab" -> (qSubwordVocab _),
    "q_corr_matrix" -> (qCorrMatrix _),
    "q_events_mi" -> (qEventsMi _),
    "q_events_active_users" -> (qEventsActiveUsers _),
    "source_overlap_matrix" -> (qSourceOverlapMatrix _),
    "source_pagerank" -> (qSourcePagerank _),
    "graph_hits" -> (qGraphHits _),
    "q_events_markov_stationary" -> (qEventsMarkovStationary _),
    "q_events_logrank" -> (qEventsLogrank _),
    "q_events_sprt" -> (qEventsSprt _),
    "rake_keywords" -> (qRakeKeywords _),
    "textrank_keywords" -> (qTextrankKeywords _),
    "q_events_holt" -> (qEventsHolt _),
    "q_events_burstiness" -> (qEventsBurstiness _),
    "als_rank1" -> (qAlsRank1 _),
    "als_rank2" -> (qAlsRank2 _),
    "q_events_poisson_trend" -> (qEventsPoissonTrend _),
    "lr_brier" -> (qLrBrier _),
    "lr_ece" -> (qLrEce _),
    "q_events_did" -> (qEventsDid _),
    "q_events_winsorized" -> (qEventsWinsorized _),
    "q_discount_elasticity" -> (qDiscountElasticity _),
    "q_cramers_v" -> (qCramersV _),
    "q_ship_delay_sla" -> (qShipDelaySla _),
    "basket_sequel_rules" -> (qBasketSequelRules _),
    "sample_neyman_alloc" -> (qSampleNeymanAlloc _),
    "q_events_mann_kendall" -> (qEventsMannKendall _),
    "q_events_stickiness" -> (qEventsStickiness _),
    "q_power_analysis" -> (qPowerAnalysis _),
    "graph_kcore" -> (qGraphKcore _),
    "graph_link_pred" -> (qGraphLinkPred _),
    "q_t_closeness" -> (qTCloseness _),
    "dq_functional_deps" -> (qDqFunctionalDeps _),
    "lexical_diversity" -> (qLexicalDiversity _),
    "retrieval_map" -> (qRetrievalMap _),
    "emb_davies_bouldin" -> (qEmbDaviesBouldin _),
    "q_events_ewma" -> (qEventsEwma _),
    "q_events_pacf" -> (qEventsPacf _),
    "markdown_profile" -> (qMarkdownProfile _),
    "q_hhi_concentration" -> (qHhiConcentration _),
    "markov_attribution" -> (qMarkovAttribution _),
    "graph_lpa" -> (qGraphLpa _),
    "q_events_cliffs_delta" -> (qEventsCliffsDelta _),
    "q_events_levene" -> (qEventsLevene _),
    "corpus_distinct_n" -> (qCorpusDistinctN _),
    "q_events_hurst" -> (qEventsHurst _),
    "paragraph_dup_stats" -> (qParagraphDupStats _),
    "sample_class_balanced" -> (qSampleClassBalanced _),
    "q_events_srm" -> (qEventsSrm _),
    "q_events_mad" -> (qEventsMad _),
    "q_price_index" -> (qPriceIndex _),
    "q_events_holt_winters" -> (qEventsHoltWinters _),
    "trigram_lm" -> (qTrigramLm _),
    "gate_overlap_matrix" -> (qGateOverlapMatrix _),
    "q_interval_union" -> (qIntervalUnion _),
    "q_events_runs" -> (qEventsRuns _),
    "q_theil_inequality" -> (qTheilInequality _),
    "dsir_ess" -> (qDsirEss _),
    "q_events_streaks" -> (qEventsStreaks _),
    "dedup_threshold_curve" -> (qDedupThresholdCurve _),
    "q_events_cohens_d" -> (qEventsCohensD _),
    "q_rank_migration" -> (qRankMigration _),
    "q_events_its" -> (qEventsIts _),
    "collocations_llr" -> (qCollocationsLlr _),
    "emb_isotropy" -> (qEmbIsotropy _),
    "lr_conformal" -> (qLrConformal _),
    "gate_parity_audit" -> (qGateParityAudit _),
    "vocab_heaps_fit" -> (qVocabHeapsFit _),
    "seq_pattern_3" -> (qSeqPattern3 _),
    "dq_timeseries_gaps" -> (qDqTimeseriesGaps _),
    "feature_quantile_norm" -> (qFeatureQuantileNorm _),
    "q_events_ucb_policy" -> (qEventsUcbPolicy _),
    "q_events_psm_att" -> (qEventsPsmAtt _),
    "item_cf_topk" -> (qItemCfTopk _),
    "dq_referential" -> (qDqReferential _),
    "hbos_outliers" -> (qHbosOutliers _),
    "contrastive_triplets" -> (qContrastiveTriplets _),
    "q_hot_keys" -> (qHotKeys _),
    "q_events_rolling_stats" -> (qEventsRollingStats _),
    "q_events_psi" -> (qEventsPsi _),
    "lang_confusion" -> (qLangConfusion _),
    "bm25_topk" -> (qBm25TopK _),
    "bm25_index_topk" -> (qBm25IndexTopK _),
    "dsir_weights" -> (qDsirWeights _),
    "dsir_select" -> (qDsirSelect _),
    "dsir_score_index" -> (qDsirScoreIndex _),
    "exact_substring_spans" -> (qExactSubstrSpans _),
    "exact_substring_index" -> (qExactSubstrIndex _),
    "member_novel_keys" -> (qMemberNovelKeys _),
    "exact_substring_apply" -> (qExactSubstrApply _),
    "q_quantile_sketch" -> (qQuantileSketch _),
    "dedup_weights" -> (qDedupWeights _),
    "vocab_growth" -> (qVocabGrowth _),
    "decontaminate_spans_apply" -> (qDecontamSpansApply _),
    "q_hll_distinct" -> (qHllDistinct _),
    "q_cms_freq" -> (qCmsFreq _),
    "blocklist_hits" -> (qBlocklistHits _),
    "text_readability" -> (qTextReadability _),
    "vocab_divergence" -> (qVocabDivergence _),
    "cluster_silhouette" -> (qClusterSilhouette _),
    "emb_knn_outliers" -> (qEmbKnnOutliers _),
    "q_join_size_est" -> (qJoinSizeEst _),
    "q_events_cuped" -> (qEventsCuped _),
    "vocab_missing_mass" -> (qVocabMissingMass _),
    "emb_drift_psi" -> (qEmbDriftPsi _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "mix_unimax" -> (qMixUnimax _),
    "split_cluster_safe" -> (qSplitClusterSafe _),
    "retrieval_maxsim" -> (qRetrievalMaxsim _),
    "image_dhash" -> (qImageDhash _),
    "image_dhash_pairs" -> (qImageDhashPairs _),
    "audio_fingerprint" -> (qAudioFingerprint _),
    "corpus_novelty" -> (qCorpusNovelty _),
    "q_grouping_sets" -> (qGroupingSets _),
    "video_fingerprint" -> (qVideoFingerprint _),
    "q_equidepth_hist" -> (qEquidepthHist _),
    "mix_schedule" -> (qMixSchedule _),
    "q_asof_forward" -> (qAsofForward _),
    "hybrid_retrieval_rrf" -> (qHybridRrf _),
    "fuzzy_match_names" -> (qFuzzyMatchNames _),
    "q_events_transitions" -> (qEventsTransitions _),
    "classifier_metrics" -> (qClassifierMetrics _),
    "score_auc" -> (qScoreAuc _),
    "score_avg_precision" -> (qScoreAvgPrecision _),
    "quality_lr_train" -> (qQualityLrTrain _),
    "lr_calibration" -> (qLrCalibration _),
    "q_events_paths" -> (qEventsPaths _),
    "q_events_survival" -> (qEventsSurvival _),
    "q_profile_lineitem" -> (qProfileLineitem _),
    "q_events_ab" -> (qEventsAb _),
    "q_events_mwu" -> (qEventsMwu _),
    "q_events_kendall" -> (qEventsKendall _),
    "q_events_theilsen" -> (qEventsTheilSen _),
    "q_events_ks" -> (qEventsKs _),
    "q_events_spearman" -> (qEventsSpearman _),
    "q_bootstrap_ci" -> (qBootstrapCi _),
    "retrieval_ndcg" -> (qRetrievalNdcg _),
    "q_events_changepoint" -> (qEventsChangepoint _),
    "q_events_contribution" -> (qEventsContribution _),
    "q_events_chi2" -> (qEventsChi2 _),
    "fim_transform" -> (qFimTransform _),
    "graph_triangles" -> (qGraphTriangles _),
    "q_events_smoothing" -> (qEventsSmoothing _),
    "q_basket_rules" -> (qBasketRules _),
    "q_events_cohort_ltv" -> (qEventsCohortLtv _),
    "q_gini_revenue" -> (qGiniRevenue _),
    "corpus_diversity" -> (qCorpusDiversity _),
    "q_zorder_key" -> (qZorderKey _),
    "q_benford" -> (qBenford _),
    "split_kfold" -> (qSplitKfold _),
    "q_events_robust_stats" -> (qEventsRobustStats _),
    "q_events_seasonality" -> (qEventsSeasonality _),
    "q_funnel_latency" -> (qFunnelLatency _),
    "q_events_by_segment" -> (qEventsBySegment _),
    "graph_degree_dist" -> (qGraphDegrees _),
    "q_pareto_revenue" -> (qParetoRevenue _),
    "vocab_zipf" -> (qVocabZipf _),
    "sft_pack" -> (qSftPack _),
    "fuzzy_match_jw" -> (qFuzzyMatchJw _),
    "q_events_acf" -> (qEventsAcf _),
    "q_k_anonymity" -> (qKAnonymity _),
    "pref_pair_stats" -> (qPrefPairStats _),
    "pref_pair_bias" -> (qPrefPairBias _),
    "fuzzy_match_dl" -> (qFuzzyMatchDl _),
    "cleaning_signals" -> (qCleaningSignals _),
    "battle_winrates" -> (qBattleWinrates _),
    "bt_strength" -> (qBtStrength _),
    "q_events_anova" -> (qEventsAnova _),
    "linkage_sorted_nbhd" -> (qLinkageSortedNbhd _),
    "source_vocab_overlap_hll" -> (qSourceVocabOverlapHll _),
    "emb_pca_power" -> (qEmbPcaPower _),
    "emb_pca2" -> (qEmbPca2 _),
    "q_events_mwu_fdr" -> (qEventsMwuFdr _),
    "q_cms_heavy_change" -> (qCmsHeavyChange _),
    "bigram_lm_kn" -> (qBigramLmKn _),
    "line_boilerplate" -> (qLineBoilerplate _),
    "script_mix" -> (qScriptMix _),
    "q_events_cusum" -> (qEventsCusum _),
    "eval_pass_at_k" -> (qEvalPassAtK _),
    "sft_validate" -> (qSftValidate _),
    "cluster_labels" -> (qClusterLabels _),
    "q_customer_rfm" -> (qCustomerRfm _)
  )

  /** MinHash-estimator-error oracle: a FULL signature replay in SQL.
    * Per (doc, permutation p): sig_p = signed-min over shingles of
    * rot17(fnv(shingle)·a_p + b_p)·C (all mod 2^64 in HUGEINT, with the
    * variable×constant multiplies split into 32-bit halves so nothing
    * overflows the signed 128-bit HUGEINT). Candidates = pairs agreeing
    * on ALL rows of ≥1 band (what Spark's band_hash equi-join computes,
    * modulo a 2⁻³² hash collision that would show up as an extra row
    * here). The JVM's signed-long min is replayed by shifting values
    * ≥ 2^63 down by 2^64 before MIN. */
  private def minhashEstErrorOracle: String = {
    val M = BigInt(1) << 64
    val permRows = (0 until 64).map { p =>
      val a = (BigInt("9E3779B97F4A7C15", 16) * (2 * p + 1)).mod(M)
      val b = (BigInt("C2B2AE3D27D4EB4F", 16) * (p + 1)).mod(M)
      s"($p, ${a & 0xFFFFFFFFL}::HUGEINT, ${a >> 32}::HUGEINT, $b::HUGEINT)"
    }.mkString(", ")
    val h = "h"
    // (h*a + b) mod 2^64 with a split into 32-bit halves
    val v0 = s"(($h * aLo + (($h * aHi) % 4294967296) * 4294967296 + b)" +
      " % 18446744073709551616::HUGEINT)"
    // rotateLeft(x, 17): disjoint bit ranges ⇒ | == +
    val rot = s"((($v0 * 131072) % 18446744073709551616::HUGEINT) + ($v0 // 140737488355328))"
    val v = mulcSql(rot, BigInt("165667B19E3779F9", 16))
    s"""WITH toks AS (
          SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
            x -> len(x) > 0) AS t FROM documents),
        sh0 AS (
          SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
          FROM toks),
        shAll AS (
          SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
          FROM sh0),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM shAll GROUP BY doc_id),
        th AS (SELECT doc_id, ${fnvSql("shingle")} AS h FROM shAll),
        perms(p, aLo, aHi, b) AS (VALUES $permRows),
        sigv AS (
          SELECT doc_id, p,
            min(CASE WHEN $v >= 9223372036854775808::HUGEINT
                THEN $v - 18446744073709551616::HUGEINT ELSE $v END) AS s
          FROM th, perms GROUP BY doc_id, p),
        sigband AS (
          SELECT doc_id, p // 8 AS band,
            string_agg(CAST(s AS VARCHAR), ',' ORDER BY p) AS sigc
          FROM sigv GROUP BY doc_id, p // 8),
        cands AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sigband a JOIN sigband b
            ON a.band = b.band AND a.sigc = b.sigc AND a.doc_id < b.doc_id),
        m AS (
          SELECT c.id_a, c.id_b,
            sum(CASE WHEN sa.s = sb.s THEN 1 ELSE 0 END) AS n_match
          FROM cands c
          JOIN sigv sa ON sa.doc_id = c.id_a
          JOIN sigv sb ON sb.doc_id = c.id_b AND sb.p = sa.p
          GROUP BY c.id_a, c.id_b),
        inter AS (
          SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS n_inter
          FROM shAll l JOIN shAll r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
          GROUP BY l.doc_id, r.doc_id)
        SELECT m.id_a, m.id_b,
          round(n_match / 64.0, 4) AS est_jaccard,
          round(CAST(coalesce(n_inter, 0) AS DOUBLE) /
            (sa.n_sh + sb.n_sh - coalesce(n_inter, 0)), 4) AS exact_jaccard,
          round(abs(n_match / 64.0 - CAST(coalesce(n_inter, 0) AS DOUBLE) /
            (sa.n_sh + sb.n_sh - coalesce(n_inter, 0))), 4) AS abs_err
        FROM m
        LEFT JOIN inter ON inter.id_a = m.id_a AND inter.id_b = m.id_b
        JOIN sizes sa ON sa.doc_id = m.id_a
        JOIN sizes sb ON sb.doc_id = m.id_b
        ORDER BY m.id_a, m.id_b"""
  }

  /** Logistic-quality-filter oracle: replays the [[TextAnalysis
    * .qualityClassify]] score from the SAME weight map over the SAME
    * post-round(4) feature values, so the constants live in one place. */
  private def qualityClassifierOracle: String = {
    val w = TextAnalysis.QualityWeights
    val nTok = """len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0))"""
    val avgTokLen = s"""round(CASE WHEN $nTok > 0
           THEN CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / $nTok
           ELSE 0.0 END, 4)"""
    val stopRatio = s"""round(CASE WHEN $nTok > 0
           THEN CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
             x -> list_contains(['the','a','an','and','or','of','to','in','is','it',
               'that','this','for','on','with','as','at','by','be'], lower(x))))
             AS DOUBLE) / $nTok
           ELSE 0.0 END, 4)"""
    val punctRatio = s"""round(CASE WHEN length(text) > 0
           THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) /
             length(text)
           ELSE 0.0 END, 4)"""
    s"""WITH f AS (
          SELECT doc_id,
            CAST($nTok AS BIGINT) AS q_tokens,
            $avgTokLen AS q_avg_token_len,
            $stopRatio AS q_stopword_ratio,
            $punctRatio AS q_punct_ratio
          FROM documents),
        z AS (
          SELECT doc_id, q_tokens, q_stopword_ratio, q_punct_ratio,
            ${w("intercept")} + ${w("log1p_tokens")} * ln(1.0 + CAST(q_tokens AS DOUBLE))
              + ${w("stopword_ratio")} * q_stopword_ratio
              + ${w("punct_ratio")} * q_punct_ratio
              + ${w("avg_token_len")} * q_avg_token_len AS zz
          FROM f)
        SELECT doc_id, q_tokens, q_stopword_ratio, q_punct_ratio,
          round(1.0 / (1.0 + exp(-zz)), 4) AS quality_score,
          (1.0 / (1.0 + exp(-zz)) >= 0.5) AS keep
        FROM z ORDER BY doc_id"""
  }

  /** Shared by dedup_ngram_jaccard (exact self-join) and
    * dedup_minhash_lsh (LSH candidates + exact verification): the two
    * queries compute the same relation by different physical routes, so
    * they share one oracle. */
  /** Exact 3-gram Jaccard pair select at a caller-chosen threshold —
    * shared by the 0.5-thresholded dedup oracle and the tuning-curve
    * oracle's 0.3 mining floor. */
  private def ngramJaccardPairsSql(threshold: Double): String =
    s"""WITH toks AS (
         SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
           x -> len(x) > 0) AS t FROM documents),
       sh0 AS (
         SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
         FROM toks),
       shAll AS (
         SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
         FROM sh0),
       rare AS (SELECT shingle FROM shAll GROUP BY shingle HAVING count(*) < 100),
       sh AS (SELECT shAll.* FROM shAll JOIN rare USING (shingle)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       inter AS (
         SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS n_inter
         FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
         GROUP BY l.doc_id, r.doc_id)
       SELECT id_a, id_b,
         round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
       FROM inter JOIN sizes sa ON sa.doc_id = id_a
       JOIN sizes sb ON sb.doc_id = id_b
       WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= $threshold"""

  private val ngramJaccardOracle: String =
    ngramJaccardPairsSql(0.5) + "\n       ORDER BY id_a, id_b"

  /** Threshold-tuning curve oracle: the 0.3-floor pair mine, then one
    * (pairs, drops) readout per candidate threshold. */
  private val dedupCurveOracle: String = {
    val rows = Seq(0.3, 0.5, 0.7, 0.8, 0.9).map { th =>
      s"""SELECT CAST($th AS DOUBLE) AS threshold,
           CAST(sum(CASE WHEN jaccard >= $th THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pairs,
           CAST(count(DISTINCT CASE WHEN jaccard >= $th THEN id_b END)
             AS BIGINT) AS n_docs_dropped
         FROM pairs"""
    }.mkString(" UNION ALL ")
    s"""WITH pairs AS (${ngramJaccardPairsSql(0.3)})
       SELECT * FROM ($rows) ORDER BY threshold"""
  }

  /** PageRank replay: the overlap-pair relation feeds an unrolled
    * 10-iteration CTE chain of the same rounded recurrence the Spark
    * operator iterates — 12-dp rounding per step is the contract that
    * keeps both engines' float sums in lockstep. */
  private def sourcePagerankOracle: String = {
    val iterCtes = (1 to 10).map { i =>
      s"""pr$i AS (
           SELECT nodes.node,
             round(CAST(0.15 AS DOUBLE) / nn.n +
               0.85 * coalesce(m.inmass, 0.0), 12) AS pr
           FROM nodes CROSS JOIN nn LEFT JOIN (
             SELECT norm.v,
               sum(CAST(round(pr${i - 1}.pr * norm.p * 1e15, 0) AS BIGINT))
                 / 1e15 AS inmass
             FROM norm JOIN pr${i - 1} ON norm.u = pr${i - 1}.node
             GROUP BY norm.v) m ON m.v = nodes.node)"""
    }.mkString(",\n         ")
    s"""WITH jp AS (SELECT id_a, id_b FROM ($ngramJaccardOracle)),
        s AS (SELECT doc_id, source FROM documents),
        om AS (SELECT least(sa.source, sb.source) AS source_a,
                 greatest(sa.source, sb.source) AS source_b,
                 CAST(count(*) AS DOUBLE) AS w
               FROM jp JOIN s sa ON sa.doc_id = id_a
               JOIN s sb ON sb.doc_id = id_b
               WHERE sa.source <> sb.source
               GROUP BY 1, 2),
        e AS (SELECT source_a AS u, source_b AS v, w FROM om
              UNION ALL SELECT source_b, source_a, w FROM om),
        outw AS (SELECT u, sum(w) AS wout FROM e GROUP BY u),
        norm AS (SELECT e.u, e.v, e.w / outw.wout AS p
                 FROM e JOIN outw USING (u)),
        nodes AS (SELECT DISTINCT source AS node FROM documents),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS pr
                FROM nodes CROSS JOIN nn),
        $iterCtes
        SELECT node AS source, round(pr, 6) AS pagerank
        FROM pr10 ORDER BY pagerank DESC, source"""
  }

  /** Shared CTE prefix of the transition-graph oracles: directed
    * event-type edges with BIGINT count weights + the node set —
    * mirrors [[transitionEdges]]. */
  private val transitionEdgesCtes: String =
    """seq AS (
         SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS prev_type
         FROM events),
       e AS MATERIALIZED (SELECT prev_type AS u, event_type AS v,
               CAST(count(*) AS BIGINT) AS w
             FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       nodes AS MATERIALIZED (SELECT u AS node FROM e UNION SELECT v FROM e),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)"""

  /** HITS replay: 8 unrolled auth/hub steps, each quantizing mass
    * terms to BIGINT at 1e15 and L1-normalizing by the exact long
    * total — the same contract as [[Graph.hits]]. */
  private def graphHitsOracle: String = {
    val iterCtes = (1 to 8).map { i =>
      s"""araw$i AS MATERIALIZED (
            SELECT norm.v,
              sum(CAST(round(h${i - 1}.hub * norm.p * 1e15, 0) AS BIGINT))
                AS raw
            FROM norm JOIN h${i - 1} ON norm.u = h${i - 1}.node
            GROUP BY norm.v),
          atot$i AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM araw$i),
          a$i AS MATERIALIZED (
            SELECT nodes.node,
              round(CAST(coalesce(araw$i.raw, 0) AS DOUBLE) / atot$i.tot,
                12) AS auth
            FROM nodes CROSS JOIN atot$i
            LEFT JOIN araw$i ON araw$i.v = nodes.node),
          hraw$i AS MATERIALIZED (
            SELECT norm.u,
              sum(CAST(round(a$i.auth * norm.p * 1e15, 0) AS BIGINT)) AS raw
            FROM norm JOIN a$i ON norm.v = a$i.node
            GROUP BY norm.u),
          htot$i AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM hraw$i),
          h$i AS MATERIALIZED (
            SELECT nodes.node,
              round(CAST(coalesce(hraw$i.raw, 0) AS DOUBLE) / htot$i.tot,
                12) AS hub
            FROM nodes CROSS JOIN htot$i
            LEFT JOIN hraw$i ON hraw$i.u = nodes.node)"""
    }.mkString(",\n        ")
    s"""WITH $transitionEdgesCtes,
        wt AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM e),
        norm AS MATERIALIZED (SELECT u, v, CAST(w AS DOUBLE) / wt.wt AS p
                 FROM e CROSS JOIN wt),
        h0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS hub
               FROM nodes CROSS JOIN nn),
        $iterCtes
        SELECT h8.node AS event_type, round(h8.hub, 6) AS hub,
          round(a8.auth, 6) AS authority
        FROM h8 JOIN a8 USING (node)
        ORDER BY authority DESC, event_type"""
  }

  /** Markov stationary replay: 12 unrolled renormalized π·P steps
    * under the quantized-long contract of [[Graph.stationary]], joined
    * to the exact empirical visit share. */
  private def markovStationaryOracle: String = {
    val iterCtes = (1 to 12).map { i =>
      s"""raw$i AS MATERIALIZED (
            SELECT norm.v,
              sum(CAST(round(p${i - 1}.pi * norm.p * 1e15, 0) AS BIGINT))
                AS raw
            FROM norm JOIN p${i - 1} ON norm.u = p${i - 1}.node
            GROUP BY norm.v),
          tot$i AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM raw$i),
          p$i AS MATERIALIZED (
            SELECT nodes.node,
              round(CAST(coalesce(raw$i.raw, 0) AS DOUBLE) / tot$i.tot,
                12) AS pi
            FROM nodes CROSS JOIN tot$i
            LEFT JOIN raw$i ON raw$i.v = nodes.node)"""
    }.mkString(",\n        ")
    s"""WITH $transitionEdgesCtes,
        outw AS (SELECT u, CAST(sum(w) AS BIGINT) AS wout
                 FROM e GROUP BY u),
        norm AS MATERIALIZED (SELECT e.u, e.v, CAST(e.w AS DOUBLE) / outw.wout AS p
                 FROM e JOIN outw USING (u)),
        p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS pi
               FROM nodes CROSS JOIN nn),
        $iterCtes,
        c AS (SELECT event_type, count(*) AS n_ev FROM events GROUP BY 1),
        ct AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM events)
        SELECT p12.node AS event_type, round(p12.pi, 6) AS pi_stationary,
          round(CAST(c.n_ev AS DOUBLE) / ct.n_tot, 6) AS share_observed
        FROM p12 JOIN c ON c.event_type = p12.node CROSS JOIN ct
        ORDER BY pi_stationary DESC, event_type"""
  }

  /** Log-rank replay: same per-user rollup + duration spec as the
    * KM oracle, hypergeometric terms quantized to BIGINT at 1e9
    * exactly as [[graft.operators.Survival.logRank]]. */
  private val logrankOracle: String =
    """WITH pu AS (
         SELECT user_id, min(epoch_us(ts)) AS t0,
           min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
             AS te
         FROM events GROUP BY user_id),
       cens AS (SELECT max(epoch_us(ts)) AS tc FROM events),
       durs AS (
         SELECT (coalesce(te, tc) - t0) // 3600000000 AS dur,
           CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END AS ev,
           CAST(user_id % 2 AS INT) AS arm
         FROM pu CROSS JOIN cens),
       bydur AS (
         SELECT dur,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS tot_a,
           sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS tot_b,
           sum(CASE WHEN arm = 1 THEN ev ELSE 0 END) AS d_a,
           sum(CASE WHEN arm = 0 THEN ev ELSE 0 END) AS d_b
         FROM durs GROUP BY dur),
       risks AS (
         SELECT dur, d_a, d_b,
           sum(tot_a) OVER () - coalesce(sum(tot_a) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS na,
           sum(tot_b) OVER () - coalesce(sum(tot_b) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
         FROM bydur),
       terms AS (
         SELECT d_a, d_b, na, nb, d_a + d_b AS d, na + nb AS n
         FROM risks WHERE d_a + d_b > 0),
       tq AS (
         SELECT CAST(sum(d_a) AS BIGINT) AS obs_a,
           CAST(sum(CAST(round(CAST(d AS DOUBLE) * na / n * 1e9, 0)
             AS BIGINT)) AS BIGINT) AS eq,
           CAST(sum(CAST(round(CASE WHEN n > 1 THEN
               CAST(d AS DOUBLE) * na * nb * (n - d) /
                 (CAST(n AS DOUBLE) * n * (n - 1))
             ELSE 0.0 END * 1e9, 0) AS BIGINT)) AS BIGINT) AS vq
         FROM terms),
       tot AS (
         SELECT
           CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_users_a,
           CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_users_b
         FROM pu)
       SELECT n_users_a, n_users_b, obs_a,
         round(eq / 1e9, 6) AS exp_a,
         CASE WHEN vq > 0 THEN round((obs_a - eq / 1e9) *
           (obs_a - eq / 1e9) / (vq / 1e9), 6) END AS chi2,
         CASE WHEN vq > 0 THEN round((obs_a - eq / 1e9) /
           sqrt(vq / 1e9), 6) END AS z
       FROM tq CROSS JOIN tot"""

  /** SPRT replay — the four log constants are interpolated from the
    * same Scala computation the engine bakes into its plan. */
  private def sprtOracle: String = {
    val (c1, c2, up, lo) =
      graft.operators.Metrics.sprtConstants(0.18, 0.22, 0.05, 0.05)
    s"""WITH daily AS (
         SELECT CAST(ts AS DATE) AS day, count(*) AS t,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
         FROM events GROUP BY 1),
       cum AS (
         SELECT day,
           CAST(sum(t) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW) AS BIGINT) AS n,
           CAST(sum(s) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW) AS BIGINT) AS k
         FROM daily)
       SELECT day, n, k,
         round(k * CAST($c1 AS DOUBLE) + (n - k) * CAST($c2 AS DOUBLE), 6)
           AS llr,
         CASE WHEN k * CAST($c1 AS DOUBLE) + (n - k) * CAST($c2 AS DOUBLE)
                >= CAST($up AS DOUBLE) THEN 'accept_h1'
              WHEN k * CAST($c1 AS DOUBLE) + (n - k) * CAST($c2 AS DOUBLE)
                <= CAST($lo AS DOUBLE) THEN 'accept_h0'
              ELSE 'continue' END AS decision
       FROM cum ORDER BY day"""
  }

  /** Holt replay as an explicit WITH RECURSIVE fold over the bucket
    * index — NOT list_reduce: DuckDB's list_reduce mutates the
    * accumulator struct FIELD BY FIELD (computing the 'b' field sees
    * the already-updated 's'), so a two-state fold cannot be expressed
    * there with proper immutable-accumulator semantics. The recursion
    * replays the exact scalar op sequence of the Spark aggregate()
    * lambda (sNext recomputed inside the trend term, same grouping).
    * Constants interpolated and CAST to DOUBLE (bare decimal literals
    * parse as DECIMAL and truncate). */
  private def holtOracle: String = {
    val (a, na, bb, nb) = (0.3, 1.0 - 0.3, 0.2, 1.0 - 0.2)
    def d(x: Double) = s"CAST($x AS DOUBLE)"
    val sNext = s"${d(a)} * x.cnt + ${d(na)} * (h.s + h.b)"
    s"""WITH RECURSIVE hourly AS (
         SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
           CAST(count(*) AS DOUBLE) AS cnt
         FROM events GROUP BY 1, 2),
       seqd AS MATERIALIZED (
         SELECT event_type, cnt,
           row_number() OVER (PARTITION BY event_type ORDER BY hour) AS i
         FROM hourly),
       nb AS (SELECT event_type, count(*) AS n_buckets
              FROM seqd GROUP BY 1),
       holt AS (
         SELECT s2.event_type, 2 AS i, s2.cnt AS s,
           s2.cnt - s1.cnt AS b
         FROM seqd s2 JOIN seqd s1 ON s1.event_type = s2.event_type
           AND s1.i = 1
         WHERE s2.i = 2
         UNION ALL
         SELECT h.event_type, h.i + 1,
           $sNext,
           ${d(bb)} * (($sNext) - h.s) + ${d(nb)} * h.b
         FROM holt h JOIN seqd x ON x.event_type = h.event_type
           AND x.i = h.i + 1),
       fin AS (
         SELECT h.event_type, h.s, h.b
         FROM holt h JOIN nb ON nb.event_type = h.event_type
           AND h.i = nb.n_buckets)
       SELECT nb.event_type, CAST(nb.n_buckets AS BIGINT) AS n_buckets,
         round(f.s, 6) AS level, round(f.b, 6) AS trend,
         round(f.s + f.b, 6) AS forecast
       FROM nb LEFT JOIN fin f ON f.event_type = nb.event_type
       ORDER BY 1"""
  }

  /** Referential-audit replay — generated from the SAME spec list the
    * engine audits, one NOT EXISTS branch per relationship. */
  private def dqReferentialOracle: String = {
    val specs = Seq(
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
    specs.map { case (name, child, ck, parent, pk) =>
      s"""SELECT '$name' AS relation,
            (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_child,
            (SELECT CAST(count(*) AS BIGINT) FROM $child c
             WHERE NOT EXISTS (SELECT 1 FROM $parent p
               WHERE p.$pk = c.$ck)) AS n_orphans,
            round(CASE WHEN (SELECT count(*) FROM $child) > 0
              THEN (SELECT count(*) FROM $child c WHERE NOT EXISTS
                (SELECT 1 FROM $parent p WHERE p.$pk = c.$ck)) /
                CAST((SELECT count(*) FROM $child) AS DOUBLE)
              ELSE 0.0 END, 6) AS orphan_rate"""
    }.mkString("\n UNION ALL \n") + "\n ORDER BY relation"
  }

  /** Rank-1 ALS replay: 3 unrolled half-step pairs under the
    * 1e-9-quantized scalar-ratio contract of
    * [[graft.operators.Factorize.alsRank1]]. */
  private def alsRank1Oracle: String = {
    val iterCtes = (1 to 3).map { k =>
      s"""u$k AS MATERIALIZED (
           SELECT r.u,
             round(CAST(sum(CAST(floor(r.r * v${k - 1}.v * 1e9 + 0.5)
                 AS HUGEINT)) AS DOUBLE) /
               CAST(sum(CAST(floor(v${k - 1}.v * v${k - 1}.v * 1e9 + 0.5)
                 AS HUGEINT)) AS DOUBLE), 12) AS uf
           FROM r JOIN v${k - 1} ON r.i = v${k - 1}.i GROUP BY r.u),
         v$k AS MATERIALIZED (
           SELECT r.i,
             round(CAST(sum(CAST(floor(r.r * u$k.uf * 1e9 + 0.5)
                 AS HUGEINT)) AS DOUBLE) /
               CAST(sum(CAST(floor(u$k.uf * u$k.uf * 1e9 + 0.5)
                 AS HUGEINT)) AS DOUBLE), 12) AS v
           FROM r JOIN u$k ON r.u = u$k.u GROUP BY r.i)"""
    }.mkString(",\n        ")
    s"""WITH r AS MATERIALIZED (
         SELECT o.o_custkey AS u, l.l_partkey AS i,
           CAST(sum(l.l_quantity) AS BIGINT) AS r
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY 1, 2),
       v0 AS (SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS v FROM r),
       $iterCtes,
       fit AS (
         SELECT count(*) AS n_cells,
           sum(CAST(floor((r.r - u3.uf * v3.v) * (r.r - u3.uf * v3.v)
             * 1e6 + 0.5) AS HUGEINT)) AS seq
         FROM r JOIN u3 ON r.u = u3.u JOIN v3 ON r.i = v3.i)
       SELECT v3.i AS l_partkey, round(v3.v, 6) AS factor,
         CAST(fit.n_cells AS BIGINT) AS n_cells,
         round(sqrt(CAST(fit.seq AS DOUBLE) / 1e6 / fit.n_cells), 6)
           AS rmse
       FROM v3 CROSS JOIN fit
       ORDER BY factor DESC, l_partkey ASC LIMIT 20"""
  }

  /** Rank-2 ALS replay: 2 unrolled half-step pairs, each a 2×2 ridge
    * solve from 1e-9-quantized HUGEINT moments — the same closed-form
    * det/adjugate expressions as [[graft.operators.Factorize.alsRank2]]. */
  private def alsRank2Oracle: String = {
    val L = "CAST(0.1 AS DOUBLE)"
    def half(tag: String, gTbl: String, inKey: String,
             outKey: String): String =
      s"""a$tag AS (
           SELECT r.$outKey AS kk,
             sum(CAST(floor(g.f1 * g.f1 * 1e9 + 0.5) AS HUGEINT)) AS s11,
             sum(CAST(floor(g.f1 * g.f2 * 1e9 + 0.5) AS HUGEINT)) AS s12,
             sum(CAST(floor(g.f2 * g.f2 * 1e9 + 0.5) AS HUGEINT)) AS s22,
             sum(CAST(floor(r.r * g.f1 * 1e9 + 0.5) AS HUGEINT)) AS b1,
             sum(CAST(floor(r.r * g.f2 * 1e9 + 0.5) AS HUGEINT)) AS b2
           FROM r JOIN $gTbl g ON r.$inKey = g.kk
           GROUP BY r.$outKey),
         d$tag AS (
           SELECT kk, CAST(s11 AS DOUBLE) / 1e9 + $L AS s11,
             CAST(s12 AS DOUBLE) / 1e9 AS s12,
             CAST(s22 AS DOUBLE) / 1e9 + $L AS s22,
             CAST(b1 AS DOUBLE) / 1e9 AS b1,
             CAST(b2 AS DOUBLE) / 1e9 AS b2
           FROM a$tag),
         $tag AS MATERIALIZED (
           SELECT kk,
             round((s22 * b1 - s12 * b2) / (s11 * s22 - s12 * s12), 12)
               AS f1,
             round((s11 * b2 - s12 * b1) / (s11 * s22 - s12 * s12), 12)
               AS f2
           FROM d$tag)"""
    s"""WITH r AS MATERIALIZED (
         SELECT o.o_custkey AS u, l.l_partkey AS i,
           CAST(sum(l.l_quantity) AS BIGINT) AS r
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY 1, 2),
       v0 AS (SELECT DISTINCT i AS kk, CAST(1.0 AS DOUBLE) AS f1,
           CASE WHEN i % 2 = 0 THEN CAST(1.0 AS DOUBLE)
             ELSE CAST(-1.0 AS DOUBLE) END AS f2
         FROM r),
       ${half("u1", "v0", "i", "u")},
       ${half("v1", "u1", "u", "i")},
       ${half("u2", "v1", "i", "u")},
       ${half("v2", "u2", "u", "i")},
       fit AS (
         SELECT count(*) AS n_cells,
           sum(CAST(floor((r.r - (u2.f1 * v2.f1 + u2.f2 * v2.f2)) *
             (r.r - (u2.f1 * v2.f1 + u2.f2 * v2.f2)) * 1e6 + 0.5)
             AS HUGEINT)) AS seq
         FROM r JOIN u2 ON r.u = u2.kk JOIN v2 ON r.i = v2.kk)
       SELECT v2.kk AS l_partkey, round(v2.f1, 6) AS v1,
         round(v2.f2, 6) AS v2,
         CAST(fit.n_cells AS BIGINT) AS n_cells,
         round(sqrt(CAST(fit.seq AS DOUBLE) / 1e6 / fit.n_cells), 6)
           AS rmse
       FROM v2 CROSS JOIN fit
       ORDER BY v1 DESC, l_partkey ASC LIMIT 20"""
  }

  /** Poisson-trend replay: 3 unrolled Newton steps per key under the
    * 1e-6-quantized moment contract of
    * [[graft.operators.TimeSeries.poissonTrend]]. */
  private def poissonTrendOracle: String = {
    val stepCtes = (1 to 3).map { k =>
      s"""s$k AS (
           SELECT p.k, b.n, b.b0 AS pb0, b.b1 AS pb1,
             sum(CAST(floor((p.y - exp(b.b0 + b.b1 * p.x)) * 1e6 + 0.5)
               AS HUGEINT)) AS g0,
             sum(CAST(floor((p.y - exp(b.b0 + b.b1 * p.x)) * p.x * 1e6
               + 0.5) AS HUGEINT)) AS g1,
             sum(CAST(floor(exp(b.b0 + b.b1 * p.x) * 1e6 + 0.5)
               AS HUGEINT)) AS h00,
             sum(CAST(floor(exp(b.b0 + b.b1 * p.x) * p.x * 1e6 + 0.5)
               AS HUGEINT)) AS h01,
             sum(CAST(floor(exp(b.b0 + b.b1 * p.x) * p.x * p.x * 1e6
               + 0.5) AS HUGEINT)) AS h11
           FROM pts p JOIN beta${k - 1} b ON p.k = b.k
           GROUP BY p.k, b.n, b.b0, b.b1),
         t$k AS (
           SELECT k, n, pb0, pb1,
             CAST(g0 AS DOUBLE) / 1e6 AS g0,
             CAST(g1 AS DOUBLE) / 1e6 AS g1,
             CAST(h00 AS DOUBLE) / 1e6 AS h00,
             CAST(h01 AS DOUBLE) / 1e6 AS h01,
             CAST(h11 AS DOUBLE) / 1e6 AS h11
           FROM s$k),
         beta$k AS MATERIALIZED (
           SELECT k, n,
             round(pb0 + (h11 * g0 - h01 * g1) /
               (h00 * h11 - h01 * h01), 12) AS b0,
             round(pb1 + (h00 * g1 - h01 * g0) /
               (h00 * h11 - h01 * h01), 12) AS b1
           FROM t$k)"""
    }.mkString(",\n        ")
    s"""WITH daily AS (
         SELECT event_type AS k,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
           CAST(count(*) AS DOUBLE) AS y
         FROM events GROUP BY 1, 2),
       x0 AS (SELECT k, min(d) AS d0 FROM daily GROUP BY k),
       pts AS MATERIALIZED (
         SELECT daily.k, CAST(daily.d - x0.d0 AS DOUBLE) AS x, y
         FROM daily JOIN x0 USING (k)),
       beta0 AS (
         SELECT k, count(*) AS n,
           round(ln(sum(y) / count(*)), 12) AS b0,
           CAST(0.0 AS DOUBLE) AS b1
         FROM pts GROUP BY k),
       $stepCtes
       SELECT k AS event_type, CAST(n AS BIGINT) AS n_days,
         round(b0, 6) AS b0, round(b1, 6) AS b1,
         round(exp(b1), 6) AS daily_rate_ratio
       FROM beta3 ORDER BY 1"""
  }

  /** Heaps'-law fit replay over the shared vocab-growth CTE: the same
    * 1e-12-quantized ln-ln OLS moments. */
  private def heapsFitOracle: String =
    s"""WITH g AS ($vocabGrowthOracle),
       pts AS (SELECT ln(CAST(n_tokens_cum AS DOUBLE)) AS x,
           ln(CAST(vocab_cum AS DOUBLE)) AS y
         FROM g WHERE n_tokens_cum > 0 AND vocab_cum > 0),
       a AS (SELECT count(*) AS n,
           sum(CAST(floor(x * 1e12 + 0.5) AS BIGINT)) AS sx,
           sum(CAST(floor(y * 1e12 + 0.5) AS BIGINT)) AS sy,
           sum(CAST(floor(x * y * 1e12 + 0.5) AS BIGINT)) AS sxy,
           sum(CAST(floor(x * x * 1e12 + 0.5) AS BIGINT)) AS sxx,
           sum(CAST(floor(y * y * 1e12 + 0.5) AS BIGINT)) AS syy
         FROM pts),
       b AS (SELECT n, sx / 1e12 AS sx, sy / 1e12 AS sy, sxy / 1e12
           AS sxy, sxx / 1e12 AS sxx, syy / 1e12 AS syy
         FROM a),
       c AS (SELECT n,
           n * sxy - sx * sy AS cov, n * sxx - sx * sx AS varx,
           n * syy - sy * sy AS vary, sx, sy
         FROM b)
       SELECT CAST(n AS BIGINT) AS n_points,
         round(cov / varx, 6) AS beta,
         round(exp((sy - (cov / varx) * sx) / n), 6) AS k,
         CASE WHEN varx > 0 AND vary > 0
           THEN round(cov * cov / (varx * vary), 6) END AS r2
       FROM c"""

  /** Cumulative vocabulary growth replay -- shared by `vocab_growth`
    * and the Heaps'-law fit oracle. */
  private val vocabGrowthOracle: String =
    """WITH n AS (SELECT count(*) AS nd FROM documents),
         d AS (
           SELECT doc_id, list_filter(
             regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS t
           FROM documents),
         toks AS (
           SELECT CAST((doc_id * 10) // nd AS BIGINT) AS decile,
             unnest(t) AS tok
           FROM d CROSS JOIN n),
         perdec AS (SELECT decile, count(*) AS n_toks FROM toks
                    GROUP BY decile),
         firstd AS (SELECT tok, min(decile) AS first_decile FROM toks
                    GROUP BY tok),
         newt AS (SELECT first_decile AS decile, count(*) AS n_new
                  FROM firstd GROUP BY first_decile),
         j AS (
           SELECT p.decile, n_toks, coalesce(n_new, 0) AS n_new
           FROM perdec p LEFT JOIN newt USING (decile))
         SELECT decile,
           CAST(sum(n_toks) OVER (ORDER BY decile) AS BIGINT) AS n_tokens_cum,
           CAST(sum(n_new) OVER (ORDER BY decile) AS BIGINT) AS vocab_cum,
           round(CAST(sum(n_new) OVER (ORDER BY decile) AS DOUBLE)
             / sum(n_toks) OVER (ORDER BY decile), 6) AS type_token_ratio
         FROM j ORDER BY decile"""

  /** RAKE replay: same fragment split / stoplist islands / ≤4-token
    * runs / 1e-6-quantized word scores as
    * [[graft.operators.TextAnalysis.rakeKeywords]]. */
  private def rakeOracle: String = {
    val stops = graft.operators.TextAnalysis.stopwordsEn
      .map(w => s"'$w'").mkString(", ")
    s"""WITH fr AS (
         SELECT doc_id,
           regexp_split_to_array(lower(text), '[^a-z0-9\\s]+') AS frags
         FROM documents),
       f2 AS (
         SELECT doc_id, unnest(generate_series(1, len(frags))) AS frag_idx,
           frags
         FROM fr),
       f3 AS (SELECT doc_id, frag_idx, frags[frag_idx] AS frag FROM f2),
       tk AS (
         SELECT doc_id, frag_idx,
           list_filter(regexp_split_to_array(trim(frag), '\\s+'),
             x -> len(x) > 0) AS ts
         FROM f3),
       tp AS (
         SELECT doc_id, frag_idx,
           unnest(generate_series(1, len(ts))) AS pos1, ts
         FROM tk),
       tw AS (SELECT doc_id, frag_idx, pos1 - 1 AS pos, ts[pos1] AS tok
              FROM tp),
       ctw AS (SELECT * FROM tw WHERE tok NOT IN ($stops)),
       isl AS (
         SELECT doc_id, frag_idx, pos, tok,
           pos - row_number() OVER (PARTITION BY doc_id, frag_idx
             ORDER BY pos) AS island
         FROM ctw),
       ph AS (
         SELECT doc_id, frag_idx, island,
           string_agg(tok, ' ' ORDER BY pos) AS phrase,
           count(*) AS plen
         FROM isl GROUP BY 1, 2, 3),
       ph2 AS (SELECT phrase, plen FROM ph WHERE plen <= 4),
       wrd AS (SELECT unnest(regexp_split_to_array(phrase, ' ')) AS wrd,
                 plen
               FROM ph2),
       ws AS (SELECT wrd,
                CAST(round(sum(plen) * 1e6 / count(*), 0) AS BIGINT)
                  AS scoreq
              FROM wrd GROUP BY wrd),
       pw AS (SELECT phrase, unnest(regexp_split_to_array(phrase, ' '))
                  AS wrd
              FROM (SELECT DISTINCT phrase FROM ph2)),
       psc AS (SELECT phrase, CAST(sum(scoreq) AS BIGINT) AS sq
               FROM pw JOIN ws USING (wrd) GROUP BY phrase),
       pcnt AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
                FROM ph2 GROUP BY phrase)
       SELECT p.phrase, c.n_occurrences, round(p.sq / 1e6, 4) AS score
       FROM psc p JOIN pcnt c USING (phrase)
       ORDER BY score DESC, phrase ASC LIMIT 25"""
  }

  /** TextRank replay: canonical adjacent-content-word pairs,
    * min-count-2 pruned, then the standard 10-iteration quantized
    * PageRank CTE chain (same contract as the source-graph oracle). */
  private def textrankOracle: String = {
    val stops = graft.operators.TextAnalysis.stopwordsEn
      .map(w => s"'$w'").mkString(", ")
    val iterCtes = (1 to 10).map { i =>
      s"""pr$i AS MATERIALIZED (
           SELECT nodes.node,
             round(CAST(0.15 AS DOUBLE) / nn.n +
               0.85 * coalesce(m.inmass, 0.0), 12) AS pr
           FROM nodes CROSS JOIN nn LEFT JOIN (
             SELECT norm.v,
               sum(CAST(round(pr${i - 1}.pr * norm.p * 1e15, 0) AS BIGINT))
                 / 1e15 AS inmass
             FROM norm JOIN pr${i - 1} ON norm.u = pr${i - 1}.node
             GROUP BY norm.v) m ON m.v = nodes.node)"""
    }.mkString(",\n         ")
    s"""WITH content AS (
         SELECT list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
           w -> w NOT IN ($stops)) AS c
         FROM documents),
       rawp AS (
         SELECT unnest(list_transform(generate_series(1, len(c) - 1),
           i -> {'a': least(c[i], c[i + 1]),
                 'b': greatest(c[i], c[i + 1])})) AS p
         FROM content WHERE len(c) >= 2),
       ed AS MATERIALIZED (
         SELECT p.a AS wa, p.b AS wb, CAST(count(*) AS BIGINT) AS w
         FROM rawp WHERE p.a <> p.b GROUP BY 1, 2 HAVING count(*) >= 2),
       sym AS MATERIALIZED (
         SELECT wa AS u, wb AS v, CAST(w AS DOUBLE) AS w FROM ed
         UNION ALL SELECT wb, wa, CAST(w AS DOUBLE) FROM ed),
       outw AS (SELECT u, sum(w) AS wout FROM sym GROUP BY u),
       norm AS MATERIALIZED (
         SELECT sym.u, sym.v, sym.w / outw.wout AS p
         FROM sym JOIN outw USING (u)),
       nodes AS MATERIALIZED (
         SELECT wa AS node FROM ed UNION SELECT wb FROM ed),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS pr
               FROM nodes CROSS JOIN nn),
       $iterCtes
       SELECT node AS word, round(pr, 6) AS textrank
       FROM pr10 ORDER BY textrank DESC, word ASC LIMIT 30"""
  }

  /** Stopword-vote lang-id replay — shared by `lang_id` (per-doc) and
    * `lang_confusion` (matrix vs the labeled column). */
  private val langIdOracle: String =
    """WITH toks AS (
         SELECT doc_id, unnest(list_transform(
           list_filter(regexp_split_to_array(trim(text), '\s+'), x -> len(x) > 0),
           y -> lower(y))) AS tok
         FROM documents),
       hits AS (
         SELECT d.doc_id,
           coalesce(h.de,0) AS de, coalesce(h.en,0) AS en, coalesce(h.es,0) AS es,
           coalesce(h.fr,0) AS fr, coalesce(h.pt,0) AS pt
         FROM documents d LEFT JOIN (
           SELECT doc_id,
             count(CASE WHEN tok IN ('der','die','und','das','ist','nicht','ein','mit','von','zu') THEN 1 END) AS de,
             count(CASE WHEN tok IN ('the','and','of','to','in','is','that','it','for','with') THEN 1 END) AS en,
             count(CASE WHEN tok IN ('el','la','de','que','y','en','un','los','se','por') THEN 1 END) AS es,
             count(CASE WHEN tok IN ('le','la','et','les','des','en','un','du','une','est') THEN 1 END) AS fr,
             count(CASE WHEN tok IN ('o','a','e','de','do','da','em','um','para','com') THEN 1 END) AS pt
           FROM toks GROUP BY doc_id) h ON d.doc_id = h.doc_id)
       SELECT doc_id,
         CASE WHEN greatest(de,en,es,fr,pt) = 0 THEN 'und'
              WHEN de = greatest(de,en,es,fr,pt) THEN 'de'
              WHEN en = greatest(de,en,es,fr,pt) THEN 'en'
              WHEN es = greatest(de,en,es,fr,pt) THEN 'es'
              WHEN fr = greatest(de,en,es,fr,pt) THEN 'fr'
              ELSE 'pt' END AS lang_pred
       FROM hits ORDER BY doc_id"""

  /** Embedding-contamination oracle: replays the SAME per-table bucket
    * expressions as `embLshOracle` over both corpus splits, the
    * distinct train×eval candidate join, the exact round-6 cosine
    * gate, and the per-train-doc rollup. */
  private def embContaminationOracle(dim: Int, nBits: Int, tables: Int,
                                     threshold: Double): String = {
    val planes = graft.operators.Similarity.hyperplanes(dim, nBits * tables)
    val perTable = (0 until tables).map { t =>
      val expr = (0 until nBits).map { i =>
        val p = planes(t * nBits + i)
        s"(CASE WHEN list_dot_product(v, [${p.mkString(",")}]) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS t, $expr AS b FROM base"
    }.mkString(" UNION ALL ")
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        bb AS ($perTable),
        cand AS (
          SELECT DISTINCT tr.vec_id AS train_id, ev.vec_id AS eval_id
          FROM bb tr JOIN bb ev ON tr.t = ev.t AND tr.b = ev.b
          WHERE tr.vec_id % 20 <> 0 AND ev.vec_id % 20 = 0),
        ver AS (
          SELECT train_id, eval_id,
            round(list_dot_product(a.v, e.v) /
              (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(e.v, e.v))), 6)
              AS cos_sim
          FROM cand JOIN base a ON a.vec_id = train_id
          JOIN base e ON e.vec_id = eval_id)
        SELECT train_id, count(*) AS n_eval_hits, max(cos_sim) AS max_cos_sim
        FROM ver WHERE cos_sim >= $threshold
        GROUP BY train_id ORDER BY train_id"""
  }

  /** Multi-table LSH pair oracle: one bucket expression per table over
    * its own plane slice, unioned, joined on (table, bucket), distinct
    * verified pairs. */
  /** The projection oracle replays the same splitmix64 plane constants
    * in SQL — list_dot_product folds elementwise exactly like the
    * VecDotConst kernel. */
  /** Embedding-drift oracle: the hyperplane replay (identical plane
    * constants inlined) unioned per component, then the standard PSI
    * tail — fixed-width bins, ε-clamp, 4-dp rounded sum. */
  private def embDriftPsiOracle(dim: Int, kProj: Int, binWidth: Double): String = {
    val planes = graft.operators.Similarity.hyperplanes(dim, kProj)
    val comps = (0 until kProj).map { j =>
      s"""SELECT vec_id, $j AS comp,
          list_dot_product(v, [${planes(j).mkString(",")}])
            / sqrt($kProj / 3.0) AS x FROM base"""
    }.mkString(" UNION ALL ")
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        proj AS ($comps),
        binned AS (SELECT comp,
            CASE WHEN vec_id % 2 = 0 THEN 'p' ELSE 'q' END AS half,
            CAST(floor(x / $binWidth) AS BIGINT) AS bin FROM proj),
        h AS (SELECT comp, half, bin, count(*) AS n
          FROM binned GROUP BY comp, half, bin),
        tt AS (SELECT comp, half, sum(n) AS tot FROM h GROUP BY comp, half),
        sh AS (SELECT h.comp, h.half, h.bin, CAST(h.n AS DOUBLE) / t.tot AS share
          FROM h JOIN tt t ON t.comp = h.comp AND t.half = h.half),
        hp AS (SELECT comp, bin, share FROM sh WHERE half = 'p'),
        hq AS (SELECT comp, bin, share FROM sh WHERE half = 'q'),
        jj AS (SELECT coalesce(hp.comp, hq.comp) AS comp,
            greatest(coalesce(hp.share, 0.0), 1e-6) AS pc,
            greatest(coalesce(hq.share, 0.0), 1e-6) AS qc
          FROM hp FULL OUTER JOIN hq
            ON hp.comp = hq.comp AND hp.bin = hq.bin)
        SELECT CAST(comp AS INT) AS comp, CAST(count(*) AS BIGINT) AS n_bins,
          round(sum((pc - qc) * ln(pc / qc)), 4) AS psi
        FROM jj GROUP BY comp ORDER BY comp"""
  }

  private def embProjectOracle(dim: Int, k: Int): String = {
    val planes = graft.operators.Similarity.hyperplanes(dim, k)
    val cols = (0 until k).map { j =>
      s"round(list_dot_product(v, [${planes(j).mkString(",")}]) / sqrt($k / 3.0), 6) AS r$j"
    }.mkString(", ")
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT vec_id, $cols FROM base ORDER BY vec_id"""
  }

  private def embLshOracle(dim: Int, nBits: Int, tables: Int): String = {
    val planes = graft.operators.Similarity.hyperplanes(dim, nBits * tables)
    val perTable = (0 until tables).map { t =>
      val expr = (0 until nBits).map { i =>
        val p = planes(t * nBits + i)
        s"(CASE WHEN list_dot_product(v, [${p.mkString(",")}]) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, v, $t AS t, $expr AS b FROM base"
    }.mkString(" UNION ALL ")
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        bb AS ($perTable)
        SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b,
          round(list_dot_product(a.v, c.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))), 6)
            AS cos_sim
        FROM bb a JOIN bb c ON a.t = c.t AND a.b = c.b AND a.vec_id < c.vec_id
        WHERE round(list_dot_product(a.v, c.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))), 6) >= 0.4
        ORDER BY id_a, id_b"""
  }

  /** The LSH top-k oracle reproduces the APPROXIMATE semantics exactly:
    * same per-table buckets, same probes, pruned cosine top-k over the
    * OR of the tables. */
  private def annLshOracle(dim: Int, nBits: Int, probes: Int, tables: Int = 1): String = {
    val planes = graft.operators.Similarity.hyperplanes(dim, nBits * tables)
    val bucketCols = (0 until tables).map { t =>
      val expr = (0 until nBits).map { i =>
        val p = planes(t * nBits + i)
        s"(CASE WHEN list_dot_product(v, [${p.mkString(",")}]) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"$expr AS b$t"
    }.mkString(", ")
    val qCols = (0 until tables).map(t => s"b$t AS qb$t").mkString(", ")
    val cond = (0 until tables).map { t =>
      val targets = (s"qb$t" +:
        (0 until (probes min nBits)).map(b => s"xor(qb$t, ${1L << b})")).mkString(", ")
      s"bb.b$t IN ($targets)"
    }.mkString(" OR ")
    s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        bb AS (SELECT vec_id, v, $bucketCols FROM b),
        q AS (SELECT v AS qv, $qCols FROM bb WHERE vec_id = 0)
        SELECT vec_id,
          round(list_dot_product(v, qv) /
            (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
        FROM bb, q WHERE $cond
        ORDER BY cos_sim DESC, vec_id LIMIT 10"""
  }

  /** CMS replay CTEs: per-key counts under `selSql` (must yield column
    * `k`), the fnv+splitmix hash chain, the d=3/w=1024 bit-field cells,
    * and the summed counter table `${pfx}ctr(r, c, v)` — shared by the
    * point-estimate and inner-product oracles. */
  private def cmsCellsCtes(pfx: String, selSql: String): String =
    s"""${pfx}k AS (SELECT k, count(*) AS cnt FROM ($selSql) GROUP BY k),
       ${pfx}f AS (SELECT k, cnt, ${fnvSql("k")} AS fv FROM ${pfx}k),
       ${pfx}z0 AS (SELECT k, cnt, (fv + 11400714819323198485)
           % 18446744073709551616::HUGEINT AS z0 FROM ${pfx}f),
       ${pfx}z1 AS (SELECT k, cnt, ${mulcSql("xor(z0, z0 // 1073741824)",
             BigInt("BF58476D1CE4E5B9", 16))} AS z1 FROM ${pfx}z0),
       ${pfx}z2 AS (SELECT k, cnt, ${mulcSql("xor(z1, z1 // 134217728)",
             BigInt("94D049BB133111EB", 16))} AS z2 FROM ${pfx}z1),
       ${pfx}hh AS (SELECT k, cnt,
           xor(z2, z2 // 2147483648) AS hv FROM ${pfx}z2),
       ${pfx}cells AS (SELECT k, cnt, rr.r,
           CAST((hv // (CASE rr.r WHEN 0 THEN 1 WHEN 1 THEN 1024
                        ELSE 1048576 END)) % 1024 AS BIGINT) AS c
         FROM ${pfx}hh, (SELECT unnest([0, 1, 2]) AS r) rr),
       ${pfx}ctr AS (SELECT r, c, sum(cnt) AS v
         FROM ${pfx}cells GROUP BY r, c)"""

  /** FNV-1a 64 of a VARCHAR expression in DuckDB: fold the codepoints
    * (ASCII corpus ⇒ identical to JVM UTF-16 code units) through the
    * h = (h xor c) * prime step in HUGEINT with mod-2^64 wraparound.
    * 0xcbf29ce484222325 = 14695981039346656037 (offset basis),
    * 0x100000001b3 = 1099511628211 (prime; < 2^41, so h*prime < 2^105
    * fits HUGEINT with no split multiply). */
  private def fnvSql(tok: String): String =
    s"""list_reduce(
         list_prepend(CAST(14695981039346656037 AS HUGEINT),
           list_transform(generate_series(1, length($tok)),
             i -> CAST(unicode(substr($tok, CAST(i AS INT), 1)) AS HUGEINT))),
         (h, c) -> (xor(h, c) * 1099511628211) % 18446744073709551616::HUGEINT)"""

  /** 64-bit wraparound multiply by a CONSTANT in HUGEINT: split the
    * constant into 32-bit halves so no intermediate exceeds 2^97
    * (a full 64×64 product would overflow the signed 128-bit HUGEINT). */
  private def mulcSql(a: String, b: BigInt): String = {
    val bLo = b & 0xFFFFFFFFL
    val bHi = b >> 32
    s"(($a * $bLo + (($a * $bHi) % 4294967296) * 4294967296) % 18446744073709551616::HUGEINT)"
  }

  /** splitmix64 staged through CTEs (z0..z3), matching
    * graft.functions.SplitMix64.mix bit-for-bit: Java signed wraparound
    * arithmetic is congruent mod 2^64 to this unsigned HUGEINT form,
    * and >>> n on the unsigned value is integer division by 2^n. */
  private def splitmixStagesSql(src: String, idExpr: String, keep: String): String =
    s"""s0 AS (SELECT $keep, (CAST($idExpr AS HUGEINT) + 11400714819323198485)
           % 18446744073709551616::HUGEINT AS z0 FROM $src),
       s1 AS (SELECT $keep, ${mulcSql("xor(z0, z0 // 1073741824)", BigInt("BF58476D1CE4E5B9", 16))} AS z1 FROM s0),
       s2 AS (SELECT $keep, ${mulcSql("xor(z1, z1 // 134217728)", BigInt("94D049BB133111EB", 16))} AS z2 FROM s1),
       s3 AS (SELECT $keep, xor(z2, z2 // 2147483648) // 2048 AS u53 FROM s2)"""

  /** Ranker-eval oracle: replays the BM25 top-5 (same CTEs as
    * [[bm25Oracle]]), the graded term-containment relevance, and the
    * quantized DCG folds — with the log2 rank discounts interpolated
    * from [[graft.operators.Retrieval.ndcgDiscounts]] as literals, since
    * libm log2 is not bit-identical across engines. */
  /** Shared qt→res CTE chain for the ranker-eval oracles
    * (retrieval_ndcg / retrieval_map): BM25 top-5 replay, graded
    * term-containment relevance, the naive id-order baseline, unioned
    * into one (ranker, query_id, rank, id, rel) top-k frame. */
  private def retrievalResCtes: String = {
    val vals = bm25QueryTerms.map { case (q, term) => s"('$q','$term')" }
      .mkString(", ")
    s"""qt(query_id, term) AS (VALUES $vals),
        d AS (
          SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
            x -> len(x) > 0) AS t
          FROM documents),
        lens AS (SELECT doc_id, len(t) AS dl FROM d),
        stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM lens),
        post AS (
          SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(t) AS term FROM d)
          GROUP BY doc_id, term),
        dfs AS (SELECT term, count(*) AS df FROM post GROUP BY term),
        scored AS (
          SELECT q.query_id, p.doc_id,
            round(sum(
              ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5)) *
              ((tf * (1.2 + 1.0)) /
               (tf + 1.2 * (0.25 + 0.75 * dl /
                  (CAST(sumdl AS DOUBLE) / n))))), 4) AS score
          FROM post p
          JOIN qt q USING (term)
          JOIN dfs USING (term)
          JOIN lens l ON p.doc_id = l.doc_id
          CROSS JOIN stats
          GROUP BY q.query_id, p.doc_id),
        ranked AS (
          SELECT query_id, doc_id, score,
            row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS rank
          FROM scored),
        rels AS (
          SELECT q.query_id, p.doc_id AS id, CAST(count(*) AS INT) AS rel
          FROM post p JOIN qt q USING (term)
          GROUP BY 1, 2),
        naive AS (
          SELECT query_id, id,
            row_number() OVER (PARTITION BY query_id ORDER BY id) AS rank
          FROM rels),
        res AS (
          SELECT 'bm25' AS ranker, r.query_id, r.rank, r.doc_id AS id,
            coalesce(rel, 0) AS rel
          FROM ranked r
          LEFT JOIN rels ON r.query_id = rels.query_id AND r.doc_id = rels.id
          WHERE r.rank <= 5
          UNION ALL
          SELECT 'id_order' AS ranker, n.query_id, n.rank, n.id,
            coalesce(rel, 0) AS rel
          FROM naive n
          LEFT JOIN rels ON n.query_id = rels.query_id AND n.id = rels.id
          WHERE n.rank <= 5)"""
  }

  private def retrievalNdcgOracle: String = {
    val disc = graft.operators.Retrieval.ndcgDiscounts(5)
    def discSql(rc: String) = "CASE " + disc.zipWithIndex
      .map { case (d, i) => s"WHEN $rc = ${i + 1} THEN $d" }
      .mkString(" ") + " END"
    def contribSql(relc: String, rankc: String) =
      s"""CAST(floor(CAST((1 << $relc) - 1 AS DOUBLE) /
         (${discSql(rankc)}) * 1e12 + 0.5) AS BIGINT)"""
    s"""WITH $retrievalResCtes,
        got AS (
          SELECT ranker, query_id, sum(${contribSql("rel", "rank")}) AS dcg_q,
            min(CASE WHEN rel > 0 THEN rank END) AS first_rel,
            CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
          FROM res GROUP BY ranker, query_id),
        ideal0 AS (
          SELECT query_id, rel,
            row_number() OVER (PARTITION BY query_id
              ORDER BY rel DESC, id) AS irank
          FROM rels WHERE rel > 0),
        ideal AS (
          SELECT query_id, sum(${contribSql("rel", "irank")}) AS idcg_q
          FROM ideal0 WHERE irank <= 5 GROUP BY query_id)
        SELECT ranker, g.query_id,
          CASE WHEN idcg_q > 0
            THEN round(CAST(dcg_q AS DOUBLE) / CAST(idcg_q AS DOUBLE), 6)
          END AS ndcg,
          CASE WHEN first_rel IS NOT NULL
            THEN round(1.0 / first_rel, 6) END AS mrr,
          round(CAST(n_rel AS DOUBLE) / 5, 6) AS p_at_k
        FROM got g LEFT JOIN ideal USING (query_id)
        ORDER BY ranker, query_id"""
  }

  /** MAP oracle: the same qt→res frame, per-position precision terms
    * quantized at 1e-12, AP = Σterms / min(R, k). */
  private def retrievalMapOracle: String =
    s"""WITH $retrievalResCtes,
        cum AS (
          SELECT ranker, query_id, rank,
            CASE WHEN rel > 0 THEN 1 ELSE 0 END AS rel01,
            sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) OVER (
              PARTITION BY ranker, query_id ORDER BY rank
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM res),
        gotm AS (
          SELECT ranker, query_id,
            CAST(sum(CASE WHEN rel01 = 1 THEN
              CAST(floor(CAST(cum AS DOUBLE) / rank * 1e12 + 0.5)
                AS BIGINT) ELSE 0 END) AS BIGINT) AS tsum,
            CAST(sum(rel01) AS BIGINT) AS n_rel_topk
          FROM cum GROUP BY 1, 2),
        tots AS (
          SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel_total
          FROM rels WHERE rel > 0 GROUP BY 1)
        SELECT ranker, g.query_id, n_rel_topk,
          coalesce(n_rel_total, 0) AS n_rel_total,
          CASE WHEN coalesce(n_rel_total, 0) > 0 THEN
            round(CAST(tsum AS DOUBLE) / 1e12 /
              least(n_rel_total, 5), 6)
          END AS ap
        FROM gotm g LEFT JOIN tots ON tots.query_id = g.query_id
        ORDER BY ranker, g.query_id"""

  /** EWMA control-chart oracle: exact integer μ/σ moments + the
    * recursive z/w/alarm fold, every constant interpolated from the
    * SAME Scala doubles the engine plan bakes in. */
  private def ewmaOracle: String = {
    val lambda = 0.2; val l = 3.0
    def d(x: Double) = s"CAST($x AS DOUBLE)"
    val lam = d(lambda); val nl = d(1.0 - lambda)
    val w2 = d((1.0 - lambda) * (1.0 - lambda))
    val f = d(lambda / (2.0 - lambda))
    def limit(w: String) = s"${d(l)} * m.sigma * sqrt($f * (1.0 - $w))"
    val z1 = s"$lam * x.x + $nl * e.z"
    s"""WITH RECURSIVE daily AS (
         SELECT event_type AS k, CAST(ts AS DATE) AS d, count(*) AS c
         FROM events GROUP BY 1, 2),
       seqd AS MATERIALIZED (
         SELECT k, CAST(c AS DOUBLE) AS x,
           row_number() OVER (PARTITION BY k ORDER BY d) AS i
         FROM daily),
       st AS (
         SELECT k, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
         FROM daily GROUP BY k),
       ms AS (
         SELECT k, n_days, CAST(s1 AS DOUBLE) / n_days AS mu,
           sqrt(greatest(CAST(s2 AS DOUBLE) / n_days -
             (CAST(s1 AS DOUBLE) / n_days) * (CAST(s1 AS DOUBLE) / n_days),
             0.0)) AS sigma
         FROM st),
       ew AS (
         SELECT x.k, 1 AS i, x.x AS z, $w2 AS w,
           CASE WHEN abs(x.x - m.mu) > ${limit(w2)}
             THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS na,
           CASE WHEN abs(x.x - m.mu) > ${limit(w2)} THEN 1 END AS fa
         FROM seqd x JOIN ms m ON m.k = x.k WHERE x.i = 1
         UNION ALL
         SELECT e.k, e.i + 1, $z1, e.w * $w2,
           e.na + CASE WHEN abs(($z1) - m.mu) > ${limit(s"e.w * $w2")}
             THEN 1 ELSE 0 END,
           coalesce(e.fa,
             CASE WHEN abs(($z1) - m.mu) > ${limit(s"e.w * $w2")}
               THEN e.i + 1 END)
         FROM ew e
         JOIN seqd x ON x.k = e.k AND x.i = e.i + 1
         JOIN ms m ON m.k = e.k),
       fin AS (
         SELECT e.* FROM ew e JOIN ms ON ms.k = e.k AND e.i = ms.n_days)
       SELECT ms.k AS event_type, ms.n_days,
         round(ms.mu, 4) AS mean, round(ms.sigma, 4) AS sigma,
         round(f.z, 4) AS ewma_final, CAST(f.na AS BIGINT) AS n_alarms,
         CAST(f.fa AS INT) AS first_alarm_i
       FROM ms LEFT JOIN fin f ON f.k = ms.k ORDER BY 1"""
  }

  /** Davies–Bouldin oracle: det-k-means replay, rank-1 assignment
    * distances quantized at 1e-9 per cell, centroid pair separations
    * from the final centroid CTE, R_i = max ratio, index = mean. */
  private def daviesBouldinOracle: String =
    s"""WITH ${detKmeansCtes(dim = 64, k = 8, iters = 2, where = "")},
        r1 AS (SELECT vec_id, cell, s FROM (
            SELECT vec_id, cell, s, row_number() OVER
              (PARTITION BY vec_id ORDER BY s, cell) AS rk FROM sf)
          WHERE rk = 1),
        dd AS (SELECT r1.cell,
            sqrt(greatest(list_dot_product(e.v, e.v) + r1.s, 0.0)) AS d
          FROM r1 JOIN e USING (vec_id)),
        pc AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
            CAST(sum(CAST(floor(d * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sd
          FROM dd GROUP BY cell),
        sc AS (SELECT cell, n_vecs,
            CAST(sd AS DOUBLE) / 1e9 / n_vecs AS scatter FROM pc),
        cd AS (SELECT * FROM (
            SELECT a.cell AS ci, b.cell AS cj,
              sqrt(greatest(list_dot_product(a.cv, a.cv) +
                list_dot_product(b.cv, b.cv) -
                2.0 * list_dot_product(a.cv, b.cv), 0.0)) AS m
            FROM c2 a JOIN c2 b ON a.cell <> b.cell)
          WHERE m > 0),
        rt AS (SELECT si.cell, si.n_vecs, si.scatter,
            CAST(floor(max((si.scatter + sj.scatter) / cd.m) * 1e9 + 0.5)
              AS BIGINT) AS rq
          FROM sc si JOIN cd ON cd.ci = si.cell
          JOIN sc sj ON sj.cell = cd.cj
          GROUP BY si.cell, si.n_vecs, si.scatter),
        tot AS (SELECT round(CAST(sum(rq) AS DOUBLE) / 1e9 / count(*), 6)
            AS db_index FROM rt)
        SELECT CAST(cell AS INT) AS cell, n_vecs,
          round(scatter, 6) AS scatter,
          round(CAST(rq AS DOUBLE) / 1e9, 6) AS r_i,
          (SELECT db_index FROM tot) AS db_index
        FROM rt ORDER BY cell"""

  /** Poisson-bootstrap oracle: replays the splitmix64 draw per
    * (unit, replicate), the SAME integer Poisson(1) CDF thresholds the
    * Spark expression compares against (interpolated from
    * [[graft.operators.Metrics.poissonThresholds]] so the constants
    * cannot drift), the long/long replicate means, and the exact
    * nearest-rank CI order statistics. */
  private def bootstrapOracle: String = {
    val wSql = graft.operators.Metrics.poissonThresholds
      .map(t => s"(CASE WHEN u53 >= $t THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH uu AS (
         SELECT event_type AS g, user_id AS id,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
         FROM events GROUP BY 1, 2),
       rr AS (
         SELECT g, id, cents, unnest(generate_series(0, 63)) AS r FROM uu),
       ${splitmixStagesSql("rr", "id * 64 + r + 1", "g, cents, r")},
       w AS (SELECT g, r, cents, $wSql AS w FROM s3),
       rm AS (SELECT g, r, CAST(sum(w * cents) AS BIGINT) AS swx,
         CAST(sum(w) AS BIGINT) AS sw FROM w GROUP BY g, r),
       m AS (SELECT g, CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) AS m
         FROM rm WHERE sw > 0),
       ci AS (SELECT g, CAST(count(*) AS BIGINT) AS n_rep,
         list_sort(list(m)) AS ms FROM m GROUP BY g),
       pt AS (SELECT g, CAST(count(*) AS BIGINT) AS n_units,
         CAST(sum(cents) AS BIGINT) AS tc FROM uu GROUP BY g)
       SELECT pt.g AS event_type, n_units,
         round(CAST(tc AS DOUBLE) / CAST(n_units AS DOUBLE) / 100.0, 4)
           AS mean_v,
         n_rep,
         round(ms[CAST(ceil(n_rep * 0.025) AS INT)] / 100.0, 4) AS ci_lo,
         round(ms[CAST(ceil(n_rep * 0.975) AS INT)] / 100.0, 4) AS ci_hi
       FROM pt JOIN ci ON pt.g = ci.g ORDER BY event_type"""
  }

  /** FIM oracle: two independent splitmix64 chains (ids 2k+1 / 2k+2),
    * pivot arithmetic in HUGEINT, PSM re-render with the same
    * character-based substr on both engines. */
  private def fimOracle: String = {
    val chainA = splitmixStagesSql("documents", "doc_id * 2 + 1", "doc_id")
      .replaceAll("\\bs([0-3])\\b", "fa$1")
    val chainB = splitmixStagesSql("documents", "doc_id * 2 + 2", "doc_id")
      .replaceAll("\\bs([0-3])\\b", "fb$1")
    s"""WITH $chainA,
        $chainB,
        base AS (
          SELECT d.doc_id, d.text, CAST(length(d.text) AS BIGINT) AS n,
            greatest(length(d.text) // 3, 1) AS third,
            a.u53 AS ua, b.u53 AS ub
          FROM documents d
          JOIN fa3 a USING (doc_id) JOIN fb3 b USING (doc_id)),
        pv AS (
          SELECT doc_id, text, n,
            CASE WHEN n >= 20 THEN CAST(ua % third + 1 AS BIGINT) END AS p1,
            CASE WHEN n >= 20
              THEN CAST(ua % third + ub % third + 2 AS BIGINT) END AS p2
          FROM base)
        SELECT doc_id, n AS n_chars, p1, p2,
          CASE WHEN p1 IS NOT NULL THEN
            '<|fim_prefix|>' || substr(text, 1, CAST(p1 AS INT)) ||
            '<|fim_suffix|>' || substr(text, CAST(p2 + 1 AS INT)) ||
            '<|fim_middle|>' ||
              substr(text, CAST(p1 + 1 AS INT), CAST(p2 - p1 AS INT))
          ELSE text END AS fim_text
        FROM pv ORDER BY doc_id"""
  }

  private def sampleOracle: String = {
    import graft.operators.Sampling.thresholdFor
    val cases = sampleRates.toSeq.sorted.map { case (lang, r) =>
      s"WHEN '$lang' THEN ${thresholdFor(r)}"
    }.mkString(" ")
    s"""WITH ${splitmixStagesSql("documents", "doc_id", "doc_id, lang")}
        SELECT doc_id, lang FROM s3
        WHERE u53 < CASE lang $cases ELSE ${thresholdFor(sampleDefaultRate)} END
        ORDER BY doc_id"""
  }

  /** SimHash pairs oracle: recompute every token's FNV-1a hash, the
    * per-bit votes, and the 64-bit signature (as two 32-bit halves so
    * xor/bit_count run on plain BIGINTs), then emit ALL pairs with
    * hamming <= 3 — by pigeonhole over the 4×16-bit blocks this is
    * exactly the Spark query's block-bucketed candidate set. */
  private def simhashOracle: String =
    s"""WITH toks AS (
          SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
            x -> len(x) > 0)) AS tok
          FROM documents),
        th AS (SELECT doc_id, ${fnvSql("tok")} AS h FROM toks),
        bits AS (
          SELECT doc_id, b,
            sum(CASE WHEN (h // CAST(power(2.0, b) AS HUGEINT)) % 2 = 1
                THEN 1 ELSE -1 END) AS vote
          FROM th, (SELECT unnest(generate_series(0, 63)) AS b) bb
          GROUP BY doc_id, b),
        sig AS (
          SELECT doc_id,
            CAST(sum(CASE WHEN vote > 0 AND b < 32
              THEN CAST(power(2.0, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS lo,
            CAST(sum(CASE WHEN vote > 0 AND b >= 32
              THEN CAST(power(2.0, b - 32) AS BIGINT) ELSE 0 END) AS BIGINT) AS hi
          FROM bits GROUP BY doc_id),
        s2 AS (
          SELECT d.doc_id, coalesce(g.lo, 0) AS lo, coalesce(g.hi, 0) AS hi
          FROM documents d LEFT JOIN sig g ON d.doc_id = g.doc_id)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT) AS hamming
        FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
        ORDER BY id_a, id_b"""

  /** Rolling-hash fingerprint oracle: per-token FNV-1a, folded in token
    * order through h = h*31 + fnv(tok) (mod 2^64), then mapped to the
    * signed two's-complement BIGINT Spark reports. */
  private def fingerprintOracle: String =
    s"""WITH toks AS (
          SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
            x -> len(x) > 0) AS t
          FROM documents),
        fps AS (
          SELECT doc_id, list_reduce(
            list_prepend(CAST(14695981039346656037 AS HUGEINT),
              list_transform(t, tok -> ${fnvSql("tok")})),
            (acc, f) -> (acc * 31 + f) % 18446744073709551616::HUGEINT) AS fp
          FROM toks)
        SELECT doc_id,
          CAST(CASE WHEN fp >= 9223372036854775808::HUGEINT
            THEN fp - 18446744073709551616::HUGEINT ELSE fp END AS BIGINT) AS fp
        FROM fps ORDER BY doc_id"""

  /** The synthesized PII text, reconstructed in SQL (same schedules). */
  private val piiTextSql: String =
    """text ||
       CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
       CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || CAST(doc_id % 250 AS VARCHAR) || '.0.' || CAST(doc_id % 200 AS VARCHAR) ELSE '' END ||
       CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567' ELSE '' END ||
       CASE WHEN doc_id % 11 = 0 THEN ' card 4111 1111 1111 1111' ELSE '' END"""

  private def piiOracle: String = {
    import graft.operators.Pii
    s"""WITH p AS (SELECT doc_id, $piiTextSql AS text FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '${Pii.EmailRe}')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(text, '${Pii.Ipv4Re}')) AS BIGINT) AS n_ips,
          CAST(len(regexp_extract_all(text, '${Pii.PhoneRe}')) AS BIGINT) AS n_phones,
          CAST(len(regexp_extract_all(text, '${Pii.CardRe}')) AS BIGINT) AS n_cards,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
            '${Pii.CardRe}', '<CARD>', 'g'),
            '${Pii.PhoneRe}', '<PHONE>', 'g'),
            '${Pii.EmailRe}', '<EMAIL>', 'g'),
            '${Pii.Ipv4Re}', '<IP>', 'g') AS redacted
        FROM p ORDER BY doc_id"""
  }

  private val contaminationOracle: String =
    """WITH toks AS (
         SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
           x -> len(x) > 0) AS t FROM documents),
       sh0 AS (
         SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
         FROM toks),
       shAll AS (
         SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
         FROM sh0),
       ev AS (SELECT doc_id AS eval_id, shingle FROM shAll WHERE doc_id % 50 = 0),
       tr AS (SELECT doc_id AS train_id, shingle FROM shAll WHERE doc_id % 50 <> 0),
       evsz AS (SELECT eval_id, count(*) AS eval_n FROM ev GROUP BY eval_id),
       ov AS (
         SELECT train_id, eval_id, count(*) AS n_overlap
         FROM tr JOIN ev USING (shingle)
         GROUP BY train_id, eval_id HAVING count(*) >= 2)
       SELECT train_id, eval_id, n_overlap,
         round(CAST(n_overlap AS DOUBLE) / eval_n, 4) AS overlap_ratio
       FROM ov JOIN evsz USING (eval_id)
       ORDER BY train_id, eval_id"""

  /** Exact cosine pair relation (threshold 0.4) over the embeddings —
    * shared by `dedup_embedding_pairs` (direct) and `semantic_dedup`
    * (as the edge set under the transitive closure). `where` restricts
    * the corpus — the EXACT-ANCHOR queries run on the deterministic
    * even-id half so their O(n²) compare work doesn't dominate the
    * bench while the production variants carry the full corpus; the
    * full-corpus exact relation itself stays oracled via
    * `dedup_embedding_pairs`. */
  private def embPairsSqlW(where: String): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings $where)
       SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(a.v, b.v) /
           (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
       FROM e a JOIN e b ON a.vec_id < b.vec_id
       WHERE round(list_dot_product(a.v, b.v) /
           (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4"""
  private val embPairsSql: String = embPairsSqlW("")
  private val halfWhere = "WHERE vec_id % 2 = 0"

  /** semantic_dedup's Spark side is exact by construction (all-cells
    * probe), so its oracle is the brute-force pair relation plus the
    * same recursive transitive closure dedup_clusters uses. */
  private def semanticDedupOracle: String =
    s"""WITH RECURSIVE
        pairs AS (SELECT id_a, id_b FROM (${embPairsSqlW(halfWhere)})),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (
          SELECT DISTINCT u, u FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        comp AS (SELECT u AS vec_id, min(v) AS cluster_id FROM reach GROUP BY u)
        SELECT vec_id, cluster_id,
          CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
        FROM comp ORDER BY vec_id"""

  /** Replays qAnnRecall's pruned-vs-brute measurement: identical bucket
    * CASE expressions, probe expansion, rounded-cosine top-k ordering,
    * and single-division ratios. */
  private def annRecallOracle(dim: Int, nBits: Int, probes: Int,
                              tables: Int, k: Int): String = {
    val planes = graft.operators.Similarity.hyperplanes(dim, nBits * tables)
    val bucketCols = (0 until tables).map { t =>
      val expr = (0 until nBits).map { i =>
        val p = planes(t * nBits + i)
        s"(CASE WHEN list_dot_product(v, [${p.mkString(",")}]) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"$expr AS b$t"
    }.mkString(", ")
    val qCols = (0 until tables).map(t => s"b$t AS qb$t").mkString(", ")
    val cond = (0 until tables).map { t =>
      val targets = (s"qb$t" +:
        (0 until (probes min nBits)).map(b => s"xor(qb$t, ${1L << b})")).mkString(", ")
      s"bb.b$t IN ($targets)"
    }.mkString(" OR ")
    val cos = """round(list_dot_product(v, qv) /
            (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6)"""
    s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        bb AS (SELECT vec_id, v, $bucketCols FROM b),
        q AS (SELECT v AS qv, $qCols FROM bb WHERE vec_id = 0),
        cand AS (SELECT vec_id, v, qv FROM bb, q WHERE $cond),
        brute AS (SELECT vec_id FROM (
          SELECT vec_id, $cos AS cs FROM bb, q
          ORDER BY cs DESC, vec_id LIMIT $k)),
        pruned AS (SELECT vec_id FROM (
          SELECT vec_id, $cos AS cs FROM cand
          ORDER BY cs DESC, vec_id LIMIT $k)),
        scan AS (SELECT (SELECT count(*) FROM cand) AS n_scanned,
                        (SELECT count(*) FROM embeddings) AS n_total),
        hits AS (SELECT count(*) AS n_hits FROM brute JOIN pruned USING (vec_id))
        SELECT $k AS k, n_scanned, n_total, n_hits,
          CAST(n_scanned AS DOUBLE) / n_total AS scanned_fraction,
          CAST(n_hits AS DOUBLE) / $k AS recall_at_k
        FROM scan, hits"""
  }

  /** Replays qKnnLabelVoteLsh: identical splitmix64 hyperplanes (as
    * literals — they are data-independent), per-table bucket CASE sums,
    * OR-collision candidate join, rounded-cosine rank, and the two
    * tie-broken row_number passes. */
  private def knnLshOracle(dim: Int, nBits: Int, tables: Int, k: Int): String = {
    val planes = graft.operators.Similarity.hyperplanes(dim, nBits * tables)
    val bucketCols = (0 until tables).map { t =>
      val expr = (0 until nBits).map { i =>
        val p = planes(t * nBits + i)
        s"(CASE WHEN list_dot_product(v, [${p.mkString(",")}]) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"$expr AS b$t"
    }.mkString(", ")
    val collide = (0 until tables).map(t => s"a.b$t = c.b$t").mkString(" OR ")
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        bb AS (SELECT vec_id, label, v, $bucketCols FROM e),
        cand AS (
          SELECT a.vec_id AS id_a, c.vec_id AS id_b,
            round(list_dot_product(a.v, c.v) /
              (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cs
          FROM bb a JOIN bb c ON a.vec_id < c.vec_id AND ($collide)),
        nb AS (SELECT id_a AS id, id_b AS nb, cs FROM cand
               UNION ALL SELECT id_b, id_a, cs FROM cand),
        r AS (SELECT *, row_number() OVER
            (PARTITION BY id ORDER BY cs DESC, nb ASC) AS rn FROM nb),
        votes AS (SELECT r.id, e2.label AS nb_label, count(*) AS n_votes
          FROM r JOIN e e2 ON e2.vec_id = r.nb WHERE rn <= $k GROUP BY r.id, e2.label),
        best AS (SELECT *, row_number() OVER
            (PARTITION BY id ORDER BY n_votes DESC, nb_label ASC) AS vr FROM votes)
        SELECT e.vec_id, e.label, best.nb_label AS pred_label,
          CAST(best.n_votes AS BIGINT) AS n_votes
        FROM e JOIN best ON best.id = e.vec_id AND best.vr = 1
        ORDER BY e.vec_id"""
  }

  /** Replays qSemanticDedupNprobe END-TO-END, Lloyd iterations
    * included: the deterministic k-means does all aggregation in exact
    * fixed-point integer arithmetic (order-independent), so unrolling
    * `iters` assignment+mean rounds in SQL lands on bit-identical
    * centroids, and from there the identical home/probe cells,
    * candidate pairs, and recall. This is the trick that makes an
    * APPROXIMATE production path fully correctness-visible. */
  /** WITH-body CTE chain for the deterministic k-means replay: `e`
    * (vectors + fixed-point coords under `where`), `c0..c$iters`
    * (Lloyd rounds — scores vs c$i, argmin cell with (score, cell)
    * tie-break, exact integer per-position sums, centroid =
    * sx/(n·1e6); empty cells keep the previous centroid), and `sf`
    * (final per-(vector, cell) scores vs c$iters). Shared by every
    * oracle that rides the deterministic centroids. */
  private def detKmeansCtes(dim: Int, k: Int, iters: Int, where: String): String =
    detKmeansCtesPfx("", lo = 1, dim = dim, k = k, iters = iters, where = where)

  /** Prefixed/sliced variant of the deterministic-k-means CTE replay:
    * runs the identical fixed-point Lloyd over `embedding[lo, lo+dim-1]`
    * with every CTE name prefixed — multiple independent builds (the
    * coarse IVF quantizer + m PQ subspace codebooks) can coexist in one
    * WITH clause. `pfx=""` + full-dim slice is semantically identical
    * to the original CTEs (list_slice over the whole list is elided),
    * so the pre-existing oracles are unchanged. */
  private def detKmeansCtesPfx(pfx: String, lo: Int, dim: Int, k: Int,
                               iters: Int, where: String): String = {
    val vexpr =
      if (lo == 1 && dim == 64) "CAST(embedding AS DOUBLE[])"
      else s"list_slice(CAST(embedding AS DOUBLE[]), $lo, ${lo + dim - 1})"
    def round_(i: Int): String =
      s"""${pfx}s$i AS (SELECT e.vec_id, c.cell,
            list_dot_product(c.cv, c.cv) - 2*list_dot_product(e.v, c.cv) AS s
          FROM ${pfx}e e, ${pfx}c$i c),
        ${pfx}a$i AS (SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER
              (PARTITION BY vec_id ORDER BY s, cell) AS rk FROM ${pfx}s$i)
          WHERE rk = 1),
        ${pfx}m$i AS (SELECT cell, i, sum(sv[i]) AS sx, count(*) AS n FROM (
            SELECT cell, sv, unnest(generate_series(1, $dim)) AS i
            FROM ${pfx}a$i JOIN ${pfx}e USING (vec_id))
          GROUP BY cell, i),
        ${pfx}c${i + 1} AS (SELECT ${pfx}c$i.cell, coalesce(u.cv, ${pfx}c$i.cv) AS cv
          FROM ${pfx}c$i LEFT JOIN (
            SELECT cell, list(CAST(sx AS DOUBLE)/(CAST(n AS DOUBLE)*1000000) ORDER BY i) AS cv
            FROM ${pfx}m$i GROUP BY cell) u USING (cell))"""
    val rounds = (0 until iters).map(round_).mkString(",\n        ")
    s"""${pfx}e AS (SELECT vec_id,
          $vexpr AS v,
          list_transform($vexpr,
            x -> CAST(floor(x*1000000 + 0.5) AS BIGINT)) AS sv
          FROM embeddings $where),
        ${pfx}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
            list_transform(sv, x -> CAST(x AS DOUBLE)/1000000) AS cv
          FROM (SELECT vec_id, sv FROM ${pfx}e ORDER BY vec_id LIMIT $k)),
        $rounds,
        ${pfx}sf AS (SELECT e.vec_id, c.cell,
            list_dot_product(c.cv, c.cv) - 2*list_dot_product(e.v, c.cv) AS s
          FROM ${pfx}e e, ${pfx}c$iters c)"""
  }

  /** PQ-encode oracle: m independent sliced det-k-means replays; per
    * vector the (s, cell)-tie-broken nearest codeword per subspace and
    * the left-assoc distortion sum (‖x_s‖² + s_s summed in subspace
    * order — the identical FP sequence to the Spark side). */
  private def pqEncodeOracle(m: Int, k: Int, iters: Int): String = {
    val sub = 64 / m
    val ctes = (0 until m).map(s =>
      detKmeansCtesPfx(s"p${s}_", s * sub + 1, sub, k, iters, ""))
      .mkString(",\n        ")
    val pcs = (0 until m).map(s =>
      s"""pc$s AS (SELECT vec_id, cell, s FROM (
            SELECT vec_id, cell, s, row_number() OVER
              (PARTITION BY vec_id ORDER BY s, cell) AS rk FROM p${s}_sf)
          WHERE rk = 1)""").mkString(",\n        ")
    val nrm = (0 until m).map(s =>
      s"n$s AS (SELECT vec_id, list_dot_product(v, v) AS vv FROM p${s}_e)")
      .mkString(",\n        ")
    val codeCols = (0 until m).map(s => s"CAST(pc$s.cell AS INT) AS code_$s")
      .mkString(", ")
    val distExpr = (0 until m).map(s => s"(n$s.vv + pc$s.s)").mkString(" + ")
    val joins = ((1 until m).map(s => s"JOIN pc$s USING (vec_id)") ++
      (0 until m).map(s => s"JOIN n$s USING (vec_id)")).mkString(" ")
    s"""WITH $ctes,
        $pcs,
        $nrm
        SELECT pc0.vec_id, $codeCols, round($distExpr, 6) AS distortion
        FROM pc0 $joins ORDER BY pc0.vec_id"""
  }

  /** IVF-PQ oracle: coarse det-k-means (prefix g) + m subspace builds,
    * per-query nprobe cells, ADC = Σ_s LUT(q, s, code_s) over the
    * candidate cells' members, rank on (rounded adc, vec_id). */
  private def annIvfPqOracle(coarseK: Int, coarseIters: Int, m: Int, k: Int,
                             iters: Int, nprobe: Int, topK: Int,
                             mod: Int): String = {
    val sub = 64 / m
    val coarseCtes = detKmeansCtesPfx("g", 1, 64, coarseK, coarseIters, "")
    val subCtes = (0 until m).map(s =>
      detKmeansCtesPfx(s"p${s}_", s * sub + 1, sub, k, iters, ""))
      .mkString(",\n        ")
    val pcs = (0 until m).map(s =>
      s"""pc$s AS (SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER
              (PARTITION BY vec_id ORDER BY s, cell) AS rk FROM p${s}_sf)
          WHERE rk = 1)""").mkString(",\n        ")
    val codesUnion = (0 until m).map(s =>
      s"SELECT vec_id, $s AS sub, cell AS code FROM pc$s")
      .mkString(" UNION ALL ")
    val cbUnion = (0 until m).map(s =>
      s"SELECT $s AS sub, cell AS code, cv FROM p${s}_c$iters")
      .mkString(" UNION ALL ")
    s"""WITH $coarseCtes,
        $subCtes,
        $pcs,
        grk AS (SELECT vec_id, cell, row_number() OVER
            (PARTITION BY vec_id ORDER BY s, cell) AS rk FROM gsf),
        ghome AS (SELECT vec_id, cell FROM grk WHERE rk = 1),
        gprobe AS (SELECT vec_id AS q_id, cell FROM grk
          WHERE rk <= $nprobe AND vec_id % $mod = 0),
        codes AS ($codesUnion),
        cb AS ($cbUnion),
        q AS (SELECT vec_id AS q_id, v FROM ge WHERE vec_id % $mod = 0),
        lut AS (SELECT q.q_id, cb.sub, cb.code,
            list_sum(list_transform(generate_series(1, $sub),
              i -> (q.v[cb.sub*$sub + i] - cb.cv[i]) *
                   (q.v[cb.sub*$sub + i] - cb.cv[i]))) AS d2
          FROM q, cb),
        cand AS (SELECT gp.q_id, h.vec_id
          FROM gprobe gp JOIN ghome h USING (cell)),
        adc AS (SELECT c.q_id, c.vec_id, round(sum(l.d2), 6) AS adc_dist2
          FROM cand c JOIN codes co ON co.vec_id = c.vec_id
          JOIN lut l ON l.q_id = c.q_id AND l.sub = co.sub AND l.code = co.code
          GROUP BY c.q_id, c.vec_id),
        rk AS (SELECT q_id, vec_id, adc_dist2, row_number() OVER
            (PARTITION BY q_id ORDER BY adc_dist2, vec_id) AS rnk FROM adc)
        SELECT q_id, vec_id, adc_dist2, CAST(rnk AS INT) AS rnk
        FROM rk WHERE rnk <= $topK ORDER BY q_id, rnk"""
  }

  private def semanticNprobeOracle(dim: Int, k: Int, iters: Int,
                                   nprobe: Int, threshold: Double): String = {
    val cos = """round(list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)"""
    s"""WITH ${detKmeansCtes(dim, k, iters, halfWhere)},
        rnk AS (SELECT vec_id, cell, row_number() OVER
            (PARTITION BY vec_id ORDER BY s, cell) AS rk FROM sf),
        home AS (SELECT vec_id AS h_id, cell FROM rnk WHERE rk = 1),
        probes AS (SELECT vec_id AS p_id, cell FROM rnk WHERE rk <= $nprobe),
        cand AS (SELECT DISTINCT least(h_id, p_id) AS id_a, greatest(h_id, p_id) AS id_b
          FROM home JOIN probes USING (cell) WHERE h_id <> p_id),
        npairs AS (SELECT id_a, id_b FROM cand
          JOIN e a ON a.vec_id = cand.id_a JOIN e b ON b.vec_id = cand.id_b
          WHERE $cos >= $threshold),
        exact AS (SELECT id_a, id_b FROM (${embPairsSqlW(halfWhere)})),
        hits AS (SELECT id_a, id_b FROM npairs JOIN exact USING (id_a, id_b))
        SELECT $k AS k, $nprobe AS nprobe,
          (SELECT count(*) FROM npairs) AS n_pairs,
          (SELECT count(*) FROM exact) AS n_exact,
          (SELECT count(*) FROM hits) AS n_hits,
          CAST((SELECT count(*) FROM hits) AS DOUBLE) /
            NULLIF((SELECT count(*) FROM exact), 0) AS recall"""
  }

  /** CDC replay: per-token FNV-1a (HUGEINT fold), boundary = low 3 bits
    * zero, chunk id = running boundary count over PRECEDING tokens,
    * then the segment_dedup first-occurrence rank over chunk texts. */
  private def cdcDedupOracle: String =
    s"""WITH d AS (
          SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
            x -> len(x) > 0) AS t
          FROM documents),
        tok AS (
          SELECT doc_id, i, t[i] AS tok
          FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM d)),
        fl AS (
          SELECT doc_id, i, tok,
            CASE WHEN (${fnvSql("tok")}) % 8 = 0 THEN 1 ELSE 0 END AS b
          FROM tok),
        ch AS (
          SELECT doc_id, i, tok,
            coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
          FROM fl),
        chunks AS (
          SELECT doc_id, cid, string_agg(tok, ' ' ORDER BY i) AS chunk_text
          FROM ch GROUP BY doc_id, cid),
        ranked AS (
          SELECT *, row_number() OVER
            (PARTITION BY chunk_text ORDER BY doc_id, cid) AS rn
          FROM chunks)
        SELECT doc_id, count(*) AS n_chunks,
          CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
          CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
        FROM ranked GROUP BY doc_id ORDER BY doc_id"""

  private def dedupClustersOracle: String =
    s"""WITH RECURSIVE
        pairs AS (SELECT id_a, id_b FROM ($ngramJaccardOracle)),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (
          SELECT DISTINCT u, u FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        comp AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
        SELECT doc_id, cluster_id,
          CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
        FROM comp ORDER BY doc_id"""

  private val embQuantizeOracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       s AS (SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
       q AS (SELECT vec_id, v, scale,
         CASE WHEN scale > 0
           THEN list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
           ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qv
         FROM s)
       SELECT vec_id, round(scale, 6) AS scale,
         CAST(list_sum(qv) AS BIGINT) AS q_sum,
         round(list_sum(list_transform(range(len(v)),
           i -> abs(v[i+1] - qv[i+1] * scale))) / len(v), 6) AS recon_mae
       FROM q ORDER BY vec_id"""

  private val textRepetitionOracle: String =
    """WITH toks AS (
         SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
           x -> len(x) > 0) AS t FROM documents),
       g0 AS (
         SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-1, 0))) AS i
         FROM toks),
       grams AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS gram FROM g0),
       gc AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram),
       agg AS (SELECT doc_id, sum(c) AS n_2grams, count(*) AS n_distinct,
         max(c) AS top_c FROM gc GROUP BY doc_id)
       SELECT d.doc_id,
         CAST(coalesce(a.n_2grams, 0) AS BIGINT) AS n_2grams,
         round(CASE WHEN coalesce(a.n_2grams, 0) > 0
           THEN 1.0 - CAST(a.n_distinct AS DOUBLE) / a.n_2grams
           ELSE 0.0 END, 4) AS dup_2gram_frac,
         round(CASE WHEN coalesce(a.n_2grams, 0) > 0
           THEN CAST(a.top_c AS DOUBLE) / a.n_2grams
           ELSE 0.0 END, 4) AS top_2gram_frac
       FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
       ORDER BY d.doc_id"""

  /** Greedy packing replayed as a recursive CTE: rows of each
    * (lang, shard) cell are visited in doc_id order (rn), carrying the
    * (bin, fill) state exactly like the mapPartitions scan. */
  /** The shared recursive-scan replay: rows of each (lang, shard) cell
    * visited in doc_id order, carrying (bin, fill) exactly like the
    * mapPartitions scan; offset = fill before the doc joined its bin. */
  private val seqPackCte: String =
    """WITH RECURSIVE d AS (
         SELECT doc_id, lang, CAST(doc_id % 4 AS INT) AS shard,
           CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0)) AS BIGINT) AS n,
           row_number() OVER (PARTITION BY lang, doc_id % 4 ORDER BY doc_id) AS rn
         FROM documents),
       pack(lang, shard, rn, doc_id, n, bin_id, "offset", fill) AS (
         SELECT lang, shard, rn, doc_id, n, CAST(0 AS BIGINT),
           CAST(0 AS BIGINT), n FROM d WHERE rn = 1
         UNION ALL
         SELECT d.lang, d.shard, d.rn, d.doc_id, d.n,
           CASE WHEN p.fill + d.n > 256 THEN p.bin_id + 1 ELSE p.bin_id END,
           CASE WHEN p.fill + d.n > 256 THEN CAST(0 AS BIGINT) ELSE p.fill END,
           CASE WHEN p.fill + d.n > 256 THEN d.n ELSE p.fill + d.n END
         FROM d JOIN pack p
           ON d.lang = p.lang AND d.shard = p.shard AND d.rn = p.rn + 1)"""

  private val seqPackOracle: String =
    seqPackCte +
    """
       SELECT doc_id, lang, shard, n AS n_tokens, bin_id, "offset"
       FROM pack ORDER BY doc_id"""

  /** Bin-utilization replay: aggregate the same recursive scan. The
    * ratio columns mirror Packing.binStats' numeric contract — exact
    * BIGINT sums, then ONE double division (no avg/round), so both
    * engines emit bit-identical doubles. */
  private val packingStatsOracle: String =
    seqPackCte +
    """,
       bins AS (
         SELECT lang, shard, bin_id, sum(n) AS fill, count(*) AS k
         FROM pack GROUP BY lang, shard, bin_id)
       SELECT lang, count(*) AS n_bins, CAST(sum(k) AS BIGINT) AS n_docs,
         CAST(sum(fill) AS BIGINT) AS sum_fill,
         CAST(sum(least(fill, 256)) AS BIGINT) AS capped_fill,
         CAST(sum(fill) AS DOUBLE) / count(*) AS avg_fill,
         CAST(sum(least(fill, 256)) AS DOUBLE) / (count(*) * 256)
           AS utilization
       FROM bins GROUP BY lang ORDER BY lang"""

  /** The capstone pipeline replayed in SQL: the quality/dedup/sample/
    * pack stages chain the same CTE fragments the per-operator oracles
    * use. */
  private def curationPipelineOracle: String = {
    import graft.operators.Sampling.thresholdFor
    val cases = sampleRates.toSeq.sorted.map { case (lang, r) =>
      s"WHEN '$lang' THEN ${thresholdFor(r)}"
    }.mkString(" ")
    s"""WITH RECURSIVE
        scored AS (
          SELECT doc_id, lang, text,
            CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
              x -> len(x) > 0)) AS BIGINT) AS n
          FROM documents),
        q AS (SELECT * FROM scored WHERE n BETWEEN 5 AND 400),
        kept AS (
          SELECT doc_id, lang, text, n FROM (
            SELECT doc_id, lang, text, n,
              min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM q)
          WHERE doc_id = keep_id),
        ktoks AS (
          SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
            x -> len(x) > 0) AS t FROM kept),
        ksh0 AS (
          SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
          FROM ktoks),
        kshAll AS (
          SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
          FROM ksh0),
        krare AS (SELECT shingle FROM kshAll GROUP BY shingle HAVING count(*) < 100),
        ksh AS (SELECT kshAll.* FROM kshAll JOIN krare USING (shingle)),
        ksizes AS (SELECT doc_id, count(*) AS n_sh FROM ksh GROUP BY doc_id),
        kinter AS (
          SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS n_inter
          FROM ksh l JOIN ksh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
          GROUP BY l.doc_id, r.doc_id),
        kpairs AS (
          SELECT id_a, id_b FROM kinter
          JOIN ksizes sa ON sa.doc_id = id_a
          JOIN ksizes sb ON sb.doc_id = id_b
          WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5),
        kedges AS (SELECT id_a AS u, id_b AS v FROM kpairs
                   UNION SELECT id_b, id_a FROM kpairs),
        kreach(u, v) AS (
          SELECT DISTINCT u, u FROM kedges
          UNION
          SELECT r.u, e.v FROM kreach r JOIN kedges e ON r.v = e.u),
        kcomp AS (SELECT u AS doc_id, min(v) AS cluster_id FROM kreach GROUP BY u),
        dd AS (
          SELECT k.doc_id, k.lang, k.n FROM kept k
          LEFT JOIN kcomp c ON k.doc_id = c.doc_id
          WHERE coalesce(c.cluster_id, k.doc_id) = k.doc_id),
        ${splitmixStagesSql("dd", "doc_id", "doc_id, lang, n")},
        samp AS (SELECT doc_id, lang, n FROM s3
          WHERE u53 < CASE lang $cases ELSE ${thresholdFor(sampleDefaultRate)} END),
        d AS (
          SELECT doc_id, lang, CAST(doc_id % 4 AS INT) AS shard, n,
            row_number() OVER (PARTITION BY lang, doc_id % 4 ORDER BY doc_id) AS rn
          FROM samp),
        pack(lang, shard, rn, doc_id, n, bin_id, fill) AS (
          SELECT lang, shard, rn, doc_id, n, CAST(0 AS BIGINT), n FROM d WHERE rn = 1
          UNION ALL
          SELECT d.lang, d.shard, d.rn, d.doc_id, d.n,
            CASE WHEN p.fill + d.n > 256 THEN p.bin_id + 1 ELSE p.bin_id END,
            CASE WHEN p.fill + d.n > 256 THEN d.n ELSE p.fill + d.n END
          FROM d JOIN pack p
            ON d.lang = p.lang AND d.shard = p.shard AND d.rn = p.rn + 1)
        SELECT doc_id, lang, shard, n AS n_tokens, bin_id
        FROM pack ORDER BY doc_id"""
  }

  /** HLL p=9 register replay (per event_type, key = `keySql`):
    * h = splitmix64(fnv1a64(key)) — the same FNV byte fold + splitmix
    * finalizer stages the sampling oracles replay (z0..z2 + final xor,
    * WITHOUT the u53 truncation: HLL reads all 64 bits). Then
    * j = h // 2^55, w = h % 2^55 (fits BIGINT), rho = 56 − bitlength(w)
    * with bitlength = length(bin(w)) (bin() has no leading zeros),
    * registers = max(rho) per (group, j), harmonic sum EXACT in HUGEINT
    * as Σ 2^(56 − M_j) + 2^56 per empty register, then the single
    * double division + small-range branch — mirrors
    * [[graft.functions.HllSketch]].eval step for step. DISTINCT keys
    * first: register max is idempotent per key, so pre-dedup is free. */
  private def hllOracleCtes(pfx: String, selSql: String): String =
    s"""${pfx}h AS (SELECT DISTINCT grp, k FROM ($selSql)),
       ${pfx}f AS (SELECT grp, ${fnvSql("k")} AS fv FROM ${pfx}h),
       ${pfx}z0 AS (SELECT grp, (fv + 11400714819323198485)
           % 18446744073709551616::HUGEINT AS z0 FROM ${pfx}f),
       ${pfx}z1 AS (SELECT grp, ${mulcSql("xor(z0, z0 // 1073741824)",
             BigInt("BF58476D1CE4E5B9", 16))} AS z1 FROM ${pfx}z0),
       ${pfx}z2 AS (SELECT grp, ${mulcSql("xor(z1, z1 // 134217728)",
             BigInt("94D049BB133111EB", 16))} AS z2 FROM ${pfx}z1),
       ${pfx}hh AS (SELECT grp,
           xor(z2, z2 // 2147483648) AS hv FROM ${pfx}z2),
       ${pfx}br AS (SELECT grp, hv // 36028797018963968 AS j,
           CAST(hv % 36028797018963968 AS BIGINT) AS w FROM ${pfx}hh),
       ${pfx}rr AS (SELECT grp, j,
           CASE WHEN w = 0 THEN 56 ELSE 56 - length(bin(w)) END AS rho
         FROM ${pfx}br),
       ${pfx}regs AS (SELECT grp, j, max(rho) AS mj
         FROM ${pfx}rr GROUP BY grp, j),
       ${pfx}agg AS (SELECT grp,
           count(*) AS nonzero,
           CAST(sum(mj) AS BIGINT) AS reg_sum,
           sum(CAST(1::BIGINT << (56 - mj) AS HUGEINT))
             + CAST(512 - count(*) AS HUGEINT) * (1::BIGINT << 56) AS s
         FROM ${pfx}regs GROUP BY grp),
       ${pfx}fin AS (SELECT grp, reg_sum,
           CAST(nonzero AS BIGINT) AS nonzero,
           CASE WHEN (0.7213 / (1.0 + 1.079 / 512.0)) * 512 * 512
                  * power(2.0, 56.0) / CAST(s AS DOUBLE) <= 2.5 * 512
                 AND 512 - nonzero > 0
                THEN 512 * ln(CAST(512 AS DOUBLE) / (512 - nonzero))
                ELSE (0.7213 / (1.0 + 1.079 / 512.0)) * 512 * 512
                  * power(2.0, 56.0) / CAST(s AS DOUBLE) END AS est
         FROM ${pfx}agg)"""

  /** dHash replay over the synthetic BMPs: the same integer pipeline as
    * [[graft.functions.MediaDHash]] on the KNOWN pixel formula
    * (synthBmp stores formula-row y bottom-up and the decoder re-emits
    * top-down, so decoded row y == formula y — verified in
    * Multimodal.synthBmp / BmpCodec.samples). Luma and grid sampling
    * are pure integer division; the hash is published as two 32-bit
    * halves (Σ 2^63 would overflow signed BIGINT). */
  private def dhashOracleCtes(whereSql: String): String =
    s"""dims AS (SELECT doc_id, (doc_id % 8) + 1 AS w, (doc_id % 6) + 1 AS h
          FROM documents $whereSql),
       grid AS (
         SELECT doc_id, jj.j, ii.i,
           (ii.i * w) // 9 AS xl, ((ii.i + 1) * w) // 9 AS xr,
           (jj.j * h) // 8 AS sy
         FROM dims,
           (SELECT unnest(generate_series(0, 7)) AS j) jj,
           (SELECT unnest(generate_series(0, 7)) AS i) ii),
       gb AS (
         SELECT doc_id, j, i,
           (299*((doc_id*31 + sy*7 + xl*3) % 256)
            + 587*((doc_id*31 + sy*7 + xl*3 + 11) % 256)
            + 114*((doc_id*31 + sy*7 + xl*3 + 22) % 256)) // 1000 AS gl,
           (299*((doc_id*31 + sy*7 + xr*3) % 256)
            + 587*((doc_id*31 + sy*7 + xr*3 + 11) % 256)
            + 114*((doc_id*31 + sy*7 + xr*3 + 22) % 256)) // 1000 AS gr
         FROM grid),
       hh AS (SELECT doc_id,
           CAST(sum(CASE WHEN j*8 + i >= 32 AND gr > gl
             THEN 1::BIGINT << (j*8 + i - 32) ELSE 0 END) AS BIGINT) AS hash_hi,
           CAST(sum(CASE WHEN j*8 + i < 32 AND gr > gl
             THEN 1::BIGINT << (j*8 + i) ELSE 0 END) AS BIGINT) AS hash_lo
         FROM gb GROUP BY doc_id)"""

  def oracleSql: Map[String, String] = Map(
    "mix_schedule" ->
      s"""WITH ${splitmixStagesSql("documents", "doc_id", "doc_id, lang")},
          d AS (SELECT doc_id, lang AS domain, u53,
              CAST(u53 % 4 AS INT) AS shard FROM s3),
          w AS (SELECT *, CASE domain WHEN 'en' THEN 0.3 WHEN 'zh' THEN 0.25
              WHEN 'de' THEN 0.15 WHEN 'es' THEN 0.15 WHEN 'fr' THEN 0.15
              END AS wt FROM d),
          r AS (SELECT *, CAST(row_number() OVER (
              PARTITION BY shard, domain ORDER BY u53, doc_id) AS BIGINT)
              AS domain_rank FROM w WHERE wt IS NOT NULL),
          v AS (SELECT *, (CAST(domain_rank AS DOUBLE) - 0.5) / wt AS vpos
            FROM r)
          SELECT shard, CAST(row_number() OVER (
              PARTITION BY shard ORDER BY vpos, doc_id) AS BIGINT) AS pos,
            doc_id, domain, domain_rank, round(vpos, 6) AS vpos
          FROM v ORDER BY shard, pos""",
    "q_equidepth_hist" ->
      """WITH e AS (SELECT event_type, event_id, value FROM events
           WHERE value IS NOT NULL),
         b AS (SELECT event_type, value,
             CAST(ntile(10) OVER (PARTITION BY event_type
               ORDER BY value, event_id) AS BIGINT) AS bin
           FROM e)
         SELECT event_type, bin, count(*) AS n,
           round(min(value), 4) AS lo, round(max(value), 4) AS hi,
           round(avg(value), 4) AS mean
         FROM b GROUP BY event_type, bin ORDER BY event_type, bin""",
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty, count(*) AS n_rows
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY l_returnflag, l_linestatus""",
    // anchors need only the sampled indices' byte sums, so the replay
    // computes sums for the (≤ 130 per doc) anchor samples, not all
    "video_fingerprint" ->
      """WITH dims AS (SELECT doc_id, (doc_id % 50) + 16 AS n FROM documents),
         anchors AS (
           SELECT doc_id, n, kk.k,
             (kk.k * n) // 65 AS ta, ((kk.k + 1) * n) // 65 AS tb
           FROM dims, (SELECT unnest(generate_series(0, 63)) AS k) kk),
         needed AS (
           SELECT DISTINCT doc_id, i FROM (
             SELECT doc_id, ta AS i FROM anchors
             UNION ALL SELECT doc_id, tb FROM anchors)),
         sv AS (
           SELECT s.doc_id, s.i,
             sum((s.doc_id*31 + s.i*7 + g.j*3) % 256) AS bsum
           FROM needed s,
             LATERAL (SELECT unnest(generate_series(0,
               ((s.doc_id + s.i*5) % 24) + 7)) AS j) g
           GROUP BY s.doc_id, s.i),
         bits AS (
           SELECT a.doc_id, a.k,
             CASE WHEN sb.bsum > sa.bsum THEN 1 ELSE 0 END AS bit
           FROM anchors a
           JOIN sv sa ON sa.doc_id = a.doc_id AND sa.i = a.ta
           JOIN sv sb ON sb.doc_id = a.doc_id AND sb.i = a.tb),
         hh AS (SELECT doc_id,
             CAST(sum(CASE WHEN k >= 32 AND bit = 1
               THEN 1::BIGINT << (k - 32) ELSE 0 END) AS BIGINT) AS hash_hi,
             CAST(sum(CASE WHEN k < 32 AND bit = 1
               THEN 1::BIGINT << k ELSE 0 END) AS BIGINT) AS hash_lo
           FROM bits GROUP BY doc_id)
         SELECT doc_id, hash_hi, hash_lo FROM hh ORDER BY doc_id""",
    "audio_fingerprint" ->
      """WITH dims AS (SELECT doc_id, (doc_id % 40) + 25 AS n FROM documents),
         bits AS (
           SELECT doc_id, kk.k,
             CASE WHEN ((doc_id*131 + (((kk.k + 1) * n) // 65) * 17) % 2048) >
                       ((doc_id*131 + ((kk.k * n) // 65) * 17) % 2048)
               THEN 1 ELSE 0 END AS bit
           FROM dims, (SELECT unnest(generate_series(0, 63)) AS k) kk),
         hh AS (SELECT doc_id,
             CAST(sum(CASE WHEN k >= 32 AND bit = 1
               THEN 1::BIGINT << (k - 32) ELSE 0 END) AS BIGINT) AS hash_hi,
             CAST(sum(CASE WHEN k < 32 AND bit = 1
               THEN 1::BIGINT << k ELSE 0 END) AS BIGINT) AS hash_lo
           FROM bits GROUP BY doc_id)
         SELECT doc_id, hash_hi, hash_lo FROM hh ORDER BY doc_id""",
    "image_dhash" ->
      s"""WITH ${dhashOracleCtes("")}
          SELECT doc_id, hash_hi, hash_lo FROM hh ORDER BY doc_id""",
    // hamming <= 3 with 4 blocks: pigeonhole makes the Spark side's
    // (block, value) candidate equi-join complete, so the oracle is the
    // plain all-pairs hamming filter over the replayed hashes
    "image_dhash_pairs" ->
      s"""WITH ${dhashOracleCtes(
            "WHERE doc_id % 8 >= 3 AND doc_id % 6 >= 3")}
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(bit_count(xor(a.hash_hi, b.hash_hi))
              + bit_count(xor(a.hash_lo, b.hash_lo)) AS INT) AS hamming
          FROM hh a JOIN hh b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.hash_hi, b.hash_hi))
              + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3
          ORDER BY id_a, id_b""",
    "q_hll_distinct" ->
      s"""WITH ${hllOracleCtes("u",
            "SELECT event_type AS grp, CAST(user_id AS VARCHAR) AS k FROM events")},
          ${hllOracleCtes("e",
            "SELECT event_type AS grp, CAST(event_id AS VARCHAR) AS k FROM events")},
          ex AS (SELECT event_type AS grp, count(DISTINCT user_id) AS exact_users
                 FROM events GROUP BY event_type)
          SELECT uf.grp AS event_type, round(uf.est, 4) AS est_users,
            uf.reg_sum AS reg_sum_users, uf.nonzero AS nonzero_users,
            round(ef.est, 4) AS est_events, ef.reg_sum AS reg_sum_events,
            ex.exact_users
          FROM ufin uf JOIN efin ef ON uf.grp = ef.grp
          JOIN ex ON uf.grp = ex.grp
          ORDER BY event_type""",
    // CMS replay: counter(r,c) = Σ cnt over keys whose hash bit-field r
    // addresses c — identical to the aggregate's +1-per-row updates
    // summed per key; estimates are min-over-rows reads on the probes
    "q_cms_freq" ->
      s"""WITH keys AS (SELECT user_id, CAST(user_id AS VARCHAR) AS k,
               count(*) AS cnt FROM events GROUP BY user_id),
          cf AS (SELECT user_id, cnt, ${fnvSql("k")} AS fv FROM keys),
          cz0 AS (SELECT user_id, cnt, (fv + 11400714819323198485)
              % 18446744073709551616::HUGEINT AS z0 FROM cf),
          cz1 AS (SELECT user_id, cnt, ${mulcSql("xor(z0, z0 // 1073741824)",
                BigInt("BF58476D1CE4E5B9", 16))} AS z1 FROM cz0),
          cz2 AS (SELECT user_id, cnt, ${mulcSql("xor(z1, z1 // 134217728)",
                BigInt("94D049BB133111EB", 16))} AS z2 FROM cz1),
          chh AS (SELECT user_id, cnt,
              xor(z2, z2 // 2147483648) AS hv FROM cz2),
          cells AS (SELECT user_id, cnt, rr.r,
              CAST((hv // (CASE rr.r WHEN 0 THEN 1 WHEN 1 THEN 1024
                           ELSE 1048576 END)) % 1024 AS BIGINT) AS c
            FROM chh, (SELECT unnest([0, 1, 2]) AS r) rr),
          counters AS (SELECT r, c, sum(cnt) AS v
            FROM cells GROUP BY r, c),
          top AS (SELECT user_id, cnt FROM keys
            ORDER BY cnt DESC, user_id LIMIT 10)
          SELECT t.user_id, t.cnt AS exact_cnt,
            CAST(min(co.v) AS BIGINT) AS est_cnt,
            CAST(min(co.v) - t.cnt AS BIGINT) AS overestimate
          FROM top t
          JOIN cells ce ON ce.user_id = t.user_id
          JOIN counters co ON co.r = ce.r AND co.c = ce.c
          GROUP BY t.user_id, t.cnt
          ORDER BY exact_cnt DESC, t.user_id""",
    // Aho–Corasick replay: non-overlapping counts are replace()
    // arithmetic (both engines scan leftmost-first); first hit is
    // min-by (position, pattern order) with pi < 100 packed
    "blocklist_hits" -> {
      val vals = blocklistPhrases.zipWithIndex
        .map { case (p, i) => s"('$p', $i)" }.mkString(", ")
      s"""WITH pats AS (SELECT * FROM (VALUES $vals) AS pt(p, pi)),
          ph AS (SELECT d.doc_id, pats.p, pats.pi,
              (length(d.text) - length(replace(d.text, pats.p, '')))
                // length(pats.p) AS cnt,
              strpos(d.text, pats.p) AS pos
            FROM documents d, pats)
          SELECT doc_id,
            CAST(sum(cnt) AS BIGINT) AS total_hits,
            CAST(count(*) FILTER (WHERE cnt > 0) AS INT) AS n_patterns,
            min_by(p, pos * 100 + pi) FILTER (WHERE pos > 0)
              AS first_pattern,
            sum(cnt) > 0 AS blocked
          FROM ph GROUP BY doc_id ORDER BY doc_id"""
    },
    "text_readability" ->
      """WITH c AS (SELECT doc_id,
           length(regexp_replace(text, '\s', '', 'g')) AS n_chars,
           length(list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> length(x) > 0)) AS n_words,
           greatest(1, length(regexp_split_to_array(text, '[.!?]+')) - 1)
             AS n_sentences
         FROM documents)
         SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CASE WHEN n_words > 0 THEN
             floor((4.71 * n_chars / n_words
               + 0.5 * n_words / n_sentences - 21.43) * 1e4 + 0.5) / 1e4
           END AS ari
         FROM c ORDER BY doc_id""",
    // per-term contributions quantized to BIGINT at 1e-12 before the
    // sum — associative, so partitioning can't move the 6-dp rounding
    "vocab_divergence" ->
      """WITH toks AS (SELECT doc_id % 2 = 0 AS is_a,
           unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> length(x) > 0)) AS tok
         FROM documents),
         vcounts AS (SELECT tok,
             sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
           FROM toks GROUP BY tok),
         vtop AS (SELECT tok, ca, cb FROM vcounts
           QUALIFY row_number() OVER (ORDER BY ca + cb DESC, tok) <= 100),
         vtot AS (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS v
           FROM vtop),
         terms AS (SELECT v,
             CAST(ca + 1 AS DOUBLE) / (na + v) AS p,
             CAST(cb + 1 AS DOUBLE) / (nb + v) AS q
           FROM vtop, vtot),
         t2 AS (SELECT v, p, q, (p + q) / 2 AS m FROM terms)
         SELECT CAST(max(v) AS BIGINT) AS vocab_size,
           round(CAST(sum(CAST(round(p * ln(p / q) * 1e12) AS BIGINT))
             AS DOUBLE) / 1e12, 6) AS kl_ab,
           round(CAST(sum(CAST(round(q * ln(q / p) * 1e12) AS BIGINT))
             AS DOUBLE) / 1e12, 6) AS kl_ba,
           round(CAST(sum(CAST(round((p * ln(p / m) / 2
             + q * ln(q / m) / 2) * 1e12) AS BIGINT))
             AS DOUBLE) / 1e12, 6) AS js
         FROM t2""",
    // CM inner-product: est = min over rows of Σ_c A[r][c]·B[r][c];
    // both counter tables rebuilt from per-key counts, all integers
    "q_join_size_est" ->
      s"""WITH ${cmsCellsCtes("ja",
            "SELECT CAST(user_id AS VARCHAR) AS k FROM events WHERE event_id % 2 = 0")},
          ${cmsCellsCtes("jb",
            "SELECT CAST(user_id AS VARCHAR) AS k FROM events WHERE event_id % 2 <> 0")},
          ip AS (SELECT ar.r, sum(ar.v * br.v) AS rp
            FROM jactr ar JOIN jbctr br ON ar.r = br.r AND ar.c = br.c
            GROUP BY ar.r),
          est AS (SELECT CAST(min(rp) AS BIGINT) AS est_join_size FROM ip),
          ex AS (SELECT CAST(coalesce(sum(a.cnt * b.cnt), 0) AS BIGINT)
              AS exact_join_size
            FROM jak a JOIN jbk b USING (k))
          SELECT est.est_join_size, ex.exact_join_size,
            est.est_join_size - ex.exact_join_size AS overestimate
          FROM est, ex""",
    "vocab_missing_mass" ->
      """WITH toks AS (SELECT lang,
           unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> length(x) > 0)) AS tok
         FROM documents),
         tc AS (SELECT lang, tok, count(*) AS c FROM toks GROUP BY lang, tok),
         f AS (SELECT lang,
             CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
           FROM tc GROUP BY lang)
         SELECT lang, vocab, n_tokens, n1, n2,
           round(CAST(n1 AS DOUBLE) / n_tokens, 6) AS missing_mass,
           CASE WHEN n2 > 0 THEN
             round(vocab + CAST(n1 AS DOUBLE) * n1 / (2.0 * n2), 4)
           END AS chao1_vocab
         FROM f ORDER BY lang""",
    // CUPED: every moment is an integer-cents sum; θ and the outputs
    // are the identical double dag over those integers on both engines
    "q_events_cuped" ->
      """WITH r AS (SELECT user_id AS u, CAST(user_id % 2 AS INT) AS v,
           epoch_us(ts) AS t,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
         b AS (SELECT (min(t) + max(t)) // 2 AS mid FROM r),
         units AS (SELECT u, max(v) AS v,
             sum(CASE WHEN t <= b.mid THEN c ELSE 0 END) AS x,
             sum(CASE WHEN t > b.mid THEN c ELSE 0 END) AS y
           FROM r, b GROUP BY u),
         m AS (SELECT count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy,
             sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN v = 0 THEN x ELSE 0 END) AS sx_a,
             sum(CASE WHEN v = 0 THEN y ELSE 0 END) AS sy_a,
             sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS n_b,
             sum(CASE WHEN v = 1 THEN x ELSE 0 END) AS sx_b,
             sum(CASE WHEN v = 1 THEN y ELSE 0 END) AS sy_b
           FROM units),
         d AS (SELECT n, n_a, n_b,
             CAST(n * sxy - sx * sy AS DOUBLE) AS cov_num,
             CAST(n * sxx - sx * sx AS DOUBLE) AS varx_num,
             CAST(n * syy - sy * sy AS DOUBLE) AS vary_num,
             CAST(sx AS DOUBLE) / n AS x_bar,
             CAST(sx_a AS DOUBLE) AS dsx_a, CAST(sy_a AS DOUBLE) AS dsy_a,
             CAST(sx_b AS DOUBLE) AS dsx_b, CAST(sy_b AS DOUBLE) AS dsy_b
           FROM m),
         d2 AS (SELECT *, cov_num / varx_num AS theta FROM d)
         SELECT CAST(n AS BIGINT) AS n, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CASE WHEN n > 0 AND varx_num > 0
             THEN round(theta, 6) END AS theta,
           CASE WHEN n_a > 0
             THEN round(dsy_a / n_a / 100.0, 6) END AS mean_a,
           CASE WHEN n_b > 0
             THEN round(dsy_b / n_b / 100.0, 6) END AS mean_b,
           CASE WHEN n > 0 AND varx_num > 0 AND n_a > 0
             THEN round((dsy_a / n_a - theta * (dsx_a / n_a - x_bar)) / 100.0, 6)
           END AS adj_mean_a,
           CASE WHEN n > 0 AND varx_num > 0 AND n_b > 0
             THEN round((dsy_b / n_b - theta * (dsx_b / n_b - x_bar)) / 100.0, 6)
           END AS adj_mean_b,
           CASE WHEN n_a > 0 AND n_b > 0
             THEN round(dsy_a / n_a / 100.0 - dsy_b / n_b / 100.0, 6)
           END AS diff,
           CASE WHEN n > 0 AND varx_num > 0 AND n_a > 0 AND n_b > 0
             THEN round((dsy_a / n_a - theta * (dsx_a / n_a - x_bar)) / 100.0
               - (dsy_b / n_b - theta * (dsx_b / n_b - x_bar)) / 100.0, 6)
           END AS adj_diff,
           CASE WHEN n > 0 AND varx_num > 0 AND vary_num > 0
             THEN round(theta * theta * (varx_num / vary_num), 6)
           END AS var_reduction
         FROM d2""",
    // the union pipeline (no WHERE) covers every group by construction,
    // so it drives the joins; absent sides estimate 0 from all-zero
    // registers — the linear-counting branch at V = m is exactly 0.0
    "corpus_novelty" ->
      s"""WITH ${hllOracleCtes("c",
            "SELECT source AS grp, text AS k FROM documents WHERE doc_id % 2 = 0")},
          ${hllOracleCtes("b",
            "SELECT source AS grp, text AS k FROM documents WHERE doc_id % 2 = 1")},
          ${hllOracleCtes("u",
            "SELECT source AS grp, text AS k FROM documents")}
          SELECT uf.grp AS source,
            round(coalesce(cf.est, 0.0), 4) AS est_corpus,
            round(coalesce(bf.est, 0.0), 4) AS est_batch,
            round(uf.est, 4) AS est_union,
            round(uf.est - coalesce(cf.est, 0.0), 4) AS novelty
          FROM ufin uf
          LEFT JOIN cfin cf ON uf.grp = cf.grp
          LEFT JOIN bfin bf ON uf.grp = bf.grp
          ORDER BY source""",
    "q_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
           count(*) FILTER (WHERE event_type = 'view') AS "view",
           count(*) FILTER (WHERE event_type = 'click') AS "click",
           count(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
           count(*) FILTER (WHERE event_type = 'signup') AS "signup",
           count(*) FILTER (WHERE event_type = 'error') AS "error"
         FROM events GROUP BY CAST(ts AS DATE) ORDER BY day""",
    "q_unpivot" ->
      """WITH a AS (
           SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty,
             round(sum(l_extendedprice), 4) AS sum_price,
             round(avg(l_discount), 6) AS avg_disc
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
         UNION ALL
         SELECT l_returnflag, 'sum_price', sum_price FROM a
         UNION ALL
         SELECT l_returnflag, 'avg_disc', avg_disc FROM a
         ORDER BY l_returnflag, measure""",
    "mix_unimax" ->
      """WITH tok AS (
           SELECT lang, CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0)) AS BIGINT) AS n
           FROM documents),
         base AS (SELECT lang AS domain, count(*) AS n_docs,
             CAST(sum(n) AS BIGINT) AS n_tokens FROM tok GROUP BY lang),
         tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM base),
         f AS (SELECT domain, n_docs, n_tokens, 2 * n_tokens AS n_full,
             CAST(row_number() OVER (ORDER BY 2 * n_tokens, domain) AS BIGINT) AS idx,
             coalesce(sum(2 * n_tokens) OVER (ORDER BY 2 * n_tokens, domain
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix,
             count(*) OVER () AS nl
           FROM base),
         g AS (SELECT f.*, t + t // 2 AS b FROM f, tot),
         h AS (SELECT *, CAST(b - prefix AS DOUBLE) / (nl - idx + 1) AS share_cand
           FROM g),
         i AS (SELECT *, CAST(n_full AS DOUBLE) <= share_cand AS capped FROM h),
         j AS (SELECT *,
             sum(CASE WHEN capped THEN n_full ELSE 0 END) OVER () AS capped_total,
             sum(CASE WHEN capped THEN 0 ELSE 1 END) OVER () AS n_uncapped
           FROM i),
         k AS (SELECT domain, n_docs, n_tokens, capped, b,
             CASE WHEN capped THEN CAST(n_full AS DOUBLE)
                  ELSE CAST(b - capped_total AS DOUBLE) / n_uncapped END AS alloc
           FROM j)
         SELECT domain, n_docs, n_tokens, capped,
           round(alloc, 4) AS alloc_tokens,
           round(alloc / n_tokens, 6) AS epochs,
           round(alloc / b, 6) AS weight
         FROM k ORDER BY domain""",
    "split_cluster_safe" ->
      s"""WITH comp AS (SELECT doc_id, cluster_id FROM ($dedupClustersOracle)),
          cl AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
                 FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
          ${splitmixStagesSql("cl", "cluster_id", "doc_id, cluster_id")}
          SELECT doc_id, cluster_id,
            CASE WHEN u53 < ${graft.operators.Sampling.thresholdFor(0.1)}
              THEN 'eval' ELSE 'train' END AS split
          FROM s3 ORDER BY doc_id""",
    "retrieval_maxsim" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 4),
         c AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         s AS (SELECT label, qid,
             max(list_dot_product(v, qv) /
               (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))) AS mx
           FROM c, q GROUP BY label, qid),
         p AS (SELECT label,
             max(CASE WHEN qid = 0 THEN mx END) AS m0,
             max(CASE WHEN qid = 1 THEN mx END) AS m1,
             max(CASE WHEN qid = 2 THEN mx END) AS m2,
             max(CASE WHEN qid = 3 THEN mx END) AS m3
           FROM s GROUP BY label)
         SELECT CAST(label AS BIGINT) AS doc_group,
           round(m0 + m1 + m2 + m3, 6) AS maxsim_score
         FROM p ORDER BY maxsim_score DESC, doc_group LIMIT 5""",
    "curation_pipeline" -> curationPipelineOracle,
    "q_asof_join" ->
      """WITH r AS (SELECT user_id, ts, max(value) AS pv FROM events
           WHERE event_type = 'purchase' GROUP BY user_id, ts)
         SELECT e.event_id, e.user_id, round(r.pv, 2) AS last_purchase_value
         FROM events e ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.ts
         ORDER BY e.event_id""",
    "q_asof_forward" ->
      """WITH r AS (SELECT user_id, ts, max(value) AS pv FROM events
           WHERE event_type = 'purchase' GROUP BY user_id, ts)
         SELECT e.event_id, e.user_id, round(r.pv, 2) AS next_purchase_value
         FROM events e ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts <= r.ts
         ORDER BY e.event_id""",
    "q_interval_join" ->
      """WITH ev AS (SELECT epoch_us(ts) AS tsus, user_id, value FROM events),
         hours AS (SELECT tsus - (tsus % 3600000000) AS hstart, count(*) AS c
                   FROM ev GROUP BY 1),
         stats AS (SELECT sum(c) AS n_total, count(*) AS n_hours FROM hours),
         busy AS (SELECT hstart - 900000000 AS ws, hstart + 4500000000 AS we
                  FROM hours, stats WHERE c * n_hours * 2 >= n_total * 3)
         SELECT ws, we, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 2) AS sum_value
         FROM busy b JOIN ev e ON e.tsus BETWEEN b.ws AND b.we
         GROUP BY ws, we ORDER BY ws""",
    "q_interval_overlap" ->
      """WITH e AS (
           SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(floor(epoch(ts)) AS BIGINT) -
               lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS gap
           FROM events),
         sx AS (
           SELECT user_id, sec,
             CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM e),
         sess AS (SELECT user_id, session_id, min(sec) AS s_lo, max(sec) AS s_hi
                  FROM sx GROUP BY user_id, session_id),
         hours AS (SELECT sec - (sec % 3600) AS hstart, count(*) AS c
                   FROM e GROUP BY 1),
         stats AS (SELECT sum(c) AS n_total, count(*) AS n_hours FROM hours),
         busy AS (SELECT hstart - 900 AS ws, hstart + 4500 AS we
                  FROM hours, stats WHERE c * n_hours * 2 >= n_total * 3)
         SELECT ws, we, count(*) AS n_sessions,
           count(DISTINCT user_id) AS n_users
         FROM sess JOIN busy ON s_lo <= we AND ws <= s_hi
         GROUP BY ws, we ORDER BY ws""",
    "lm_score_index" ->
      """WITH ttoks AS (
           SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS tk FROM documents WHERE doc_id % 2 = 0),
         tuni AS (SELECT unnest(tk) AS w FROM ttoks),
         ucnt AS (SELECT w, count(*) AS uc FROM tuni GROUP BY w),
         tot AS (SELECT CAST(sum(uc) AS DOUBLE) AS n_tok,
                        CAST(count(*) AS DOUBLE) AS v_size FROM ucnt),
         tb0 AS (SELECT tk, unnest(generate_series(1, greatest(len(tk)-1, 0))) AS i
                 FROM ttoks),
         bcnt AS (SELECT tk[i] AS w1, tk[i+1] AS w2, count(*) AS c
                  FROM tb0 GROUP BY 1, 2),
         atoks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS tk FROM documents),
         ab0 AS (SELECT doc_id, tk,
                   unnest(generate_series(1, greatest(len(tk)-1, 0))) AS i
                 FROM atoks),
         big AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2 FROM ab0),
         perdoc AS (
           SELECT big.doc_id, count(*) AS n_bigrams,
             round(sum(ln(0.7 * (CASE WHEN c1.uc IS NOT NULL AND b.c IS NOT NULL
                 THEN b.c / c1.uc ELSE 0.0 END)
               + 0.3 * ((coalesce(c2.uc, 0) + 1) / (n_tok + v_size))))
               / count(*), 4) AS avg_logprob
           FROM big LEFT JOIN bcnt b ON big.w1 = b.w1 AND big.w2 = b.w2
                LEFT JOIN ucnt c1 ON big.w1 = c1.w
                LEFT JOIN ucnt c2 ON big.w2 = c2.w, tot
           GROUP BY big.doc_id)
         SELECT d.doc_id, CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           coalesce(p.avg_logprob, 0.0) AS avg_logprob
         FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
         ORDER BY d.doc_id""",
    "seq_pack" -> seqPackOracle,
    "packing_stats" -> packingStatsOracle,
    "text_logprob" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0)) AS tok
           FROM documents),
         freq AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
         perdoc AS (
           SELECT doc_id, count(*) AS n_tokens,
             round(sum(ln(CAST(tf AS DOUBLE) / n)) / count(*), 4) AS avg_logprob
           FROM toks JOIN freq USING (tok), tot GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           coalesce(p.avg_logprob, 0.0) AS avg_logprob
         FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
         ORDER BY d.doc_id""",
    "url_dedup_stats" ->
      """WITH raws AS (
           SELECT source, unnest([
             'https://www.' || source || '.Example.COM:443/' || lang ||
               '/doc/' || CAST(doc_id AS VARCHAR) || '/',
             'HTTPS://' || source || '.example.com/' || lang || '/doc/' ||
               CAST(doc_id AS VARCHAR) ||
               CASE WHEN doc_id % 3 = 1 THEN '?page=2&utm_source=feed'
                    ELSE '?utm_source=feed' END ||
               CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END]) AS raw
           FROM documents),
         s1 AS (SELECT source,
           concat(lower(regexp_extract(raw, '^([^/?#]*://[^/?#]*)', 1)),
                  regexp_replace(raw, '^[^/?#]*://[^/?#]*', '')) AS lowered
           FROM raws),
         s2 AS (SELECT source, regexp_replace(lowered, '#.*$', '') AS nofrag
                FROM s1),
         s3 AS (SELECT source, regexp_replace(regexp_replace(nofrag,
                  '^(https://[^/?#:]*):443([/?#].*)?$', '\1\2'),
                  '^(http://[^/?#:]*):80([/?#].*)?$', '\1\2') AS noport
                FROM s2),
         s4 AS (SELECT source,
                  regexp_replace(noport, '^(https?://)www\.', '\1') AS nowww
                FROM s3),
         s5 AS (SELECT source,
           regexp_replace(regexp_replace(nowww, '\?.*$', ''), '/$', '') AS base,
           list_filter(string_split(regexp_extract(nowww, '\?(.*)$', 1), '&'),
             p -> NOT starts_with(p, 'utm_') AND p <> '') AS keep
           FROM s4),
         normed AS (SELECT source,
           CASE WHEN len(keep) > 0
                THEN base || '?' || array_to_string(keep, '&')
                ELSE base END AS norm
           FROM s5),
         withhost AS (SELECT source, norm,
           regexp_extract(norm, '^[^/?#]*://([^/?#:]*)', 1) AS host
           FROM normed),
         block AS (SELECT DISTINCT source || '.example.com' AS bdom
                   FROM documents
                   WHERE CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 7 = 0)
         SELECT w.source, count(*) AS n_raw,
           count(DISTINCT norm) AS n_norm,
           round(1.0 - count(DISTINCT norm) / count(*), 4) AS dup_share,
           CAST(sum(CASE WHEN b.bdom IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocked
         FROM withhost w LEFT JOIN block b ON w.host = b.bdom
         GROUP BY w.source ORDER BY w.source""",
    "corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS h, source FROM documents
                    WHERE doc_id % 13 <> 5),
         n AS (SELECT doc_id,
                 md5(CASE WHEN doc_id % 11 = 7 THEN text || ' rev2'
                     ELSE text END) AS h, source
               FROM documents WHERE doc_id % 17 <> 3),
         j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                 CASE WHEN o.doc_id IS NULL THEN 'added'
                      WHEN n.doc_id IS NULL THEN 'removed'
                      WHEN o.h <> n.h THEN 'changed'
                      ELSE 'unchanged' END AS status,
                 coalesce(n.source, o.source) AS source
               FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
         SELECT source, status, count(*) AS n_docs,
           min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM j GROUP BY source, status ORDER BY source, status""",
    "pmi_collocations" ->
      """WITH toks AS (
           SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS tk FROM documents),
         uni AS (SELECT unnest(tk) AS w FROM toks),
         ucnt AS (SELECT w, count(*) AS uc FROM uni GROUP BY w),
         utot AS (SELECT CAST(sum(uc) AS DOUBLE) AS n_tok FROM ucnt),
         b0 AS (SELECT tk, unnest(generate_series(1, greatest(len(tk)-1, 0))) AS i
                FROM toks),
         big AS (SELECT tk[i] AS w1, tk[i+1] AS w2 FROM b0),
         bcnt AS (SELECT w1, w2, count(*) AS c_xy FROM big GROUP BY w1, w2),
         btot AS (SELECT CAST(sum(c_xy) AS DOUBLE) AS m_big FROM bcnt)
         SELECT b.w1, b.w2, b.c_xy,
           round(ln((b.c_xy / m_big) / ((c1.uc / n_tok) * (c2.uc / n_tok))), 4) AS pmi
         FROM bcnt b JOIN ucnt c1 ON b.w1 = c1.w JOIN ucnt c2 ON b.w2 = c2.w,
              btot, utot
         WHERE b.c_xy >= 5
         ORDER BY pmi DESC, b.w1, b.w2 LIMIT 50""",
    "bigram_lm" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS tk FROM documents),
         uni AS (SELECT unnest(tk) AS w FROM toks),
         ucnt AS (SELECT w, count(*) AS uc FROM uni GROUP BY w),
         utot AS (SELECT CAST(sum(uc) AS DOUBLE) AS n_tok FROM ucnt),
         b0 AS (SELECT doc_id, tk,
                  unnest(generate_series(1, greatest(len(tk)-1, 0))) AS i
                FROM toks),
         big AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2 FROM b0),
         bcnt AS (SELECT w1, w2, count(*) AS c_xy FROM big GROUP BY w1, w2),
         perdoc AS (
           SELECT big.doc_id, count(*) AS n_bigrams,
             round(sum(ln(0.7 * (c_xy / c1.uc) + 0.3 * (c2.uc / n_tok)))
               / count(*), 4) AS avg_logprob
           FROM big JOIN bcnt USING (w1, w2)
                JOIN ucnt c1 ON big.w1 = c1.w
                JOIN ucnt c2 ON big.w2 = c2.w, utot
           GROUP BY big.doc_id)
         SELECT d.doc_id, CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           coalesce(p.avg_logprob, 0.0) AS avg_logprob
         FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
         ORDER BY d.doc_id""",
    "trigram_lm" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(
             regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS tk FROM documents),
         uni AS (SELECT unnest(tk) AS w FROM toks),
         ucnt AS (SELECT w, count(*) AS uc FROM uni GROUP BY w),
         utot AS (SELECT CAST(sum(uc) AS DOUBLE) AS n_tok FROM ucnt),
         b0 AS (SELECT doc_id, tk,
                  unnest(generate_series(1, greatest(len(tk)-1, 0))) AS i
                FROM toks),
         big AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2 FROM b0),
         bcnt AS (SELECT w1, w2, count(*) AS c_xy FROM big GROUP BY w1, w2),
         t0 AS (SELECT doc_id, tk,
                  unnest(generate_series(1, greatest(len(tk)-2, 0))) AS i
                FROM toks),
         tri AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2, tk[i+2] AS w3
                 FROM t0),
         tcnt AS (SELECT w1, w2, w3, count(*) AS c123
                  FROM tri GROUP BY 1, 2, 3),
         perdoc AS (
           SELECT tri.doc_id, count(*) AS n_trigrams,
             round(sum(ln(0.6 * (c123 / b12.c_xy) +
               0.3 * (b23.c_xy / c2.uc) +
               0.1 * (c3.uc / n_tok))) / count(*), 4) AS avg_logprob
           FROM tri JOIN tcnt USING (w1, w2, w3)
             JOIN bcnt b12 ON b12.w1 = tri.w1 AND b12.w2 = tri.w2
             JOIN bcnt b23 ON b23.w1 = tri.w2 AND b23.w2 = tri.w3
             JOIN ucnt c2 ON tri.w2 = c2.w
             JOIN ucnt c3 ON tri.w3 = c3.w, utot
           GROUP BY tri.doc_id)
         SELECT d.doc_id,
           CAST(coalesce(p.n_trigrams, 0) AS BIGINT) AS n_trigrams,
           coalesce(p.avg_logprob, 0.0) AS avg_logprob
         FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
         ORDER BY d.doc_id""",
    "gate_overlap_matrix" -> gateOverlapOracle,
    "q_interval_union" ->
      """WITH iv AS (
           SELECT user_id AS k, min(epoch_us(ts)) AS s,
             max(epoch_us(ts)) AS e
           FROM events GROUP BY user_id, event_type),
         sw AS (SELECT k, s, e,
             max(e) OVER (PARTITION BY k ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
           FROM iv),
         gr AS (SELECT k, s, e,
             sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
               OVER (PARTITION BY k ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
           FROM sw),
         segs AS (SELECT k, grp, count(*) AS n_iv, min(s) AS gs,
             max(e) AS ge
           FROM gr GROUP BY 1, 2),
         per AS (SELECT k, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
             CAST(count(*) AS BIGINT) AS n_segments,
             CAST(sum(ge - gs) AS BIGINT) AS covered,
             CAST(max(ge) - min(gs) AS BIGINT) AS span
           FROM segs GROUP BY k)
         SELECT k AS user_id, n_intervals, n_segments, covered, span,
           round(CASE WHEN span > 0 THEN CAST(covered AS DOUBLE) / span
             ELSE 0.0 END, 6) AS coverage_ratio
         FROM per ORDER BY 1""",
    "q_events_runs" ->
      """WITH daily AS (
           SELECT event_type AS k, CAST(ts AS DATE) AS d, count(*) AS c
           FROM events GROUP BY 1, 2),
         blocks AS (SELECT k, c AS v, count(*) AS cnt
           FROM daily GROUP BY 1, 2),
         cum AS (SELECT k, v, sum(cnt) OVER (PARTITION BY k ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM blocks),
         tot AS (SELECT k, CAST(sum(cnt) AS BIGINT) AS n
           FROM blocks GROUP BY k),
         med AS (SELECT c.k,
             min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS med
           FROM cum c JOIN tot ON tot.k = c.k GROUP BY c.k),
         signs AS (SELECT d.k, d.d,
             CASE WHEN d.c > m.med THEN 1 ELSE 0 END AS sg
           FROM daily d JOIN med m ON m.k = d.k WHERE d.c <> m.med),
         wp AS (SELECT k, sg,
             lag(sg, 1) OVER (PARTITION BY k ORDER BY d) AS pv
           FROM signs),
         agg AS (SELECT k, CAST(sum(sg) AS BIGINT) AS n1,
             CAST(sum(1 - sg) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN pv IS NULL OR pv <> sg THEN 1 ELSE 0 END)
               AS BIGINT) AS r
           FROM wp GROUP BY k)
         SELECT k AS event_type, n1, n0, r AS runs,
           CASE WHEN n1 > 0 AND n0 > 0 THEN
             round(2.0 * n1 * n0 / (n1 + n0) + 1.0, 4) END AS expected,
           CASE WHEN n1 > 0 AND n0 > 0 AND
               2.0 * n1 * n0 * (2.0 * n1 * n0 - n1 - n0) /
                 (CAST(n1 + n0 AS DOUBLE) * (n1 + n0) * (n1 + n0 - 1)) > 0
             THEN round((CAST(r AS DOUBLE) -
               (2.0 * n1 * n0 / (n1 + n0) + 1.0)) /
               sqrt(2.0 * n1 * n0 * (2.0 * n1 * n0 - n1 - n0) /
                 (CAST(n1 + n0 AS DOUBLE) * (n1 + n0) * (n1 + n0 - 1))), 4)
           END AS z
         FROM agg ORDER BY 1""",
    "pii_scan" -> piiOracle,
    "contamination_ngram" -> contaminationOracle,
    // bloom pre-filter + exact verify == exact (no false negatives)
    "contamination_bloom" -> contaminationOracle,
    "decontaminate_report" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0) AS t FROM documents),
         sh0 AS (
           SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
           FROM toks),
         shAll AS (
           SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
           FROM sh0),
         ev AS (SELECT doc_id AS eval_id, shingle FROM shAll WHERE doc_id % 50 = 0),
         tr AS (SELECT doc_id AS train_id, shingle FROM shAll WHERE doc_id % 50 <> 0),
         evsz AS (SELECT eval_id, count(*) AS eval_n FROM ev GROUP BY eval_id),
         ov AS (
           SELECT train_id, eval_id, count(*) AS n_overlap
           FROM tr JOIN ev USING (shingle)
           GROUP BY train_id, eval_id HAVING count(*) >= 2),
         ovagg AS (
           SELECT train_id, count(DISTINCT eval_id) AS n_eval_hits,
             max(round(CAST(n_overlap AS DOUBLE) / eval_n, 4)) AS max_overlap_ratio
           FROM ov JOIN evsz USING (eval_id) GROUP BY train_id)
         SELECT d.doc_id, coalesce(a.n_eval_hits, 0) AS n_eval_hits,
           a.max_overlap_ratio, (a.train_id IS NULL) AS keep
         FROM documents d LEFT JOIN ovagg a ON d.doc_id = a.train_id
         WHERE d.doc_id % 50 <> 0 ORDER BY d.doc_id""",
    "dedup_clusters" -> dedupClustersOracle,
    "dedup_clusters_star" -> dedupClustersOracle,
    "sample_stratified" -> sampleOracle,
    "segment_dedup" ->
      """WITH d AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0) AS toks
           FROM documents),
         s AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
         segs AS (
           SELECT doc_id, CAST(s0 // 8 AS INT) AS seg_idx,
             array_to_string(toks[s0+1:s0+8], ' ') AS seg_text
           FROM (SELECT doc_id, toks, n, unnest(range(0, n, 8)) AS s0 FROM s)),
         ranked AS (
           SELECT *, row_number() OVER
             (PARTITION BY seg_text ORDER BY doc_id, seg_idx) AS rn
           FROM segs)
         SELECT doc_id, count(*) AS n_segments,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments,
           round(CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
             AS dup_seg_frac,
           coalesce(string_agg(CASE WHEN rn = 1 THEN seg_text END, ' '
             ORDER BY seg_idx), '') AS clean_text
         FROM ranked GROUP BY doc_id ORDER BY doc_id""",
    "doc_chunk" ->
      """WITH d AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0) AS toks
           FROM documents),
         s AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
         st AS (SELECT doc_id, toks, n, unnest(range(0, n, 48)) AS s0 FROM s)
         SELECT doc_id, CAST(s0 // 48 AS INT) AS chunk_idx,
           CAST(s0 AS INT) AS start_token,
           CAST(least(64, n - s0) AS INT) AS n_tokens,
           array_to_string(toks[s0+1:s0+64], ' ') AS chunk_text
         FROM st ORDER BY doc_id, chunk_idx""",
    "vocab_coverage" ->
      """WITH tok AS (
           SELECT lang AS grp,
             unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> len(x) > 0)) AS tok
           FROM documents),
         counts AS (SELECT grp, tok, count(*) AS c FROM tok GROUP BY grp, tok),
         ranked AS (
           SELECT *, row_number() OVER
             (PARTITION BY grp ORDER BY c DESC, tok ASC) AS rn
           FROM counts)
         SELECT grp AS lang, CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           round(CAST(sum(CASE WHEN rn <= 40 THEN c ELSE 0 END) AS DOUBLE)
             / sum(c), 6) AS coverage
         FROM ranked GROUP BY grp ORDER BY lang""",
    "mix_weights" ->
      """WITH tok AS (
           SELECT lang,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS n
           FROM documents),
         agg AS (
           SELECT lang AS domain, count(*) AS n_docs, sum(n) AS n_tokens
           FROM tok GROUP BY lang),
         t AS (
           SELECT *, CAST(CASE domain WHEN 'en' THEN 0.2 WHEN 'zh' THEN 0.3
             WHEN 'es' THEN 0.2 ELSE 0.1 END AS DOUBLE) AS traw
           FROM agg)
         SELECT domain, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE), 6)
             AS actual_share,
           round(traw / sum(traw) OVER (), 6) AS target_share,
           round((traw / sum(traw) OVER ()) /
             (CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE)), 6)
             AS weight
         FROM t ORDER BY domain""",
    "text_repetition" -> textRepetitionOracle,
    "emb_quantize" -> embQuantizeOracle,
    "dedup_simhash" -> simhashOracle,
    "doc_fingerprint" -> fingerprintOracle,
    "dedup_minhash_lsh" -> ngramJaccardOracle,
    "ann_lsh_topk" -> annLshOracle(dim = 64, nBits = 8, probes = 2, tables = 8),
    "dedup_embedding_lsh" -> embLshOracle(dim = 64, nBits = 2, tables = 8),
    "dedup_crosscorpus_emb" ->
      crossCorpusEmbOracle(dim = 64, nBits = 2, tables = 8, threshold = 0.4),
    "emb_project" -> embProjectOracle(dim = 64, k = 8),
    "emb_drift_psi" -> embDriftPsiOracle(dim = 64, kProj = 8, binWidth = 0.5),
    "ip_range_lookup" ->
      """WITH probe AS (
           SELECT c_custkey,
             '10.' || CAST(c_nationkey AS VARCHAR) || '.' ||
               CAST(c_custkey % 256 AS VARCHAR) || '.1' AS ip,
             CAST(167772160 + c_nationkey * 65536 + (c_custkey % 256) * 256 + 1
               AS BIGINT) AS ip_int
           FROM customer)
         SELECT c_custkey, ip, ip_int, n_name AS zone
         FROM probe LEFT JOIN nation
           ON ip_int BETWEEN 167772160 + n_nationkey * 65536
                         AND 167772160 + n_nationkey * 65536 + 65535
         ORDER BY c_custkey""",
    "multimodal_meta" ->
      """WITH n AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents)
         SELECT doc_id,
         CASE doc_id % 4 WHEN 0 THEN 'bmp' WHEN 1 THEN 'png' WHEN 2 THEN 'wav'
           ELSE (CASE WHEN nb % 3 = 0 THEN 'png' WHEN nb % 3 = 1 THEN 'jpeg'
                 ELSE 'webp' END) END AS format,
         CAST(CASE doc_id % 4 WHEN 0 THEN doc_id % 8 + 1 WHEN 1 THEN doc_id % 9 + 1
           WHEN 2 THEN 8000 ELSE nb % 640 + 1 END AS INT) AS width,
         CAST(CASE doc_id % 4 WHEN 0 THEN doc_id % 6 + 1 WHEN 1 THEN doc_id % 4 + 1
           WHEN 2 THEN 2 ELSE nb % 480 + 1 END AS INT) AS height,
         CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 1
           WHEN 2 THEN doc_id % 16 + 4 ELSE nb // 1000 + 1 END AS INT) AS n_frames,
         CASE WHEN doc_id % 4 = 3 THEN nb > 0 ELSE TRUE END AS ok
         FROM n ORDER BY doc_id""",
    "multimodal_bmp_decode" ->
      """WITH dims AS (
           SELECT doc_id, (doc_id % 8) + 1 AS w, (doc_id % 6) + 1 AS h FROM documents
         ), px AS (
           SELECT d.doc_id, d.w, d.h, gy.y, gx.x
           FROM dims d,
                LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS y) gy,
                LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS x) gx
         )
         SELECT doc_id, 'bmp' AS format, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           round(avg((doc_id*31 + y*7 + x*3) % 256), 4) AS r_mean,
           round(avg((doc_id*31 + y*7 + x*3 + 11) % 256), 4) AS g_mean,
           round(avg((doc_id*31 + y*7 + x*3 + 22) % 256), 4) AS b_mean
         FROM px GROUP BY doc_id, w, h ORDER BY doc_id""",
    "multimodal_png_decode" ->
      """WITH dims AS (
           SELECT doc_id, (doc_id % 9) + 1 AS w, (doc_id % 4) + 1 AS h FROM documents
         ), px AS (
           SELECT d.doc_id, d.w, d.h, gy.y, gx.x
           FROM dims d,
                LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS y) gy,
                LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS x) gx
         )
         SELECT doc_id, 'png' AS format, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           round(avg((doc_id*31 + y*7 + x*3) % 256), 4) AS r_mean,
           round(avg((doc_id*31 + y*7 + x*3 + 11) % 256), 4) AS g_mean,
           round(avg((doc_id*31 + y*7 + x*3 + 22) % 256), 4) AS b_mean
         FROM px GROUP BY doc_id, w, h ORDER BY doc_id""",
    "multimodal_jpeg_decode" ->
      """WITH dims AS (
           SELECT doc_id, (doc_id % 3) + 1 AS wb, (doc_id % 2) + 1 AS hb FROM documents
         ), blk AS (
           SELECT d.doc_id, d.wb, d.hb,
             (d.doc_id*31 + gy.by*7 + gx.bx*3) % 256 AS y,
             (d.doc_id*31 + gy.by*7 + gx.bx*3 + 11) % 256 AS cb,
             (d.doc_id*31 + gy.by*7 + gx.bx*3 + 22) % 256 AS cr
           FROM dims d,
                LATERAL (SELECT unnest(generate_series(0, d.hb - 1)) AS by) gy,
                LATERAL (SELECT unnest(generate_series(0, d.wb - 1)) AS bx) gx
         ), px AS (
           -- fixed-point BT.601, the decoder's exact integer formula:
           -- positive-biased numerator so // floors like Scala's >>
           SELECT doc_id, wb, hb,
             GREATEST(0, LEAST(255, (y*65536 + 91881*(cr-128) + 32768 + 67108864) // 65536 - 1024)) AS r,
             GREATEST(0, LEAST(255, (y*65536 - 22554*(cb-128) - 46802*(cr-128) + 32768 + 67108864) // 65536 - 1024)) AS g,
             GREATEST(0, LEAST(255, (y*65536 + 116130*(cb-128) + 32768 + 67108864) // 65536 - 1024)) AS b
           FROM blk
         )
         SELECT doc_id, 'jpeg' AS format, CAST(wb*8 AS INT) AS width,
           CAST(hb*8 AS INT) AS height,
           round(avg(r), 4) AS r_mean, round(avg(g), 4) AS g_mean,
           round(avg(b), 4) AS b_mean
         FROM px GROUP BY doc_id, wb, hb ORDER BY doc_id""",
    "multimodal_gif_decode" ->
      """WITH dims AS (
           SELECT doc_id, (doc_id % 6) + 5 AS w, (doc_id % 4) + 5 AS h FROM documents
         ), px AS (
           SELECT d.doc_id, d.w, d.h, gy.y, gx.x
           FROM dims d,
                LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS y) gy,
                LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS x) gx
         )
         SELECT doc_id, 'gif' AS format, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           round(avg((doc_id*31 + y*7 + x*3) % 256), 4) AS r_mean,
           round(avg((doc_id*31 + y*7 + x*3 + 11) % 256), 4) AS g_mean,
           round(avg((doc_id*31 + y*7 + x*3 + 22) % 256), 4) AS b_mean
         FROM px GROUP BY doc_id, w, h ORDER BY doc_id""",
    "multimodal_wav_decode" ->
      """WITH dims AS (SELECT doc_id, (doc_id % 16) + 4 AS frames FROM documents),
          smp AS (
           SELECT d.doc_id, d.frames,
             ((d.doc_id*131 + gi.i*17) % 2048) - 1024 AS s0,
             ((d.doc_id*131 + gi.i*17 + 29) % 2048) - 1024 AS s1
           FROM dims d, LATERAL (SELECT unnest(generate_series(0, d.frames - 1)) AS i) gi
          )
         SELECT doc_id, 'wav' AS format, CAST(8000 AS INT) AS sample_rate,
           CAST(2 AS INT) AS channels, CAST(frames AS INT) AS n_frames,
           round(avg(s0), 4) AS ch0_mean, round(avg(s1), 4) AS ch1_mean,
           round(sqrt(avg(s0*s0)), 4) AS ch0_rms, round(sqrt(avg(s1*s1)), 4) AS ch1_rms
         FROM smp GROUP BY doc_id, frames ORDER BY doc_id""",
    "multimodal_mp4_decode" ->
      """WITH dims AS (SELECT doc_id, (doc_id % 7) + 3 AS n FROM documents),
          smp AS (
           SELECT d.doc_id, d.n, gi.i, ((d.doc_id + gi.i*5) % 24) + 8 AS sz
           FROM dims d, LATERAL (SELECT unnest(generate_series(0, d.n - 1)) AS i) gi),
          byt AS (
           SELECT s.doc_id, s.n, s.i, s.sz,
             ((s.doc_id*31 + s.i*7 + gj.j*3) % 256) AS bv
           FROM smp s, LATERAL (SELECT unnest(generate_series(0, s.sz - 1)) AS j) gj),
          per AS (
           SELECT doc_id, n, i, max(sz) AS sz, sum(bv) AS bsum
           FROM byt GROUP BY doc_id, n, i)
         SELECT doc_id, 'mp4' AS format, CAST(64 AS INT) AS width,
           CAST(48 AS INT) AS height, CAST(n AS INT) AS n_samples,
           round(avg(bsum), 4) AS mean_sample_bytesum,
           round(avg(sz), 4) AS mean_sample_size,
           round(sqrt(avg(bsum*bsum)), 4) AS rms_sample_bytesum
         FROM per GROUP BY doc_id, n ORDER BY doc_id""",
    "oml_transform" ->
      """SELECT event_id, event_type AS etype,
         CASE WHEN event_type = 'error' THEN 'high'
              WHEN event_type IN ('purchase','signup') THEN 'mid'
              ELSE 'low' END AS level,
         event_type || ':' || CAST(user_id AS VARCHAR) AS msg,
         CAST(props->>'$.k' AS BIGINT) AS kk
         FROM events ORDER BY event_id""",
    "oml_objects" ->
      """SELECT event_id,
         CASE WHEN event_type = 'error' AND CAST(props->>'$.k' AS BIGINT) = 0
                THEN 'zero_error'
              WHEN event_type = 'error' THEN 'real_error'
              ELSE 'normal' END AS sev,
         to_json(struct_pack(u := user_id, t := event_type)) AS info,
         to_json([event_id, CAST(props->>'$.k' AS BIGINT)]) AS pair
         FROM events ORDER BY event_id""",
    "oml_sql_enrich" ->
      """SELECT c_custkey, n_name FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         ORDER BY c_custkey""",
    "oml_sql_enrich_join" ->
      """SELECT c_custkey, n_name FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         ORDER BY c_custkey""",
    "wpl_nginx_parse" ->
      """SELECT o_orderkey,
         '10.0.' || CAST(o_custkey % 250 + 1 AS VARCHAR) || '.' ||
           CAST(o_orderkey % 250 + 1 AS VARCHAR) AS sip,
         o_orderdate AS recv_time,
         CASE o_orderstatus WHEN 'O' THEN 'GET' WHEN 'F' THEN 'POST'
           ELSE 'PUT' END AS method,
         '/order/' || CAST(o_orderkey AS VARCHAR) AS uri,
         200 + (o_orderkey % 4) * 100 AS status,
         CAST(floor(o_totalprice) AS BIGINT) AS bytes,
         'http://ref.example.com/' || CAST(o_custkey AS VARCHAR) AS referer,
         'Agent/' || o_orderpriority AS agent
         FROM orders ORDER BY o_orderkey""",
    "wpl_kvarr_parse" ->
      """SELECT event_id, event_type AS etype, user_id,
         CAST(props->>'$.k' AS BIGINT) AS k
         FROM events ORDER BY event_id""",
    "wpl_json_parse" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
         FROM events ORDER BY event_id""",
    "wpl_geo_enrich" ->
      """SELECT event_id,
         '10.0.' || CAST(user_id % 25 AS VARCHAR) || '.' ||
           CAST(event_id % 250 AS VARCHAR) AS src_ip,
         n_name AS city_name,
         'zone-' || CAST(event_id % 4 AS VARCHAR) AS zone_name,
         'vendor-' || CAST((event_id % 10) % 3 AS VARCHAR) AS device_val
         FROM events JOIN nation ON n_nationkey = user_id % 25
         ORDER BY event_id""",
    "syslog_normalize" ->
      """SELECT event_id, CAST(event_id % 192 AS INT) AS pri,
         (['kern','user','mail','daemon','auth','syslog','lpr','news','uucp',
           'cron','authpriv','ftp','ntp','audit','alert','clock','local0',
           'local1','local2','local3','local4','local5','local6','local7'])
           [CAST(event_id % 192 AS INT) // 8 + 1] AS facility,
         (['emerg','alert','crit','err','warning','notice','info','debug'])
           [CAST(event_id % 192 AS INT) % 8 + 1] AS severity,
         'host' || CAST(user_id AS VARCHAR) AS host,
         'app' || CAST(event_id % 10 AS VARCHAR) AS app,
         'event ' || event_type AS message
         FROM events ORDER BY event_id""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount > 0.05
           AND l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber""",
    "q_join_topk" ->
      """SELECT o_orderkey,
         round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q_broadcast_dims" ->
      """SELECT r_name, n_name,
         round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_window_topn" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
           FROM lineitem) WHERE rn <= 3
         ORDER BY l_suppkey, rn""",
    "q_window_running" ->
      """SELECT l_orderkey, l_linenumber,
         round(sum(l_quantity) OVER (PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_qty
         FROM lineitem ORDER BY l_orderkey, l_linenumber, running_qty""",
    "q_set_ops" ->
      """SELECT k, set_op FROM (
           SELECT k, 'intersect' AS set_op FROM
             (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
           UNION ALL
           SELECT k, 'except' AS set_op FROM
             (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders))
         ORDER BY set_op, k""",
    "q_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS returnflag,
         coalesce(l_linestatus,'ALL') AS linestatus,
         count(*) AS n, round(sum(l_quantity),2) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",
    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
         substr(p_name, 1, 10) AS name10,
         CAST(length(p_type) AS BIGINT) AS type_len,
         CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS lev,
         lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
         CAST(instr(p_type, 'BRASS') AS BIGINT) AS brass_at,
         translate(p_brand, '#', '-') AS brand_t
         FROM part ORDER BY p_partkey""",
    "q_date_funcs" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         CAST(day(o_orderdate) AS BIGINT) AS d,
         CAST(o_orderdate AS DATE) + 30 AS due,
         CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
           AS BIGINT) AS age_days,
         strftime(o_orderdate, '%Y-%m') AS ym
         FROM orders ORDER BY o_orderkey""",
    "q_cube" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
         coalesce(o_orderpriority,'ALL') AS priority,
         count(*) AS n, round(sum(o_totalprice),2) AS total
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",
    "q_events_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(floor(epoch(ts)) AS BIGINT) -
               lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS gap
           FROM events),
         s AS (
           SELECT user_id, sec,
             CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM e)
         SELECT user_id, session_id, count(*) AS n_events,
           min(sec) AS sess_start_sec, max(sec) AS sess_end_sec
         FROM s GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
           WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         ORDER BY o_orderkey""",
    "knowdb_lookup" ->
      """SELECT c_custkey, c_name, n_name, r_name
         FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
         LEFT JOIN region ON n_regionkey = r_regionkey
         ORDER BY c_custkey""",
    "q_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
         count(*) AS n, round(sum(value),2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_events_json" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_skew_salted_agg" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_skew_adaptive_join" ->
      """WITH dim AS (SELECT event_type, count(*) AS n_type
                      FROM events GROUP BY event_type)
         SELECT e.event_type, count(*) AS n, first(d.n_type) AS n_type,
           round(sum(e.value), 2) AS sum_value
         FROM events e JOIN dim d ON e.event_type = d.event_type
         GROUP BY e.event_type ORDER BY e.event_type""",
    "q_events_lag" ->
      """SELECT user_id, event_id, sec - prev_sec AS gap_sec FROM (
           SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
           FROM events) ORDER BY user_id, event_id""",
    "dedup_exact" ->
      s"""WITH q AS (SELECT doc_id, ${fnvSql("text")} AS hv FROM documents)
         SELECT CAST(CASE WHEN hv >= 9223372036854775808::HUGEINT
                          THEN hv - 18446744073709551616::HUGEINT
                          ELSE hv END AS BIGINT) AS content_h,
           min(doc_id) AS keep_id, count(*) AS dup_count
         FROM q GROUP BY 1 ORDER BY keep_id""",
    "dedup_incremental" ->
      s"""WITH b AS (SELECT doc_id, ${fnvSql("text")} AS h FROM documents WHERE doc_id % 10 >= 8),
         c AS (SELECT DISTINCT ${fnvSql("text")} AS h FROM documents WHERE doc_id % 10 < 8),
         f AS (SELECT doc_id, h, min(doc_id) OVER (PARTITION BY h) AS first_id FROM b)
         SELECT f.doc_id,
           CASE WHEN c.h IS NOT NULL THEN 'dup_of_corpus'
                WHEN f.doc_id <> f.first_id THEN 'dup_in_batch'
                ELSE 'kept' END AS status
         FROM f LEFT JOIN c ON f.h = c.h ORDER BY f.doc_id""",
    "text_quality" ->
      """SELECT doc_id,
         CAST(length(text) AS BIGINT) AS q_chars,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
           x -> len(x) > 0)) AS BIGINT) AS q_tokens,
         round(CASE WHEN len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0)) > 0
           THEN CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) /
             len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> len(x) > 0))
           ELSE 0.0 END, 4) AS q_avg_token_len,
         round(CASE WHEN len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0)) > 0
           THEN CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> list_contains(['the','a','an','and','or','of','to','in','is','it',
               'that','this','for','on','with','as','at','by','be'], lower(x))))
             AS DOUBLE) /
             len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> len(x) > 0))
           ELSE 0.0 END, 4) AS q_stopword_ratio,
         round(CASE WHEN length(text) > 0
           THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) /
             length(text)
           ELSE 0.0 END, 4) AS q_punct_ratio
         FROM documents ORDER BY doc_id""",
    "corpus_stats" ->
      """WITH d AS (
           SELECT lang, CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0)) AS BIGINT) AS n_tok
           FROM documents)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           round(quantile_cont(n_tok, 0.5), 4) AS p50_tokens,
           round(quantile_cont(n_tok, 0.9), 4) AS p90_tokens,
           min(n_tok) AS min_tokens, max(n_tok) AS max_tokens
         FROM d GROUP BY lang ORDER BY lang""",
    "corpus_top_tokens" ->
      """WITH t AS (
           SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0)) AS tok
           FROM documents)
         SELECT tok, count(*) AS n FROM t GROUP BY tok
         ORDER BY n DESC, tok LIMIT 25""",
    "token_stats" ->
      """SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
           x -> len(x) > 0)) AS BIGINT) AS n_ws_tokens,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
           AS BIGINT) AS n_bpe_tokens
         FROM documents ORDER BY doc_id""",
    "dedup_ngram_jaccard" -> ngramJaccardOracle,
    "dedup_threshold_curve" -> dedupCurveOracle,
    "q_events_its" ->
      """WITH daily AS (
           SELECT event_type AS k, CAST(ts AS DATE) AS d, count(*) AS c
           FROM events GROUP BY 1, 2),
         idx AS (SELECT k, d, c,
             row_number() OVER (PARTITION BY k ORDER BY d) AS i
           FROM daily),
         nn AS (SELECT k, CAST(count(*) AS BIGINT) AS nd
           FROM idx GROUP BY k),
         base AS (SELECT idx.k, idx.c, idx.i,
             idx.i <= nn.nd / 2 AS pre
           FROM idx JOIN nn ON nn.k = idx.k),
         ols AS (SELECT k, CAST(count(*) AS BIGINT) AS np,
             CAST(sum(i) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy,
             CAST(sum(i * c) AS BIGINT) AS sxy,
             CAST(sum(i * i) AS BIGINT) AS sxx
           FROM base WHERE pre GROUP BY k
           HAVING count(*) >= 2),
         sl AS (SELECT k, np, sy, sx,
             CAST(np * sxy - sx * sy AS DOUBLE) /
               CAST(np * sxx - sx * sx AS DOUBLE) AS slope
           FROM ols),
         ic AS (SELECT k, np, slope,
             (CAST(sy AS DOUBLE) - slope * sx) / np AS icept
           FROM sl),
         fit AS (SELECT b.k, b.c, ic.np,
             CAST(floor((ic.icept + ic.slope * b.i) * 1e6 + 0.5)
               AS BIGINT) AS predq
           FROM base b JOIN ic ON ic.k = b.k WHERE NOT b.pre),
         fin AS (SELECT k, CAST(max(np) AS BIGINT) AS n_pre,
             CAST(count(*) AS BIGINT) AS n_post,
             CAST(sum(c) AS BIGINT) AS actual_post,
             CAST(sum(predq) AS BIGINT) AS pq
           FROM fit GROUP BY k)
         SELECT k AS event_type, n_pre, n_post, actual_post,
           round(CAST(pq AS DOUBLE) / 1e6, 4) AS predicted_post,
           round(CAST(actual_post AS DOUBLE) - CAST(pq AS DOUBLE) / 1e6, 4)
             AS abs_effect,
           CASE WHEN pq > 0 THEN
             round((CAST(actual_post AS DOUBLE) - CAST(pq AS DOUBLE) / 1e6)
               / (CAST(pq AS DOUBLE) / 1e6), 6) END AS rel_effect
         FROM fin ORDER BY 1""",
    "q_events_cohens_d" ->
      """WITH e AS (SELECT event_type AS g, CAST(user_id % 2 AS INT) AS v,
             CAST(round(value * 100, 0) AS BIGINT) AS x FROM events),
         agg AS (SELECT g,
             CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN v = 0 THEN x ELSE 0 END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN v = 1 THEN x ELSE 0 END) AS BIGINT) AS sb,
             sum(CASE WHEN v = 0 THEN CAST(x AS HUGEINT) * x
               ELSE 0 END) AS qa,
             sum(CASE WHEN v = 1 THEN CAST(x AS HUGEINT) * x
               ELSE 0 END) AS qb
           FROM e GROUP BY g),
         t AS (SELECT g, na, nb,
             CAST(sa AS DOUBLE) / na AS ma, CAST(sb AS DOUBLE) / nb AS mb,
             CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) *
               (CAST(sa AS DOUBLE) / na) AS ssa,
             CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) *
               (CAST(sb AS DOUBLE) / nb) AS ssb
           FROM agg),
         f AS (SELECT g, na, nb, ma, mb,
             sqrt((ssa + ssb) / CAST(na + nb - 2 AS DOUBLE)) AS sp
           FROM t)
         SELECT g AS event_type, na, nb,
           round(ma / 100.0, 4) AS mean_a, round(mb / 100.0, 4) AS mean_b,
           CASE WHEN na > 1 AND nb > 1 AND sp > 0
             THEN round((ma - mb) / sp, 4) END AS cohens_d,
           CASE WHEN na > 1 AND nb > 1 AND sp > 0
             THEN round(((ma - mb) / sp) *
               (1.0 - 3.0 / (4.0 * (na + nb) - 9)), 4) END AS hedges_g
         FROM f ORDER BY 1""",
    "q_rank_migration" ->
      """WITH b AS (SELECT
             CAST(min(epoch_us(l_shipdate)) AS BIGINT) AS lo,
             CAST(max(epoch_us(l_shipdate)) AS BIGINT) AS hi
           FROM lineitem),
         units AS (SELECT
             CASE WHEN epoch_us(l_shipdate) > (lo + hi) // 2
               THEN 1 ELSE 0 END AS p,
             l_partkey AS key,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100,
               0) AS BIGINT)) AS BIGINT) AS tv
           FROM lineitem, b GROUP BY 1, 2),
         ranked AS (SELECT p, key, CAST(row_number() OVER
             (PARTITION BY p ORDER BY tv DESC, key) AS INT) AS rk
           FROM units),
         r1 AS (SELECT key, rk AS rank_1 FROM ranked
                WHERE p = 0 AND rk <= 20),
         r2 AS (SELECT key, rk AS rank_2 FROM ranked
                WHERE p = 1 AND rk <= 20)
         SELECT coalesce(r1.key, r2.key) AS p_partkey, rank_1, rank_2,
           rank_1 - rank_2 AS rank_gain,
           CASE WHEN rank_1 IS NULL THEN 'entered'
             WHEN rank_2 IS NULL THEN 'dropped'
             ELSE 'stayed' END AS status
         FROM r1 FULL OUTER JOIN r2 ON r2.key = r1.key
         ORDER BY status, p_partkey""",
    "q_events_streaks" ->
      """WITH ud AS (
           SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
           FROM events),
         isl AS (SELECT u, d,
             d - CAST(row_number() OVER (PARTITION BY u ORDER BY d)
               AS INT) AS grp
           FROM ud),
         islands AS (SELECT u, grp, CAST(count(*) AS BIGINT) AS len,
             max(d) AS iend
           FROM isl GROUP BY 1, 2)
         SELECT u AS user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(max_by(len, iend) AS BIGINT) AS last_streak,
           max(iend) AS last_day
         FROM islands GROUP BY u ORDER BY 1""",
    "dedup_embedding_pairs" -> (embPairsSql + " ORDER BY id_a, id_b"),
    "ann_recall" -> annRecallOracle(dim = 64, nBits = 6, probes = 2,
      tables = 2, k = 10),
    "semantic_dedup" -> semanticDedupOracle,
    "knn_label_vote_lsh" -> knnLshOracle(dim = 64, nBits = 6, tables = 4, k = 5),
    "semantic_dedup_nprobe" -> semanticNprobeOracle(dim = 64, k = 8,
      iters = 2, nprobe = 2, threshold = 0.4),
    "emb_outliers" ->
      s"""WITH ${detKmeansCtes(dim = 64, k = 8, iters = 2, where = "")},
          home AS (SELECT vec_id, cell, s FROM (
              SELECT vec_id, cell, s, row_number() OVER
                (PARTITION BY vec_id ORDER BY s, cell) AS rk FROM sf)
            WHERE rk = 1)
          SELECT h.vec_id, CAST(h.cell AS INT) AS cell,
            round(list_dot_product(e.v, e.v) + h.s, 6) AS dist2
          FROM home h JOIN e USING (vec_id)
          ORDER BY dist2 DESC, vec_id LIMIT 50""",
    "tfidf_keywords" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(trim(lower(text)), '\s+'), x -> len(x) > 0)) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY doc_id, term),
         dl AS (SELECT doc_id, sum(c) AS dlen FROM tf GROUP BY doc_id),
         dft AS (SELECT term, count(*) AS dft FROM tf GROUP BY term),
         n AS (SELECT count(*) AS nd FROM documents),
         sc AS (
           SELECT t.doc_id, t.term,
             round((CAST(t.c AS DOUBLE) / dlen) * ln(CAST(nd AS DOUBLE) / dft), 4) AS tfidf
           FROM tf t JOIN dl USING (doc_id) JOIN dft USING (term), n),
         r AS (SELECT *, row_number() OVER
             (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rnk FROM sc)
         SELECT doc_id, term, tfidf, CAST(rnk AS INT) AS rnk
         FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""",
    "shard_stats" ->
      s"""WITH ${splitmixStagesSql("documents", "doc_id", "doc_id, text")},
          sh AS (SELECT doc_id, CAST(u53 % 16 AS INT) AS shard,
            CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
              x -> len(x) > 0)) AS BIGINT) AS n_tok
            FROM s3)
          SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
            min(doc_id) AS min_doc, max(doc_id) AS max_doc
          FROM sh GROUP BY shard ORDER BY shard""",
    "source_stats" ->
      """WITH d AS (
           SELECT source, md5(text) AS h,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS n_tok
           FROM documents),
         hc AS (SELECT h, count(*) AS c FROM d GROUP BY h),
         s AS (SELECT source, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
           FROM d JOIN hc USING (h) GROUP BY source),
         t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM s)
         SELECT source, n_docs, n_tokens, n_dup_docs,
           CAST(n_dup_docs AS DOUBLE) / n_docs AS dup_frac,
           CAST(n_tokens AS DOUBLE) / n_docs AS mean_tokens,
           CAST(n_tokens AS DOUBLE) / tot AS token_share
         FROM s, t ORDER BY source""",
    "cdc_dedup" -> cdcDedupOracle,
    "span_dedup" ->
      """WITH d AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0) AS toks
           FROM documents),
         s AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
         segs AS (
           SELECT doc_id, CAST(s0 // 8 AS INT) AS seg_idx,
             array_to_string(toks[s0+1:s0+8], ' ') AS seg_text
           FROM (SELECT doc_id, toks, n, unnest(range(0, n, 8)) AS s0 FROM s)),
         ranked AS (
           SELECT *, row_number() OVER
             (PARTITION BY seg_text ORDER BY doc_id, seg_idx) AS rn
           FROM segs),
         flags AS (SELECT doc_id, seg_idx, (rn > 1) AS is_dup FROM ranked),
         isl AS (
           SELECT doc_id, seg_idx, is_dup,
             seg_idx - row_number() OVER
               (PARTITION BY doc_id, is_dup ORDER BY seg_idx) AS g
           FROM flags),
         runs AS (
           SELECT doc_id, max(run) AS mx FROM (
             SELECT doc_id, g, count(*) AS run FROM isl WHERE is_dup
             GROUP BY doc_id, g)
           GROUP BY doc_id),
         sums AS (
           SELECT doc_id, count(*) AS n_segments,
             CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments
           FROM flags GROUP BY doc_id)
         SELECT s.doc_id, s.n_segments, s.n_dup_segments,
           CAST(coalesce(r.mx, 0) AS BIGINT) AS max_dup_run
         FROM sums s LEFT JOIN runs r USING (doc_id)
         ORDER BY s.doc_id""",
    "bpe_top_merges" ->
      """WITH toks AS (
           SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS t
           FROM documents),
         p AS (
           SELECT t[i] AS tok_a, t[i+1] AS tok_b
           FROM (SELECT t, unnest(generate_series(1, greatest(len(t)-1, 0))) AS i
                 FROM toks)
           WHERE i + 1 <= len(t))
         SELECT tok_a, tok_b, count(*) AS n FROM p GROUP BY tok_a, tok_b
         ORDER BY n DESC, tok_a, tok_b LIMIT 20""",
    "knn_label_vote" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           WHERE vec_id % 2 = 0),
         p AS (
           SELECT a.vec_id AS id, b.vec_id AS nb, b.label AS nb_label,
             round(list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cs
           FROM e a JOIN e b ON a.vec_id <> b.vec_id),
         r AS (SELECT *, row_number() OVER
             (PARTITION BY id ORDER BY cs DESC, nb ASC) AS rn FROM p),
         votes AS (SELECT id, nb_label, count(*) AS n_votes
           FROM r WHERE rn <= 5 GROUP BY id, nb_label),
         best AS (SELECT *, row_number() OVER
             (PARTITION BY id ORDER BY n_votes DESC, nb_label ASC) AS vr FROM votes)
         SELECT e.vec_id, e.label, b.nb_label AS pred_label,
           CAST(b.n_votes AS BIGINT) AS n_votes
         FROM e JOIN best b ON b.id = e.vec_id AND b.vr = 1
         ORDER BY e.vec_id""",
    "ann_ivf_kmeans_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 2)
         SELECT vec_id,
           round(list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
             (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
              sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
         FROM embeddings, q
         ORDER BY cos_sim DESC, vec_id LIMIT 10""",
    "ann_cosine_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
         SELECT vec_id,
           round(list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
             (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
              sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
         FROM embeddings, q
         ORDER BY cos_sim DESC, vec_id LIMIT 10""",
    "lang_id" -> langIdOracle,
    // ann_ivf_topk probes ALL cells after the real k-means build, so the
    // result is exact: the oracle is plain brute-force top-k (query 1).
    "ann_ivf_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 1)
         SELECT vec_id,
           round(list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
             (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
              sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
         FROM embeddings, q
         ORDER BY cos_sim DESC, vec_id LIMIT 10""",
    // ann_ivf_kmeans_topk is the deliberately cell-PRUNED approximate
    // variant (recall pinned in SimilaritySpec) → rows-only by design;
    // every other query is oracled (dedup_simhash / doc_fingerprint via
    // the HUGEINT mod-2^64 FNV-1a reconstruction above).
    //
    // Band recall covers every true pair at threshold 0.5 (same argument
    // as dedup_minhash_lsh), so the cross-corpus LSH survivors equal the
    // plain batch×corpus Jaccard anti-join.
    "dedup_crosscorpus_lsh" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0) AS t FROM documents),
         sh0 AS (
           SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
           FROM toks),
         shAll AS (
           SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
           FROM sh0),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM shAll GROUP BY doc_id),
         b AS (SELECT * FROM shAll WHERE doc_id % 2 = 1),
         c AS (SELECT * FROM shAll WHERE doc_id % 2 = 0),
         inter AS (
           SELECT b.doc_id AS bid, c.doc_id AS cid, count(*) AS n_inter
           FROM b JOIN c USING (shingle) GROUP BY b.doc_id, c.doc_id),
         dup AS (
           SELECT DISTINCT bid FROM inter
           JOIN sizes sb ON sb.doc_id = bid
           JOIN sizes sc ON sc.doc_id = cid
           WHERE CAST(n_inter AS DOUBLE) / (sb.n_sh + sc.n_sh - n_inter) >= 0.5)
         SELECT doc_id, source, lang FROM documents
         WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT bid FROM dup)
         ORDER BY doc_id""",
    "ngram_novelty" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0) AS t FROM documents),
         sh0 AS (
           SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
           FROM toks),
         shAll AS (
           SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
           FROM sh0),
         fst AS (SELECT shingle, min(doc_id) AS first_id FROM shAll GROUP BY shingle),
         per AS (
           SELECT s.doc_id, count(*) AS n_shingles,
             sum(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END) AS n_novel
           FROM shAll s JOIN fst f USING (shingle) GROUP BY s.doc_id)
         SELECT d.doc_id,
           CAST(coalesce(n_shingles, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
           round(coalesce(CAST(n_novel AS DOUBLE) / n_shingles, 0.0), 4) AS novelty
         FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""",
    "quality_classifier" -> qualityClassifierOracle,
    "minhash_est_error" -> minhashEstErrorOracle,
    "budget_select" ->
      s"""WITH qc AS (SELECT * FROM ($qualityClassifierOracle)),
          d AS (SELECT qc.doc_id, q_tokens, quality_score, lang
            FROM qc JOIN documents USING (doc_id)),
          bk AS (SELECT lang, quality_score AS s, count(*) AS bn,
              CAST(sum(q_tokens) AS BIGINT) AS btok
            FROM d GROUP BY lang, quality_score),
          bud AS (SELECT lang,
              CAST(floor(CAST(sum(q_tokens) AS DOUBLE) * 0.6) AS BIGINT) AS budget
            FROM d GROUP BY lang),
          cum AS (SELECT lang, s, bn, btok,
              sum(btok) OVER (PARTITION BY lang ORDER BY s DESC) AS cumtok
            FROM bk),
          sel AS (SELECT cum.* FROM cum JOIN bud USING (lang)
            WHERE cumtok <= budget)
          SELECT lang, min(s) AS thr_score,
            CAST(sum(bn) AS BIGINT) AS n_selected,
            CAST(sum(btok) AS BIGINT) AS tokens_selected
          FROM sel GROUP BY lang ORDER BY lang""",
    "dataset_card" ->
      """SELECT source, lang, count(*) AS n_docs,
           count(DISTINCT text) AS n_distinct_texts,
           CAST(sum(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0))) AS BIGINT) AS total_tokens,
           round(avg(CAST(length(text) AS DOUBLE)), 4) AS avg_chars,
           round(CAST(count(*) - count(DISTINCT text) AS DOUBLE) / count(*), 4)
             AS dup_rate
         FROM documents GROUP BY source, lang ORDER BY source, lang""",
    "emb_dim_stats" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         u0 AS (SELECT v, unnest(generate_series(1, len(v))) AS i FROM e),
         u AS (SELECT CAST(i - 1 AS INT) AS dim, v[i] AS x FROM u0)
         SELECT dim, count(*) AS n,
           round(avg(x), 4) AS mean,
           round(stddev_samp(x), 4) AS std,
           min(x) AS min_x, max(x) AS max_x
         FROM u GROUP BY dim ORDER BY dim""",
    "q_events_funnel" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS ct FROM events
           WHERE event_type = 'signup' GROUP BY 1),
         s2 AS (SELECT e.user_id AS u, min(e.ts) AS ct FROM events e
           JOIN s1 ON e.user_id = s1.u
           WHERE e.event_type = 'view' AND e.ts > s1.ct GROUP BY 1),
         s3 AS (SELECT e.user_id AS u, min(e.ts) AS ct FROM events e
           JOIN s2 ON e.user_id = s2.u
           WHERE e.event_type = 'click' AND e.ts > s2.ct GROUP BY 1),
         s4 AS (SELECT e.user_id AS u, min(e.ts) AS ct FROM events e
           JOIN s3 ON e.user_id = s3.u
           WHERE e.event_type = 'purchase' AND e.ts > s3.ct GROUP BY 1),
         c AS (
           SELECT 1 AS stage_idx, 'signup' AS stage,
             (SELECT count(*) FROM s1) AS n_users
           UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
           UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
           UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4))
         SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
           CAST(n_users AS BIGINT) AS n_users,
           round(CAST(n_users AS DOUBLE) /
             NULLIF((SELECT n_users FROM c WHERE stage_idx = 1), 0), 6)
             AS conv_rate
         FROM c ORDER BY stage_idx""",
    "q_events_retention" ->
      """WITH f AS (SELECT user_id AS u, date_trunc('week', min(ts))
             AS cohort_week
           FROM events WHERE event_type = 'signup' GROUP BY 1),
         a AS (SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS act_week
           FROM events),
         j AS (SELECT a.u, f.cohort_week,
             CAST(date_diff('day', CAST(f.cohort_week AS DATE),
               CAST(a.act_week AS DATE)) // 7 AS INT) AS week_offset
           FROM a JOIN f ON a.u = f.u WHERE a.act_week >= f.cohort_week),
         cs AS (SELECT cohort_week, count(*) AS n_cohort FROM f GROUP BY 1)
         SELECT CAST(j.cohort_week AS DATE) AS cohort_week, week_offset,
           count(*) AS n_active, CAST(cs.n_cohort AS BIGINT) AS n_cohort,
           round(CAST(count(*) AS DOUBLE) / cs.n_cohort, 6) AS retention_rate
         FROM j JOIN cs USING (cohort_week)
         GROUP BY j.cohort_week, week_offset, cs.n_cohort
         ORDER BY cohort_week, week_offset""",
    // simplified silhouette on the same deterministic-centroid replay:
    // rk=1/rk=2 of the (s, cell)-ordered scores are home/nearest-other;
    // per-point s quantizes to BIGINT at 1e-9 before the mean
    "cluster_silhouette" ->
      s"""WITH ${detKmeansCtes(dim = 64, k = 8, iters = 2, where = "")},
          rnk AS (SELECT vec_id, cell, s, row_number() OVER
              (PARTITION BY vec_id ORDER BY s, cell) AS rk FROM sf),
          ab AS (SELECT r1.vec_id, r1.cell,
              sqrt(greatest(list_dot_product(e.v, e.v) + r1.s, 0.0)) AS a,
              sqrt(greatest(list_dot_product(e.v, e.v) + r2.s, 0.0)) AS b
            FROM rnk r1
            JOIN rnk r2 ON r2.vec_id = r1.vec_id AND r2.rk = 2
            JOIN e ON e.vec_id = r1.vec_id
            WHERE r1.rk = 1),
          sil AS (SELECT vec_id, cell,
              CASE WHEN greatest(a, b) > 0
                THEN (b - a) / greatest(a, b) ELSE 0.0 END AS sil
            FROM ab)
          SELECT CAST(cell AS INT) AS cell,
            CAST(count(*) AS BIGINT) AS n_vecs,
            round(CAST(sum(CAST(floor(sil * 1e9 + 0.5) AS BIGINT))
              AS DOUBLE) / 1e9 / count(*), 6) AS mean_sil
          FROM sil GROUP BY cell ORDER BY cell""",
    // k-distance outliers: full pairwise cosine at oracle scale; the
    // engine's blocked sweep meets every pair exactly once
    "emb_knn_outliers" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id % 2 = 0),
         nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
           FROM e),
         p AS (SELECT a.vec_id AS id, b.vec_id AS nb,
             round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
               AS cos_sim
           FROM nn a JOIN nn b ON a.vec_id < b.vec_id),
         sym AS (SELECT id, nb, cos_sim FROM p
           UNION ALL SELECT nb AS id, id AS nb, cos_sim FROM p),
         kth AS (SELECT id, cos_sim FROM (
             SELECT id, cos_sim, row_number() OVER
               (PARTITION BY id ORDER BY cos_sim DESC, nb ASC) AS rk
             FROM sym)
           WHERE rk = 5)
         SELECT id AS vec_id, cos_sim AS kth_cos,
           round(1.0 - cos_sim, 6) AS knn_dist
         FROM kth ORDER BY kth_cos ASC, vec_id ASC LIMIT 20""",
    "topic_cluster_stats" ->
      s"""WITH ${detKmeansCtes(dim = 64, k = 8, iters = 2, where = "")},
          home AS (SELECT vec_id, cell, s FROM (
              SELECT vec_id, cell, s, row_number() OVER
                (PARTITION BY vec_id ORDER BY s, cell) AS rk FROM sf)
            WHERE rk = 1),
          d AS (SELECT h.vec_id, h.cell,
              list_dot_product(e.v, e.v) + h.s AS dist2, emb.label
            FROM home h JOIN e USING (vec_id)
            JOIN embeddings emb ON emb.vec_id = h.vec_id),
          bcl AS (SELECT cell, label, count(*) AS n, sum(dist2) AS sd
            FROM d GROUP BY cell, label),
          tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_n FROM bcl),
          tops AS (SELECT cell, label AS top_label, n AS top_n FROM (
              SELECT cell, label, n, row_number() OVER
                (PARTITION BY cell ORDER BY n DESC, label ASC) AS rk FROM bcl)
            WHERE rk = 1),
          cards AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n_vecs,
              sum(sd) / sum(n) AS avg_dist2
            FROM bcl GROUP BY cell)
          SELECT CAST(c.cell AS INT) AS cell, c.n_vecs,
            round(CAST(c.n_vecs AS DOUBLE) / tot.total_n, 6) AS share,
            round(c.avg_dist2, 6) AS avg_dist2,
            CAST(t.top_label AS INT) AS top_label,
            round(CAST(t.top_n AS DOUBLE) / c.n_vecs, 6) AS top_label_frac
          FROM cards c JOIN tops t USING (cell), tot
          ORDER BY cell""",
    "gopher_rules" ->
      """WITH d AS (
           SELECT doc_id, text,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> len(x) > 0) AS toks
           FROM documents),
         f AS (
           SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             round(CASE WHEN len(toks) > 0
               THEN CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                 / len(toks) ELSE 0.0 END, 4) AS mean_word_len,
             round(CASE WHEN len(toks) > 0
               THEN CAST(length(text) -
                 length(regexp_replace(text, '[#…]', '', 'g')) AS DOUBLE)
                 / len(toks) ELSE 0.0 END, 4) AS symbol_ratio,
             round(CASE WHEN len(toks) > 0
               THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                 AS DOUBLE) / len(toks) ELSE 0.0 END, 4) AS alpha_word_frac,
             CAST(len(list_filter(toks, x -> list_contains(
               ['the','be','to','of','and','that','have','with'], lower(x))))
               AS BIGINT) AS n_stopwords
           FROM d)
         SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
           n_stopwords,
           (n_words >= 10 AND n_words <= 100000) AS r_word_count,
           (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS r_mean_word_len,
           (symbol_ratio <= 0.1) AS r_symbol_ratio,
           (alpha_word_frac >= 0.8) AS r_alpha_words,
           (n_stopwords >= 2) AS r_stopwords,
           ((n_words >= 10 AND n_words <= 100000)
             AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
             AND (symbol_ratio <= 0.1) AND (alpha_word_frac >= 0.8)
             AND (n_stopwords >= 2)) AS keep
         FROM f ORDER BY doc_id""",
    "char_entropy" ->
      """WITH ch AS (
           SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c
           FROM documents),
         ent AS (SELECT doc_id, round(entropy(c), 4) AS char_entropy
           FROM ch GROUP BY doc_id)
         SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
           coalesce(ent.char_entropy, 0.0) AS char_entropy
         FROM documents d LEFT JOIN ent USING (doc_id) ORDER BY doc_id""",
    "pq_encode" -> pqEncodeOracle(m = 4, k = 16, iters = 2),
    "ann_ivfpq_topk" -> annIvfPqOracle(coarseK = 8, coarseIters = 2, m = 4,
      k = 16, iters = 2, nprobe = 2, topK = 10, mod = 41),
    "ann_ivfpq_recall" -> {
      val approx = annIvfPqOracle(coarseK = 8, coarseIters = 2, m = 4,
        k = 16, iters = 2, nprobe = 2, topK = 10, mod = 41)
      s"""WITH approx AS (SELECT q_id, vec_id FROM ($approx)),
          e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 41 = 0),
          dists AS (
            SELECT q.q_id, e.vec_id,
              round(list_sum(list_transform(generate_series(1, 64),
                i -> (e.v[i] - q.qv[i]) * (e.v[i] - q.qv[i]))), 6) AS d2
            FROM e, q),
          rk AS (SELECT q_id, vec_id, row_number() OVER
              (PARTITION BY q_id ORDER BY d2, vec_id) AS rnk FROM dists),
          exact AS (SELECT q_id, vec_id FROM rk WHERE rnk <= 10),
          nq AS (SELECT count(*) AS n_queries FROM q),
          hits AS (SELECT count(*) AS n_hits
            FROM exact JOIN approx USING (q_id, vec_id))
          SELECT 10 AS k, n_queries, n_hits,
            CAST(n_hits AS DOUBLE) / (n_queries * 10) AS recall_at_k
          FROM nq, hits"""
    },
    "quality_ensemble" -> qualityEnsembleOracle,
    "ppl_buckets" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0)) AS tok
           FROM documents),
         freq AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
         perdoc AS (
           SELECT doc_id, count(*) AS n_tokens,
             round(sum(ln(CAST(tf AS DOUBLE) / n)) / count(*), 4) AS avg_logprob
           FROM toks JOIN freq USING (tok), tot GROUP BY doc_id),
         alldocs AS (
           SELECT d.doc_id, d.lang,
             CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
             coalesce(p.avg_logprob, 0.0) AS avg_logprob
           FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id),
         bk AS (
           SELECT lang, CAST(floor(avg_logprob / 0.5) AS INT) AS ppl_bucket,
             count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             round(avg(avg_logprob), 4) AS mean_logprob
           FROM alldocs GROUP BY lang, ppl_bucket)
         SELECT lang, ppl_bucket, CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
           mean_logprob,
           round(CAST(n_docs AS DOUBLE) /
             CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 4) AS lang_share
         FROM bk ORDER BY lang, ppl_bucket""",
    "dedup_containment" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0) AS t FROM documents),
         sh0 AS (
           SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
           FROM toks),
         shAll AS (
           SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
           FROM sh0),
         rare AS (SELECT shingle FROM shAll GROUP BY shingle HAVING count(*) < 100),
         sh AS (SELECT shAll.* FROM shAll JOIN rare USING (shingle)),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         inter AS (
           SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS n_inter
           FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
           GROUP BY l.doc_id, r.doc_id),
         sc AS (
           SELECT id_a, id_b,
             round(CAST(n_inter AS DOUBLE) / sa.n_sh, 4) AS contain_a,
             round(CAST(n_inter AS DOUBLE) / sb.n_sh, 4) AS contain_b
           FROM inter JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b)
         SELECT id_a, id_b, contain_a, contain_b FROM sc
         WHERE contain_a >= 0.8 OR contain_b >= 0.8
         ORDER BY id_a, id_b""",
    "dedup_keep_list" ->
      s"""WITH RECURSIVE
          pairs AS (SELECT id_a, id_b FROM ($ngramJaccardOracle)),
          edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          reach(u, v) AS (
            SELECT DISTINCT u, u FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
          comp AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
          SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS rep_id,
            (coalesce(c.cluster_id, d.doc_id) = d.doc_id) AS keep
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
          ORDER BY d.doc_id""",
    "user_features" ->
      """SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_purchases,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents,
           min(epoch_us(ts)) AS first_ts_us,
           max(epoch_us(ts)) AS last_ts_us,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_active_days
         FROM events GROUP BY user_id ORDER BY user_id""",
    "source_neardup_stats" ->
      s"""WITH RECURSIVE
          pairs AS (SELECT id_a, id_b FROM ($ngramJaccardOracle)),
          edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          reach(u, v) AS (
            SELECT DISTINCT u, u FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
          comp AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
          kl AS (
            SELECT d.doc_id, d.source,
              (coalesce(c.cluster_id, d.doc_id) = d.doc_id) AS keep
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
          SELECT source, count(*) AS n_docs,
            CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_near_dups,
            round(CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS DOUBLE)
              / count(*), 4) AS near_dup_frac
          FROM kl GROUP BY source ORDER BY source""",
    "dedup_keep_list_containment" ->
      """WITH RECURSIVE
         toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0) AS t FROM documents),
         sh0 AS (
           SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
           FROM toks),
         shAll AS (
           SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
           FROM sh0),
         rare AS (SELECT shingle FROM shAll GROUP BY shingle HAVING count(*) < 100),
         sh AS (SELECT shAll.* FROM shAll JOIN rare USING (shingle)),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         inter AS (
           SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS n_inter
           FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
           GROUP BY l.doc_id, r.doc_id),
         cp AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE round(CAST(n_inter AS DOUBLE) / sa.n_sh, 4) >= 0.8
              OR round(CAST(n_inter AS DOUBLE) / sb.n_sh, 4) >= 0.8),
         edges AS (SELECT id_a AS u, id_b AS v FROM cp
                   UNION SELECT id_b, id_a FROM cp),
         reach(u, v) AS (
           SELECT DISTINCT u, u FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         comp AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
         reps AS (
           SELECT c.cluster_id,
             first(c.doc_id ORDER BY s.n_sh DESC, c.doc_id ASC) AS rep
           FROM comp c JOIN sizes s ON s.doc_id = c.doc_id
           GROUP BY c.cluster_id),
         asn AS (SELECT c.doc_id, r.rep FROM comp c JOIN reps r USING (cluster_id))
         SELECT d.doc_id, coalesce(a.rep, d.doc_id) AS rep_id,
           (coalesce(a.rep, d.doc_id) = d.doc_id) AS keep
         FROM documents d LEFT JOIN asn a ON d.doc_id = a.doc_id
         ORDER BY d.doc_id""",
    "q_events_attribution" ->
      """WITH t AS (
           SELECT user_id, ts AS touch_ts, max(event_id) AS tid,
             arg_max(event_type, event_id) AS ttype
           FROM events WHERE event_type IN ('view', 'click')
           GROUP BY user_id, ts),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         j AS (
           SELECT c.event_id, c.user_id, c.ts, t.tid, t.ttype, t.touch_ts
           FROM c ASOF LEFT JOIN t
             ON c.user_id = t.user_id AND c.ts >= t.touch_ts)
         SELECT event_id, user_id, ts,
           CASE WHEN touch_ts IS NOT NULL
             AND epoch_us(ts) - epoch_us(touch_ts) <= 604800000000
             THEN tid END AS touch_event_id,
           CASE WHEN touch_ts IS NOT NULL
             AND epoch_us(ts) - epoch_us(touch_ts) <= 604800000000
             THEN ttype END AS touch_type,
           CASE WHEN touch_ts IS NOT NULL
             AND epoch_us(ts) - epoch_us(touch_ts) <= 604800000000
             THEN epoch_us(ts) - epoch_us(touch_ts) END AS micros_since_touch
         FROM j ORDER BY event_id""",
    "q_events_anomaly" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS hour,
             count(*) AS n_events
           FROM events GROUP BY event_type, date_trunc('hour', ts)),
         win AS (
           SELECT event_type, hour, CAST(n_events AS BIGINT) AS n_events,
             count(*) OVER w AS n_prev,
             avg(n_events) OVER w AS mu_raw,
             stddev_samp(n_events) OVER w AS sigma_raw
           FROM hourly
           WINDOW w AS (PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
         sc AS (
           SELECT event_type, hour, n_events,
             CASE WHEN n_prev >= 1 THEN round(mu_raw, 4) END AS mu,
             CASE WHEN n_prev >= 2 THEN round(sigma_raw, 4) END AS sigma,
             CASE WHEN n_prev >= 2 AND sigma_raw > 0
               THEN round((n_events - mu_raw) / sigma_raw, 4) END AS z
           FROM win)
         SELECT event_type, hour, n_events, mu, sigma, z,
           coalesce(z > 3.0, false) AS is_anomaly
         FROM sc ORDER BY event_type, hour""",
    "tokenizer_fertility" ->
      """WITH d AS (
           SELECT lang,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS ws,
             CAST(len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe,
             CAST(length(text) AS BIGINT) AS chars
           FROM documents),
         g AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ws) AS BIGINT) AS n_words,
             CAST(sum(bpe) AS BIGINT) AS n_tokens,
             CAST(sum(chars) AS BIGINT) AS n_chars
           FROM d GROUP BY lang)
         SELECT lang, n_docs, n_words, n_tokens, n_chars,
           round(CAST(n_tokens AS DOUBLE) / n_words, 4) AS fertility,
           round(CAST(n_chars AS DOUBLE) / n_tokens, 4) AS chars_per_token
         FROM g ORDER BY lang""",
    "contamination_emb" ->
      embContaminationOracle(dim = 64, nBits = 2, tables = 8, threshold = 0.4),
    "intradoc_dedup" ->
      """WITH d AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0) AS toks
           FROM documents),
         s AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
         segs AS (
           SELECT doc_id, CAST(s0 // 2 AS INT) AS seg_idx,
             array_to_string(toks[s0+1:s0+2], ' ') AS seg_text
           FROM (SELECT doc_id, toks, n, unnest(range(0, n, 2)) AS s0 FROM s)),
         ranked AS (
           SELECT *, row_number() OVER
             (PARTITION BY doc_id, seg_text ORDER BY seg_idx) AS rn
           FROM segs)
         SELECT doc_id, count(*) AS n_segments,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments,
           round(CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
             AS dup_seg_frac,
           coalesce(string_agg(CASE WHEN rn = 1 THEN seg_text END, ' '
             ORDER BY seg_idx), '') AS clean_text
         FROM ranked GROUP BY doc_id ORDER BY doc_id""",
    "mix_temperature" ->
      """WITH d AS (
           SELECT lang,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS n_tok
           FROM documents),
         g AS (SELECT lang AS domain, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM d GROUP BY lang),
         sh AS (SELECT *, CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS share
                FROM g)
         SELECT domain, n_docs, n_tokens, round(share, 6) AS share,
           round(pow(share, 0.3) / sum(pow(share, 0.3)) OVER (), 6) AS q_a30,
           round(pow(share, 0.7) / sum(pow(share, 0.7)) OVER (), 6) AS q_a70
         FROM sh ORDER BY domain""",
    "seqlen_histogram" ->
      """WITH d AS (
           SELECT CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0)) AS BIGINT) AS n
           FROM documents),
         p AS (SELECT n, CAST(1 AS BIGINT) << (length(bin(n)) - 1) AS bucket_lo
               FROM d WHERE n > 0),
         g AS (SELECT bucket_lo, count(*) AS n_docs,
               CAST(sum(n) AS BIGINT) AS n_tokens FROM p GROUP BY bucket_lo)
         SELECT bucket_lo, n_docs, n_tokens,
           round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS doc_share,
           round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6) AS token_share,
           round(CAST(sum(n_tokens) OVER (ORDER BY bucket_lo) AS DOUBLE) /
             sum(n_tokens) OVER (), 6) AS cum_token_share
         FROM g ORDER BY bucket_lo""",
    "dup_cluster_sizes" ->
      s"""WITH RECURSIVE
          pairs AS (SELECT id_a, id_b FROM ($ngramJaccardOracle)),
          edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          reach(u, v) AS (
            SELECT DISTINCT u, u FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
          comp AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
          cs AS (SELECT cluster_id, count(*) AS sz FROM comp GROUP BY cluster_id),
          hist AS (SELECT sz AS cluster_size, count(*) AS n_clusters,
                   CAST(sz * count(*) AS BIGINT) AS n_docs FROM cs GROUP BY sz),
          tot AS (SELECT count(*) AS n_total FROM documents),
          cl AS (SELECT count(*) AS n_clustered FROM comp),
          singles AS (
            SELECT CAST(1 AS BIGINT) AS cluster_size,
              n_total - n_clustered AS n_clusters,
              n_total - n_clustered AS n_docs
            FROM tot, cl WHERE n_total - n_clustered > 0),
          allrows AS (SELECT * FROM hist UNION ALL SELECT * FROM singles)
          SELECT cluster_size, n_clusters, n_docs,
            round(CAST(n_docs AS DOUBLE) / n_total, 6) AS doc_share
          FROM allrows, tot ORDER BY cluster_size""",
    // every log argument is a ratio of exact integers; every term
    // quantizes to BIGINT at 1e-12 before the associative sum
    "q_events_mi" ->
      """WITH cells AS (SELECT event_type AS a, hour(ts) AS b, count(*) AS n
           FROM events GROUP BY a, b),
         ra AS (SELECT a, sum(n) AS na FROM cells GROUP BY a),
         rb AS (SELECT b, sum(n) AS nb FROM cells GROUP BY b),
         tot AS (SELECT sum(n) AS nn FROM cells),
         terms AS (SELECT CAST(floor((CAST(c.n AS DOUBLE) / nn)
             * ln(CAST(c.n * nn AS DOUBLE) / (ra.na * rb.nb)) * 1e12 + 0.5)
             AS BIGINT) AS t
           FROM cells c JOIN ra USING (a) JOIN rb USING (b), tot),
         smi AS (SELECT sum(t) AS smi FROM terms),
         sha AS (SELECT sum(CAST(floor((CAST(na AS DOUBLE) / nn)
             * ln(CAST(nn AS DOUBLE) / na) * 1e12 + 0.5) AS BIGINT)) AS sha
           FROM ra, tot),
         shb AS (SELECT sum(CAST(floor((CAST(nb AS DOUBLE) / nn)
             * ln(CAST(nn AS DOUBLE) / nb) * 1e12 + 0.5) AS BIGINT)) AS shb
           FROM rb, tot)
         SELECT round(CAST(smi AS DOUBLE) / 1e12, 6) AS mi,
           round(CAST(sha AS DOUBLE) / 1e12, 6) AS h_a,
           round(CAST(shb AS DOUBLE) / 1e12, 6) AS h_b,
           CASE WHEN sha > 0 AND shb > 0 THEN
             round(CAST(smi AS DOUBLE)
               / sqrt(CAST(sha AS DOUBLE) * CAST(shb AS DOUBLE)), 6)
           END AS nmi
         FROM smi, sha, shb""",
    // every moment an exact integer sum at cent scale; corr is the
    // same double dag over those integers on both engines
    "q_corr_matrix" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val qs = cs.map(c => s"CAST(floor($c * 100 + 0.5) AS BIGINT) AS $c")
        .mkString(", ")
      val pairSel = (for {
        i <- cs.indices; j <- cs.indices if i < j
      } yield {
        val (a, b) = (cs(i), cs(j))
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
            CASE WHEN CAST(n * ss_$a - s_$a * s_$a AS DOUBLE) > 0
                  AND CAST(n * ss_$b - s_$b * s_$b AS DOUBLE) > 0
              THEN round(CAST(n * p_${a}_$b - s_$a * s_$b AS DOUBLE)
                / sqrt(CAST(n * ss_$a - s_$a * s_$a AS DOUBLE)
                     * CAST(n * ss_$b - s_$b * s_$b AS DOUBLE)), 6)
            END AS corr FROM m"""
      }).mkString(" UNION ALL ")
      val moments =
        cs.map(c => s"sum(CAST($c AS HUGEINT)) AS s_$c, " +
          s"sum(CAST($c AS HUGEINT) * $c) AS ss_$c").mkString(", ") + ", " +
        (for { i <- cs.indices; j <- cs.indices if i < j } yield {
          val (a, b) = (cs(i), cs(j))
          s"sum(CAST($a AS HUGEINT) * $b) AS p_${a}_$b"
        }).mkString(", ")
      s"""WITH qv AS (SELECT $qs FROM lineitem),
          m AS (SELECT CAST(count(*) AS HUGEINT) AS n, $moments FROM qv)
          SELECT * FROM ($pairSel) ORDER BY col_a, col_b"""
    },
    "subword_vocab" ->
      """WITH toks AS (SELECT unnest(list_filter(
             regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> length(x) > 0)) AS tok FROM documents),
         lens AS (SELECT tok, unnest(generate_series(2,
             least(6, length(tok)))) AS l
           FROM toks WHERE length(tok) >= 2),
         pieces AS (SELECT unnest(list_transform(
             generate_series(0, length(tok) - l),
             i -> substr(tok, CAST(i + 1 AS INT), CAST(l AS INT)))) AS piece
           FROM lens),
         counts AS (SELECT piece, count(*) AS cnt FROM pieces
           GROUP BY piece HAVING count(*) >= 2)
         SELECT piece, CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt * (length(piece) - 1) AS BIGINT) AS score
         FROM counts ORDER BY score DESC, piece ASC LIMIT 50""",
    "sample_weighted" ->
      s"""WITH ${splitmixStagesSql("documents", "doc_id", "doc_id, lang, n_chars")},
          keyed AS (SELECT doc_id, lang, n_chars,
              ln((u53 + 1) / 9007199254740992.0) / n_chars AS k
            FROM s3 WHERE n_chars > 0),
          ranked AS (SELECT doc_id, lang, n_chars, k,
              CAST(row_number() OVER
                (PARTITION BY lang ORDER BY k DESC, doc_id) AS INT)
                AS sample_rank
            FROM keyed)
          SELECT doc_id, lang, n_chars, round(k, 6) AS es_key, sample_rank
          FROM ranked WHERE sample_rank <= 8 ORDER BY lang, sample_rank""",
    "sample_exact_n" ->
      s"""WITH ${splitmixStagesSql("documents", "doc_id", "doc_id, lang")},
          ranked AS (
            SELECT doc_id, lang, CAST(row_number() OVER
              (PARTITION BY lang ORDER BY u53, doc_id) AS INT) AS sample_rank
            FROM s3)
          SELECT doc_id, lang, sample_rank FROM ranked
          WHERE sample_rank <= 7 ORDER BY lang, sample_rank""",
    "source_pagerank" -> sourcePagerankOracle,
    "graph_hits" -> graphHitsOracle,
    "q_events_markov_stationary" -> markovStationaryOracle,
    "q_events_logrank" -> logrankOracle,
    "q_events_sprt" -> sprtOracle,
    "rake_keywords" -> rakeOracle,
    "textrank_keywords" -> textrankOracle,
    "item_cf_topk" ->
      """WITH items AS (
           SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         pc AS (SELECT p, count(*) AS c FROM items GROUP BY p),
         pairs AS (
           SELECT a.p AS pa, b.p AS pb, count(*) AS support
           FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS (
           SELECT pa AS item, pb AS neighbor, support FROM pairs
           UNION ALL SELECT pb, pa, support FROM pairs),
         scored AS (
           SELECT s.item, s.neighbor, s.support,
             round(s.support / sqrt(CAST(ci.c AS DOUBLE) * cn.c), 6)
               AS cosine
           FROM sym s JOIN pc ci ON ci.p = s.item
           JOIN pc cn ON cn.p = s.neighbor),
         ranked AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY item
             ORDER BY cosine DESC, neighbor ASC) AS INT) AS rank
           FROM scored)
         SELECT item, neighbor, CAST(support AS BIGINT) AS support,
           cosine, rank
         FROM ranked WHERE rank <= 5 ORDER BY item, rank""",
    "dq_referential" -> dqReferentialOracle,
    "q_events_holt" -> holtOracle,
    "als_rank1" -> alsRank1Oracle,
    "als_rank2" -> alsRank2Oracle,
    "q_events_poisson_trend" -> poissonTrendOracle,
    "q_cramers_v" ->
      """WITH cells AS (
           SELECT l_returnflag AS a, l_linestatus AS b, count(*) AS o
           FROM lineitem GROUP BY 1, 2),
         ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS na
                FROM cells GROUP BY a),
         cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS nb
                FROM cells GROUP BY b),
         nn AS (SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(count(DISTINCT a) AS BIGINT) AS r,
             CAST(count(DISTINCT b) AS BIGINT) AS c
           FROM cells),
         grid AS (
           SELECT ra.a, cb.b, ra.na, cb.nb, coalesce(cells.o, 0) AS o
           FROM ra CROSS JOIN cb
           LEFT JOIN cells ON cells.a = ra.a AND cells.b = cb.b),
         terms AS (
           SELECT grid.o, grid.na, grid.nb, nn.n, nn.r, nn.c,
             CAST(floor((CAST(grid.o AS DOUBLE) -
                 CAST(grid.na AS DOUBLE) * grid.nb / nn.n) *
               (grid.o - CAST(grid.na AS DOUBLE) * grid.nb / nn.n) /
               (CAST(grid.na AS DOUBLE) * grid.nb / nn.n) * 1e6 + 0.5)
               AS BIGINT) AS tq
           FROM grid CROSS JOIN nn)
         SELECT max(n) AS n, max(r) AS r, max(c) AS c,
           round(sum(tq) / 1e6, 4) AS chi2,
           CASE WHEN least(max(r), max(c)) > 1 THEN
             round(sqrt(sum(tq) / 1e6 /
               (CAST(max(n) AS DOUBLE) * (least(max(r), max(c)) - 1))), 6)
           END AS cramers_v
         FROM terms""",
    "q_discount_elasticity" ->
      """WITH b AS (
           SELECT l_returnflag AS g,
             CAST(round(l_discount * 100, 0) AS BIGINT) AS x,
             CAST(l_quantity AS BIGINT) AS y
           FROM lineitem),
         m AS (
           SELECT g, count(*) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM b GROUP BY g),
         c AS (
           SELECT g, CAST(n AS BIGINT) AS n,
             CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) AS cov,
             CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) AS varx,
             CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE) AS vary,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
           FROM m)
         SELECT g AS l_returnflag, n,
           CASE WHEN varx > 0 THEN round(cov / varx, 6) END AS slope,
           CASE WHEN varx > 0
             THEN round((syd - (cov / varx) * sxd) / n, 6) END
             AS intercept,
           CASE WHEN varx > 0 AND vary > 0
             THEN round(cov * cov / (varx * vary), 6) END AS r2
         FROM c ORDER BY 1""",
    "q_ship_delay_sla" ->
      """WITH j AS (
           SELECT o.o_orderpriority AS g,
             date_diff('day', CAST(o.o_orderdate AS DATE),
               CAST(l.l_shipdate AS DATE)) AS v
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         blocks AS (SELECT g, CAST(v AS BIGINT) AS v, count(*) AS cnt
                    FROM j GROUP BY 1, 2),
         cm AS (SELECT g, v, cnt,
             sum(cnt) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM blocks),
         totals AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n
                    FROM blocks GROUP BY g),
         thr AS (
           SELECT cm.g,
             min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50,
             min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN v END) AS p90,
             min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99
           FROM cm JOIN totals ON cm.g = totals.g GROUP BY cm.g),
         sh AS (SELECT g,
             round(sum(CASE WHEN v > 30 THEN 1 ELSE 0 END) /
               CAST(count(*) AS DOUBLE), 6) AS share_gt_30
           FROM j GROUP BY g)
         SELECT thr.g AS o_orderpriority, totals.n, thr.p50, thr.p90,
           thr.p99, sh.share_gt_30
         FROM thr JOIN totals ON thr.g = totals.g
         JOIN sh ON sh.g = thr.g
         ORDER BY 1""",
    "basket_sequel_rules" ->
      """WITH items AS (
           SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS p,
             o.o_orderdate AS d
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         pr AS (
           SELECT DISTINCT a.cust, a.p AS pa, b.p AS pb
           FROM items a JOIN items b ON a.cust = b.cust
             AND a.d < b.d AND a.p <> b.p),
         sup AS (SELECT pa, pb, count(*) AS n_customers
                 FROM pr GROUP BY 1, 2 HAVING count(*) >= 2),
         ca AS (SELECT p, count(*) AS n_a
                FROM (SELECT DISTINCT cust, p FROM items) GROUP BY p)
         SELECT s.pa AS part_a, s.pb AS part_b,
           CAST(s.n_customers AS BIGINT) AS n_customers,
           round(CAST(s.n_customers AS DOUBLE) / ca.n_a, 6) AS confidence
         FROM sup s JOIN ca ON ca.p = s.pa
         ORDER BY confidence DESC, part_a, part_b LIMIT 20""",
    "q_events_winsorized" ->
      """WITH blocks AS (
           SELECT event_type AS g,
             CAST(round(value * 100, 0) AS BIGINT) AS c, count(*) AS cnt
           FROM events GROUP BY 1, 2),
         cm AS (SELECT g, c, cnt,
             sum(cnt) OVER (PARTITION BY g ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM blocks),
         totals AS (
           SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(c * cnt) AS BIGINT) AS sc,
             (CAST(sum(cnt) AS BIGINT) * 5 + 99) // 100 AS klo,
             (CAST(sum(cnt) AS BIGINT) * 95 + 99) // 100 AS khi
           FROM blocks GROUP BY g),
         thr AS (
           SELECT cm.g, min(CASE WHEN cum >= klo THEN c END) AS p_lo,
             min(CASE WHEN cum >= khi THEN c END) AS p_hi
           FROM cm JOIN totals ON cm.g = totals.g GROUP BY cm.g),
         fin AS (
           SELECT b.g, t.n, t.sc, r.p_lo, r.p_hi,
             CAST(sum(least(greatest(b.c, r.p_lo), r.p_hi) * b.cnt)
               AS BIGINT) AS scw
           FROM blocks b JOIN thr r ON b.g = r.g
           JOIN totals t ON b.g = t.g
           GROUP BY 1, 2, 3, 4, 5)
         SELECT g AS event_type, n,
           round(p_lo / 100.0, 2) AS p05, round(p_hi / 100.0, 2) AS p95,
           round(CAST(sc AS DOUBLE) / n / 100.0, 4) AS mean,
           round(CAST(scw AS DOUBLE) / n / 100.0, 4) AS winsorized_mean
         FROM fin ORDER BY 1""",
    "q_events_mann_kendall" ->
      """WITH daily AS (
           SELECT event_type AS k, CAST(ts AS DATE) AS d, count(*) AS c
           FROM events GROUP BY 1, 2),
         s AS (
           SELECT a.k,
             CAST(sum(CASE WHEN b.c > a.c THEN 1
               WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s
           FROM daily a JOIN daily b ON a.k = b.k AND a.d < b.d
           GROUP BY a.k),
         ties AS (
           SELECT k, CAST(sum(t) AS BIGINT) AS n,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
           FROM (SELECT k, c, count(*) AS t FROM daily GROUP BY k, c)
           GROUP BY k),
         j AS (
           SELECT ties.k, ties.n, s.s,
             (ties.n * (ties.n - 1) * (2 * ties.n + 5) - ties.tsum) / 18.0
               AS var_s
           FROM ties JOIN s ON s.k = ties.k)
         SELECT k AS event_type, n AS n_days, s,
           round(var_s, 4) AS var_s,
           CASE WHEN var_s > 0 THEN
             round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
               WHEN s < 0 THEN (s + 1) / sqrt(var_s) ELSE 0.0 END, 4)
           END AS z
         FROM j ORDER BY event_type""",
    "q_events_stickiness" ->
      """WITH ud AS (
           SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
           FROM events),
         days AS (SELECT DISTINCT d AS rd FROM ud),
         fan AS (
           SELECT u, o, d + CAST(o AS INT) AS rd
           FROM ud CROSS JOIN (SELECT unnest(range(0, 28)) AS o)),
         g AS (
           SELECT f.rd,
             count(DISTINCT CASE WHEN o = 0 THEN u END) AS dau,
             count(DISTINCT CASE WHEN o < 7 THEN u END) AS wau,
             count(DISTINCT u) AS mau
           FROM fan f JOIN days ON days.rd = f.rd GROUP BY f.rd)
         SELECT rd AS d, CAST(dau AS BIGINT) AS dau,
           CAST(wau AS BIGINT) AS wau, CAST(mau AS BIGINT) AS mau,
           round(CAST(dau AS DOUBLE) / wau, 4) AS dau_wau,
           round(CAST(dau AS DOUBLE) / mau, 4) AS dau_mau
         FROM g ORDER BY d""",
    "q_power_analysis" -> powerAnalysisOracle,
    "graph_kcore" -> kcoreOracle,
    "graph_link_pred" -> linkPredOracle,
    "q_t_closeness" ->
      """WITH base AS (
           SELECT c_nationkey AS q1, c_mktsegment AS q2,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS v
           FROM customer),
         cell AS (SELECT q1, q2, v, count(*) AS c FROM base GROUP BY 1, 2, 3),
         cls AS (SELECT q1, q2, CAST(sum(c) AS BIGINT) AS nc
                 FROM cell GROUP BY 1, 2),
         vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS gv FROM cell GROUP BY 1),
         tot AS (SELECT CAST(sum(gv) AS BIGINT) AS nn,
                   CAST(count(*) AS BIGINT) AS m FROM vals),
         grid AS (
           SELECT cls.q1, cls.q2, cls.nc, vals.v, vals.gv,
             coalesce(cell.c, 0) AS c, tot.nn, tot.m
           FROM cls CROSS JOIN vals
           LEFT JOIN cell ON cell.q1 = cls.q1 AND cell.q2 = cls.q2
             AND cell.v = vals.v
           CROSS JOIN tot),
         cum AS (
           SELECT q1, q2, nc, nn, m,
             sum(CAST(c AS HUGEINT) * nn - CAST(gv AS HUGEINT) * nc)
               OVER (PARTITION BY q1, q2 ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cu
           FROM grid),
         pc AS (
           SELECT q1, q2,
             CASE WHEN max(m) > 1 THEN
               CAST(floor(CAST(sum(abs(cu)) AS DOUBLE) /
                 (CAST(max(nc) AS DOUBLE) * max(nn) * (max(m) - 1)) *
                 1e9 + 0.5) AS BIGINT)
             ELSE 0 END AS emdq
           FROM cum GROUP BY q1, q2)
         SELECT CAST(count(*) AS BIGINT) AS n_classes,
           (SELECT m FROM tot) AS n_values,
           round(CAST(max(emdq) AS DOUBLE) / 1e9, 6) AS t_closeness,
           round(CAST(sum(emdq) AS DOUBLE) / 1e9 / count(*), 6) AS avg_emd
         FROM pc""",
    "dq_functional_deps" -> fdAuditOracle,
    "retrieval_map" -> retrievalMapOracle,
    "emb_davies_bouldin" -> daviesBouldinOracle,
    "q_events_ewma" -> ewmaOracle,
    "markov_attribution" -> markovAttributionOracle,
    "graph_lpa" -> lpaOracle,
    "q_events_hurst" -> hurstOracle,
    "q_events_holt_winters" -> holtWintersOracle,
    "q_events_mad" ->
      """WITH daily AS (
           SELECT event_type AS k, CAST(ts AS DATE) AS d, count(*) AS c
           FROM events GROUP BY 1, 2),
         blocks AS (SELECT k, c AS v, count(*) AS cnt
           FROM daily GROUP BY 1, 2),
         cum AS (SELECT k, v, sum(cnt) OVER (PARTITION BY k ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM blocks),
         tot AS (SELECT k, CAST(sum(cnt) AS BIGINT) AS n
           FROM blocks GROUP BY k),
         med AS (SELECT c.k,
             min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS med
           FROM cum c JOIN tot ON tot.k = c.k GROUP BY c.k),
         dev AS (SELECT d.k, d.d, d.c, m.med, abs(d.c - m.med) AS dv
           FROM daily d JOIN med m ON m.k = d.k),
         dblocks AS (SELECT k, dv AS v, count(*) AS cnt
           FROM dev GROUP BY 1, 2),
         dcum AS (SELECT k, v, sum(cnt) OVER (PARTITION BY k ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM dblocks),
         dtot AS (SELECT k, CAST(sum(cnt) AS BIGINT) AS n
           FROM dblocks GROUP BY k),
         madt AS (SELECT c.k,
             min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS mad
           FROM dcum c JOIN dtot ON dtot.k = c.k GROUP BY c.k),
         z AS (SELECT dev.k, dev.d, dev.med, madt.mad,
             0.6745 * CAST(dev.c - dev.med AS DOUBLE) / madt.mad AS z
           FROM dev JOIN madt ON madt.k = dev.k)
         SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(med) AS BIGINT) AS median,
           CAST(max(mad) AS BIGINT) AS mad,
           CAST(sum(CASE WHEN mad > 0 AND abs(z) > 3.5 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers,
           round(max(CASE WHEN mad > 0 THEN abs(z) END), 4) AS max_abs_z,
           min(CASE WHEN mad > 0 AND abs(z) > 3.5 THEN d END)
             AS first_outlier_day
         FROM z GROUP BY k ORDER BY 1""",
    "q_price_index" ->
      """WITH cell AS (
           SELECT * FROM (
             SELECT l_partkey AS i, year(l_shipdate) AS t,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS sp,
               CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
                 AS sq
             FROM lineitem GROUP BY 1, 2)
           WHERE sq > 0),
         b0 AS (SELECT min(t) AS t0 FROM cell),
         b AS (SELECT i, sp AS sp0, sq AS sq0 FROM cell, b0
               WHERE t = t0),
         j AS (SELECT cell.t, cell.i, cell.sp, cell.sq, b.sp0, b.sq0
           FROM cell JOIN b ON b.i = cell.i, b0 WHERE cell.t <> b0.t0),
         agg AS (SELECT t, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(floor(CAST(CAST(sp AS HUGEINT) * sq0 AS DOUBLE)
               / sq * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS ln,
             CAST(sum(sp0) AS BIGINT) AS ld,
             CAST(sum(sp) AS BIGINT) AS pn,
             CAST(sum(CAST(floor(CAST(CAST(sp0 AS HUGEINT) * sq AS DOUBLE)
               / sq0 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS pd
           FROM j GROUP BY t)
         SELECT CAST(t AS INT) AS period, n_items,
           CASE WHEN ld > 0 THEN
             round(CAST(ln AS DOUBLE) / 1e6 / ld, 6) END AS laspeyres,
           CASE WHEN pd > 0 THEN
             round(CAST(pn AS DOUBLE) / (CAST(pd AS DOUBLE) / 1e6), 6)
           END AS paasche,
           CASE WHEN ld > 0 AND pd > 0 THEN
             round(sqrt((CAST(ln AS DOUBLE) / 1e6 / ld) *
               (CAST(pn AS DOUBLE) / (CAST(pd AS DOUBLE) / 1e6))), 6)
           END AS fisher
         FROM agg ORDER BY 1""",
    "paragraph_dup_stats" ->
      """WITH aug AS (SELECT doc_id, source, text ||
             CASE WHEN doc_id % 4 = 0 THEN chr(10) || chr(10) ||
               '(c) example corp all rights reserved' ELSE '' END ||
             CASE WHEN doc_id % 5 = 2 THEN chr(10) || chr(10) ||
               'subscribe to our newsletter today' ELSE '' END AS t2
           FROM documents),
         paras AS (SELECT doc_id, source AS src,
             unnest(list_filter(list_transform(
               string_split(t2, chr(10) || chr(10)), p -> trim(p)),
               p -> len(p) > 0)) AS para
           FROM aug),
         dfq AS (SELECT para, count(DISTINCT doc_id) AS nd
                 FROM paras GROUP BY 1),
         per AS (SELECT src, count(*) AS n_paras,
             sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS n_dup,
             sum(len(para)) AS n_chars,
             sum(CASE WHEN nd >= 2 THEN len(para) ELSE 0 END) AS ndc
           FROM paras JOIN dfq USING (para) GROUP BY src)
         SELECT src AS source, CAST(n_paras AS BIGINT) AS n_paras,
           CAST(n_dup AS BIGINT) AS n_dup_paras,
           round(CAST(n_dup AS DOUBLE) / n_paras, 6) AS dup_para_share,
           round(CAST(ndc AS DOUBLE) / n_chars, 6) AS dup_char_share
         FROM per ORDER BY source""",
    "sample_class_balanced" -> classBalancedOracle,
    "q_events_srm" ->
      """WITH units AS (SELECT DISTINCT event_type AS g, user_id AS u,
             CAST(user_id % 2 AS INT) AS v FROM events),
         agg AS (SELECT g,
             CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
           FROM units GROUP BY g)
         SELECT g AS event_type, n_a, n_b,
           CASE WHEN n_a + n_b > 0 THEN
             round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) /
               (n_a + n_b), 6) END AS chi2,
           CASE WHEN n_a + n_b > 0 THEN
             CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) /
               (n_a + n_b) > 3.841 END AS srm_flag
         FROM agg ORDER BY 1""",
    "q_events_cliffs_delta" ->
      """WITH e AS (SELECT event_type AS g, CAST(user_id % 2 AS INT) AS v,
             CAST(round(value * 100, 0) AS BIGINT) AS x FROM events),
         bv AS (SELECT g, x,
             CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ta,
             CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tb
           FROM e GROUP BY 1, 2),
         cum AS (SELECT g, x, ta, tb,
             coalesce(sum(tb) OVER (PARTITION BY g ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bb,
             sum(tb) OVER (PARTITION BY g) AS bt
           FROM bv),
         agg AS (SELECT g, CAST(sum(ta) AS BIGINT) AS n_a,
             CAST(max(bt) AS BIGINT) AS n_b,
             CAST(sum(ta * bb) AS BIGINT) AS gt,
             CAST(sum(ta * (bt - bb - tb)) AS BIGINT) AS lt
           FROM cum GROUP BY g),
         d AS (SELECT *, CAST(gt - lt AS DOUBLE) /
             (CAST(n_a AS DOUBLE) * n_b) AS delta
           FROM agg WHERE n_a > 0 AND n_b > 0)
         SELECT g AS event_type, n_a, n_b, gt, lt,
           round(delta, 6) AS delta,
           CASE WHEN abs(delta) < 0.147 THEN 'negligible'
             WHEN abs(delta) < 0.33 THEN 'small'
             WHEN abs(delta) < 0.474 THEN 'medium'
             ELSE 'large' END AS magnitude
         FROM d ORDER BY 1""",
    "q_events_levene" ->
      """WITH base AS (SELECT event_type AS g,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
         blocks AS (SELECT g, c AS v, count(*) AS cnt
           FROM base GROUP BY 1, 2),
         cum AS (SELECT g, v, cnt,
             sum(cnt) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM blocks),
         tot AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n
           FROM blocks GROUP BY g),
         med AS (SELECT c.g,
             min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50
           FROM cum c JOIN tot ON tot.g = c.g GROUP BY c.g),
         e AS (SELECT b.g,
             CAST(floor((CAST(abs(b.c - m.p50) AS DOUBLE) / 100.0) * 100
               + 0.5) AS BIGINT) AS c
           FROM base b JOIN med m ON m.g = b.g),
         gg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng, sum(c) AS sg,
                  sum(c * c) AS sgg FROM e GROUP BY g),
         m AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(ng) AS BIGINT) AS n,
                 sum(sg) AS s, sum(sgg) AS ss,
                 sum(CAST(floor(CAST(sg * sg AS DOUBLE) / ng + 0.5)
                   AS HUGEINT)) AS bq
               FROM gg),
         m2 AS (SELECT *, CAST(floor(CAST(s * s AS DOUBLE) / n + 0.5)
                  AS HUGEINT) AS grand FROM m)
         SELECT k, n,
           round(CAST(bq - grand AS DOUBLE), 4) AS ssb,
           round(CAST(ss - grand AS DOUBLE) - CAST(bq - grand AS DOUBLE), 4)
             AS ssw,
           round(CAST(ss - grand AS DOUBLE), 4) AS sst,
           CASE WHEN k > 1 AND n > k AND
               (CAST(ss - grand AS DOUBLE) - CAST(bq - grand AS DOUBLE)) > 0
             THEN round((CAST(bq - grand AS DOUBLE) / CAST(k - 1 AS DOUBLE)) /
               ((CAST(ss - grand AS DOUBLE) - CAST(bq - grand AS DOUBLE)) /
                 CAST(n - k AS DOUBLE)), 4)
           END AS f_stat,
           CASE WHEN CAST(ss - grand AS DOUBLE) > 0
             THEN round(CAST(bq - grand AS DOUBLE) /
               CAST(ss - grand AS DOUBLE), 6)
           END AS eta_sq
         FROM m2""",
    "corpus_distinct_n" ->
      """WITH toksd AS (
           SELECT source AS g, list_filter(
             regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS t
           FROM documents),
         g1 AS (SELECT g, unnest(t) AS gram FROM toksd),
         i2 AS (SELECT g, t,
             unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
           FROM toksd),
         g2 AS (SELECT g, t[i] || ' ' || t[i + 1] AS gram FROM i2),
         i3 AS (SELECT g, t,
             unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
           FROM toksd),
         g3 AS (SELECT g, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
             AS gram FROM i3),
         u AS (
           SELECT g, 1 AS n, count(*) AS n_grams,
             count(DISTINCT gram) AS n_unique FROM g1 GROUP BY g
           UNION ALL SELECT g, 2, count(*), count(DISTINCT gram)
             FROM g2 GROUP BY g
           UNION ALL SELECT g, 3, count(*), count(DISTINCT gram)
             FROM g3 GROUP BY g)
         SELECT g AS source, CAST(n AS INT) AS n,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_unique AS BIGINT) AS n_unique,
           round(CAST(n_unique AS DOUBLE) / n_grams, 6) AS distinct_n
         FROM u ORDER BY source, n""",
    "q_events_pacf" ->
      """WITH daily AS (
           SELECT event_type AS k, CAST(ts AS DATE) AS d, count(*) AS c
           FROM events GROUP BY 1, 2),
         idx AS (SELECT k, c,
             row_number() OVER (PARTITION BY k ORDER BY d) AS i
           FROM daily),
         tot AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s, sum(c * c) AS sxx
           FROM idx GROUP BY k),
         lags AS (SELECT unnest(range(1, 4)) AS lag),
         pairs AS (SELECT a.k, l.lag, a.c AS ca, b.c AS cb
           FROM idx a CROSS JOIN lags l
           JOIN idx b ON b.k = a.k AND b.i = a.i + l.lag),
         agg AS (SELECT k, lag, sum(ca * cb) AS sxy,
             CAST(sum(ca) AS BIGINT) AS sh, CAST(sum(cb) AS BIGINT) AS st,
             CAST(count(*) AS BIGINT) AS n_pairs
           FROM pairs GROUP BY 1, 2),
         rr AS (
           SELECT t.k, t.n, a.lag,
             CASE WHEN CAST(t.sxx AS DOUBLE)
                    - CAST(t.s AS DOUBLE) * (CAST(t.s AS DOUBLE) / t.n) > 0
               THEN (CAST(a.sxy AS DOUBLE)
                   - (CAST(t.s AS DOUBLE) / t.n) * CAST(a.sh AS DOUBLE)
                   - (CAST(t.s AS DOUBLE) / t.n) * CAST(a.st AS DOUBLE)
                   + CAST(a.n_pairs AS DOUBLE) * (CAST(t.s AS DOUBLE) / t.n)
                     * (CAST(t.s AS DOUBLE) / t.n))
                 / (CAST(t.sxx AS DOUBLE)
                   - CAST(t.s AS DOUBLE) * (CAST(t.s AS DOUBLE) / t.n))
             END AS r
           FROM agg a JOIN tot t ON a.k = t.k),
         pv AS (SELECT k, max(n) AS n,
             max(CASE WHEN lag = 1 THEN r END) AS r1,
             max(CASE WHEN lag = 2 THEN r END) AS r2,
             max(CASE WHEN lag = 3 THEN r END) AS r3
           FROM rr GROUP BY k),
         p2 AS (SELECT *, (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22 FROM pv),
         p3 AS (SELECT *, r1 - p22 * r1 AS p21 FROM p2)
         SELECT k AS event_type, n AS n_days,
           round(r1, 4) AS pacf1,
           CASE WHEN abs(1.0 - r1 * r1) > 1e-12
             THEN round(p22, 4) END AS pacf2,
           CASE WHEN abs(1.0 - r1 * r1) > 1e-12
             AND abs(1.0 - p21 * r1 - p22 * r2) > 1e-12
             THEN round((r3 - p21 * r2 - p22 * r1) /
               (1.0 - p21 * r1 - p22 * r2), 4)
           END AS pacf3
         FROM p3 ORDER BY event_type""",
    "markdown_profile" ->
      """WITH aug AS (SELECT doc_id, text ||
             CASE WHEN doc_id % 6 = 0 THEN chr(10) || '# heading one' ||
               chr(10) || '## heading two' ELSE '' END ||
             CASE WHEN doc_id % 6 = 1 THEN chr(10) || '```' || chr(10) ||
               'code block' || chr(10) || '```' ELSE '' END ||
             CASE WHEN doc_id % 6 = 2 THEN chr(10) || '- item one' ||
               chr(10) || '- item two' || chr(10) || '* item three'
               ELSE '' END ||
             CASE WHEN doc_id % 6 = 3
               THEN ' see [link](http://example.com) and [two](http://x.y)'
               ELSE '' END AS t2
           FROM documents),
         ln AS (SELECT doc_id, string_split(t2, chr(10)) AS ls, t2
                FROM aug),
         sig AS (SELECT doc_id,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(len(list_filter(ls,
               l -> regexp_matches(l, '^#{1,6} '))) AS BIGINT) AS n_headings,
             CAST(len(list_filter(ls,
               l -> regexp_matches(l, '^```'))) AS BIGINT) AS n_fences,
             CAST(len(list_filter(ls,
               l -> regexp_matches(l, '^[-*] '))) AS BIGINT) AS n_list_lines,
             CAST(len(regexp_extract_all(t2, '\[[^\]]+\]\([^)]+\)'))
               AS BIGINT) AS n_links
           FROM ln)
         SELECT doc_id, n_lines, n_headings, n_fences, n_list_lines,
           n_links,
           CAST((CASE WHEN n_headings > 0 THEN 1 ELSE 0 END) +
             (CASE WHEN n_fences > 0 THEN 1 ELSE 0 END) +
             (CASE WHEN n_list_lines > 0 THEN 1 ELSE 0 END) +
             (CASE WHEN n_links > 0 THEN 1 ELSE 0 END) AS INT)
             AS md_signals
         FROM sig ORDER BY doc_id""",
    "q_hhi_concentration" ->
      """WITH li AS (
           SELECT l_suppkey,
             CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
               AS BIGINT) AS cents
           FROM lineitem),
         j AS (SELECT s.s_nationkey AS g, s.s_suppkey AS u, cents
           FROM li JOIN supplier s ON s.s_suppkey = li.l_suppkey),
         units AS (SELECT g, u, CAST(sum(cents) AS BIGINT) AS v
           FROM j GROUP BY 1, 2),
         tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(v) AS BIGINT) AS tv, CAST(max(v) AS BIGINT) AS mv
           FROM units GROUP BY g),
         hq AS (SELECT units.g,
             CAST(sum(CAST(floor((CAST(v AS DOUBLE) / tv) *
               (CAST(v AS DOUBLE) / tv) * 1e10 + 0.5) AS BIGINT))
               AS BIGINT) AS hq
           FROM units JOIN tot ON tot.g = units.g GROUP BY units.g)
         SELECT t.g AS s_nationkey, t.n_units, t.tv AS total,
           round(CAST(t.mv AS DOUBLE) / t.tv, 6) AS top_share,
           round(CAST(hq AS DOUBLE) / 1e6, 2) AS hhi,
           CASE WHEN hq > 0 THEN round(1e10 / hq, 4) END AS n_effective
         FROM tot t JOIN hq ON hq.g = t.g ORDER BY 1""",
    "lexical_diversity" ->
      """WITH toks AS (
           SELECT source AS g, unnest(list_filter(
             regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0)) AS tok
           FROM documents),
         tc AS (SELECT g, tok, count(*) AS c FROM toks GROUP BY 1, 2),
         m AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
             sum(CAST(c AS HUGEINT) * c) AS sc2
           FROM tc GROUP BY g)
         SELECT g AS source, n_tokens, n_types, n_hapax,
           round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
           round(CAST(n_hapax AS DOUBLE) / n_types, 6) AS hapax_share,
           round(1e4 * (CAST(sc2 AS DOUBLE) - n_tokens) /
             (CAST(n_tokens AS DOUBLE) * n_tokens), 4) AS yule_k
         FROM m ORDER BY source""",
    "sample_neyman_alloc" ->
      """WITH m AS (
           SELECT source AS h, count(*) AS nh,
             sum(CAST(n_chars AS HUGEINT)) AS sy,
             sum(CAST(n_chars AS HUGEINT) * n_chars) AS syy
           FROM documents GROUP BY 1),
         wgt AS (
           SELECT h, CAST(nh AS BIGINT) AS nh,
             sqrt(CAST(syy AS DOUBLE) / nh -
               (CAST(sy AS DOUBLE) / nh) * (CAST(sy AS DOUBLE) / nh))
               AS sh,
             CAST(floor(nh * sqrt(CAST(syy AS DOUBLE) / nh -
               (CAST(sy AS DOUBLE) / nh) * (CAST(sy AS DOUBLE) / nh))
               * 1e6 + 0.5) AS BIGINT) AS wq
           FROM m),
         tot AS (SELECT CAST(sum(wq) AS BIGINT) AS wt FROM wgt),
         based AS (
           SELECT h, nh, sh, wq, (1000 * wq) // wt AS base,
             1000 * wq - ((1000 * wq) // wt) * wt AS rem
           FROM wgt CROSS JOIN tot),
         spare AS (SELECT 1000 - CAST(sum(base) AS BIGINT) AS spare
                   FROM based),
         ranked AS (SELECT *,
             row_number() OVER (ORDER BY rem DESC, h ASC) AS rk
           FROM based)
         SELECT h AS source, nh AS n_pop, round(sh, 4) AS std,
           CAST(base + CASE WHEN rk <= spare THEN 1 ELSE 0 END AS BIGINT)
             AS n_alloc,
           round(CAST(base + CASE WHEN rk <= spare THEN 1 ELSE 0 END
             AS DOUBLE) / nh, 6) AS sampling_fraction
         FROM ranked CROSS JOIN spare ORDER BY 1""",
    "q_events_did" ->
      """WITH bounds AS (
           SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
           FROM events),
         pu AS (
           SELECT user_id,
             sum(CASE WHEN epoch_us(ts) <= mid AND event_type = 'purchase'
               THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
               AS y1,
             sum(CASE WHEN epoch_us(ts) > mid AND event_type = 'purchase'
               THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
               AS y2
           FROM events CROSS JOIN bounds GROUP BY user_id),
         units AS (
           SELECT CAST(user_id % 2 AS INT) AS tr, 1 AS pd, y1 AS y FROM pu
           UNION ALL
           SELECT CAST(user_id % 2 AS INT), 2, y2 FROM pu),
         cells AS (SELECT tr, pd, count(*) AS n, sum(y) AS sy
                   FROM units GROUP BY tr, pd),
         agg AS (
           SELECT CAST(sum(n) AS BIGINT) AS n_units_periods,
             max(CASE WHEN tr = 1 AND pd = 1
               THEN CAST(sy AS DOUBLE) / n / 100.0 END) AS t1,
             max(CASE WHEN tr = 1 AND pd = 2
               THEN CAST(sy AS DOUBLE) / n / 100.0 END) AS t2,
             max(CASE WHEN tr = 0 AND pd = 1
               THEN CAST(sy AS DOUBLE) / n / 100.0 END) AS c1,
             max(CASE WHEN tr = 0 AND pd = 2
               THEN CAST(sy AS DOUBLE) / n / 100.0 END) AS c2
           FROM cells)
         SELECT n_units_periods, round(t1, 4) AS treated_pre,
           round(t2, 4) AS treated_post, round(c1, 4) AS control_pre,
           round(c2, 4) AS control_post,
           round((t2 - t1) - (c2 - c1), 4) AS did
         FROM agg""",
    "collocations_llr" ->
      """WITH toks AS (
           SELECT list_filter(regexp_split_to_array(trim(lower(text)),
             '\s+'), x -> len(x) > 0) AS tk FROM documents),
         b0 AS (SELECT tk,
             unnest(generate_series(1, greatest(len(tk) - 1, 0))) AS i
           FROM toks),
         big AS (SELECT tk[i] AS w1, tk[i+1] AS w2 FROM b0),
         bcnt AS (SELECT w1, w2, count(*) AS k11 FROM big GROUP BY 1, 2),
         f1 AS (SELECT w1, count(*) AS r1 FROM big GROUP BY w1),
         f2 AS (SELECT w2, count(*) AS c1t FROM big GROUP BY w2),
         nt AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM big),
         j AS (SELECT b.w1, b.w2, b.k11, f1.r1, f2.c1t, nt.nn
               FROM bcnt b JOIN f1 ON b.w1 = f1.w1
               JOIN f2 ON b.w2 = f2.w2 CROSS JOIN nt
               WHERE b.k11 >= 5)
         SELECT w1, w2, CAST(k11 AS BIGINT) AS c_xy,
           round(2.0 * (
             (CASE WHEN k11 > 0 THEN CAST(k11 AS DOUBLE) *
               ln(CAST(k11 AS DOUBLE) * nn /
                 (CAST(r1 AS DOUBLE) * c1t)) ELSE 0.0 END) +
             (CASE WHEN r1 - k11 > 0 THEN CAST(r1 - k11 AS DOUBLE) *
               ln(CAST(r1 - k11 AS DOUBLE) * nn /
                 (CAST(r1 AS DOUBLE) * (CAST(nn AS DOUBLE) - c1t)))
               ELSE 0.0 END) +
             (CASE WHEN c1t - k11 > 0 THEN CAST(c1t - k11 AS DOUBLE) *
               ln(CAST(c1t - k11 AS DOUBLE) * nn /
                 ((CAST(nn AS DOUBLE) - r1) * c1t)) ELSE 0.0 END) +
             (CASE WHEN nn - r1 - c1t + k11 > 0
               THEN CAST(nn - r1 - c1t + k11 AS DOUBLE) *
                 ln(CAST(nn - r1 - c1t + k11 AS DOUBLE) * nn /
                   ((CAST(nn AS DOUBLE) - r1) *
                    (CAST(nn AS DOUBLE) - c1t))) ELSE 0.0 END)
           ), 4) AS llr_g2
         FROM j ORDER BY llr_g2 DESC, w1, w2 LIMIT 30""",
    "emb_isotropy" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         wn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
                FROM e WHERE sqrt(list_dot_product(v, v)) > 0),
         ns AS (SELECT CAST(count(*) AS BIGINT) AS n,
             round(min(nrm), 6) AS min_norm,
             round(max(nrm), 6) AS max_norm,
             CAST(sum(CAST(floor(nrm * 1e9 + 0.5) AS HUGEINT)) AS DOUBLE)
               / 1e9 AS sum_nrm
           FROM wn),
         ex AS (SELECT vec_id, nrm,
             unnest(generate_series(1, len(v))) AS d1, v
           FROM wn),
         ds AS (SELECT d1,
             sum(CAST(floor(v[d1] / nrm * 1e9 + 0.5) AS HUGEINT)) AS sq
           FROM ex GROUP BY d1),
         dd AS (SELECT CAST(count(*) AS BIGINT) AS dim,
             CAST(sum(CAST(floor((CAST(sq AS DOUBLE) / 1e9) *
               (CAST(sq AS DOUBLE) / 1e9) * 1e9 + 0.5) AS HUGEINT))
               AS DOUBLE) / 1e9 AS s2
           FROM ds)
         SELECT ns.n, dd.dim,
           round((dd.s2 - ns.n) /
             (CAST(ns.n AS DOUBLE) * (ns.n - 1)), 6)
             AS mean_pairwise_cos,
           round(ns.sum_nrm / ns.n, 6) AS mean_norm,
           ns.min_norm, ns.max_norm
         FROM ns CROSS JOIN dd""",
    "lr_ece" ->
      s"""WITH $lrTrainCte,
          sc AS (SELECT doc_id, y, round(sum(w), 12) AS m
                 FROM db JOIN w3 USING (b) GROUP BY doc_id, y),
          pb AS (SELECT y, 1.0 / (1.0 + exp(-m)) AS p FROM sc),
          binned AS (SELECT y, p,
              least(CAST(floor(p * 10) AS BIGINT), 9) AS bin
            FROM pb),
          perbin AS (SELECT bin, count(*) AS n_b,
              sum(CAST(floor(p * 1e12 + 0.5) AS HUGEINT)) AS spq,
              sum(y) AS sy
            FROM binned GROUP BY bin),
          g AS (SELECT bin, n_b,
              abs(spq - CAST(sy AS HUGEINT) * 1000000000000) AS gap_q
            FROM perbin)
          SELECT CAST(sum(n_b) AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS n_bins_nonempty,
            round(CAST(sum(gap_q) AS DOUBLE) / 1e12 / sum(n_b), 6)
              AS ece,
            round(max(CAST(gap_q AS DOUBLE) / 1e12 / n_b), 6)
              AS max_bin_gap
          FROM g""",
    "lr_conformal" ->
      s"""WITH $lrTrainCte,
          sc AS (SELECT doc_id, y, round(sum(w), 12) AS m
                 FROM db JOIN w3 USING (b) GROUP BY doc_id, y),
          pb AS (SELECT doc_id, y, 1.0 / (1.0 + exp(-m)) AS p FROM sc),
          sq AS (SELECT doc_id, y, p,
              CAST(floor((CASE WHEN y = 1 THEN 1.0 - p ELSE p END)
                * 1e12 + 0.5) AS BIGINT) AS sq
            FROM pb),
          calib AS (SELECT * FROM sq WHERE doc_id % 2 = 0),
          test AS (SELECT * FROM sq WHERE doc_id % 2 <> 0),
          nc AS (SELECT CAST(count(*) AS BIGINT) AS n_calib,
              least(CAST(ceil((count(*) + 1) * CAST(0.9 AS DOUBLE))
                AS BIGINT), count(*)) AS k
            FROM calib),
          ranked AS (SELECT sq,
              row_number() OVER (ORDER BY sq, doc_id) AS rk
            FROM calib),
          thr AS (SELECT nc.n_calib, ranked.sq AS thr_q
                  FROM ranked CROSS JOIN nc WHERE ranked.rk = nc.k),
          agg AS (SELECT count(*) AS n_test,
              sum(CASE WHEN t.sq <= thr.thr_q THEN 1 ELSE 0 END)
                AS n_covered,
              sum((CASE WHEN CAST(floor((1.0 - t.p) * 1e12 + 0.5)
                    AS BIGINT) <= thr.thr_q THEN 1 ELSE 0 END) +
                  (CASE WHEN CAST(floor(t.p * 1e12 + 0.5) AS BIGINT)
                    <= thr.thr_q THEN 1 ELSE 0 END)) AS set_sz
            FROM test t CROSS JOIN thr)
          SELECT thr.n_calib, CAST(agg.n_test AS BIGINT) AS n_test,
            round(thr.thr_q / 1e12, 6) AS threshold,
            round(CAST(agg.n_covered AS DOUBLE) / agg.n_test, 6)
              AS coverage,
            round(CAST(agg.set_sz AS DOUBLE) / agg.n_test, 6)
              AS avg_set_size
          FROM agg CROSS JOIN thr""",
    "gate_parity_audit" ->
      s"""WITH e AS ($qualityEnsembleOracle),
          j AS (SELECT d.lang, CASE WHEN e.keep THEN 1 ELSE 0 END AS k
                FROM e JOIN documents d USING (doc_id)),
          per AS (SELECT lang, count(*) AS n, sum(k) AS n_keep
                  FROM j GROUP BY lang),
          pooled AS (SELECT count(*) AS nt, sum(k) AS kt FROM j)
          SELECT lang, CAST(n AS BIGINT) AS n,
            CAST(n_keep AS BIGINT) AS n_keep,
            round(CAST(n_keep AS DOUBLE) / n, 6) AS keep_rate,
            round((CAST(n_keep AS DOUBLE) / n) /
              (CAST(kt AS DOUBLE) / nt), 6) AS rate_ratio,
            (CAST(n_keep AS DOUBLE) / n) <
              (CAST(kt AS DOUBLE) / nt) * CAST(0.8 AS DOUBLE)
              AS four_fifths_flag
          FROM per CROSS JOIN pooled ORDER BY lang""",
    "lr_brier" ->
      s"""WITH $lrTrainCte,
          sc AS (SELECT doc_id, y, round(sum(w), 12) AS m
                 FROM db JOIN w3 USING (b) GROUP BY doc_id, y),
          pb AS (SELECT y, 1.0 / (1.0 + exp(-m)) AS p FROM sc),
          agg AS (SELECT count(*) AS n, sum(y) AS n_pos,
              sum(CAST(floor((p - y) * (p - y) * 1e12 + 0.5) AS HUGEINT))
                AS sq
            FROM pb),
          b2 AS (SELECT n, n_pos, CAST(n_pos AS DOUBLE) / n AS base,
              CAST(sq AS DOUBLE) / 1e12 / n AS br
            FROM agg)
          SELECT CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
            round(base, 6) AS base_rate, round(br, 6) AS brier,
            CASE WHEN base > 0 AND base < 1
              THEN round(1.0 - br / (base * (1.0 - base)), 6)
            END AS brier_skill
          FROM b2""",
    "vocab_heaps_fit" -> heapsFitOracle,
    "seq_pattern_3" ->
      """WITH ut AS (
           SELECT user_id AS u, event_type AS tau,
             min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
           FROM events GROUP BY 1, 2),
         t2 AS (
           SELECT e.user_id AS u, f.a, e.event_type AS b,
             min(epoch_us(e.ts)) AS tb
           FROM events e JOIN (SELECT u, tau AS a, mn AS ta FROM ut) f
             ON e.user_id = f.u
           WHERE epoch_us(e.ts) > f.ta
           GROUP BY 1, 2, 3),
         sup AS (
           SELECT t2.a, t2.b, cc.tau AS c, count(*) AS support
           FROM t2 JOIN ut cc ON cc.u = t2.u
           WHERE cc.mx > t2.tb
           GROUP BY 1, 2, 3),
         nu AS (SELECT count(DISTINCT user_id) AS n_users FROM events)
         SELECT a, b, c, CAST(support AS BIGINT) AS support,
           round(CAST(support AS DOUBLE) / n_users, 6) AS share
         FROM sup CROSS JOIN nu
         ORDER BY support DESC, a, b, c LIMIT 20""",
    "q_events_burstiness" ->
      """WITH g0 AS (
           SELECT event_type AS k, CAST(ts AS DATE) AS d, epoch_us(ts)
             AS t, event_id AS id
           FROM events),
         g1 AS (SELECT k, t - lag(t) OVER (PARTITION BY k, d
                  ORDER BY t, id) AS g
                FROM g0),
         gaps AS (SELECT k, count(*) AS n_gaps,
             sum(CAST(g AS HUGEINT)) AS sg,
             sum(CAST(g AS HUGEINT) * g) AS sgg
           FROM g1 WHERE g IS NOT NULL GROUP BY k),
         h0 AS (SELECT event_type AS k, epoch_us(ts) // 3600000000 AS b
                FROM events),
         hc AS (SELECT k, b, count(*) AS c FROM h0 GROUP BY 1, 2),
         hs AS (SELECT k, count(*) AS n_buckets, sum(c) AS sc,
             sum(CAST(c AS HUGEINT) * c) AS scc
           FROM hc GROUP BY k),
         gm AS (SELECT k, n_gaps, sg, sgg,
             CAST(sg AS DOUBLE) / n_gaps AS m
           FROM gaps),
         hm AS (SELECT k, n_buckets, sc, scc,
             CAST(sc AS DOUBLE) / n_buckets AS mc
           FROM hs)
         SELECT g.k AS event_type, CAST(g.n_gaps AS BIGINT) AS n_gaps,
           CAST(h.n_buckets AS BIGINT) AS n_buckets,
           round(g.m / 1e6, 3) AS mean_gap_s,
           CASE WHEN g.n_gaps > 0 AND g.sg > 0 THEN
             round((CAST(g.sgg AS DOUBLE) / g.n_gaps - g.m * g.m) /
               (g.m * g.m), 6) END AS cv2,
           CASE WHEN h.sc > 0 THEN
             round((CAST(h.scc AS DOUBLE) / h.n_buckets - h.mc * h.mc) /
               h.mc, 6) END AS fano_hourly
         FROM gm g JOIN hm h ON g.k = h.k ORDER BY 1""",
    "dq_timeseries_gaps" ->
      """WITH b AS (SELECT DISTINCT event_type AS k,
             epoch_us(ts) // 3600000000 AS bk
           FROM events),
         g AS (SELECT k, bk,
             bk - lag(bk) OVER (PARTITION BY k ORDER BY bk) - 1 AS gap
           FROM b)
         SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_observed,
           CAST(max(bk) - min(bk) + 1 AS BIGINT) AS span,
           CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap,
           round(count(*) / CAST(max(bk) - min(bk) + 1 AS DOUBLE), 6)
             AS coverage
         FROM g GROUP BY k ORDER BY 1""",
    "feature_quantile_norm" ->
      """WITH base AS (SELECT source AS g, n_chars AS v, doc_id AS id
                       FROM documents),
         tiled AS (
           SELECT g, v,
             ntile(10) OVER (PARTITION BY g ORDER BY v, id) AS decile,
             ntile(10) OVER (ORDER BY v, id) AS pooled_decile
           FROM base),
         pooled AS (SELECT pooled_decile AS decile, max(v) AS pooled_upper
                    FROM tiled GROUP BY 1),
         srcd AS (SELECT g, decile, count(*) AS n, max(v) AS src_upper
                  FROM tiled GROUP BY 1, 2)
         SELECT s.g AS source, s.decile, CAST(s.n AS BIGINT) AS n,
           s.src_upper, p.pooled_upper
         FROM srcd s JOIN pooled p USING (decile)
         ORDER BY source, decile""",
    "q_events_ucb_policy" ->
      """WITH daily AS (
           SELECT event_type AS arm, CAST(ts AS DATE) AS day,
             count(*) AS t,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS rc
           FROM events GROUP BY 1, 2),
         cum AS (
           SELECT arm, day,
             coalesce(sum(t) OVER (PARTITION BY arm ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_i,
             coalesce(sum(rc) OVER (PARTITION BY arm ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r_i
           FROM daily),
         tot AS (SELECT *, sum(n_i) OVER (PARTITION BY day) AS n_total
                 FROM cum),
         scored AS (
           SELECT day, arm, n_i,
             CAST(r_i AS DOUBLE) / 100.0 / n_i +
               sqrt(2.0 * ln(n_total) / n_i) AS ucb
           FROM tot WHERE n_i > 0 AND n_total > n_i),
         picked AS (
           SELECT *, row_number() OVER (PARTITION BY day
             ORDER BY ucb DESC, arm ASC) AS pick
           FROM scored)
         SELECT day, arm AS chosen_arm, CAST(n_i AS BIGINT) AS n_i,
           round(ucb, 6) AS ucb
         FROM picked WHERE pick = 1 ORDER BY day""",
    "q_events_psm_att" ->
      """WITH bounds AS (
           SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
           FROM events),
         units AS (
           SELECT user_id, CAST(user_id % 2 AS INT) AS tr,
             sum(CASE WHEN epoch_us(ts) <= mid THEN 1 ELSE 0 END) AS cov,
             sum(CASE WHEN epoch_us(ts) > mid AND event_type = 'purchase'
               THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
               AS y
           FROM events CROSS JOIN bounds GROUP BY 1, 2),
         treated AS (SELECT cov, y FROM units WHERE tr = 1),
         ctrl AS (
           SELECT u.cov + o.o AS cov, u.y AS yc
           FROM (SELECT cov, y FROM units WHERE tr = 0) u
           CROSS JOIN (SELECT unnest(range(-2, 3)) AS o) o),
         cagg AS (SELECT cov, count(*) AS n_c, sum(yc) AS sy_c
                  FROM ctrl GROUP BY cov),
         m AS (
           SELECT CAST(t.y AS DOUBLE) - CAST(c.sy_c AS DOUBLE) / c.n_c
             AS diff
           FROM treated t JOIN cagg c USING (cov)),
         magg AS (SELECT count(*) AS n_matched,
             sum(CAST(floor(diff * 1e6 + 0.5) AS BIGINT)) AS dq
           FROM m),
         nt AS (SELECT count(*) AS n_treated, sum(y) AS syt
                FROM units WHERE tr = 1),
         nc AS (SELECT count(*) AS n_controls, sum(y) AS syc
                FROM units WHERE tr = 0)
         SELECT CAST(n_treated AS BIGINT) AS n_treated,
           CAST(n_controls AS BIGINT) AS n_controls,
           CAST(n_matched AS BIGINT) AS n_matched,
           round(dq / 1e6 / n_matched / 100.0, 4) AS att,
           round((CAST(syt AS DOUBLE) / n_treated -
             CAST(syc AS DOUBLE) / n_controls) / 100.0, 4) AS naive_diff
         FROM magg CROSS JOIN nt CROSS JOIN nc""",
    "hbos_outliers" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         ex AS (SELECT vec_id, unnest(generate_series(1, 8)) AS d1, v
                FROM e),
         bx AS (SELECT vec_id, d1 - 1 AS d,
                  CAST(floor(v[d1] / 0.25) AS BIGINT) AS bin
                FROM ex),
         hist AS (SELECT d, bin, count(*) AS c FROM bx GROUP BY 1, 2),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
         sq AS (SELECT d, bin,
                  CAST(round((ln(n.n) - ln(c)) * 1e9, 0) AS BIGINT) AS q
                FROM hist CROSS JOIN n),
         sc AS (SELECT vec_id, CAST(sum(q) AS BIGINT) AS sqsum
                FROM bx JOIN sq USING (d, bin) GROUP BY vec_id)
         SELECT vec_id, round(sqsum / 1e9, 6) AS hbos
         FROM sc ORDER BY hbos DESC, vec_id LIMIT 20""",
    "contrastive_triplets" ->
      s"""WITH jp AS (SELECT id_a, id_b, jaccard FROM ($ngramJaccardOracle)),
          nn AS (SELECT count(*) AS n_docs FROM documents),
          ${splitmixStagesSql("jp", "id_a * 1000003 + id_b", "id_a, id_b, jaccard")},
          t0 AS (SELECT id_a, id_b, jaccard,
                   CAST(u53 % n_docs AS BIGINT) AS neg0 FROM s3, nn),
          t1 AS (SELECT id_a, id_b, jaccard,
                   CASE WHEN neg0 = id_a OR neg0 = id_b
                     THEN (neg0 + 1) % n_docs ELSE neg0 END AS neg1 FROM t0, nn),
          t2 AS (SELECT id_a, id_b, jaccard,
                   CASE WHEN neg1 = id_a OR neg1 = id_b
                     THEN (neg1 + 1) % n_docs ELSE neg1 END AS negative
                 FROM t1, nn)
          SELECT id_a AS anchor, id_b AS positive, negative, jaccard
          FROM t2 ORDER BY anchor, positive""",
    "q_hot_keys" ->
      """SELECT event_type AS key, count(*) AS count_lo, count(*) AS count_hi
         FROM events GROUP BY event_type
         ORDER BY count_hi DESC, key LIMIT 3""",
    "training_order" ->
      s"""WITH ${splitmixStagesSql("documents", "doc_id", "doc_id")},
          sh AS (SELECT doc_id, CAST(u53 % 8 AS INT) AS shard, u53 FROM s3)
          SELECT doc_id, shard,
            CAST(row_number() OVER (PARTITION BY shard ORDER BY u53, doc_id)
              AS BIGINT) AS pos
          FROM sh ORDER BY shard, pos""",
    "q_events_active_users" ->
      """WITH du AS (
           SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u FROM events),
         dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
         cover AS (
           SELECT day + CAST(i AS INT) AS day, u
           FROM du, (SELECT unnest(range(0, 7)) AS i) ii),
         wau AS (SELECT day, count(DISTINCT u) AS wau_7d FROM cover GROUP BY day)
         SELECT d.day, d.dau, w.wau_7d,
           round(CAST(d.dau AS DOUBLE) / w.wau_7d, 4) AS stickiness
         FROM dau d JOIN wau w USING (day) ORDER BY d.day""",
    "source_overlap_matrix" ->
      s"""WITH jp AS (SELECT id_a, id_b, jaccard FROM ($ngramJaccardOracle)),
          s AS (SELECT doc_id, source FROM documents),
          m AS (SELECT least(sa.source, sb.source) AS source_a,
                 greatest(sa.source, sb.source) AS source_b, jaccard
                FROM jp JOIN s sa ON sa.doc_id = id_a
                JOIN s sb ON sb.doc_id = id_b)
          SELECT source_a, source_b, count(*) AS n_pairs,
            round(avg(jaccard), 4) AS avg_jaccard
          FROM m GROUP BY source_a, source_b ORDER BY source_a, source_b""",
    "q_events_rolling_stats" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
           FROM events GROUP BY event_type, CAST(ts AS DATE)),
         dn AS (SELECT *, datediff('day', DATE '1970-01-01', day) AS dnum
                FROM daily),
         ma AS (
           SELECT *, round(avg(n_events) OVER
             (PARTITION BY event_type ORDER BY dnum
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma_7d
           FROM dn)
         SELECT c.event_type, c.day, c.n_events, c.ma_7d,
           round(CAST(c.n_events AS DOUBLE) / p.n_events, 4) AS wow_ratio
         FROM ma c LEFT JOIN dn p
           ON p.event_type = c.event_type AND p.dnum = c.dnum - 7
         ORDER BY c.event_type, c.day""",
    "q_events_psi" ->
      """WITH b AS (SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
                    FROM events),
         e AS (
           SELECT event_type AS grp,
             CASE WHEN epoch_us(ts) <= (t0 + t1) // 2 THEN 'p' ELSE 'q' END AS half,
             CAST(floor(value / 20.0) AS BIGINT) AS bin
           FROM events, b),
         c AS (SELECT grp, half, bin, count(*) AS n FROM e GROUP BY grp, half, bin),
         t AS (SELECT grp, half, CAST(sum(n) AS BIGINT) AS tot
               FROM c GROUP BY grp, half),
         s AS (SELECT c.grp, c.half, c.bin, CAST(n AS DOUBLE) / tot AS share
               FROM c JOIN t ON c.grp = t.grp AND c.half = t.half),
         p AS (SELECT grp, bin, share FROM s WHERE half = 'p'),
         q AS (SELECT grp, bin, share FROM s WHERE half = 'q'),
         j AS (
           SELECT coalesce(p.grp, q.grp) AS grp,
             greatest(coalesce(p.share, 0.0), 1e-6) AS pc,
             greatest(coalesce(q.share, 0.0), 1e-6) AS qc
           FROM p FULL OUTER JOIN q ON p.grp = q.grp AND p.bin = q.bin)
         SELECT grp AS event_type, count(*) AS n_bins,
           round(sum((pc - qc) * ln(pc / qc)), 4) AS psi
         FROM j GROUP BY grp ORDER BY grp""",
    "lang_confusion" ->
      s"""WITH pred AS ($langIdOracle),
          j AS (SELECT d.lang, p.lang_pred
                FROM documents d JOIN pred p USING (doc_id)),
          c AS (SELECT lang, lang_pred, count(*) AS n_docs
                FROM j GROUP BY lang, lang_pred)
          SELECT lang, lang_pred, n_docs,
            round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY lang), 4)
              AS share_of_actual
          FROM c ORDER BY lang, lang_pred""",
    "bm25_topk" -> bm25Oracle(""),
    "bm25_index_topk" -> bm25Oracle("WHERE doc_id % 2 = 0"),
    "dsir_weights" ->
      s"""WITH $dsirWeightsCte
          SELECT doc_id, n_feats, logw FROM wts ORDER BY doc_id""",
    "dsir_select" -> dsirSelectOracle,
    "dsir_ess" ->
      s"""WITH $dsirWeightsCte,
          wsrc AS (SELECT d.source AS g, coalesce(w.logw, 0.0) AS lw
            FROM documents d LEFT JOIN wts w ON w.doc_id = d.doc_id),
          mx AS (SELECT g, max(lw) AS mw FROM wsrc GROUP BY g),
          q AS (SELECT wsrc.g,
              CAST(floor(exp(lw - mw) * 1e12 + 0.5) AS BIGINT) AS wq
            FROM wsrc JOIN mx ON mx.g = wsrc.g),
          agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
              sum(CAST(wq AS HUGEINT)) AS sw,
              sum(CAST(wq AS HUGEINT) * wq) AS sw2
            FROM q GROUP BY g)
          SELECT g AS source, n,
            round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) /
              CAST(sw2 AS DOUBLE), 4) AS ess,
            round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) /
              CAST(sw2 AS DOUBLE) / n, 6) AS ess_ratio
          FROM agg ORDER BY 1""",
    "q_theil_inequality" ->
      """WITH li AS (
           SELECT l_suppkey,
             CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
               AS BIGINT) AS cents
           FROM lineitem),
         units AS (SELECT s.s_nationkey AS g, s.s_suppkey AS u,
             CAST(sum(cents) AS BIGINT) AS v
           FROM li JOIN supplier s ON s.s_suppkey = li.l_suppkey
           GROUP BY 1, 2),
         base AS (SELECT g, v FROM units WHERE v > 0),
         gstats AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(v) AS BIGINT) AS xg
           FROM base GROUP BY g),
         tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
             CAST(sum(xg) AS BIGINT) AS x FROM gstats),
         wt AS (SELECT b.g, gs.ng, gs.xg, t.n, t.x,
             CAST(floor((b.v / (CAST(t.x AS DOUBLE) / t.n)) *
               ln(b.v / (CAST(t.x AS DOUBLE) / t.n)) * 1e9 + 0.5)
               AS BIGINT) AS ttq,
             CAST(floor((b.v / (CAST(gs.xg AS DOUBLE) / gs.ng)) *
               ln(b.v / (CAST(gs.xg AS DOUBLE) / gs.ng)) * 1e9 + 0.5)
               AS BIGINT) AS twq
           FROM base b JOIN gstats gs ON gs.g = b.g CROSS JOIN tot t),
         perg AS (SELECT g, max(ng) AS ng, max(xg) AS xg, max(n) AS n,
             max(x) AS x, CAST(sum(ttq) AS BIGINT) AS tq,
             CAST(sum(twq) AS BIGINT) AS wsum
           FROM wt GROUP BY g),
         fin AS (SELECT
             CAST(sum(ng) AS BIGINT) AS n_units,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(tq) AS BIGINT) AS tqs,
             CAST(sum(CAST(floor((CAST(xg AS DOUBLE) / x) *
               (CAST(wsum AS DOUBLE) / 1e9 / ng) * 1e9 + 0.5) AS BIGINT))
               AS BIGINT) AS wq,
             CAST(sum(CAST(floor((CAST(xg AS DOUBLE) / x) *
               ln((CAST(xg AS DOUBLE) / ng) / (CAST(x AS DOUBLE) / n))
               * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS bq,
             max(n) AS nn
           FROM perg)
         SELECT n_units, n_groups,
           round(CAST(tqs AS DOUBLE) / 1e9 / nn, 6) AS theil_total,
           round(CAST(bq AS DOUBLE) / 1e9, 6) AS theil_between,
           round(CAST(wq AS DOUBLE) / 1e9, 6) AS theil_within
         FROM fin""",
    "dsir_score_index" ->
      s"""WITH toks AS (
            SELECT doc_id, lang,
              list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                x -> len(x) > 0) AS t
            FROM documents),
          g0 AS (
            SELECT doc_id, lang, t,
              unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
            FROM toks),
          grams AS (
            SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS gram FROM g0),
          bk AS (SELECT doc_id, lang, ${fnvSql("gram")} % 256 AS bucket
                 FROM grams),
          ref AS (
            SELECT bucket, count(*) AS cr,
              count(*) FILTER (WHERE lang = 'en') AS ct
            FROM bk WHERE doc_id % 2 = 0 GROUP BY bucket),
          tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM ref),
          scored AS (
            SELECT doc_id, count(*) AS n_feats,
              round(sum(
                ln((coalesce(ct, 0) + 1) / (tt + 256)) -
                ln((coalesce(cr, 0) + 1) / (tr + 256))), 4) AS logw
            FROM bk LEFT JOIN ref USING (bucket) CROSS JOIN tot
            GROUP BY doc_id)
          SELECT d.doc_id, coalesce(n_feats, 0) AS n_feats,
            coalesce(logw, 0.0) AS logw
          FROM documents d LEFT JOIN scored USING (doc_id)
          ORDER BY doc_id""",
    "exact_substring_spans" ->
      """WITH d AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0) AS t
           FROM documents),
         w0 AS (
           SELECT doc_id, t,
             unnest(generate_series(1, greatest(len(t) - 7, 0))) AS i
           FROM d),
         wins AS (
           SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS wt
           FROM w0),
         dups AS (
           SELECT doc_id, pos FROM (
             SELECT doc_id, pos,
               count(*) OVER (PARTITION BY wt) AS cnt,
               row_number() OVER (PARTITION BY wt ORDER BY doc_id, pos) AS rn
             FROM wins)
           WHERE cnt >= 2 AND rn > 1),
         flg AS (
           SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
                  THEN 1 ELSE 0 END AS ns
           FROM dups),
         sp AS (
           SELECT doc_id, pos,
             sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
           FROM flg)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 7 AS BIGINT) AS span_end, count(*) AS n_windows
         FROM sp GROUP BY doc_id, span_id
         ORDER BY doc_id, span_start""",
    "member_novel_keys" ->
      """WITH e AS (
           SELECT event_id,
             CAST(user_id AS VARCHAR) || ':' || event_type || ':' || props
               AS member_key
           FROM events)
         SELECT event_id, member_key FROM e
         WHERE event_id % 5 = 0 AND member_key NOT IN (
           SELECT member_key FROM e WHERE event_id % 5 <> 0)
         ORDER BY event_id""",
    "exact_substring_index" ->
      """WITH d AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0) AS t
           FROM documents),
         w0 AS (
           SELECT doc_id, t,
             unnest(generate_series(1, greatest(len(t) - 7, 0))) AS i
           FROM d),
         wins AS (
           SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS wt
           FROM w0),
         corpus AS (SELECT DISTINCT wt FROM wins WHERE doc_id % 2 = 0),
         dups AS (
           SELECT doc_id, pos FROM wins
           WHERE doc_id % 2 = 1 AND wt IN (SELECT wt FROM corpus)),
         flg AS (
           SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
                  THEN 1 ELSE 0 END AS ns
           FROM dups),
         sp AS (
           SELECT doc_id, pos,
             sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
           FROM flg)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 7 AS BIGINT) AS span_end, count(*) AS n_windows
         FROM sp GROUP BY doc_id, span_id
         ORDER BY doc_id, span_start""",
    "exact_substring_apply" ->
      """WITH d AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0) AS t
           FROM documents),
         w0 AS (
           SELECT doc_id, t,
             unnest(generate_series(1, greatest(len(t) - 7, 0))) AS i
           FROM d),
         wins AS (
           SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS wt
           FROM w0),
         dups AS (
           SELECT doc_id, pos FROM (
             SELECT doc_id, pos,
               count(*) OVER (PARTITION BY wt) AS cnt,
               row_number() OVER (PARTITION BY wt ORDER BY doc_id, pos) AS rn
             FROM wins)
           WHERE cnt >= 2 AND rn > 1),
         flg AS (
           SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
                  THEN 1 ELSE 0 END AS ns
           FROM dups),
         sp AS (
           SELECT doc_id, pos,
             sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
           FROM flg),
         spans AS (
           SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
           FROM sp GROUP BY doc_id, span_id),
         cov AS (
           SELECT DISTINCT doc_id, unnest(generate_series(s, e)) AS pos
           FROM spans),
         toks AS (
           SELECT doc_id, t[i] AS tok, i - 1 AS pos
           FROM (SELECT doc_id, t,
                   unnest(generate_series(1, len(t))) AS i FROM d)),
         kept AS (
           SELECT k.doc_id, k.tok, k.pos FROM toks k
           ANTI JOIN cov c ON k.doc_id = c.doc_id AND k.pos = c.pos),
         reb AS (
           SELECT doc_id, count(*) AS n_kept,
             string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
           FROM kept GROUP BY doc_id)
         SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
           CAST(len(d.t) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(cleaned_text, '') AS cleaned_text
         FROM d LEFT JOIN reb USING (doc_id)
         ORDER BY doc_id""",
    "dedup_weights" ->
      s"""WITH RECURSIVE
          pairs AS (SELECT id_a, id_b FROM ($ngramJaccardOracle)),
          edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          reach(u, v) AS (
            SELECT DISTINCT u, u FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
          comp AS (SELECT u AS doc_id, min(v) AS cluster_id
                   FROM reach GROUP BY u),
          cs AS (SELECT cluster_id, count(*) AS sz FROM comp
                 GROUP BY cluster_id),
          m AS (SELECT doc_id, sz FROM comp JOIN cs USING (cluster_id))
          SELECT d.doc_id, CAST(coalesce(sz, 1) AS BIGINT) AS cluster_size,
            round(CAST(1.0 AS DOUBLE) / coalesce(sz, 1), 6) AS sample_weight
          FROM documents d LEFT JOIN m USING (doc_id)
          ORDER BY d.doc_id""",
    "vocab_growth" -> vocabGrowthOracle,
    "decontaminate_spans_apply" ->
      """WITH d AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> len(x) > 0) AS t
           FROM documents),
         w0 AS (
           SELECT doc_id, t,
             unnest(generate_series(1, greatest(len(t) - 3, 0))) AS i
           FROM d),
         wins AS (
           SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+3], ' ') AS wt
           FROM w0),
         ev AS (SELECT DISTINCT wt FROM wins WHERE doc_id % 50 = 0),
         dups AS (
           SELECT doc_id, pos FROM wins
           WHERE doc_id % 50 <> 0 AND wt IN (SELECT wt FROM ev)),
         flg AS (
           SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 4
                  THEN 1 ELSE 0 END AS ns
           FROM dups),
         sp AS (
           SELECT doc_id, pos,
             sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
           FROM flg),
         spans AS (
           SELECT doc_id, min(pos) AS s, max(pos) + 3 AS e
           FROM sp GROUP BY doc_id, span_id),
         cov AS (
           SELECT DISTINCT doc_id, unnest(generate_series(s, e)) AS pos
           FROM spans),
         toks AS (
           SELECT doc_id, t[i] AS tok, i - 1 AS pos
           FROM (SELECT doc_id, t,
                   unnest(generate_series(1, len(t))) AS i FROM d
                 WHERE doc_id % 50 <> 0)),
         kept AS (
           SELECT k.doc_id, k.tok, k.pos FROM toks k
           ANTI JOIN cov c ON k.doc_id = c.doc_id AND k.pos = c.pos),
         reb AS (
           SELECT doc_id, count(*) AS n_kept,
             string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
           FROM kept GROUP BY doc_id)
         SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
           CAST(len(d.t) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(cleaned_text, '') AS cleaned_text
         FROM d LEFT JOIN reb USING (doc_id)
         WHERE d.doc_id % 50 <> 0
         ORDER BY d.doc_id""",
    "q_quantile_sketch" ->
      """WITH vals AS (
           SELECT event_type, list_sort(list(CAST(value AS DOUBLE))) AS v,
             count(*) AS n
           FROM events WHERE value IS NOT NULL GROUP BY event_type),
         qs(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
           (CAST(0.99 AS DOUBLE)))
         SELECT event_type, q,
           v[CAST(floor(q * (n - 1)) AS INT) + 1] AS value
         FROM vals CROSS JOIN qs
         ORDER BY event_type, q""",
    "hybrid_retrieval_rrf" -> hybridRrfOracle,
    "fuzzy_match_names" ->
      """WITH dim AS (SELECT p_name AS name, count(*) AS cnt
                      FROM part GROUP BY 1),
         blk AS (SELECT name, cnt, regexp_extract(name, '[^ ]+$') AS block
                 FROM dim)
         SELECT a.name AS name_a, b.name AS name_b,
           levenshtein(a.name, b.name) AS dist,
           a.cnt * b.cnt AS pair_rows
         FROM blk a JOIN blk b ON a.block = b.block AND a.name < b.name
         WHERE levenshtein(a.name, b.name) <= 3
         ORDER BY name_a, name_b""",
    "q_events_transitions" ->
      """WITH seq AS (
           SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
           FROM events),
         c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
               FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
         SELECT prev_type, next_type, n,
           round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 4)
             AS p
         FROM c ORDER BY prev_type, next_type""",
    "classifier_metrics" ->
      s"""WITH pred AS ($langIdOracle),
          j AS (SELECT d.lang AS gold, p.lang_pred AS pred
                FROM documents d JOIN pred p USING (doc_id)),
          cm AS (SELECT gold, pred, count(*) AS n FROM j GROUP BY 1, 2),
          g AS (SELECT gold AS label, CAST(sum(n) AS BIGINT) AS n_gold
                FROM cm GROUP BY 1),
          pr AS (SELECT pred AS label, CAST(sum(n) AS BIGINT) AS n_pred
                 FROM cm GROUP BY 1),
          tp AS (SELECT gold AS label, n AS n_correct FROM cm
                 WHERE gold = pred),
          per AS (SELECT label, coalesce(n_gold, 0) AS n_gold,
                    coalesce(n_pred, 0) AS n_pred,
                    coalesce(n_correct, 0) AS n_correct
                  FROM g FULL OUTER JOIN pr USING (label)
                  LEFT JOIN tp USING (label)),
          tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
                    CAST(sum(CASE WHEN gold = pred THEN n ELSE 0 END)
                      AS BIGINT) AS n_ok FROM cm),
          pe AS (SELECT sum(CAST(n_gold AS DOUBLE) * n_pred) AS pe_num
                 FROM per),
          calc AS (SELECT label, n_gold, n_pred, n_correct,
                     CASE WHEN n_pred > 0
                       THEN CAST(n_correct AS DOUBLE) / n_pred
                       ELSE 0.0 END AS p_,
                     CASE WHEN n_gold > 0
                       THEN CAST(n_correct AS DOUBLE) / n_gold
                       ELSE 0.0 END AS r_
                   FROM per)
          SELECT label, n_gold, n_pred, n_correct,
            round(p_, 4) AS "precision", round(r_, 4) AS recall,
            round(CASE WHEN p_ + r_ > 0 THEN 2.0 * p_ * r_ / (p_ + r_)
                  ELSE 0.0 END, 4) AS f1,
            round(CAST(n_ok AS DOUBLE) / n_total, 4) AS accuracy,
            round((CAST(n_ok AS DOUBLE) / n_total -
                   pe_num / (CAST(n_total AS DOUBLE) * n_total)) /
                  (1.0 - pe_num / (CAST(n_total AS DOUBLE) * n_total)), 4)
              AS kappa
          FROM calc CROSS JOIN tot CROSS JOIN pe ORDER BY label""",
    "score_auc" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_transform(
             list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> len(x) > 0), y -> lower(y))) AS tok
           FROM documents),
         sc AS (
           SELECT d.doc_id,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
             coalesce(h.c, 0) AS s
           FROM documents d LEFT JOIN (
             SELECT doc_id, count(CASE WHEN tok IN ('the','and','of','to',
               'in','is','that','it','for','with') THEN 1 END) AS c
             FROM toks GROUP BY doc_id) h USING (doc_id)),
         bys AS (SELECT s, count(*) AS cnt, sum(y) AS cpos
                 FROM sc GROUP BY s),
         r AS (SELECT s, cnt, cpos,
                 coalesce(sum(cnt) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum
               FROM bys)
         SELECT CAST(sum(cpos) AS BIGINT) AS n_pos,
           CAST(sum(cnt - cpos) AS BIGINT) AS n_neg,
           round(CAST(sum(cpos * (2 * cum + cnt + 1)) -
                      sum(cpos) * (sum(cpos) + 1) AS DOUBLE) /
                 (2.0 * sum(cpos) * sum(cnt - cpos)), 6) AS auc
         FROM r""",
    "score_avg_precision" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_transform(
             list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> len(x) > 0), y -> lower(y))) AS tok
           FROM documents),
         sc AS (
           SELECT d.doc_id,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
             coalesce(h.c, 0) AS s
           FROM documents d LEFT JOIN (
             SELECT doc_id, count(CASE WHEN tok IN ('the','and','of','to',
               'in','is','that','it','for','with') THEN 1 END) AS c
             FROM toks GROUP BY doc_id) h USING (doc_id)),
         r AS (SELECT y,
             row_number() OVER (ORDER BY s DESC, doc_id) AS k,
             coalesce(sum(y) OVER (ORDER BY s DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pprev
           FROM sc)
         SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CASE WHEN sum(y) > 0 THEN
             round(CAST(sum(CASE WHEN y = 1 THEN
               CAST(floor(CAST(pprev + 1 AS DOUBLE) / k * 1e12 + 0.5)
                 AS BIGINT) ELSE 0 END) AS DOUBLE) / 1e12 / sum(y), 6)
           END AS avg_precision
         FROM r""",
    "quality_lr_train" -> lrTrainOracle,
    "lr_calibration" ->
      s"""WITH $lrTrainCte,
          sc AS (SELECT doc_id, y, round(sum(w), 12) AS m
                 FROM db JOIN w3 USING (b) GROUP BY doc_id, y),
          pb AS (SELECT doc_id, y, 1.0 / (1.0 + exp(-m)) AS p FROM sc),
          binned AS (SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
                       p, y
                     FROM pb)
          SELECT bin, count(*) AS n, round(avg(p), 4) AS mean_p,
            round(avg(y), 4) AS obs_rate
          FROM binned GROUP BY bin ORDER BY bin""",
    "q_events_paths" ->
      """WITH seq AS (
           SELECT user_id, event_type,
             lag(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS t1,
             lag(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS t2
           FROM events)
         SELECT t1, t2, event_type AS t3, count(*) AS n
         FROM seq WHERE t1 IS NOT NULL
         GROUP BY t1, t2, t3
         ORDER BY n DESC, t1, t2, t3 LIMIT 10""",
    "q_events_survival" ->
      """WITH pu AS (
           SELECT user_id, min(epoch_us(ts)) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS te
           FROM events GROUP BY user_id),
         cens AS (SELECT max(epoch_us(ts)) AS tc FROM events),
         durs AS (
           SELECT (coalesce(te, tc) - t0) // 3600000000 AS dur,
             CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END AS ev
           FROM pu CROSS JOIN cens),
         bydur AS (SELECT dur, count(*) AS total, sum(ev) AS d
                   FROM durs GROUP BY dur),
         km AS (
           SELECT dur, total, d,
             sum(total) OVER () - coalesce(sum(total) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
           FROM bydur),
         km2 AS (
           SELECT dur, n_risk, d,
             CASE WHEN d > 0 AND d < n_risk
               THEN ln(1.0 - CAST(d AS DOUBLE)/n_risk) ELSE 0.0 END AS lnf,
             CASE WHEN d > 0 AND d >= n_risk THEN 1 ELSE 0 END AS zf
           FROM km),
         km3 AS (
           SELECT dur, n_risk, d,
             CASE WHEN max(zf) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) = 1 THEN 0.0
               ELSE round(exp(sum(lnf) OVER (ORDER BY dur ROWS BETWEEN
                 UNBOUNDED PRECEDING AND CURRENT ROW)), 6) END AS surv
           FROM km2)
         SELECT CAST(dur AS BIGINT) AS dur_h, CAST(n_risk AS BIGINT)
             AS n_risk,
           CAST(d AS BIGINT) AS d_events, surv
         FROM km3 WHERE d > 0 ORDER BY dur_h""",
    "q_profile_lineitem" ->
      """SELECT 'l_quantity' AS "column", count(*) AS n_rows,
           count(*) - count(l_quantity) AS n_null,
           count(DISTINCT l_quantity) AS n_distinct,
           round(min(l_quantity), 4) AS min_v,
           round(max(l_quantity), 4) AS max_v,
           round(avg(l_quantity), 4) AS mean_v FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
           count(DISTINCT l_extendedprice), round(min(l_extendedprice), 4),
           round(max(l_extendedprice), 4), round(avg(l_extendedprice), 4)
         FROM lineitem
         UNION ALL
         SELECT 'l_discount', count(*), count(*) - count(l_discount),
           count(DISTINCT l_discount), round(min(l_discount), 4),
           round(max(l_discount), 4), round(avg(l_discount), 4)
         FROM lineitem
         UNION ALL
         SELECT 'l_tax', count(*), count(*) - count(l_tax),
           count(DISTINCT l_tax), round(min(l_tax), 4),
           round(max(l_tax), 4), round(avg(l_tax), 4)
         FROM lineitem
         ORDER BY "column"""",
    "q_events_ab" ->
      """WITH u AS (
           SELECT user_id, CAST(user_id % 2 AS INT) AS v,
             CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
               ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS f
           FROM events GROUP BY user_id),
         a AS (SELECT
           CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN v = 0 THEN f ELSE 0 END) AS BIGINT) AS conv_a,
           CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(sum(CASE WHEN v = 1 THEN f ELSE 0 END) AS BIGINT) AS conv_b
           FROM u),
         s AS (SELECT *,
           sqrt((CAST(conv_a + conv_b AS DOUBLE)/(n_a + n_b)) *
             (1.0 - CAST(conv_a + conv_b AS DOUBLE)/(n_a + n_b)) *
             (1.0/nullif(n_a, 0) + 1.0/nullif(n_b, 0))) AS se
           FROM a)
         SELECT n_a, conv_a,
           CASE WHEN n_a > 0
             THEN round(CAST(conv_a AS DOUBLE)/n_a, 4) END AS rate_a,
           n_b, conv_b,
           CASE WHEN n_b > 0
             THEN round(CAST(conv_b AS DOUBLE)/n_b, 4) END AS rate_b,
           CASE WHEN n_a > 0 AND n_b > 0
             THEN round(CAST(conv_a AS DOUBLE)/n_a
               - CAST(conv_b AS DOUBLE)/n_b, 4) END AS rate_diff,
           CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
             THEN round((CAST(conv_a AS DOUBLE)/n_a
               - CAST(conv_b AS DOUBLE)/n_b) / se, 4) END AS z
         FROM s""",
    "q_events_mwu" -> mwuOracle,
    "q_events_kendall" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CASE WHEN event_type = 'purchase'
               THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS x,
             CAST(count(DISTINCT user_id) AS BIGINT) AS y
           FROM events GROUP BY 1),
         p AS (
           SELECT CASE WHEN a.x < b.x THEN 1 WHEN a.x > b.x THEN -1 ELSE 0 END
               AS cx,
             CASE WHEN a.y < b.y THEN 1 WHEN a.y > b.y THEN -1 ELSE 0 END AS cy
           FROM daily a JOIN daily b ON a.d < b.d),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN cx * cy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(sum(CASE WHEN cx * cy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
             CAST(sum(CASE WHEN cx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
             CAST(sum(CASE WHEN cy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
           FROM p)
         SELECT n0, nc, nd,
           CASE WHEN n0 > tx AND n0 > ty
             THEN round((nc - nd) / sqrt((n0 - tx) * CAST(n0 - ty AS DOUBLE)), 4)
           END AS tau_b
         FROM agg""",
    "q_events_theilsen" ->
      """WITH daily AS (
           SELECT event_type AS k, CAST(ts AS DATE) - DATE '1970-01-01' AS d,
             count(*) AS c
           FROM events GROUP BY 1, 2),
         p AS (
           SELECT a.k, (b.c - a.c) / CAST(b.d - a.d AS DOUBLE) AS slope
           FROM daily a JOIN daily b ON a.k = b.k AND a.d < b.d)
         SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           round(median(slope), 4) AS sen_slope
         FROM p GROUP BY k ORDER BY event_type""",
    "q_bootstrap_ci" -> bootstrapOracle,
    "retrieval_ndcg" -> retrievalNdcgOracle,
    "q_events_changepoint" ->
      """WITH daily AS (
           SELECT event_type AS k, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         g AS (
           SELECT k, d, c,
             CAST(row_number() OVER (PARTITION BY k ORDER BY d) AS INT) AS i,
             CAST(sum(c) OVER (PARTITION BY k ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS sl,
             CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
             CAST(sum(c) OVER (PARTITION BY k) AS BIGINT) AS s
           FROM daily),
         cand AS (
           SELECT k, d, i, sl, n, s,
             CAST(CAST(sl AS HUGEINT) * sl AS DOUBLE) / i +
             CAST(CAST(s - sl AS HUGEINT) * (s - sl) AS DOUBLE) / (n - i) -
             CAST(CAST(s AS HUGEINT) * s AS DOUBLE) / n AS gain
           FROM g WHERE i < n),
         best AS (
           SELECT k, d, n, gain, sl, i, s,
             row_number() OVER (PARTITION BY k ORDER BY gain DESC, d) AS rn
           FROM cand)
         SELECT k AS event_type, d AS cp_day, n AS n_days,
           round(gain, 4) AS gain,
           round(CAST(sl AS DOUBLE) / i, 4) AS mean_before,
           round(CAST(s - sl AS DOUBLE) / (n - i), 4) AS mean_after
         FROM best WHERE rn = 1 ORDER BY event_type""",
    "q_events_contribution" ->
      """WITH base AS (
           SELECT event_type AS seg, CAST(ts AS DATE) AS d,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events),
         span AS (SELECT min(d) AS d0, max(d) AS d1 FROM base),
         p AS (
           SELECT seg,
             CAST(sum(CASE WHEN d <= d0 + CAST(floor((d1 - d0) / 2) AS INT)
               THEN cents ELSE 0 END) AS BIGINT) AS rev_p1,
             CAST(sum(CASE WHEN d > d0 + CAST(floor((d1 - d0) / 2) AS INT)
               THEN cents ELSE 0 END) AS BIGINT) AS rev_p2
           FROM base CROSS JOIN span GROUP BY seg),
         t AS (SELECT *, rev_p2 - rev_p1 AS delta FROM p),
         tot AS (SELECT CAST(sum(delta) AS BIGINT) AS total_delta FROM t)
         SELECT seg AS event_type, rev_p1, rev_p2, delta,
           CASE WHEN total_delta <> 0
             THEN round(CAST(delta AS DOUBLE) / CAST(total_delta AS DOUBLE), 4)
           END AS share_of_move,
           CAST(row_number() OVER (ORDER BY abs(delta) DESC, seg) AS INT)
             AS seg_rank
         FROM t CROSS JOIN tot ORDER BY seg_rank""",
    "q_events_ks" ->
      """WITH e AS (
           SELECT event_type AS g, CAST(user_id % 2 AS INT) AS v, value AS x
           FROM events),
         bv AS (
           SELECT g, x,
             CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb
           FROM e GROUP BY g, x),
         c AS (
           SELECT g,
             CAST(sum(ca) OVER (PARTITION BY g ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cuma,
             CAST(sum(cb) OVER (PARTITION BY g ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cumb,
             CAST(sum(ca) OVER (PARTITION BY g) AS BIGINT) AS n_a,
             CAST(sum(cb) OVER (PARTITION BY g) AS BIGINT) AS n_b
           FROM bv),
         agg AS (
           SELECT g, max(abs(cuma * n_b - cumb * n_a)) AS dnum,
             min(n_a) AS n_a, min(n_b) AS n_b
           FROM c GROUP BY g)
         SELECT g AS event_type, n_a, n_b,
           CASE WHEN n_a > 0 AND n_b > 0
             THEN round(CAST(dnum AS DOUBLE) /
               (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) END AS ks_d,
           CASE WHEN n_a > 0 AND n_b > 0
             THEN round(CAST(dnum AS DOUBLE) /
               (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) *
               sqrt(CAST(n_a AS DOUBLE) * n_b /
                 CAST(n_a + n_b AS DOUBLE)), 4) END AS ks_stat
         FROM agg ORDER BY event_type""",
    "q_events_spearman" ->
      """WITH e AS (
           SELECT event_type AS g, value AS x, epoch_us(ts) AS y
           FROM events),
         bx AS (SELECT g, x, count(*) AS t FROM e GROUP BY g, x),
         rx AS (
           SELECT g, x,
             2 * coalesce(sum(t) OVER (PARTITION BY g ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + t + 1 AS rx
           FROM bx),
         byy AS (SELECT g, y, count(*) AS t FROM e GROUP BY g, y),
         ry AS (
           SELECT g, y,
             2 * coalesce(sum(t) OVER (PARTITION BY g ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + t + 1 AS ry
           FROM byy),
         j AS (
           SELECT e.g, CAST(rx.rx AS HUGEINT) AS rx,
             CAST(ry.ry AS HUGEINT) AS ry
           FROM e
           JOIN rx ON e.g = rx.g AND e.x = rx.x
           JOIN ry ON e.g = ry.g AND e.y = ry.y),
         m AS (
           SELECT g, CAST(count(*) AS HUGEINT) AS n,
             sum(rx) AS sx, sum(ry) AS sy,
             sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
             sum(rx * ry) AS sxy
           FROM j GROUP BY g)
         SELECT g AS event_type, CAST(n AS BIGINT) AS n,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
             THEN round(CAST(n * sxy - sx * sy AS DOUBLE) /
               sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                 CAST(n * syy - sy * sy AS DOUBLE)), 6)
           END AS rho
         FROM m ORDER BY event_type""",
    "q_events_chi2" ->
      """WITH cells AS (
           SELECT event_type AS r, CAST(user_id % 2 AS INT) AS c,
             count(*) AS o
           FROM events GROUP BY 1, 2),
         grid AS (
           SELECT r, c, coalesce(o, 0) AS o
           FROM (SELECT DISTINCT r FROM cells)
           CROSS JOIN (SELECT DISTINCT c FROM cells)
           LEFT JOIN cells USING (r, c)),
         en AS (
           SELECT r, c, o,
             (CAST(sum(o) OVER (PARTITION BY r) AS DOUBLE) *
              sum(o) OVER (PARTITION BY c)) / sum(o) OVER () AS e
           FROM grid)
         SELECT round(sum((o - e) * (o - e) / e), 4) AS chi2,
           CAST((count(DISTINCT r) - 1) * (count(DISTINCT c) - 1) AS BIGINT)
             AS dof
         FROM en""",
    "fim_transform" -> fimOracle,
    "graph_triangles" ->
      """WITH dim AS (SELECT p_name AS name, count(*) AS cnt
                      FROM part GROUP BY 1),
         blk AS (SELECT name, regexp_extract(name, '[^ ]+$') AS block
                 FROM dim),
         prs AS (SELECT a.name AS na, b.name AS nb
                 FROM blk a JOIN blk b
                   ON a.block = b.block AND a.name < b.name
                 WHERE levenshtein(a.name, b.name) <= 3),
         deg AS (SELECT v, count(*) AS d FROM (
                   SELECT na AS v FROM prs
                   UNION ALL SELECT nb FROM prs) GROUP BY v),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                   CAST(sum(d) / 2 AS BIGINT) AS n_edges,
                   CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
                 FROM deg),
         tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
                 FROM prs e1
                 JOIN prs e2 ON e1.nb = e2.na
                 JOIN prs e3 ON e3.na = e1.na AND e3.nb = e2.nb)
         SELECT n_nodes, n_edges, n_triangles,
           round(CASE WHEN n_wedges > 0
             THEN 3.0 * n_triangles / n_wedges ELSE 0.0 END, 4)
             AS clustering_coeff
         FROM tot CROSS JOIN tri""",
    "q_events_smoothing" ->
      """WITH hourly AS (
           SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
             CAST(count(*) AS DOUBLE) AS cnt
           FROM events GROUP BY 1, 2),
         seq AS (
           SELECT event_type, count(*) AS n_buckets,
             list(cnt ORDER BY hour) AS xs
           FROM hourly GROUP BY event_type)
         SELECT event_type, CAST(n_buckets AS BIGINT) AS n_buckets,
           round(list_reduce(xs, (acc, x) -> 0.3 * x + 0.7 * acc), 6)
             AS level
         FROM seq ORDER BY event_type""",
    "q_basket_rules" ->
      """WITH items AS (
           SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         n AS (SELECT count(DISTINCT o) AS n_orders FROM items),
         pc AS (SELECT p, count(*) AS c FROM items GROUP BY p),
         pairs AS (
           SELECT a.p AS item_a, b.p AS item_b, count(*) AS support
           FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
           GROUP BY 1, 2 HAVING count(*) >= 3)
         SELECT item_a, item_b, support,
           round(CAST(support AS DOUBLE) / c_a, 4) AS confidence,
           round(CAST(support AS DOUBLE) * n_orders /
             (CAST(c_a AS DOUBLE) * c_b), 4) AS lift
         FROM pairs
         JOIN (SELECT p AS item_a, c AS c_a FROM pc) USING (item_a)
         JOIN (SELECT p AS item_b, c AS c_b FROM pc) USING (item_b)
         CROSS JOIN n
         ORDER BY lift DESC, item_a, item_b LIMIT 20""",
    "q_events_cohort_ltv" ->
      """WITH cohorts AS (
           SELECT user_id, min(CAST(ts AS DATE)) AS cohort
           FROM events GROUP BY user_id),
         rev AS (SELECT user_id, CAST(ts AS DATE) AS day, value
                 FROM events WHERE event_type = 'purchase'),
         j AS (SELECT c.cohort, datediff('day', c.cohort, r.day) AS age_d,
                 r.user_id, r.value
               FROM rev r JOIN cohorts c USING (user_id)),
         g AS (SELECT cohort, age_d, count(DISTINCT user_id) AS n_buyers,
                 sum(value) AS rev
               FROM j GROUP BY 1, 2)
         SELECT cohort AS cohort_day, age_d, n_buyers,
           round(rev, 2) AS revenue,
           round(sum(rev) OVER (PARTITION BY cohort ORDER BY age_d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS cum_revenue
         FROM g ORDER BY cohort_day, age_d""",
    "q_gini_revenue" ->
      """WITH rev AS (
           SELECT o_custkey, round(sum(o_totalprice), 2) AS x
           FROM orders GROUP BY 1),
         r AS (SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i
               FROM rev)
         SELECT CAST(count(*) AS BIGINT) AS n, round(sum(x), 2) AS total,
           round(2.0 * sum(i * x) / (count(*) * round(sum(x), 2)) -
             (count(*) + 1.0) / count(*), 6) AS gini
         FROM r""",
    "corpus_diversity" ->
      """WITH c AS (SELECT source, count(*) AS c
                    FROM documents GROUP BY 1),
         tot AS (SELECT sum(c) AS n_total FROM c),
         p AS (SELECT CAST(c AS DOUBLE) / n_total AS p, n_total
               FROM c CROSS JOIN tot),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
                 CAST(max(n_total) AS BIGINT) AS n_total,
                 round(-sum(p * ln(p)), 6) AS shannon,
                 round(sum(p * p), 6) AS simpson
               FROM p)
         SELECT n_categories, n_total, shannon, simpson,
           round(exp(shannon), 4) AS effective_n
         FROM a""",
    "q_zorder_key" ->
      """SELECT l_orderkey, l_partkey, l_linenumber,
           ((((l_orderkey & 65535) >> 0) & 1) << 0) | ((((l_partkey & 65535) >> 0) & 1) << 1) | ((((l_orderkey & 65535) >> 1) & 1) << 2) | ((((l_partkey & 65535) >> 1) & 1) << 3) | ((((l_orderkey & 65535) >> 2) & 1) << 4) | ((((l_partkey & 65535) >> 2) & 1) << 5) | ((((l_orderkey & 65535) >> 3) & 1) << 6) | ((((l_partkey & 65535) >> 3) & 1) << 7) | ((((l_orderkey & 65535) >> 4) & 1) << 8) | ((((l_partkey & 65535) >> 4) & 1) << 9) | ((((l_orderkey & 65535) >> 5) & 1) << 10) | ((((l_partkey & 65535) >> 5) & 1) << 11) | ((((l_orderkey & 65535) >> 6) & 1) << 12) | ((((l_partkey & 65535) >> 6) & 1) << 13) | ((((l_orderkey & 65535) >> 7) & 1) << 14) | ((((l_partkey & 65535) >> 7) & 1) << 15) | ((((l_orderkey & 65535) >> 8) & 1) << 16) | ((((l_partkey & 65535) >> 8) & 1) << 17) | ((((l_orderkey & 65535) >> 9) & 1) << 18) | ((((l_partkey & 65535) >> 9) & 1) << 19) | ((((l_orderkey & 65535) >> 10) & 1) << 20) | ((((l_partkey & 65535) >> 10) & 1) << 21) | ((((l_orderkey & 65535) >> 11) & 1) << 22) | ((((l_partkey & 65535) >> 11) & 1) << 23) | ((((l_orderkey & 65535) >> 12) & 1) << 24) | ((((l_partkey & 65535) >> 12) & 1) << 25) | ((((l_orderkey & 65535) >> 13) & 1) << 26) | ((((l_partkey & 65535) >> 13) & 1) << 27) | ((((l_orderkey & 65535) >> 14) & 1) << 28) | ((((l_partkey & 65535) >> 14) & 1) << 29) | ((((l_orderkey & 65535) >> 15) & 1) << 30) | ((((l_partkey & 65535) >> 15) & 1) << 31) AS z
         FROM lineitem
         ORDER BY l_orderkey, l_partkey, l_linenumber, z""",
    "q_benford" ->
      """WITH cents AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS n
           FROM orders WHERE o_totalprice > 0),
         fd AS (SELECT CAST(substr(CAST(n AS VARCHAR), 1, 1) AS INT) AS d
                FROM cents),
         c AS (SELECT d, count(*) AS cnt FROM fd GROUP BY d),
         tot AS (SELECT sum(cnt) AS n_total FROM c)
         SELECT d, cnt,
           round(CAST(cnt AS DOUBLE) / n_total, 4) AS share,
           round(log10(1.0 + 1.0 / d), 4) AS benford,
           round(CAST(cnt AS DOUBLE) / n_total - log10(1.0 + 1.0 / d), 4)
             AS deviation
         FROM c CROSS JOIN tot ORDER BY d""",
    "split_kfold" ->
      s"""WITH comp AS (SELECT doc_id, cluster_id FROM ($dedupClustersOracle)),
          cl AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
                 FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
          ${splitmixStagesSql("cl", "cluster_id", "doc_id, cluster_id")}
          SELECT doc_id, cluster_id,
            CAST(u53 * 5 // ${1L << 53} AS BIGINT) AS fold
          FROM s3 ORDER BY doc_id""",
    "q_events_robust_stats" ->
      """WITH vals AS (
           SELECT event_type, list_sort(list(CAST(value AS DOUBLE))) AS v,
             count(*) AS n
           FROM events WHERE value IS NOT NULL GROUP BY 1),
         med AS (SELECT event_type, n, v,
                   v[CAST(floor(0.5 * (n - 1)) AS INT) + 1] AS m
                 FROM vals),
         mad0 AS (SELECT event_type, n, m,
                    list_sort(list_transform(v, x -> abs(x - m))) AS dv
                  FROM med)
         SELECT event_type, CAST(n AS BIGINT) AS n, round(m, 4) AS median,
           round(dv[CAST(floor(0.5 * (n - 1)) AS INT) + 1], 4) AS mad
         FROM mad0 ORDER BY event_type""",
    "q_events_seasonality" ->
      """WITH c AS (
           SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hod,
             count(*) AS n
           FROM events GROUP BY 1, 2),
         tot AS (SELECT sum(n) AS n_total FROM c)
         SELECT dow, hod, n,
           round(CAST(n AS DOUBLE) / n_total, 6) AS share
         FROM c CROSS JOIN tot ORDER BY dow, hod""",
    "q_funnel_latency" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS ct FROM events
           WHERE event_type = 'signup' GROUP BY 1),
         s2 AS (SELECT e.user_id AS u, min(e.ts) AS ct FROM events e
           JOIN s1 ON e.user_id = s1.u
           WHERE e.event_type = 'view' AND e.ts > s1.ct GROUP BY 1),
         s3 AS (SELECT e.user_id AS u, min(e.ts) AS ct FROM events e
           JOIN s2 ON e.user_id = s2.u
           WHERE e.event_type = 'click' AND e.ts > s2.ct GROUP BY 1),
         s4 AS (SELECT e.user_id AS u, min(e.ts) AS ct FROM events e
           JOIN s3 ON e.user_id = s3.u
           WHERE e.event_type = 'purchase' AND e.ts > s3.ct GROUP BY 1),
         gaps AS (
           SELECT 2 AS stage_idx, 'view' AS stage,
             epoch_us(b.ct) - epoch_us(a.ct) AS gap_us
           FROM s2 b JOIN s1 a USING (u)
           UNION ALL
           SELECT 3, 'click', epoch_us(b.ct) - epoch_us(a.ct)
           FROM s3 b JOIN s2 a USING (u)
           UNION ALL
           SELECT 4, 'purchase', epoch_us(b.ct) - epoch_us(a.ct)
           FROM s4 b JOIN s3 a USING (u)),
         g AS (SELECT stage_idx, stage, list_sort(list(gap_us)) AS v,
                 count(*) AS n_users
               FROM gaps GROUP BY 1, 2)
         SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
           CAST(n_users AS BIGINT) AS n_users,
           round(v[CAST(floor(0.5 * (n_users - 1)) AS INT) + 1] /
             1000000.0, 6) AS p50_s,
           round(v[CAST(floor(0.9 * (n_users - 1)) AS INT) + 1] /
             1000000.0, 6) AS p90_s
         FROM g ORDER BY stage_idx""",
    "q_events_by_segment" ->
      """SELECT c_mktsegment, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_purchases,
           round(sum(CASE WHEN event_type = 'purchase' THEN value
             ELSE 0.0 END), 2) AS purchase_value
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "graph_degree_dist" ->
      """WITH dim AS (SELECT p_name AS name, count(*) AS cnt
                      FROM part GROUP BY 1),
         blk AS (SELECT name, regexp_extract(name, '[^ ]+$') AS block
                 FROM dim),
         prs AS (SELECT a.name AS na, b.name AS nb
                 FROM blk a JOIN blk b
                   ON a.block = b.block AND a.name < b.name
                 WHERE levenshtein(a.name, b.name) <= 3),
         deg AS (SELECT v, count(*) AS d FROM (
                   SELECT na AS v FROM prs
                   UNION ALL SELECT nb FROM prs) GROUP BY v),
         h AS (SELECT d AS degree, count(*) AS n_nodes
               FROM deg GROUP BY d),
         tot AS (SELECT sum(n_nodes) AS n_total FROM h)
         SELECT degree, n_nodes,
           round(CAST(n_nodes AS DOUBLE) / n_total, 6) AS share
         FROM h CROSS JOIN tot ORDER BY degree""",
    "q_pareto_revenue" ->
      """WITH rev AS (
           SELECT o_custkey, round(sum(o_totalprice), 2) AS x
           FROM orders GROUP BY 1),
         r AS (SELECT x, row_number() OVER (ORDER BY x DESC, o_custkey)
                 AS rk
               FROM rev),
         t AS (SELECT count(*) AS n, round(sum(x), 2) AS total FROM r)
         SELECT CAST(t.n AS BIGINT) AS n, t.total,
           round((SELECT sum(x) FROM r WHERE rk <= (t.n * 1 + 99) // 100)
             / t.total, 6) AS top1_share,
           round((SELECT sum(x) FROM r WHERE rk <= (t.n * 5 + 99) // 100)
             / t.total, 6) AS top5_share,
           round((SELECT sum(x) FROM r WHERE rk <= (t.n * 10 + 99) // 100)
             / t.total, 6) AS top10_share,
           round((SELECT sum(x) FROM r WHERE rk <= (t.n * 20 + 99) // 100)
             / t.total, 6) AS top20_share
         FROM t""",
    "vocab_zipf" ->
      """WITH toks AS (
           SELECT unnest(list_filter(
             regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0)) AS tok
           FROM documents),
         tc AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
         top AS (SELECT tok, c, rk FROM (
                   SELECT tok, c, row_number() OVER
                     (ORDER BY c DESC, tok) AS rk
                   FROM tc) WHERE rk <= 100),
         pts AS (SELECT ln(CAST(rk AS DOUBLE)) AS x,
                   ln(CAST(c AS DOUBLE)) AS y
                 FROM top),
         agg AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
                   sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
                 FROM pts)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM tc) AS n_vocab,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
             AS zipf_slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             / n, 4) AS intercept
         FROM agg""",
    "sft_pack" ->
      """WITH turns AS (
           SELECT user_id AS conv,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS turn_idx,
             CASE WHEN event_id % 2 = 0 THEN 'assistant'
                  ELSE 'user' END AS role,
             event_type || '#' || CAST(event_id AS VARCHAR) AS content
           FROM events),
         p AS (
           SELECT conv, turn_idx, role,
             '<|' || role || '|>' || content || '<|end|>' AS piece
           FROM turns),
         o AS (
           SELECT conv, turn_idx, role, piece,
             CAST(len(piece) AS BIGINT) AS plen,
             CAST(sum(len(piece)) OVER (PARTITION BY conv
               ORDER BY turn_idx) AS BIGINT) AS cum
           FROM p),
         sp AS (
           SELECT conv, turn_idx, role, piece, cum,
             cum - plen + 1 + CAST(len(role) AS BIGINT) + 4
               AS content_start,
             cum - 7 AS content_end
           FROM o)
         SELECT conv,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_mask_turns,
           max(cum) AS render_len,
           CAST(sum(CASE WHEN role = 'assistant'
               THEN content_end - content_start + 1 ELSE 0 END)
             AS BIGINT) AS mask_chars,
           round(CAST(sum(CASE WHEN role = 'assistant'
               THEN content_end - content_start + 1 ELSE 0 END) AS DOUBLE)
             / max(cum), 4) AS mask_ratio,
           md5(string_agg(piece, '' ORDER BY turn_idx)) AS render_md5,
           coalesce(string_agg(CASE WHEN role = 'assistant' THEN
               CAST(content_start AS VARCHAR) || '-' ||
               CAST(content_end AS VARCHAR) END, ';' ORDER BY turn_idx),
             '') AS mask_spans
         FROM sp GROUP BY conv""",
    "fuzzy_match_jw" ->
      """WITH dim AS (SELECT p_name AS name, count(*) AS cnt
                      FROM part GROUP BY 1),
         blk AS (SELECT name, cnt, regexp_extract(name, '^[^ ]+') AS block
                 FROM dim)
         SELECT a.name AS name_a, b.name AS name_b,
           levenshtein(a.name, b.name) AS dist,
           a.cnt * b.cnt AS pair_rows,
           round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
         FROM blk a JOIN blk b ON a.block = b.block AND a.name < b.name
         WHERE levenshtein(a.name, b.name) <= 4
         ORDER BY name_a, name_b""",
    "q_events_acf" ->
      """WITH daily AS (
           SELECT event_type AS k, CAST(ts AS DATE) AS d, count(*) AS c
           FROM events GROUP BY 1, 2),
         idx AS (SELECT k, c,
             row_number() OVER (PARTITION BY k ORDER BY d) AS i
           FROM daily),
         tot AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s, sum(c * c) AS sxx
           FROM idx GROUP BY k),
         lags AS (SELECT unnest(range(1, 8)) AS lag),
         pairs AS (SELECT a.k, l.lag, a.c AS ca, b.c AS cb
           FROM idx a CROSS JOIN lags l
           JOIN idx b ON b.k = a.k AND b.i = a.i + l.lag),
         agg AS (SELECT k, lag, sum(ca * cb) AS sxy,
             CAST(sum(ca) AS BIGINT) AS sh, CAST(sum(cb) AS BIGINT) AS st,
             CAST(count(*) AS BIGINT) AS n_pairs
           FROM pairs GROUP BY 1, 2)
         SELECT t.k, CAST(a.lag AS INT) AS lag, t.n AS n_days, a.n_pairs,
           CASE WHEN CAST(t.sxx AS DOUBLE)
                  - CAST(t.s AS DOUBLE) * (CAST(t.s AS DOUBLE) / t.n) > 0
             THEN round((CAST(a.sxy AS DOUBLE)
                 - (CAST(t.s AS DOUBLE) / t.n) * CAST(a.sh AS DOUBLE)
                 - (CAST(t.s AS DOUBLE) / t.n) * CAST(a.st AS DOUBLE)
                 + CAST(a.n_pairs AS DOUBLE) * (CAST(t.s AS DOUBLE) / t.n)
                   * (CAST(t.s AS DOUBLE) / t.n))
               / (CAST(t.sxx AS DOUBLE)
                 - CAST(t.s AS DOUBLE) * (CAST(t.s AS DOUBLE) / t.n)), 4)
           END AS r
         FROM agg a JOIN tot t ON a.k = t.k
         ORDER BY t.k, lag""",
    "q_k_anonymity" ->
      """WITH cls AS (
           SELECT c_nationkey, c_mktsegment,
             CAST(count(*) AS BIGINT) AS sz,
             CAST(count(DISTINCT floor(c_acctbal / 1000)) AS BIGINT) AS ld
           FROM customer GROUP BY 1, 2)
         SELECT min(sz) AS k_anonymity,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(sz) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
             AS n_rows_below_k,
           round(CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS DOUBLE)
             / sum(sz), 4) AS pct_below_k,
           min(ld) AS l_diversity,
           round(avg(sz), 4) AS avg_class_size
         FROM cls""",
    "fuzzy_match_dl" ->
      """WITH dim AS (SELECT p_name AS name, count(*) AS cnt
                      FROM part GROUP BY 1),
         blk AS (SELECT name, cnt, regexp_extract(name, '[^ ]+$') AS block
                 FROM dim)
         SELECT a.name AS name_a, b.name AS name_b,
           CAST(damerau_levenshtein(a.name, b.name) AS INT) AS dl,
           CAST(levenshtein(a.name, b.name) AS INT) AS lev,
           a.cnt * b.cnt AS pair_rows
         FROM blk a JOIN blk b ON a.block = b.block AND a.name < b.name
         WHERE damerau_levenshtein(a.name, b.name) <= 3
         ORDER BY name_a, name_b""",
    "cleaning_signals" ->
      raw"""WITH aug AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 5 = 0 THEN
               ' <div class="x">see <a href="http://example.com/a">link</a></div>'
             ELSE '' END ||
             CASE WHEN doc_id % 7 = 3 THEN ' Ã© broken â€™ text �'
             ELSE '' END ||
             CASE WHEN doc_id % 11 = 5 THEN chr(10) ||
               '    if (x == 1) { return y; }' || chr(10) || chr(9) ||
               'total += 1;'
             ELSE '' END AS t2
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(t2, '\x{FFFD}')) AS BIGINT)
             AS n_replacement,
           CAST(len(regexp_extract_all(t2,
             '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS BIGINT) AS n_control,
           CAST(len(regexp_extract_all(t2,
             '${graft.operators.CleaningSignals.MojibakeRe}'))
             AS BIGINT) AS n_mojibake,
           CAST(len(regexp_extract_all(t2, '<[A-Za-z/][^>]*>')) AS BIGINT)
             AS n_tags,
           CAST(len(regexp_extract_all(t2, 'https?://[^ \t\n]+'))
             AS BIGINT) AS n_links,
           CAST(coalesce(list_sum(list_transform(
             regexp_extract_all(t2, 'https?://[^ \t\n]+'),
             x -> len(x))), 0) AS BIGINT) AS link_chars,
           CASE WHEN len(t2) > 0 THEN
             round(CAST(coalesce(list_sum(list_transform(
               regexp_extract_all(t2, 'https?://[^ \t\n]+'),
               x -> len(x))), 0) AS DOUBLE) / len(t2), 4)
           END AS link_density,
           CAST(len(string_split(t2, chr(10))) AS BIGINT) AS n_lines,
           CAST(len(regexp_extract_all(t2, '(?m)^(    |\t)')) AS BIGINT)
             AS n_indented,
           round(CAST(len(regexp_extract_all(t2, '(?m)^(    |\t)'))
             AS DOUBLE) / len(string_split(t2, chr(10))), 4)
             AS indented_frac,
           CASE WHEN len(t2) > 0 THEN
             round(CAST(len(regexp_extract_all(t2, '[{}();=]'))
               AS DOUBLE) / len(t2), 4)
           END AS code_sym_density,
           len(regexp_extract_all(t2, '\x{FFFD}')) = 0
             AND len(regexp_extract_all(t2,
               '[\x00-\x08\x0B\x0C\x0E-\x1F]')) = 0
             AND len(regexp_extract_all(t2,
               '${graft.operators.CleaningSignals.MojibakeRe}')) = 0
             AS enc_clean
         FROM aug ORDER BY doc_id""",
    "pref_pair_stats" -> prefPairOracleStats,
    "pref_pair_bias" ->
      s"""WITH st AS ($prefPairOracleStats)
          SELECT CAST(count(*) AS BIGINT) AS n_pairs,
            round(CAST(sum(CASE WHEN chosen_longer THEN 1 ELSE 0 END)
              AS DOUBLE) / count(*), 4) AS pct_chosen_longer,
            round(CAST(sum(len_chosen) AS DOUBLE) / sum(len_rejected), 4)
              AS agg_len_ratio,
            round(CAST(sum(n_tok_inter) AS DOUBLE) / sum(n_tok_union), 4)
              AS micro_jaccard,
            CAST(sum(CASE WHEN exact_dup THEN 1 ELSE 0 END) AS BIGINT)
              AS n_exact_dup
          FROM st""",
    "battle_winrates" -> {
      val z = 1.96
      s"""WITH cells AS ($battleCellsOracle),
          b AS (SELECT model_a, model_b, n, wins_a,
                  CAST(n AS DOUBLE) AS nd,
                  CAST(wins_a AS DOUBLE) / CAST(n AS DOUBLE) AS p
                FROM cells),
          w AS (SELECT *, 1.0 + ${z * z} / nd AS den,
                  p + ${z * z} / (2.0 * nd) AS center,
                  $z * sqrt((p * (1.0 - p) + ${z * z} / (4.0 * nd)) / nd)
                    AS margin
                FROM b)
          SELECT model_a, model_b, n, wins_a, round(p, 6) AS winrate_a,
            round((center - margin) / den, 6) AS wilson_lo,
            round((center + margin) / den, 6) AS wilson_hi
          FROM w ORDER BY model_a, model_b"""
    },
    "bt_strength" ->
      graft.operators.Battles.btOracleSql(battleCellsOracle, iters = 20),
    "q_events_anova" ->
      """WITH e AS (SELECT event_type AS g,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
           gg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng, sum(c) AS sg,
                    sum(c * c) AS sgg FROM e GROUP BY g),
           m AS (SELECT CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(ng) AS BIGINT) AS n,
                   sum(sg) AS s, sum(sgg) AS ss,
                   sum(CAST(floor(CAST(sg * sg AS DOUBLE) / ng + 0.5)
                     AS HUGEINT)) AS bq
                 FROM gg),
           m2 AS (SELECT *, CAST(floor(CAST(s * s AS DOUBLE) / n + 0.5)
                    AS HUGEINT) AS grand FROM m)
         SELECT k, n,
           round(CAST(bq - grand AS DOUBLE), 4) AS ssb,
           round(CAST(ss - grand AS DOUBLE) - CAST(bq - grand AS DOUBLE), 4)
             AS ssw,
           round(CAST(ss - grand AS DOUBLE), 4) AS sst,
           CASE WHEN k > 1 AND n > k AND
               (CAST(ss - grand AS DOUBLE) - CAST(bq - grand AS DOUBLE)) > 0
             THEN round((CAST(bq - grand AS DOUBLE) / CAST(k - 1 AS DOUBLE)) /
               ((CAST(ss - grand AS DOUBLE) - CAST(bq - grand AS DOUBLE)) /
                 CAST(n - k AS DOUBLE)), 4)
           END AS f_stat,
           CASE WHEN CAST(ss - grand AS DOUBLE) > 0
             THEN round(CAST(bq - grand AS DOUBLE) /
               CAST(ss - grand AS DOUBLE), 6)
           END AS eta_sq
         FROM m2""",
    "linkage_sorted_nbhd" ->
      """WITH dict AS (SELECT p_name AS name, CAST(count(*) AS BIGINT) AS cnt
                       FROM part GROUP BY 1),
           d2 AS (SELECT name, cnt, substr(name, 1, 1) AS part FROM dict),
           nb AS (SELECT name, cnt,
                    lead(name, 1) OVER w AS n1, lead(cnt, 1) OVER w AS c1,
                    lead(name, 2) OVER w AS n2, lead(cnt, 2) OVER w AS c2
                  FROM d2 WINDOW w AS (PARTITION BY part ORDER BY name)),
           pairs AS (
             SELECT name, cnt, n1 AS nname, c1 AS ncnt FROM nb
             WHERE n1 IS NOT NULL
             UNION ALL
             SELECT name, cnt, n2, c2 FROM nb WHERE n2 IS NOT NULL)
         SELECT least(name, nname) AS name_a,
           greatest(name, nname) AS name_b,
           levenshtein(name, nname) AS dist,
           CAST(cnt * ncnt AS BIGINT) AS pair_rows
         FROM pairs WHERE levenshtein(name, nname) <= 4
         ORDER BY name_a, name_b""",
    "source_vocab_overlap_hll" ->
      s"""WITH ${hllOracleCtes("v",
            """SELECT source AS grp, unnest(list_filter(
                 regexp_split_to_array(trim(text), '\s+'),
                 x -> len(x) > 0)) AS k FROM documents""")},
          grps AS (SELECT DISTINCT grp FROM vregs),
          prs AS (SELECT a.grp AS ga, b.grp AS gb
                  FROM grps a JOIN grps b ON a.grp < b.grp),
          prg AS (SELECT p.ga, p.gb, r.j, max(r.mj) AS mj
                  FROM prs p JOIN vregs r ON r.grp = p.ga OR r.grp = p.gb
                  GROUP BY 1, 2, 3),
          pagg AS (SELECT ga, gb, count(*) AS nonzero,
                  sum(CAST(1::BIGINT << (56 - mj) AS HUGEINT))
                    + CAST(512 - count(*) AS HUGEINT) * (1::BIGINT << 56) AS s
                  FROM prg GROUP BY 1, 2),
          pest AS (SELECT ga, gb,
                  CASE WHEN (0.7213 / (1.0 + 1.079 / 512.0)) * 512 * 512
                         * power(2.0, 56.0) / CAST(s AS DOUBLE) <= 2.5 * 512
                        AND 512 - nonzero > 0
                       THEN 512 * ln(CAST(512 AS DOUBLE) / (512 - nonzero))
                       ELSE (0.7213 / (1.0 + 1.079 / 512.0)) * 512 * 512
                         * power(2.0, 56.0) / CAST(s AS DOUBLE) END AS est
                  FROM pagg)
          SELECT p.ga AS source_a, p.gb AS source_b,
            round(fa.est, 4) AS est_a, round(fb.est, 4) AS est_b,
            round(p.est, 4) AS est_union,
            round((fa.est + fb.est) - p.est, 4) AS est_inter,
            CASE WHEN p.est > 0
              THEN round(((fa.est + fb.est) - p.est) / p.est, 6)
            END AS jaccard_est
          FROM pest p JOIN vfin fa ON p.ga = fa.grp
          JOIN vfin fb ON p.gb = fb.grp
          ORDER BY source_a, source_b""",
    "emb_pca_power" -> graft.operators.Pca.oracleSql(
      "SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
      iters = 8),
    "emb_pca2" -> graft.operators.Pca.oracle2Sql(
      "SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
      iters = 8),
    "q_events_mwu_fdr" ->
      s"""WITH mwu AS ($mwuOracle),
          pz0 AS (SELECT event_type AS k,
              abs(z) / ${math.sqrt(2.0)} AS x
            FROM mwu WHERE z IS NOT NULL),
          pz1 AS (SELECT k, x, 1.0 / (1.0 + 0.3275911 * x) AS t FROM pz0),
          pz AS (SELECT k,
              ((((1.061405429 * t + -1.453152027) * t + 1.421413741) * t
                + -0.284496736) * t + 0.254829592) * t * exp(-(x * x)) AS p
            FROM pz1),
          rk AS (SELECT k, p,
              row_number() OVER (ORDER BY p, k) AS i,
              count(*) OVER () AS m
            FROM pz),
          adj AS (SELECT k, p,
              least(1.0, min(p * m / i) OVER (ORDER BY p DESC, k DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS p_adj
            FROM rk)
          SELECT k AS event_type, round(p, 6) AS p_value,
            round(p_adj, 6) AS p_adj, p_adj < 0.05 AS significant
          FROM adj ORDER BY event_type""",
    "q_cms_heavy_change" ->
      s"""WITH tt AS (SELECT user_id, epoch_us(ts) AS t FROM events),
          md AS (SELECT (min(t) + max(t)) // 2 AS mid FROM tt),
          keys AS (SELECT user_id, CAST(user_id AS VARCHAR) AS k,
              sum(CASE WHEN t <= md.mid THEN 1 ELSE 0 END) AS w1,
              sum(CASE WHEN t > md.mid THEN 1 ELSE 0 END) AS w2,
              count(*) AS cnt
            FROM tt, md GROUP BY user_id),
          cf AS (SELECT user_id, cnt, w1, w2, ${fnvSql("k")} AS fv FROM keys),
          cz0 AS (SELECT user_id, cnt, w1, w2, (fv + 11400714819323198485)
              % 18446744073709551616::HUGEINT AS z0 FROM cf),
          cz1 AS (SELECT user_id, cnt, w1, w2, ${mulcSql("xor(z0, z0 // 1073741824)",
                BigInt("BF58476D1CE4E5B9", 16))} AS z1 FROM cz0),
          cz2 AS (SELECT user_id, cnt, w1, w2, ${mulcSql("xor(z1, z1 // 134217728)",
                BigInt("94D049BB133111EB", 16))} AS z2 FROM cz1),
          chh AS (SELECT user_id, cnt, w1, w2,
              xor(z2, z2 // 2147483648) AS hv FROM cz2),
          cells AS (SELECT user_id, cnt, w1, w2, rr.r,
              CAST((hv // (CASE rr.r WHEN 0 THEN 1 WHEN 1 THEN 1024
                           ELSE 1048576 END)) % 1024 AS BIGINT) AS c
            FROM chh, (SELECT unnest([0, 1, 2]) AS r) rr),
          counters AS (SELECT r, c, sum(w1) AS v1, sum(w2) AS v2
            FROM cells GROUP BY r, c),
          top AS (SELECT user_id, cnt FROM keys
            ORDER BY cnt DESC, user_id LIMIT 12)
          SELECT t.user_id, t.cnt AS total,
            CAST(min(co.v1) AS BIGINT) AS est_before,
            CAST(min(co.v2) AS BIGINT) AS est_after,
            CAST(min(co.v2) - min(co.v1) AS BIGINT) AS delta
          FROM top t
          JOIN cells ce ON ce.user_id = t.user_id
          JOIN counters co ON co.r = ce.r AND co.c = ce.c
          GROUP BY t.user_id, t.cnt
          ORDER BY abs(CAST(min(co.v2) - min(co.v1) AS BIGINT)) DESC, t.user_id""",
    "bigram_lm_kn" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS tk FROM documents),
         uni AS (SELECT unnest(tk) AS w FROM toks),
         ucnt AS (SELECT w, count(*) AS uc FROM uni GROUP BY w),
         b0 AS (SELECT doc_id, tk,
                  unnest(generate_series(1, greatest(len(tk)-1, 0))) AS i
                FROM toks),
         big AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2 FROM b0),
         bcnt AS (SELECT w1, w2, count(*) AS c_xy FROM big GROUP BY w1, w2),
         cont AS (SELECT w1, count(*) AS nc1 FROM bcnt GROUP BY w1),
         lft AS (SELECT w2, count(*) AS nl2 FROM bcnt GROUP BY w2),
         nbt AS (SELECT CAST(count(*) AS DOUBLE) AS nbt FROM bcnt),
         perdoc AS (
           SELECT big.doc_id, count(*) AS n_bigrams,
             round(sum(ln(greatest(c_xy - 0.75, 0.0) / c1.uc
               + (0.75 * cont.nc1 / c1.uc) * (lft.nl2 / nbt.nbt)))
               / count(*), 4) AS avg_logprob_kn
           FROM big JOIN bcnt USING (w1, w2)
                JOIN ucnt c1 ON big.w1 = c1.w
                JOIN cont ON big.w1 = cont.w1
                JOIN lft ON big.w2 = lft.w2, nbt
           GROUP BY big.doc_id)
         SELECT d.doc_id, CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           coalesce(p.avg_logprob_kn, 0.0) AS avg_logprob_kn
         FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
         ORDER BY d.doc_id""",
    "line_boilerplate" ->
      """WITH aug AS (SELECT doc_id, text ||
             CASE WHEN doc_id % 3 = 0
               THEN chr(10) || '(c) example corp all rights reserved'
               ELSE '' END ||
             CASE WHEN doc_id % 5 = 1
               THEN chr(10) || 'subscribe to our newsletter'
               ELSE '' END AS t2
           FROM documents),
         ln AS (SELECT doc_id, unnest(string_split(t2, chr(10))) AS line
                FROM aug),
         dfq AS (SELECT line, count(DISTINCT doc_id) AS ndocs
                 FROM ln GROUP BY line),
         per AS (SELECT ln.doc_id, count(*) AS n_lines,
             sum(CASE WHEN ndocs >= 3 THEN 1 ELSE 0 END) AS n_boiler,
             sum(CASE WHEN ndocs < 3 THEN len(ln.line) ELSE 0 END)
               AS kept_chars
           FROM ln JOIN dfq USING (line) GROUP BY ln.doc_id)
         SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_boiler AS BIGINT) AS n_boiler,
           round(CAST(n_boiler AS DOUBLE) / n_lines, 4) AS boiler_frac,
           CAST(kept_chars AS BIGINT) AS kept_chars
         FROM per ORDER BY doc_id""",
    "script_mix" ->
      ("""WITH aug AS (SELECT doc_id, text ||
             CASE WHEN doc_id % 7 = 2 THEN ' \u4e2d\u6587\u6d4b\u8bd5\u6587\u672c' ELSE '' END ||
             CASE WHEN doc_id % 11 = 4 THEN ' \u0440\u0443\u0441\u0441\u043a\u0438\u0439 \u0442\u0435\u043a\u0441\u0442' ELSE '' END ||
             CASE WHEN doc_id % 13 = 6 THEN ' \u0646\u0635 \u0639\u0631\u0628\u064a' ELSE '' END AS t2
           FROM documents)
         SELECT doc_id, CAST(len(t2) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(t2, '[A-Za-z]')) AS BIGINT) AS n_latin,
           CAST(len(regexp_extract_all(t2, '[0-9]')) AS BIGINT) AS n_digit,
           CAST(len(regexp_extract_all(t2, '\p{Han}')) AS BIGINT) AS n_han,
           CAST(len(regexp_extract_all(t2, '\p{Cyrillic}')) AS BIGINT)
             AS n_cyrillic,
           CAST(len(regexp_extract_all(t2, '\p{Arabic}')) AS BIGINT)
             AS n_arabic,
           round(CAST(len(regexp_extract_all(t2, '[A-Za-z]')) AS DOUBLE)
             / len(t2), 4) AS frac_latin,
           round(CAST(len(regexp_extract_all(t2, '\p{Han}')) AS DOUBLE)
             / len(t2), 4) AS frac_han,
           round(CAST(len(regexp_extract_all(t2, '\p{Cyrillic}')) AS DOUBLE)
             / len(t2), 4) AS frac_cyrillic,
           round(CAST(len(regexp_extract_all(t2, '\p{Arabic}')) AS DOUBLE)
             / len(t2), 4) AS frac_arabic
         FROM aug ORDER BY doc_id"""),
    "q_events_cusum" ->
      """WITH daily AS (
           SELECT event_type AS k, CAST(ts AS DATE) AS d, count(*) AS c
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT k, d, c,
             count(*) OVER w AS n,
             sum(c) OVER w AS s1,
             sum(c * c) OVER w AS s2
           FROM daily WINDOW w AS (PARTITION BY k)),
         ms AS (
           SELECT k, d, c, n,
             CAST(s1 AS DOUBLE) / n AS mu,
             sqrt(greatest(CAST(s2 AS DOUBLE) / n
               - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
               0.0)) AS sigma
           FROM st),
         pp AS (
           SELECT k, d, n, sigma,
             sum(CAST(floor((CAST(c AS DOUBLE) - mu - 0.5 * sigma) * 1e6
               + 0.5) AS BIGINT)) OVER wd AS p
           FROM ms
           WINDOW wd AS (PARTITION BY k ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         ss AS (
           SELECT k, d, n, sigma,
             p - least(0, min(p) OVER wd) AS s
           FROM pp
           WINDOW wd AS (PARTITION BY k ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         sm AS (
           SELECT k, d, n, sigma, s, max(s) OVER (PARTITION BY k) AS smax
           FROM ss)
         SELECT k AS event_type,
           CAST(min(n) AS BIGINT) AS n_days,
           round(min(sigma), 4) AS sigma,
           round(CAST(min(smax) AS DOUBLE) / 1e6, 4) AS max_cusum,
           min(CASE WHEN s = smax THEN d END) AS peak_day,
           min(CASE WHEN CAST(s AS DOUBLE) > 4.0 * sigma * 1e6 THEN d END)
             AS alarm_day
         FROM sm GROUP BY k ORDER BY event_type""",
    "eval_pass_at_k" ->
      s"""WITH att AS (SELECT doc_id % 40 AS task_id,
              (doc_id * 2654435761) % 5 = 0 AS ok FROM documents),
          base AS (SELECT task_id, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS c
            FROM att GROUP BY task_id)
          SELECT task_id, n, c,
            ${graft.operators.Classifier.passAtKSql(1)} AS pass_at_1,
            ${graft.operators.Classifier.passAtKSql(5)} AS pass_at_5,
            ${graft.operators.Classifier.passAtKSql(10)} AS pass_at_10
          FROM base ORDER BY task_id""",
    "sft_validate" ->
      """WITH turns AS (
           SELECT user_id AS conv, ts AS ord, event_id AS tie,
             CASE WHEN event_id % 2 = 0 THEN 'assistant'
                  ELSE 'user' END AS role,
             event_type || '#' || event_id AS content
           FROM events),
         wr AS (
           SELECT conv, role, content,
             lag(role, 1) OVER w AS prev_role,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY conv) AS nc
           FROM turns WINDOW w AS (PARTITION BY conv ORDER BY ord, tie)),
         per AS (
           SELECT conv AS user_id, count(*) AS n_turns,
             sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END)
               AS n_role_violations,
             sum(CASE WHEN len(trim(content)) = 0 THEN 1 ELSE 0 END)
               AS n_empty_turns,
             max(CASE WHEN rn = 1 THEN role = 'user' END)
               AS starts_with_user,
             max(CASE WHEN rn = nc THEN role = 'assistant' END)
               AS ends_with_assistant
           FROM wr GROUP BY conv)
         SELECT user_id, CAST(n_turns AS BIGINT) AS n_turns,
           CAST(n_role_violations AS BIGINT) AS n_role_violations,
           CAST(n_empty_turns AS BIGINT) AS n_empty_turns,
           starts_with_user, ends_with_assistant,
           n_role_violations = 0 AND n_empty_turns = 0
             AND starts_with_user AND ends_with_assistant AS valid
         FROM per ORDER BY user_id""",
    "cluster_labels" ->
      s"""WITH ${detKmeansCtes(dim = 64, k = 8, iters = 2, where = "")},
          chome AS (SELECT vec_id, cell FROM (
              SELECT vec_id, cell, s, row_number() OVER
                (PARTITION BY vec_id ORDER BY s, cell) AS rk FROM sf)
            WHERE rk = 1),
          ctoks AS (SELECT doc_id AS vec_id,
              unnest(list_filter(
                regexp_split_to_array(trim(lower(text)), '\\s+'),
                x -> len(x) > 0)) AS token
            FROM documents),
          ctf AS (SELECT h.cell, t.token, count(*) AS n
            FROM chome h JOIN ctoks t USING (vec_id)
            GROUP BY h.cell, t.token),
          cdf AS (SELECT token, count(*) AS dfc FROM ctf GROUP BY token),
          csc AS (SELECT ctf.cell, ctf.token, ctf.n,
              CAST(ctf.n AS DOUBLE) * ln(9.0 / CAST(cdf.dfc + 1 AS DOUBLE))
                AS score
            FROM ctf JOIN cdf USING (token)),
          crk AS (SELECT cell, token, n, score, row_number() OVER
              (PARTITION BY cell ORDER BY score DESC, token) AS rank
            FROM csc)
          SELECT CAST(cell AS INT) AS cell, CAST(rank AS INT) AS rank,
            token, CAST(n AS BIGINT) AS n, round(score, 4) AS score
          FROM crk WHERE rank <= 3
          ORDER BY cell, rank""",
    "q_customer_rfm" ->
      """WITH o AS (SELECT o_custkey AS cust,
             CAST(o_orderdate AS DATE) AS dt,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
           FROM orders),
         hz AS (SELECT max(dt) AS horizon FROM o),
         per AS (SELECT cust,
             date_diff('day', max(dt), horizon) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency, sum(c) AS cents
           FROM o, hz GROUP BY cust, horizon),
         sc AS (SELECT cust, recency_days, frequency, cents,
             6 - ntile(5) OVER (ORDER BY recency_days, cust) AS r_score,
             ntile(5) OVER (ORDER BY frequency, cust) AS f_score,
             ntile(5) OVER (ORDER BY cents, cust) AS m_score
           FROM per)
         SELECT cust AS custkey,
           CAST(recency_days AS BIGINT) AS recency_days, frequency,
           round(CAST(cents AS DOUBLE) / 100.0, 2) AS monetary,
           CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                  THEN 'champion'
                WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                WHEN r_score <= 2 AND f_score <= 2 THEN 'lost'
                ELSE 'regular' END AS segment
         FROM sc ORDER BY custkey"""
  )

  /** Mann–Whitney U oracle (shared by `q_events_mwu` and the FDR
    * battery built on its z scores). */
  /** Functional-dependency audit oracle — one block per candidate FD,
    * unioned, mirroring the engine's (lhs,rhs)-pair → lhs-group →
    * 1-row fold. */
  private val fdAuditOracle: String = {
    def block(name: String, table: String, l: String, r: String) =
      s"""SELECT '$name' AS fd,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           CAST(sum(CASE WHEN nv > 1 THEN sz ELSE 0 END) AS BIGINT)
             AS n_rows_violating,
           CAST(max(nv) AS BIGINT) AS max_rhs_values,
           max(nv) = 1 AS fd_holds
         FROM (SELECT l, count(DISTINCT r) AS nv, count(*) AS sz
               FROM (SELECT $l AS l, $r AS r FROM $table) GROUP BY l)"""
    Seq(
      block("nation.n_nationkey->n_regionkey", "nation",
        "n_nationkey", "n_regionkey"),
      block("part.p_partkey->p_brand", "part", "p_partkey", "p_brand"),
      block("customer.c_nationkey->c_mktsegment", "customer",
        "c_nationkey", "c_mktsegment"),
      block("orders.o_custkey->o_orderpriority", "orders",
        "o_custkey", "o_orderpriority"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
  }

  /** Holt–Winters oracle: the array-state fold replayed as a recursive
    * CTE carrying the seasonal LIST column; every smoothing constant
    * interpolated from the SAME Scala doubles the engine plan bakes
    * in, l' written as one shared text so all three of its uses are
    * the identical expression. */
  private val holtWintersOracle: String = {
    val m = 7
    val (al, be, ga) = (0.3, 0.1, 0.2)
    def d(x: Double) = s"CAST($x AS DOUBLE)"
    val (sa, sna) = (d(al), d(1.0 - al))
    val (sb, snb) = (d(be), d(1.0 - be))
    val (sg, sng) = (d(ga), d(1.0 - ga))
    val lp = s"$sa * (x.x - h.ss[1]) + $sna * (h.l + h.b)"
    s"""WITH RECURSIVE daily AS (
         SELECT event_type AS k, CAST(ts AS DATE) AS d,
           CAST(count(*) AS DOUBLE) AS cnt
         FROM events GROUP BY 1, 2),
       seqd AS MATERIALIZED (
         SELECT k, cnt AS x,
           row_number() OVER (PARTITION BY k ORDER BY d) AS i
         FROM daily),
       cnts AS (SELECT k, CAST(count(*) AS BIGINT) AS n
                FROM seqd GROUP BY 1),
       xs AS (SELECT k, list(x ORDER BY i) AS xs FROM seqd GROUP BY k),
       ini AS (
         SELECT xs.k, cnts.n,
           list_reduce(xs.xs[1:$m], (p, q) -> p + q) / $m AS l0,
           (list_reduce(xs.xs[${m + 1}:${2 * m}], (p, q) -> p + q) / $m
             - list_reduce(xs.xs[1:$m], (p, q) -> p + q) / $m) / $m AS b0,
           list_transform(xs.xs[1:$m],
             v -> v - list_reduce(xs.xs[1:$m], (p, q) -> p + q) / $m)
             AS ss
         FROM xs JOIN cnts ON cnts.k = xs.k WHERE cnts.n >= ${2 * m}),
       hw AS (
         SELECT k, ${2 * m} AS i, l0 AS l, b0 AS b, ss FROM ini
         UNION ALL
         SELECT h.k, h.i + 1,
           $lp,
           $sb * (($lp) - h.l) + $snb * h.b,
           list_append(h.ss[2:$m],
             $sg * (x.x - ($lp)) + $sng * h.ss[1])
         FROM hw h JOIN seqd x ON x.k = h.k AND x.i = h.i + 1),
       fin AS (SELECT h.* FROM hw h
               JOIN cnts ON cnts.k = h.k AND h.i = cnts.n)
       SELECT f.k AS event_type, cnts.n AS n_days,
         round(f.l, 6) AS level, round(f.b, 6) AS trend,
         round(f.l + f.b + f.ss[1], 6) AS forecast,
         round(list_aggregate(f.ss, 'max') - list_aggregate(f.ss, 'min'),
           6) AS seasonal_amplitude
       FROM fin f JOIN cnts ON cnts.k = f.k ORDER BY 1"""
  }

  /** Gate co-failure oracle: the four hard-gate indicators as one
    * map-side pass, indicator-product sums, literal pair rows. */
  private val gateOverlapOracle: String = {
    val gates = Seq(
      ("short", "len(toks) < 10"),
      ("few_stopwords",
        "len(list_filter(toks, x -> list_contains(" +
          "['the','be','to','of','and','that','have','with'], lower(x)))) < 2"),
      ("symbol_heavy",
        "round(CASE WHEN len(toks) > 0 THEN CAST(length(text) - " +
          "length(regexp_replace(text, '[#…]', '', 'g')) AS DOUBLE) " +
          "/ len(toks) ELSE 0.0 END, 4) > 0.1"),
      ("non_alpha",
        "round(CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, " +
          "x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) " +
          "/ len(toks) ELSE 0.0 END, 4) < 0.8"))
    val bcols = gates.map { case (n, e) =>
      s"CASE WHEN $e THEN 1 ELSE 0 END AS $n" }.mkString(",\n           ")
    val sums = (for { i <- gates.indices; j <- gates.indices if i <= j }
      yield s"CAST(sum(${gates(i)._1} * ${gates(j)._1}) AS BIGINT)" +
        s" AS s_${i}_$j").mkString(",\n           ")
    val rows = (for { i <- gates.indices; j <- gates.indices if i < j }
      yield s"""SELECT '${gates(i)._1}' AS gate_a,
           '${gates(j)._1}' AS gate_b, n_docs,
           s_${i}_$i AS fail_a, s_${j}_$j AS fail_b,
           s_${i}_$j AS co_fail FROM agg""").mkString(" UNION ALL ")
    s"""WITH d AS (
         SELECT doc_id, text, list_filter(
           regexp_split_to_array(trim(text), '\\s+'),
           x -> len(x) > 0) AS toks
         FROM documents),
       b AS (SELECT $bcols FROM d),
       agg AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, $sums FROM b),
       pairs AS ($rows)
       SELECT gate_a, gate_b, n_docs, fail_a, fail_b, co_fail,
         round(CASE WHEN fail_a + fail_b - co_fail > 0
           THEN CAST(co_fail AS DOUBLE) / (fail_a + fail_b - co_fail)
           ELSE 0.0 END, 6) AS jaccard
       FROM pairs ORDER BY gate_a, gate_b"""
  }

  /** Hurst aggregated-variance oracle: one block-variance branch per
    * scale m (complete blocks only), ln(m) quantized from the SAME
    * Scala doubles the engine constant-folds, 1e-6-quantized ln-ln
    * OLS in exact integers. */
  private val hurstOracle: String = {
    val ms = Seq(1, 2, 4, 8)
    val branches = ms.map { m =>
      val xq = math.floor(math.log(m.toDouble) * 1e6 + 0.5).toLong
      s"""SELECT k, $m AS m, CAST($xq AS BIGINT) AS xq,
           CAST(count(*) AS BIGINT) AS nb,
           (CAST(sum(CAST(bs AS HUGEINT) * bs) AS DOUBLE) / count(*) -
             (CAST(sum(bs) AS DOUBLE) / count(*)) *
             (CAST(sum(bs) AS DOUBLE) / count(*))) /
             CAST(${(m * m).toDouble} AS DOUBLE) AS varm
         FROM (SELECT k, (i - 1) // $m AS b, count(*) AS bn,
               CAST(sum(c) AS BIGINT) AS bs FROM idx GROUP BY 1, 2)
         WHERE bn = $m GROUP BY k"""
    }.mkString(" UNION ALL ")
    s"""WITH daily AS (
         SELECT event_type AS k, CAST(ts AS DATE) AS d, count(*) AS c
         FROM events GROUP BY 1, 2),
       idx AS (SELECT k, c,
           row_number() OVER (PARTITION BY k ORDER BY d) AS i
         FROM daily),
       pm AS ($branches),
       pts AS (SELECT k, xq,
           CAST(floor(ln(varm) * 1e6 + 0.5) AS BIGINT) AS yq
         FROM pm WHERE nb >= 2 AND varm > 0),
       o AS (SELECT k, CAST(count(*) AS BIGINT) AS np,
           CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
           CAST(sum(xq * yq) AS BIGINT) AS sxy,
           CAST(sum(xq * xq) AS BIGINT) AS sxx
         FROM pts GROUP BY k),
       sl AS (SELECT k, np,
           CAST(np * sxy - sx * sy AS DOUBLE) /
             CAST(np * sxx - sx * sx AS DOUBLE) AS slope
         FROM o)
       SELECT k AS event_type, np AS n_scales,
         CASE WHEN np >= 3 THEN round(slope, 4) END AS slope,
         CASE WHEN np >= 3 THEN round(1.0 + slope / 2.0, 4) END AS hurst
       FROM sl ORDER BY 1"""
  }

  /** Class-balanced sampling oracle: the splitmix64 hash-rank replay
    * (same stage CTEs as the bootstrap) cut at the minority count. */
  private def classBalancedOracle: String =
    s"""WITH base AS (SELECT vec_id AS id, label AS lbl FROM embeddings),
       ${splitmixStagesSql("base", "id", "id, lbl")},
       r AS (SELECT id, lbl, row_number() OVER
           (PARTITION BY lbl ORDER BY u53, id) AS rk FROM s3),
       mn AS (SELECT min(n) AS n_min FROM
         (SELECT count(*) AS n FROM base GROUP BY lbl)),
       kept AS (SELECT lbl, id FROM r, mn WHERE rk <= n_min),
       bef AS (SELECT lbl, CAST(count(*) AS BIGINT) AS n_before
               FROM base GROUP BY lbl)
       SELECT k.lbl AS label, max(b.n_before) AS n_before,
         CAST(count(*) AS BIGINT) AS n_kept,
         CAST(sum(id) AS BIGINT) AS sum_kept_ids
       FROM kept k JOIN bef b ON b.lbl = k.lbl
       GROUP BY k.lbl ORDER BY 1"""

  /** Markov removal-effect oracle: journey→transition CTEs mirroring
    * the engine's windows, then one unrolled quantized value-iteration
    * chain per variant (full + one per removed channel). Every fold
    * term is ⌊P·w+0.5⌋ as a BIGINT, so round order can't move it. */
  private val markovAttributionOracle: String = {
    val rounds = 12
    def iteration(pfx: String, removed: Option[String]): String = {
      val remCase = removed
        .map(ch => s"WHEN p.dst = '$ch' THEN 0.0").getOrElse("")
      val chain = (1 to rounds).map { i =>
        s"""${pfx}$i AS MATERIALIZED (
             SELECT p.src, CAST(sum(CAST(floor(p.pr * (CASE
                 WHEN p.dst = 'conv' THEN 1e12
                 WHEN p.dst = 'null' THEN 0.0
                 $remCase
                 ELSE CAST(coalesce(v.q, 0) AS DOUBLE) END) + 0.5)
               AS BIGINT)) AS BIGINT) AS q
             FROM p LEFT JOIN ${pfx}${i - 1} v ON v.src = p.dst
             GROUP BY p.src)"""
      }.mkString(",\n")
      s"""${pfx}0 AS (SELECT src, CAST(0 AS BIGINT) AS q FROM tt),
         $chain"""
    }
    val variants = ("f", None) +:
      markovChannels.sorted.zipWithIndex.map { case (ch, i) =>
        (s"r$i", Some(ch)) }
    val iterSql = variants.map { case (p, rem) => iteration(p, rem) }
      .mkString(",\n")
    val effRows = markovChannels.sorted.zipWithIndex.map { case (ch, i) =>
      s"""SELECT '$ch' AS channel,
           (SELECT q FROM r$i$rounds WHERE src = 'start') AS vrem"""
    }.mkString(" UNION ALL ")
    s"""WITH seq0 AS (
         SELECT user_id, ts, event_id,
           CASE WHEN event_type = 'purchase' THEN 'conv'
             ELSE event_type END AS st,
           row_number() OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS rk
         FROM events),
       fc AS (SELECT user_id, min(rk) AS cr FROM seq0
              WHERE st = 'conv' GROUP BY 1),
       tr AS MATERIALIZED (
         SELECT s.user_id, s.st, s.rk,
           lead(s.st, 1) OVER (PARTITION BY s.user_id
             ORDER BY s.ts, s.event_id) AS nxt
         FROM seq0 s LEFT JOIN fc ON fc.user_id = s.user_id
         WHERE fc.cr IS NULL OR s.rk <= fc.cr),
       trans AS (
         SELECT src, dst, CAST(count(*) AS BIGINT) AS c FROM (
           SELECT st AS src,
             CASE WHEN st = 'conv' THEN NULL
               ELSE coalesce(nxt, 'null') END AS dst
           FROM tr
           UNION ALL
           SELECT 'start' AS src, st AS dst FROM tr WHERE rk = 1)
         WHERE dst IS NOT NULL GROUP BY 1, 2),
       tt AS (SELECT src, CAST(sum(c) AS BIGINT) AS t
              FROM trans GROUP BY 1),
       p AS MATERIALIZED (
         SELECT trans.src, trans.dst, CAST(c AS DOUBLE) / t AS pr
         FROM trans JOIN tt ON tt.src = trans.src),
       $iterSql,
       fv AS (SELECT q AS vfull FROM f$rounds WHERE src = 'start'),
       eff AS ($effRows),
       eq AS (SELECT channel, vrem,
           CASE WHEN (SELECT vfull FROM fv) > 0 THEN
             CAST(floor(CAST((SELECT vfull FROM fv) - vrem AS DOUBLE) /
               (SELECT vfull FROM fv) * 1e9 + 0.5) AS BIGINT)
           ELSE CAST(0 AS BIGINT) END AS eq
         FROM eff),
       tote AS (SELECT CAST(sum(eq) AS BIGINT) AS s FROM eq)
       SELECT channel,
         round(CAST((SELECT vfull FROM fv) AS DOUBLE) / 1e12, 6)
           AS p_conv_full,
         round(CAST(vrem AS DOUBLE) / 1e12, 6) AS p_conv_removed,
         round(CAST(eq AS DOUBLE) / 1e9, 6) AS removal_effect,
         CASE WHEN (SELECT s FROM tote) > 0
           THEN round(CAST(eq AS DOUBLE) / (SELECT s FROM tote), 6)
           ELSE 0.0 END AS attribution_share
       FROM eq ORDER BY channel"""
  }

  /** LPA oracle: the engine's synchronous rounds unrolled — per round
    * one neighbor-label count + one (count desc, label) rank pick. */
  // def, not val: references coPurchaseCte, which is declared below
  // (a val here would interpolate null at object-init time)
  private def lpaOracle: String = {
    val iters = 5
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT a.m, l.lbl AS nl, count(*) AS c
           FROM adj a JOIN l${i - 1} l ON l.v = a.x GROUP BY 1, 2),
         l$i AS MATERIALIZED (SELECT m AS v, nl AS lbl FROM (
             SELECT m, nl, row_number() OVER
               (PARTITION BY m ORDER BY c DESC, nl) AS rk FROM c$i)
           WHERE rk = 1)"""
    }.mkString(",\n")
    s"""WITH $coPurchaseCte,
       adj AS (SELECT lo AS m, hi AS x FROM e0
         UNION ALL SELECT hi AS m, lo AS x FROM e0),
       l0 AS (SELECT DISTINCT m AS v, m AS lbl FROM adj),
       $rounds
       SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes
       FROM l$iters GROUP BY lbl ORDER BY n_nodes DESC, community"""
  }

  /** Co-purchase edge CTE shared by the graph_kcore / graph_link_pred
    * oracles — distinct (order, part) items, pairs within an order,
    * kept at co-occurrence ≥ 2, canonical lo < hi. */
  private val coPurchaseCte: String =
    """items AS MATERIALIZED (
         SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       e0 AS MATERIALIZED (
         SELECT a.p AS lo, b.p AS hi FROM items a
         JOIN items b ON a.o = b.o AND a.p < b.p
         GROUP BY 1, 2 HAVING count(*) >= 2)"""

  /** k-core oracle: the engine's synchronous peel unrolled as a
    * MATERIALIZED CTE chain (the documented iterative-oracle lesson —
    * un-materialized, DuckDB re-expands each round 4×). */
  private val kcoreOracle: String = {
    val (k, iters) = (3, 12)
    val rounds = (0 until iters).map { i =>
      s"""d$i AS MATERIALIZED (SELECT v, count(*) AS d FROM (
           SELECT lo AS v FROM e$i UNION ALL SELECT hi AS v FROM e$i)
           GROUP BY v),
         k$i AS MATERIALIZED (SELECT v FROM d$i WHERE d >= $k),
         e${i + 1} AS MATERIALIZED (SELECT lo, hi FROM e$i
           WHERE lo IN (SELECT v FROM k$i)
             AND hi IN (SELECT v FROM k$i))"""
    }.mkString(",\n")
    s"""WITH $coPurchaseCte,
       $rounds
       SELECT v AS p_partkey, CAST(d AS BIGINT) AS degree FROM (
         SELECT v, count(*) AS d FROM (
           SELECT lo AS v FROM e$iters UNION ALL SELECT hi AS v FROM e$iters)
         GROUP BY v)
       ORDER BY p_partkey"""
  }

  /** Link-prediction oracle: wedges through a shared middle vertex,
    * anti-joined against the edge set, ranked on the exact quantized
    * Resource-Allocation sum. */
  private val linkPredOracle: String =
    s"""WITH $coPurchaseCte,
       deg AS (SELECT v, count(*) AS d FROM (
         SELECT lo AS v FROM e0 UNION ALL SELECT hi AS v FROM e0)
         GROUP BY v),
       adj AS (SELECT lo AS m, hi AS x FROM e0
         UNION ALL SELECT hi AS m, lo AS x FROM e0),
       wed AS (SELECT w1.x AS a, w2.x AS b, w1.m
         FROM adj w1 JOIN adj w2 ON w1.m = w2.m AND w1.x < w2.x),
       cand AS (
         SELECT a, b, CAST(count(*) AS BIGINT) AS cn,
           CAST(sum(CAST(floor(1e9 / deg.d + 0.5) AS BIGINT)) AS BIGINT)
             AS raq
         FROM wed JOIN deg ON deg.v = wed.m
         GROUP BY a, b),
       nonedge AS (
         SELECT cand.* FROM cand
         LEFT JOIN e0 ON e0.lo = cand.a AND e0.hi = cand.b
         WHERE e0.lo IS NULL)
       SELECT n.a, n.b, n.cn,
         round(CAST(n.cn AS DOUBLE) / (da.d + db.d - n.cn), 6) AS jaccard,
         round(CAST(n.raq AS DOUBLE) / 1e9, 6) AS ra
       FROM nonedge n
       JOIN deg da ON da.v = n.a JOIN deg db ON db.v = n.b
       ORDER BY n.cn DESC, n.raq DESC, n.a, n.b LIMIT 25"""

  /** Two-proportion power card oracle — the normal quantiles ride as
    * the SAME Scala literals the engine plan bakes in (no probit in
    * either engine), and the num² / MDE terms use explicit
    * multiplication to match the engine's arithmetic tree. */
  private val powerAnalysisOracle: String = {
    val za = graft.operators.Metrics.PowerZAlpha
    val zb = graft.operators.Metrics.PowerZBeta
    s"""WITH b AS (
         SELECT c_mktsegment AS g, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS conv
         FROM customer GROUP BY 1),
       p AS (
         SELECT g, n, conv,
           CAST(conv AS DOUBLE) / n AS p1,
           least(CAST(conv AS DOUBLE) / n * CAST(1.1 AS DOUBLE),
             CAST(0.999 AS DOUBLE)) AS p2
         FROM b),
       q AS (
         SELECT g, n, conv, p1, p2,
           CAST($za AS DOUBLE) *
             sqrt(2.0 * ((p1 + p2) / 2.0) * (1.0 - (p1 + p2) / 2.0)) +
           CAST($zb AS DOUBLE) *
             sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)) AS num
         FROM p)
       SELECT g AS c_mktsegment, n, conv,
         round(p1, 6) AS p1, round(p2, 6) AS p2,
         CASE WHEN conv > 0 AND p1 < 0.999 THEN
           CAST(ceil(num * num / ((p1 - p2) * (p1 - p2))) AS BIGINT)
         END AS n_per_arm
       FROM q ORDER BY c_mktsegment"""
  }

  private val mwuOracle: String =
    """WITH e AS (
         SELECT event_type AS g, CAST(user_id % 2 AS INT) AS v, value AS x
         FROM events),
       bv AS (
         SELECT g, x, count(*) AS t,
           sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS ta
         FROM e GROUP BY g, x),
       r AS (
         SELECT g, t, ta,
           coalesce(sum(t) OVER (PARTITION BY g ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         FROM bv),
       agg AS (
         SELECT g, CAST(sum(ta) AS BIGINT) AS n_a,
           CAST(sum(t - ta) AS BIGINT) AS n_b,
           CAST(sum(ta * (2*cum + t + 1)) AS BIGINT) AS ra2,
           CAST(sum(t*t*t - t) AS BIGINT) AS ties3
         FROM r GROUP BY g),
       s AS (
         SELECT g, n_a, n_b,
           ra2 / 2.0 - n_a * (n_a + 1) / 2.0 AS u,
           n_a * CAST(n_b AS DOUBLE) / 12.0 *
             ((n_a + n_b + 1) - CAST(ties3 AS DOUBLE) /
               ((n_a + n_b) * (n_a + n_b - 1.0))) AS sigma2
         FROM agg)
       SELECT g AS event_type, n_a, n_b, round(u, 4) AS u,
         CASE WHEN n_a > 0 AND n_b > 0 AND sigma2 > 0
           THEN round((u - n_a * CAST(n_b AS DOUBLE) / 2.0) / sqrt(sigma2), 4)
         END AS z
       FROM s ORDER BY event_type"""

  /** Battle cells (shared by `battle_winrates` / `bt_strength`):
    * adjacent docs from different sources fight, longer text wins,
    * canonical unordered (model_a < model_b) cells with exact counts. */
  private val battleCellsOracle: String =
    """WITH f AS (
         SELECT a.source AS ma, b.source AS mb,
           (a.n_chars > b.n_chars OR
            (a.n_chars = b.n_chars AND a.source < b.source)) AS a_won
         FROM documents a JOIN documents b ON a.doc_id = b.doc_id - 1
         WHERE a.source <> b.source)
       SELECT least(ma, mb) AS model_a, greatest(ma, mb) AS model_b,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN (CASE WHEN ma < mb THEN a_won
                             ELSE NOT a_won END) THEN 1 ELSE 0 END)
           AS BIGINT) AS wins_a
       FROM f GROUP BY 1, 2"""

  private val prefPairOracleStats: String =
    """WITH pairs AS (
         SELECT a.doc_id AS pair_id, a.text AS chosen, b.text AS rejected
         FROM documents a JOIN documents b
           ON b.doc_id = a.doc_id + 1 AND b.lang = a.lang),
       tok AS (SELECT pair_id, chosen, rejected,
           list_distinct(list_filter(
             regexp_split_to_array(trim(chosen), '\s+'),
             x -> len(x) > 0)) AS tc,
           list_distinct(list_filter(
             regexp_split_to_array(trim(rejected), '\s+'),
             x -> len(x) > 0)) AS tr
         FROM pairs)
       SELECT pair_id,
         CAST(len(chosen) AS BIGINT) AS len_chosen,
         CAST(len(rejected) AS BIGINT) AS len_rejected,
         CASE WHEN len(rejected) > 0
           THEN round(CAST(len(chosen) AS DOUBLE) / len(rejected), 4)
         END AS len_ratio,
         CAST(len(list_intersect(tc, tr)) AS BIGINT) AS n_tok_inter,
         CAST(len(list_distinct(list_concat(tc, tr))) AS BIGINT)
           AS n_tok_union,
         CASE WHEN len(list_distinct(list_concat(tc, tr))) > 0
           THEN round(CAST(len(list_intersect(tc, tr)) AS DOUBLE)
             / len(list_distinct(list_concat(tc, tr))), 4)
         END AS tok_jaccard,
         chosen = rejected AS exact_dup,
         len(chosen) > len(rejected) AS chosen_longer
       FROM tok ORDER BY pair_id"""

  /** BM25 oracle over an optionally restricted corpus: full replay of
    * the postings/df/idf/tf-norm fold. The constants are written as the
    * SAME double folds Spark performs — `(1.2 + 1.0)` is the Scala
    * `k1 + 1.0` sum (one ulp off the literal 2.2), `0.25` is the exact
    * `1.0 − b`, and the `(idf · (num/denom))` association matches the
    * Column tree, so 4-dp rounding sees identical doubles. */
  /** LR-training oracle: replays Classifier.trainLogReg's 3 full-batch
    * gradient steps as unrolled CTEs under the 12-dp per-step rounding
    * contract (margins, gradient means, weight updates all round to
    * 12 dp — the pagerank determinism precedent, so hash-agg vs sort
    * summation order and libm exp ULP differences are absorbed).
    * Features = distinct hashed unigram buckets (FNV-1a low 6 bits,
    * the dsir bucket replay) + the always-on bias bucket −1.
    * [[lrTrainCte]] is the shared WITH-body ending in `w3(b, w)` and
    * `db(doc_id, y, b)` so the calibration oracle can score with the
    * same trained weights. */
  private def lrTrainOracle: String =
    s"""WITH $lrTrainCte
        SELECT b AS bucket, w AS weight FROM w3 ORDER BY bucket"""

  private def lrTrainCte: String =
    s"""toks AS (
          SELECT doc_id,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
            unnest(list_filter(
              regexp_split_to_array(trim(lower(text)), '\\s+'),
              x -> len(x) > 0)) AS tok
          FROM documents),
        db0 AS (SELECT DISTINCT doc_id, y,
                  CAST(${fnvSql("tok")} % 64 AS BIGINT) AS b FROM toks),
        dbias AS (SELECT doc_id,
                    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                    CAST(-1 AS BIGINT) AS b
                  FROM documents),
        db AS (SELECT * FROM db0 UNION ALL SELECT * FROM dbias),
        nn AS (SELECT count(*) AS n FROM documents),
        g1 AS (SELECT b, round(sum(0.5 - y) / n, 12) AS g
               FROM db CROSS JOIN nn GROUP BY b, n),
        w1 AS (SELECT b, round(0.0 - g, 12) AS w FROM g1),
        m2 AS (SELECT doc_id, y, round(sum(w), 12) AS m
               FROM db JOIN w1 USING (b) GROUP BY doc_id, y),
        p2 AS (SELECT doc_id, y, 1.0 / (1.0 + exp(-m)) AS p FROM m2),
        g2 AS (SELECT b, round(sum(p - y) / n, 12) AS g
               FROM db JOIN p2 USING (doc_id, y) CROSS JOIN nn
               GROUP BY b, n),
        w2 AS (SELECT b, round(w - g, 12) AS w
               FROM w1 JOIN g2 USING (b)),
        m3 AS (SELECT doc_id, y, round(sum(w), 12) AS m
               FROM db JOIN w2 USING (b) GROUP BY doc_id, y),
        p3 AS (SELECT doc_id, y, 1.0 / (1.0 + exp(-m)) AS p FROM m3),
        g3 AS (SELECT b, round(sum(p - y) / n, 12) AS g
               FROM db JOIN p3 USING (doc_id, y) CROSS JOIN nn
               GROUP BY b, n),
        w3 AS (SELECT b, round(w - g, 12) AS w
               FROM w2 JOIN g3 USING (b))"""

  /** Hybrid RRF oracle: the bm25Oracle scoring chain truncated at
    * rank ≤ 20, a dense cosine ranking per anchored query (anchors =
    * embeddings 0/1/2 for wq1/wq2/wq3), both fused with
    * Σ 1/(60 + rank) and re-ranked on the 6-dp-rounded fusion score
    * with doc-id tie-break — exactly what `Retrieval.rrfFuse` emits. */
  private def hybridRrfOracle: String = {
    val vals = bm25QueryTerms.map { case (q, term) => s"('$q','$term')" }
      .mkString(", ")
    s"""WITH qt(query_id, term) AS (VALUES $vals),
        d AS (
          SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
            x -> len(x) > 0) AS t
          FROM documents),
        lens AS (SELECT doc_id, len(t) AS dl FROM d),
        stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM lens),
        post AS (
          SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(t) AS term FROM d)
          GROUP BY doc_id, term),
        dfs AS (SELECT term, count(*) AS df FROM post GROUP BY term),
        scored AS (
          SELECT q.query_id, p.doc_id,
            round(sum(
              ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5)) *
              ((tf * (1.2 + 1.0)) /
               (tf + 1.2 * (0.25 + 0.75 * dl /
                  (CAST(sumdl AS DOUBLE) / n))))), 4) AS score
          FROM post p
          JOIN qt q USING (term)
          JOIN dfs USING (term)
          JOIN lens l ON p.doc_id = l.doc_id
          CROSS JOIN stats
          GROUP BY q.query_id, p.doc_id),
        sparse AS (
          SELECT * FROM (
            SELECT query_id, doc_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id) AS rank
            FROM scored) WHERE rank <= 20),
        qa(query_id, anchor) AS (VALUES ('wq1', 0), ('wq2', 1), ('wq3', 2)),
        av AS (
          SELECT query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings JOIN qa ON vec_id = anchor),
        dcos AS (
          SELECT av.query_id, vec_id AS doc_id,
            round(list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
              (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) *
               sqrt(list_dot_product(qv, qv))), 6) AS score
          FROM embeddings CROSS JOIN av),
        dense AS (
          SELECT * FROM (
            SELECT query_id, doc_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id) AS rank
            FROM dcos) WHERE rank <= 20),
        fused AS (
          SELECT coalesce(s.query_id, dn.query_id) AS query_id,
                 coalesce(s.doc_id, dn.doc_id) AS doc_id,
            round(coalesce(1.0 / (60 + s.rank), 0) +
                  coalesce(1.0 / (60 + dn.rank), 0), 6) AS rrf
          FROM sparse s FULL OUTER JOIN dense dn
            ON s.query_id = dn.query_id AND s.doc_id = dn.doc_id)
        SELECT query_id, rank, doc_id, rrf FROM (
          SELECT query_id, doc_id, rrf,
            row_number() OVER (PARTITION BY query_id
              ORDER BY rrf DESC, doc_id) AS rank
          FROM fused)
        WHERE rank <= 10 ORDER BY query_id, rank"""
  }

  private def bm25Oracle(where: String): String = {
    val vals = bm25QueryTerms.map { case (q, term) => s"('$q','$term')" }
      .mkString(", ")
    s"""WITH qt(query_id, term) AS (VALUES $vals),
        d AS (
          SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
            x -> len(x) > 0) AS t
          FROM documents $where),
        lens AS (SELECT doc_id, len(t) AS dl FROM d),
        stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM lens),
        post AS (
          SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(t) AS term FROM d)
          GROUP BY doc_id, term),
        dfs AS (SELECT term, count(*) AS df FROM post GROUP BY term),
        scored AS (
          SELECT q.query_id, p.doc_id,
            round(sum(
              ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5)) *
              ((tf * (1.2 + 1.0)) /
               (tf + 1.2 * (0.25 + 0.75 * dl /
                  (CAST(sumdl AS DOUBLE) / n))))), 4) AS score
          FROM post p
          JOIN qt q USING (term)
          JOIN dfs USING (term)
          JOIN lens l ON p.doc_id = l.doc_id
          CROSS JOIN stats
          GROUP BY q.query_id, p.doc_id),
        ranked AS (
          SELECT query_id, doc_id, score,
            row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS rank
          FROM scored)
        SELECT query_id, rank, doc_id, score FROM ranked
        WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** DSIR weight CTE chain ending in `wts(doc_id, n_feats, logw)`:
    * hashed-bigram buckets (FNV low 8 bits), add-one smoothed bucket
    * likelihoods for the English target vs the raw pool, per-doc
    * summed log-ratio at 4 dp. */
  private def dsirWeightsCte: String =
    s"""toks AS (
          SELECT doc_id, lang,
            list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
              x -> len(x) > 0) AS t
          FROM documents),
        g0 AS (
          SELECT doc_id, lang, t,
            unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
          FROM toks),
        grams AS (
          SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS gram FROM g0),
        bk AS (SELECT doc_id, lang, ${fnvSql("gram")} % 256 AS bucket FROM grams),
        raw AS (SELECT bucket, count(*) AS cr FROM bk GROUP BY bucket),
        tgt AS (SELECT bucket, count(*) AS ct
                FROM bk WHERE lang = 'en' GROUP BY bucket),
        tot AS (SELECT (SELECT sum(cr) FROM raw) AS tr,
                       (SELECT sum(ct) FROM tgt) AS tt),
        ratio AS (
          SELECT bucket,
            ln((coalesce(ct, 0) + 1) / (tt + 256)) -
            ln((cr + 1) / (tr + 256)) AS lr
          FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot),
        perdoc AS (
          SELECT doc_id, count(*) AS n_feats, round(sum(lr), 4) AS logw
          FROM bk JOIN ratio USING (bucket) GROUP BY doc_id),
        wts AS (
          SELECT d.doc_id, coalesce(n_feats, 0) AS n_feats,
            coalesce(logw, 0.0) AS logw
          FROM documents d LEFT JOIN perdoc USING (doc_id))"""

  /** Replays [[qDsirSelect]]: the weight chain, the splitmix64 53-bit
    * uniform, the Gumbel key at 4 dp, and the (key DESC, id) top-100. */
  private def dsirSelectOracle: String =
    s"""WITH $dsirWeightsCte,
        ${splitmixStagesSql("wts", "doc_id", "doc_id, n_feats, logw")},
        keyed AS (
          SELECT doc_id, n_feats, logw,
            round(logw - ln(-ln(CAST(greatest(u53, 1) AS DOUBLE)
              / 9007199254740992.0)), 4) AS gumbel_key
          FROM s3)
        SELECT doc_id, n_feats, logw, gumbel_key FROM keyed
        ORDER BY gumbel_key DESC, doc_id LIMIT 100"""

  /** The ensemble oracle composes the gopher gate CTE, the DuckDB log₂
    * `entropy()` replay of CharEntropy, and the logistic score with the
    * shared [[TextAnalysis.QualityWeights]] — then names the first
    * failing gate in the same fixed priority order as the operator. */
  private def qualityEnsembleOracle: String = {
    val w = TextAnalysis.QualityWeights
    s"""WITH d AS (
          SELECT doc_id, text,
            list_filter(regexp_split_to_array(trim(text), '\\s+'),
              x -> len(x) > 0) AS toks
          FROM documents),
        f AS (
          SELECT doc_id,
            CAST(len(toks) AS BIGINT) AS n_words,
            round(CASE WHEN len(toks) > 0
              THEN CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
                / len(toks) ELSE 0.0 END, 4) AS mean_word_len,
            round(CASE WHEN len(toks) > 0
              THEN CAST(length(text) -
                length(regexp_replace(text, '[#…]', '', 'g')) AS DOUBLE)
                / len(toks) ELSE 0.0 END, 4) AS symbol_ratio,
            round(CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                AS DOUBLE) / len(toks) ELSE 0.0 END, 4) AS alpha_word_frac,
            CAST(len(list_filter(toks, x -> list_contains(
              ['the','be','to','of','and','that','have','with'], lower(x))))
              AS BIGINT) AS n_stopwords,
            round(CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, x -> list_contains(
                ['the','a','an','and','or','of','to','in','is','it',
                 'that','this','for','on','with','as','at','by','be'], lower(x))))
                AS DOUBLE) / len(toks) ELSE 0.0 END, 4) AS q_stop_ratio,
            round(CASE WHEN length(text) > 0
              THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                AS DOUBLE) / length(text) ELSE 0.0 END, 4) AS q_punct_ratio
          FROM d),
        ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c
               FROM documents),
        ent AS (SELECT doc_id, round(entropy(c), 4) AS char_entropy
                FROM ch GROUP BY doc_id),
        z AS (
          SELECT f.doc_id, n_words, mean_word_len, symbol_ratio,
            alpha_word_frac, n_stopwords,
            coalesce(ent.char_entropy, 0.0) AS char_entropy,
            round(1.0 / (1.0 + exp(-(${w("intercept")}
              + ${w("log1p_tokens")} * ln(1.0 + CAST(n_words AS DOUBLE))
              + ${w("stopword_ratio")} * q_stop_ratio
              + ${w("punct_ratio")} * q_punct_ratio
              + ${w("avg_token_len")} * mean_word_len))), 4) AS quality_score
          FROM f LEFT JOIN ent ON f.doc_id = ent.doc_id),
        r AS (
          SELECT *, CASE
            WHEN NOT (n_words >= 10 AND n_words <= 100000) THEN 'word_count'
            WHEN NOT (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
              THEN 'mean_word_len'
            WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
            WHEN alpha_word_frac < 0.8 THEN 'alpha_words'
            WHEN n_stopwords < 2 THEN 'stopwords'
            WHEN char_entropy < 3.5 THEN 'low_entropy'
            WHEN quality_score < 0.5 THEN 'classifier'
            END AS reject_reason
          FROM z)
        SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
          n_stopwords, char_entropy, quality_score, reject_reason,
          (reject_reason IS NULL) AS keep
        FROM r ORDER BY doc_id"""
  }
}
