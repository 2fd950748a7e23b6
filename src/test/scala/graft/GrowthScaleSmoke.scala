package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SplitMix64.splitmix64
import graft.operators.{CacheScope, Clustering, Dedup, Funnel}

/** Growth-rate scale smoke for the dedup chain: the sf corpora top out
  * at ~600k rows, so "this is linear at 100 TB" claims otherwise rest
  * on plan shape alone. This smoke runs the minhash-LSH → cross-corpus
  * → connected-components chain on SYNTHETIC corpora at two sizes 10×
  * apart (default 250k vs 2.5M docs, generated distributed from pure
  * splitmix64 column expressions — no driver loop, no disk) and asserts
  * the two observables that actually catch quadratic traps early:
  *
  *  - candidate-pair counts grow ~linearly in corpus size (the
  *    zero-shingle banding bug r5's property test caught was exactly a
  *    super-linear candidate cluster — this asserts the absence of the
  *    whole failure class, not just that one instance);
  *  - total shuffle-read RECORDS per phase grow ~linearly (a shape
  *    regression that re-introduces an all-pairs join or an unpruned
  *    window shows up here as ~100× growth at 10× data).
  *
  * Ratio gate: metric(10N)/metric(N) ≤ 20 (linear with slack for
  * fixed overheads and band-collision noise); candidate pairs must
  * also grow ≥ 5× (a test that stops finding pairs proves nothing).
  *
  * Run: sbt "Test/runMain graft.GrowthScaleSmoke [N]"  (N = small size)
  */
object GrowthScaleSmoke {

  /** Sums shuffle-read records across completed stages; listener-bus
    * delivery is async, so phases sleep briefly before sampling. */
  private final class ShuffleTap extends SparkListener {
    val records = new AtomicLong(0)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) { records.addAndGet(m.shuffleReadMetrics.recordsRead); () }
    }
  }

  /** Deterministic 10–40-token text for doc `d` over a 30k-word vocab;
    * pure column expressions so generation runs distributed. */
  private def textOf(d: Column): Column = {
    val len = pmod(splitmix64(d * 2654435761L + 7), lit(31)).cast("int") + 10
    concat_ws(" ", transform(sequence(lit(0), len - 1),
      i => concat(lit("w"), pmod(splitmix64(d * 131071L + i.cast("long")), lit(30000)))))
  }

  /** Corpus text for doc id `d`: every 10th doc is a planted near-copy
    * of its decade's base doc (two appended tokens → Jaccard ≈ 0.9). */
  private def docText(d: Column): Column =
    when(d % 10 === 9,
      concat(textOf(d - 9), lit(" xtr"), (d % 7).cast("string")))
      .otherwise(textOf(d))

  private def genDocs(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"), docText(col("id")).as("text"))

  private final case class Phase(name: String, result: Long, shuffleRecords: Long, secs: Double)

  private def runChain(spark: SparkSession, tap: ShuffleTap, n: Long): Seq[Phase] = {
    def phase(name: String)(f: => Long): Phase = {
      Thread.sleep(1500) // let prior stage events drain
      val before = tap.records.get
      val t0 = System.nanoTime()
      val r = f
      CacheScope.drain()
      Thread.sleep(1500)
      val p = Phase(name, r, tap.records.get - before, (System.nanoTime() - t0) / 1e9)
      println(f"GROWTH n=$n%8d ${p.name}%-14s result=${p.result}%10d shuffleRows=${p.shuffleRecords}%12d ${p.secs}%7.1f s")
      p
    }
    val docs = genDocs(spark, n).repartition(32).persist()
    docs.count()
    val minhash = phase("minhash_lsh") {
      Dedup.minhashLshPairs(docs, "text", "doc_id", shingleN = 3, nPerm = 64, bands = 16).count()
    }
    val cross = phase("crosscorpus") {
      val idx = Dedup.nearDupCorpusIndex(docs, "text", "doc_id",
        shingleN = 3, nPerm = 64, bands = 16)
      // batch = n/10 docs: half near-copies of corpus docs (scattered by
      // a co-prime multiplier), half novel text from a disjoint id space
      val batch = spark.range(n / 10).select(
        (col("id") + 10L * n).as("doc_id"),
        when(col("id") % 2 === 0,
          concat(docText(pmod(col("id") * 7919L, lit(n))), lit(" qq")))
          .otherwise(textOf(col("id") + 5L * n + 123L)).as("text"))
      val kept = Dedup.dropNearDupsOfCorpus(batch, "text", "doc_id", idx, 0.5).count()
      idx.release()
      kept
    }
    val cc = phase("conn_comp") {
      val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
        shingleN = 3, nPerm = 64, bands = 16)
      Clustering.dupClusters(pairs, "id_a", "id_b").count()
    }
    // exact-substring spans: shuffle rows ∝ sliding windows (∝ tokens,
    // linear); the planted every-10th near-copies guarantee dup windows
    // keep appearing at scale. A quadratic trap here would be the
    // window-hash partitions degenerating (hot hash × occurrences).
    val ess = phase("exact_substr") {
      Dedup.exactSubstrSpans(docs, "text", "doc_id", winTokens = 8).count()
    }
    // DSIR scoring: two corpus scans (bucket-count agg + per-doc sum),
    // both ∝ bigram features; the ratio table is nBuckets rows and rides
    // a broadcast, so shuffle rows must stay ∝ docs, never ∝ docs×buckets
    val dsir = phase("dsir_score") {
      graft.operators.Dsir.importanceWeights(docs, "text", "doc_id",
        col("doc_id") % 10 === 0, nBuckets = 256).count()
    }
    // in-engine LR training: per iteration one doc-keyed margin agg and
    // one bucket-keyed gradient agg over the feature rows — shuffle rows
    // ∝ tokens × iters (linear); result = bucket-vector size (constant).
    // A regression that joins features against features (instead of the
    // broadcast weight vector) would show as tokens² growth here.
    val lrt = phase("lr_train") {
      graft.operators.Classifier.trainLogReg(docs, "text", "doc_id",
        col("doc_id") % 10 === 0, nBuckets = 64, iters = 2).count()
    }
    docs.unpersist()

    // event-chain phases (r7 verdict ask #7): attribution + funnel on a
    // HOT-USER-SKEWED synthetic event stream — 10% of all events land on
    // 10 users, the rest spread over n/50 users. Quadratic traps here
    // would be per-user history buffering (shuffle rows ∝ events×touches)
    // or an unpruned window; linear shuffle growth at 10× events with the
    // skew present is the evidence the aggregation-cascade shapes hold.
    val events = genEvents(spark, n).repartition(32).persist()
    events.count()
    val attr = phase("attribution") {
      Funnel.lastTouchAttribution(events, Seq("view", "click"), "purchase",
        windowMicros = 3600L * 1000000L).count()
    }
    val fun = phase("funnel") {
      // result rows = |stages| (constant): the shuffle-row ratio is the
      // load-bearing observable for this phase
      Funnel.orderedFunnel(events, Seq("view", "click", "purchase")).count()
    }
    // bucketized interval join: the window dim stays CONSTANT (24 hourly
    // busy windows) while events grow 10× — joined rows and shuffle rows
    // must both grow ~linearly; a BNLJ regression shows as events×windows
    // replication in the shuffle tap
    val ij = phase("interval_join") {
      import graft.operators.IntervalJoin
      val pts = events.select(unix_micros(col("ts")).as("tsus"))
      val wins = spark.range(24).select(
        (col("id") * 3600000000L - 900000000L).as("ws"),
        (col("id") * 3600000000L + 4500000000L).as("we"))
      IntervalJoin.pointInInterval(pts, "tsus", wins, "ws", "we",
        1800000000L).count()
    }
    // Markov transition matrix on the same skewed stream: one lag
    // window (per-user sort, linear) + a types²-bounded agg — result
    // rows stay ≤ 9 while events grow 10×
    val trn = phase("transitions") {
      Funnel.transitionMatrix(events).count()
    }
    events.unpersist()
    // blocked fuzzy linkage with a FIXED dictionary (4k distinct names
    // over any row count): the dictionary-first discipline means the
    // within-block pair work is CONSTANT as rows grow 10× — only the
    // distinct-name aggregation scans more. A regression that pairs at
    // the row level instead of the dictionary shows as rows² here.
    val fz = phase("fuzzy_link") {
      import graft.operators.FuzzyLink
      val names = spark.range(n).select(concat(
        lit("adj"), pmod(splitmix64(col("id") * 23L + 1), lit(200)),
        lit(" noun"), pmod(splitmix64(col("id") * 41L + 9), lit(20)))
        .as("p_name"))
      FuzzyLink.blockedPairs(names, "p_name",
        regexp_extract(col("name"), "[^ ]+$", 0), maxDist = 2).count()
    }
    // market-basket pair mining: baskets of ≤ 6 items over a 10k-item
    // catalog — pair rows ∝ orders × basket² (constant basket bound ⇒
    // linear); an item×item regression would blow up on the hot items
    val bk = phase("basket_rules") {
      import graft.operators.Basket
      val facts = spark.range(n).select(
        (col("id") / 4L).cast("long").as("o"),
        pmod(splitmix64(col("id") * 37L + 3), lit(10000)).as("p"))
      Basket.associationRules(facts, "o", "p", minSupport = 2,
        topK = 50).count()
    }
    // join-iterated pagerank on a synthetic 5-regular-ish digraph that
    // scales with the corpus: shuffle rows ∝ edges × iterations (linear);
    // result rows = node count
    val pg = phase("pagerank") {
      import graft.operators.Graph
      val nNodes = (n / 1000).max(100L)
      val edges = spark.range(nNodes * 5).select(
        pmod(col("id"), lit(nNodes)).as("s"),
        pmod(splitmix64(col("id") * 19L + 7), lit(nNodes)).as("d"),
        lit(1.0).as("w"))
      val nodes = spark.range(nNodes).select(col("id").as("node0"))
      Graph.pageRank(edges, "s", "d", "w", nodes, "node0", iters = 3).count()
    }
    // image dHash pair mining on n/10 RANDOM-pixel BMPs with every 10th
    // a planted identical copy of its decade base: pairs ∝ images, and
    // the 16-bit-block buckets stay bounded — a quadratic regression
    // (all-pairs hamming) shows as ~100× growth. The oracle-corpus
    // generator (linear-ramp pixels) is deliberately NOT used here: its
    // same-dims images are all brightness shifts of each other, so its
    // true dHash pair set IS quadratic — correct for the operator,
    // useless as a linear-growth probe (first run of this smoke proved
    // it at exactly 100× result growth).
    val dh = phase("image_dhash") {
      import graft.operators.Multimodal
      def randBmp(seed: Long, w: Int, h: Int): Array[Byte] = {
        val b = Multimodal.synthBmp(seed, w, h)
        val stride = (w * 3 + 3) & ~3
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w * 3) {
            b(54 + y * stride + x) = (graft.functions.SplitMix64
              .mix(seed * 1000003L + y * 512L + x) & 0xFF).toByte
            x += 1
          }
          y += 1
        }
        b
      }
      val randBmpUdf = udf(randBmp _)
      val seed = when(col("id") % 10 === 9, col("id") - 9).otherwise(col("id"))
      // w ≥ 9, h ≥ 8 so the 9×8 sample grid hits distinct pixels and
      // all 64 hash bits are live random bits: cross-image hamming ≤ 3
      // collisions are then ~2^-50 rare, leaving the planted copies as
      // the pair set (smaller images collapse to ~24 effective bits
      // and random collisions alone re-grow quadratically)
      val imgs = spark.range(n / 10).select(col("id").as("img_id"),
        randBmpUdf(seed,
          (pmod(seed, lit(4)) + 9).cast("int"),
          (pmod(seed, lit(3)) + 8).cast("int")).as("media"))
      Multimodal.imageDHashPairs(imgs, "media", "img_id", maxDist = 3).count()
    }
    // cardinality-profile novelty: register aggregation ships ONE
    // 512-byte buffer per (group × task) through the exchange, so
    // shuffle ROWS stay ~constant while data grows 10× — the whole
    // point of sketch-backed profiling; result rows = group count
    val card = phase("card_novelty") {
      import graft.operators.Cardinality
      val corpus = spark.range(n).select(
        pmod(col("id"), lit(20)).cast("string").as("grp"),
        concat(lit("t"), col("id")).as("text"))
      val batch = spark.range(n / 10).select(
        pmod(col("id"), lit(20)).cast("string").as("grp"),
        concat(lit("t"), col("id") * 2).as("text"))
      Cardinality.CardRef.build(corpus, "grp", "text")
        .noveltyOf(batch, "grp", "text").count()
    }
    Seq(minhash, cross, cc, ess, dsir, lrt, attr, fun, trn, ij, fz, bk,
      pg, dh, card)
  }

  /** Skewed event stream: (event_id, user_id, ts, event_type); ~10% of
    * events on 10 hot users, timestamps over one synthetic day, types
    * ~60% view / 30% click / 10% purchase. Pure column expressions. */
  private def genEvents(spark: SparkSession, n: Long): DataFrame = {
    val d = col("id")
    val hot = pmod(splitmix64(d * 31L + 5), lit(10)) === 0
    val user = when(hot, pmod(splitmix64(d * 17L + 11), lit(10)))
      .otherwise(lit(10) + pmod(splitmix64(d * 13L + 1), lit((n / 50).max(1L))))
    val tsUs = pmod(splitmix64(d * 7L + 3), lit(86400000000L))
    val r = pmod(splitmix64(d * 29L + 23), lit(10))
    val typ = when(r <= 5, lit("view"))
      .when(r <= 8, lit("click"))
      .otherwise(lit("purchase"))
    spark.range(n).select(d.as("event_id"), user.as("user_id"),
      timestamp_micros(tsUs).as("ts"), typ.as("event_type"))
  }

  def main(args: Array[String]): Unit = {
    val nSmall = if (args.nonEmpty) args(0).toLong else 250000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("growth_ckpt").toString)
    val tap = new ShuffleTap
    spark.sparkContext.addSparkListener(tap)

    val small = runChain(spark, tap, nSmall)
    val big = runChain(spark, tap, nSmall * 10)

    var failed = false
    small.zip(big).foreach { case (s, b) =>
      val rShuffle = b.shuffleRecords.toDouble / math.max(1, s.shuffleRecords)
      val rResult = b.result.toDouble / math.max(1, s.result)
      println(f"GROWTH ratio ${s.name}%-14s result×$rResult%6.1f shuffleRows×$rShuffle%6.1f (linear=10, quadratic=100)")
      if (rShuffle > 20) { println(s"GROWTH FAIL ${s.name}: shuffle grew ${rShuffle}× at 10× data"); failed = true }
      if (rResult > 20) { println(s"GROWTH FAIL ${s.name}: result grew ${rResult}× at 10× data"); failed = true }
    }
    // the pair search must keep finding the planted structure at scale
    if (big.head.result < 5 * small.head.result) {
      println(s"GROWTH FAIL: candidate pairs ${small.head.result} -> ${big.head.result}, expected ≥5×")
      failed = true
    }
    // adaptive salted join (r8 ask #5): the hot reducer's row share of
    // the join exchange must drop ~salts× once SpaceSaving-detected hot
    // keys are salted. The event stream's type key is massively hot
    // (~60% of rows on one value), the canonical un-splittable skew.
    {
      import graft.operators.Skew
      val salts = 8
      val ev = genEvents(spark, nSmall)
      val dim = ev.select(col("event_type")).distinct()
        .withColumn("n_type", lit(1L))
      def maxShare(df: DataFrame, keys: Column*): Double = {
        val r = df.repartition(32, keys: _*)
          .groupBy(spark_partition_id().as("p"))
          .agg(count(lit(1)).as("c"))
          .agg(max(col("c")).as("mx"), sum(col("c")).as("tot")).head()
        r.getLong(0).toDouble / r.getLong(1)
      }
      val before = maxShare(ev, col("event_type"))
      val (f, _, _) = Skew.adaptiveSaltedJoin(ev, dim, "event_type",
        salts, col("event_id"))
      val after = maxShare(f, col("event_type"), col("__salt"))
      println(f"GROWTH salted-exchange hot-reducer share $before%.3f -> $after%.3f (salts=$salts)")
      if (after > before / (salts / 2)) {
        println(f"GROWTH FAIL salted-exchange: share only $before%.3f -> $after%.3f at salts=$salts")
        failed = true
      }
    }
    // adaptive salting IN THE MINING CHAIN (r9 ask #5): plant a
    // boilerplate cluster (60 identical docs → identical signatures →
    // every band bucket they produce goes hot), then check (a) the
    // SpaceSaving report detects the buckets, (b) the salted pair
    // search returns the EXACT unsalted pair set, and (c) the planted
    // bucket no longer owns one reducer key: max fact-side rows per
    // join key drops ~salts× (per-key pair generation is quadratic in
    // that count — it IS the hot-reducer bound).
    {
      import graft.operators.{Dedup, Skew}
      val salts = 8
      val boiler = "the shared boilerplate legal disclaimer text that " +
        "every crawled page carries along verbatim all rights reserved"
      val docs = spark.range(2000).select(col("id").as("doc_id"),
        when(col("id") % 33 === 0, lit(boiler))
          .otherwise(concat(lit("unique document body number "),
            col("id").cast("string"), lit(" with varied words "),
            (col("id") * 7 % 1000).cast("string"), lit(" "),
            (col("id") * 13 % 997).cast("string"), lit(" tail section "),
            (col("id") * 29 % 991).cast("string"))).as("text"))
      val sh = Dedup.shingleDf(docs, "text", "doc_id", 3, outId = "mh_id")
      val keyed = Dedup.bandFrame(sh, "mh_id", 64, 8)
        .withColumn("__bk",
          concat_ws("\u0001", col("band"), col("band_hash")))
        .localCheckpoint()
      val hot = Skew.hotKeyList(keyed, "__bk")
      if (hot.isEmpty) {
        println("GROWTH FAIL mining-salt: planted hot band buckets not detected")
        failed = true
      }
      def maxPerKey(df: DataFrame, keys: Column*): Long =
        df.groupBy(keys: _*).agg(count(lit(1)).as("c"))
          .agg(max(col("c"))).head().getLong(0)
      val before = maxPerKey(keyed, col("__bk"))
      val salted = keyed.withColumn("__salt",
        when(col("__bk").isin(hot: _*),
          pmod(hash(col("mh_id")), lit(salts))).otherwise(lit(0)))
      val after = maxPerKey(salted, col("__bk"), col("__salt"))
      println(s"GROWTH mining-salt hot=${hot.size} maxPerKey $before -> $after (salts=$salts)")
      if (after > before / (salts / 2)) {
        println(s"GROWTH FAIL mining-salt: maxPerKey only $before -> $after at salts=$salts")
        failed = true
      }
      def pairSet(s: Int) =
        Dedup.minhashLshPairsFromShingles(
            Dedup.shingleDf(docs, "text", "doc_id", 3, outId = "mh_id"),
            64, 8, salts = s)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
      val (plain, adaptive) = (pairSet(0), pairSet(salts))
      graft.operators.CacheScope.drain()
      if (plain != adaptive) {
        println(s"GROWTH FAIL mining-salt: salted pairs diverge " +
          s"(plain=${plain.size}, salted=${adaptive.size})")
        failed = true
      } else println(s"GROWTH mining-salt pair sets identical (${plain.size} pairs)")
    }
    spark.stop()
    assert(!failed, "growth assertions failed — see GROWTH FAIL lines")
    println("GROWTH OK: all phases ~linear at 10× data")
  }
}
