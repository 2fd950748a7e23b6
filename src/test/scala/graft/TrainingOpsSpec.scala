package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Pii, Clustering, Contamination, Sampling, Similarity, TextAnalysis}
import graft.functions.SplitMix64

/** Round-3 training-data operators: PII scrub, benchmark contamination,
  * dup clustering, deterministic sampling, repetition stats, int8
  * quantization. Each test pins semantics on crafted inputs small
  * enough to verify by hand; the DuckDB oracles re-verify the same
  * operators end-to-end on the real corpus. */
class TrainingOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import scala.jdk.CollectionConverters._

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ----------------------------------------------------------------- PII

  test("pii scan counts and redaction") {
    val d = docs(
      (1L, "mail me at alice.smith+x@corp.example.org or 10.1.2.3 soon"),
      (2L, "call 555-123-4567 card 4111 1111 1111 1111 done"),
      (3L, "nothing sensitive here"))
    val out = d.select((col("doc_id") +: Pii.scanColumns(col("text")) :+
        Pii.redact(col("text")).as("red")): _*)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 1 && out(0).getLong(2) == 1) // email, ip
    assert(out(0).getString(5) ==
      "mail me at <EMAIL> or <IP> soon")
    assert(out(1).getLong(3) == 1 && out(1).getLong(4) == 1) // phone, card
    assert(out(1).getString(5) == "call <PHONE> card <CARD> done")
    assert(out(2).toSeq.slice(1, 5) == Seq(0L, 0L, 0L, 0L))
    assert(out(2).getString(5) == "nothing sensitive here")
  }

  test("pii hasPii routes only matching docs") {
    val d = docs((1L, "x bob@example.com y"), (2L, "clean"))
    val flagged = d.filter(Pii.hasPii(col("text"))).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(flagged == Seq(1L))
  }

  // ---------------------------------------------------------- clustering

  test("connected components: min-label over chains and singleton edges") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val comp = Clustering.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("large-star/small-star: long chain converges in logarithmic rounds") {
    import spark.implicits._
    // a 400-node path: min-label propagation needs ~400 rounds; the
    // star contraction must finish inside maxIter = 15 — correctness
    // under that cap IS the convergence-speed assertion
    val chain = (0L until 399L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Clustering.connectedComponentsStar(chain, "id_a", "id_b", maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 400)
    assert(comp.values.forall(_ == 0L), comp.filter(_._2 != 0L).take(5).toString)
    // mixed shapes + self-loop + singleton-edge parity with min-label
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (5L, 5L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val star = Clustering.connectedComponentsStar(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("dupClusters adds membership counts") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val out = Clustering.dupClusters(edges, "id_a", "id_b")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (8L, 7L, 2L)))
  }

  // ------------------------------------------------------- contamination

  test("ngram overlap between train and eval docs") {
    val train = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text with no overlap at all whatsoever"))
    val eval_ = docs((100L, "quick brown fox jumps high"))
    val out = Contamination.ngramOverlap(train, eval_, "text", "doc_id",
        n = 3, minOverlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // eval doc has 3 trigrams: "quick brown fox", "brown fox jumps",
    // "fox jumps high" — the first two appear in train doc 1
    assert(out.toSeq == Seq((1L, 100L, 2L, 0.6667)))
  }

  test("bloom contamination pre-filter: no false negatives, bounded extras") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val eval_ = d.filter(col("doc_id") % 50 === 0)
    val train = d.filter(col("doc_id") % 50 =!= 0)
    val exact = Contamination.ngramOverlap(train, eval_, "text", "doc_id",
        n = 3, minOverlap = 1)
      .select("train_id").distinct().collect().map(_.getLong(0)).toSet
    val flagged = Contamination.ngramBloomFlag(train, eval_, "text", "doc_id",
        n = 3)
      .collect().map(_.getLong(0)).toSet
    // Bloom has no false negatives: every truly overlapping doc is flagged
    assert((exact -- flagged).isEmpty, s"missed: ${exact -- flagged}")
    // doc-level fp ≈ 1-(1-1e-4)^s ≈ 0.4% at s≈40 — allow generous slack
    val nTrain = train.count()
    assert(flagged.size - exact.size <= math.max(10, (nTrain * 0.05).toLong),
      s"flagged=${flagged.size} exact=${exact.size} of $nTrain")
  }

  test("decontamination: report verdicts match the apply-side anti-join") {
    val train = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text with no overlap at all whatsoever"),
      (3L, "quick brown fox jumps high above everything today"))
    val eval_ = docs((100L, "quick brown fox jumps high"))
    val ov = Contamination.ngramOverlap(train, eval_, "text", "doc_id",
      n = 3, minOverlap = 1)
    val rep = Contamination.decontaminationReport(train, "doc_id", ov)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Boolean]("keep"))).toMap
    assert(rep(1L)._2 == false && rep(1L)._1 == 1L) // hits eval doc 100
    assert(rep(3L)._2 == false)                     // 3 shared trigrams
    assert(rep(2L) == (0L, true))                   // clean
    // apply step == report.filter(keep), and it's a broadcastable
    // anti-join on the id (no text in the join)
    val applied = Contamination.decontaminate(train, "doc_id", ov)
    assert(applied.select("doc_id").collect().map(_.getLong(0)).toSet ==
      rep.filter(_._2._2).keySet)
    val plan = applied.queryExecution.sparkPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(800))
  }

  // ------------------------------------------------------------ sampling

  test("splitmix64 matches the reference test vector") {
    // first output of the splitmix64 stream seeded with 0
    assert(SplitMix64.mix(0L) == 0xE220A8397B1DCDAFL)
  }

  test("stratified Bernoulli: deterministic, rate-1 keeps all, rate-0 none") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val keepAll = Sampling.stratifiedBernoulli(d, "doc_id", "lang",
      Map("en" -> 1.0), defaultRate = 1.0).count()
    assert(keepAll == d.count())
    val keepNone = Sampling.stratifiedBernoulli(d, "doc_id", "lang",
      Map.empty, defaultRate = 0.0).count()
    assert(keepNone == 0)
    val a = Sampling.stratifiedBernoulli(d, "doc_id", "lang",
      Map("en" -> 0.5), defaultRate = 0.2).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedBernoulli(d, "doc_id", "lang",
      Map("en" -> 0.5), defaultRate = 0.2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must be a pure function of ids")
    // a 0.5-rate stratum keeps roughly half (binomial, loose bound)
    val en = d.filter(col("lang") === "en").count().toDouble
    val enKept = Sampling.stratifiedBernoulli(d, "doc_id", "lang",
      Map("en" -> 0.5), defaultRate = 0.0).count().toDouble
    assert(enKept > en * 0.3 && enKept < en * 0.7, s"$enKept of $en")
  }

  test("stratified exact-N keeps exactly N per stratum, deterministically") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sampling.stratifiedExactN(d, "doc_id", "lang", 7)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 7L), counts.toString)
    val again = Sampling.stratifiedExactN(d, "doc_id", "lang", 7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  // ---------------------------------------------------------- repetition

  test("token chunking: overlap, tail coverage, empty docs drop out") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e"), (2L, "x"), (3L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(d, "text", "doc_id", chunkSize = 3, stride = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .toSeq
    assert(out == Seq(
      (1L, 0, 0, 3, "a b c"),
      (1L, 1, 2, 3, "c d e"),
      (1L, 2, 4, 1, "e"),
      (2L, 0, 0, 1, "x")))
  }

  test("incremental dedup classifies batch rows against the corpus") {
    import spark.implicits._
    import graft.operators.Dedup
    val corpus = Seq((1L, "old news"), (2L, "evergreen")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "fresh content"),   // kept
      (11L, "old news"),        // dup_of_corpus
      (12L, "fresh content"),   // dup_in_batch (10 came first)
      (13L, "evergreen"))       // dup_of_corpus
      .toDF("doc_id", "text")
    val out = Dedup.incremental(batch, corpus, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(out == Seq(10L -> "kept", 11L -> "dup_of_corpus",
      12L -> "dup_in_batch", 13L -> "dup_of_corpus"))
  }

  test("segment dedup: first corpus occurrence wins, clean text rejoins") {
    import spark.implicits._
    import graft.operators.Dedup
    val d = Seq((1L, "a b c d"), (2L, "a b x y"), (3L, "c d c d"))
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedup(d, "text", "doc_id", segTokens = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4))).toSeq
    // "a b" first in doc 1; "c d" first in doc 1; doc 3 is pure repeats
    assert(out == Seq(
      (1L, 2L, 0L, 0.0, "a b c d"),
      (2L, 2L, 1L, 0.5, "x y"),
      (3L, 2L, 2L, 1.0, "")))
  }

  test("dup spans: longest contiguous duplicated-segment run per doc") {
    import spark.implicits._
    import graft.operators.Dedup
    // doc 1 originates everything; doc 2 = copied middle run of 2
    // segments with novel head/tail; doc 3 = full copy of doc 1
    val d = Seq(
      (1L, "a b c d e f g h"),
      (2L, "p q c d e f r s"),
      (3L, "a b c d e f g h")
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(d, "text", "doc_id", segTokens = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (1L, 4L, 0L, 0L),   // all first occurrences
      (2L, 4L, 2L, 2L),   // "c d","e f" contiguous dup run of 2
      (3L, 4L, 4L, 4L)))  // full near-copy: one run spanning the doc
  }

  test("vocab coverage: top-N token share with deterministic tie-break") {
    import spark.implicits._
    val d = Seq((1L, "a a a b b c", "en"), (2L, "x y", "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.vocabCoverage(d, "text", "lang", topN = 2)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // en: tokens a×3 b×2 c×1 → top-2 = a,b cover 5/6; de: x,y cover all
    assert(out == Seq(("de", 2L, 2L, 1.0), ("en", 6L, 3L, round5of6)))
  }
  private val round5of6 = BigDecimal(5.0 / 6)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("domain mixture weights reshape token shares to the target") {
    import spark.implicits._
    import graft.operators.Sampling
    val d = Seq(("en", 80L), ("en", 20L), ("zh", 50L), ("de", 50L))
      .toDF("lang", "n")
    val out = Sampling.domainWeights(d, "lang", col("n"),
        Map("en" -> 0.2, "zh" -> 0.3), defaultTarget = 0.1)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    // tokens: en 100, zh 50, de 50 (total 200); raw targets en .2 zh .3
    // de .1 (sum .6) → target shares 1/3, 1/2, 1/6
    assert(out == Seq(
      ("de", 1L, 50L, 0.25, 0.166667, 0.666667),
      ("en", 2L, 100L, 0.5, 0.333333, 0.666667),
      ("zh", 1L, 50L, 0.25, 0.5, 2.0)))
  }

  test("repetition stats: duplicate and top 2-gram fractions") {
    val d = docs(
      (1L, "a b a b a b"),     // bigrams: ab ba ab ba ab → 5 total, 2 distinct
      (2L, "w x y z"),         // 3 distinct bigrams, no repeats
      (3L, "single"))          // < 2 tokens → zeros
    val out = TextAnalysis.repetitionStats(d, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out(0) == ((1L, 5L, 0.6, 0.6)))
    assert(out(1) == ((2L, 3L, 0.0, 0.3333)))
    assert(out(2) == ((3L, 0L, 0.0, 0.0)))
  }

  // ----------------------------------------------------------- asof join

  test("as-of join: nearest earlier state, inclusive ties, null when none") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    val left = Seq((1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 5L),
      (4L, "u2", 10L)).toDF("id", "k", "ts")
    val right = Seq(("u1", 10L, "a"), ("u1", 15L, "b"), ("u2", 99L, "z"))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .orderBy("id").collect().map(r => r.getLong(0) -> Option(r.getString(3))).toSeq
    assert(out == Seq(
      1L -> Some("a"),   // tie: right at ts=10 visible at left ts=10
      2L -> Some("b"),   // latest state <= 20
      3L -> None,        // before any right row
      4L -> None))       // u2's only right row is later
  }

  // ------------------------------------------------------------- packing

  test("greedy packing: budget boundaries, oversize docs, cell resets") {
    import spark.implicits._
    import graft.operators.Packing
    // one group, one shard (ids all ≡ 0 mod 1): budget 10
    val d = Seq((0L, "g", 4L), (1L, "g", 6L),   // bin 0 (4+6 = 10, fits)
      (2L, "g", 1L),                            // bin 1 (10+1 > 10)
      (3L, "g", 25L),                           // bin 2 (oversize → own bin)
      (4L, "g", 10L))                           // bin 3 (25+10 > 10)
      .toDF("doc_id", "grp", "n")
    val out = Packing.packGreedy(d, "doc_id", "grp", "n", budget = 10, shards = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5))).toSeq
    // (id, bin, offset): doc 1 lands at token offset 4 inside bin 0;
    // every bin opener (incl. the oversize doc) starts at offset 0
    assert(out == Seq((0L, 0L, 0L), (1L, 0L, 4L), (2L, 1L, 0L),
      (3L, 2L, 0L), (4L, 3L, 0L)))
  }

  test("bin-utilization stats match a hand-computed packing") {
    import spark.implicits._
    import graft.operators.Packing
    val d = Seq((0L, "g", 4L), (1L, "g", 6L), (2L, "g", 1L),
      (3L, "g", 25L), (4L, "g", 10L)).toDF("doc_id", "grp", "n")
    val packed = Packing.packGreedy(d, "doc_id", "grp", "n", budget = 10, shards = 1)
    val st = Packing.binStats(packed, budget = 10).collect()
    assert(st.length == 1)
    val r = st.head
    // bins: {4+6}, {1}, {25 oversize}, {10} → fills 10,1,25,10
    assert(r.getAs[Long]("n_bins") == 4L)
    assert(r.getAs[Long]("n_docs") == 5L)
    assert(r.getAs[Double]("avg_fill") == (10 + 1 + 25 + 10) / 4.0)
    // oversize bin counts as full (least(fill, budget))
    assert(r.getAs[Double]("utilization") == (10 + 1 + 10 + 10) / 40.0)
  }

  test("packing respects cell isolation and bin budgets on the corpus") {
    import graft.operators.Packing
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
    val out = Packing.packGreedy(d, "doc_id", "lang", "n", budget = 256, shards = 4)
    // every bin's total ≤ budget unless it holds a single oversize doc
    val bad = out.groupBy("grp", "shard", "bin_id")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("k"))
      .filter(col("tot") > 256 && col("k") > 1).count()
    assert(bad == 0)
    assert(out.count() == d.count())
    // deterministic across runs
    val a = Packing.packGreedy(d, "doc_id", "lang", "n", budget = 256, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    val b = Packing.packGreedy(d, "doc_id", "lang", "n", budget = 256, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    assert(a == b)
  }

  // ------------------------------------------------------------- logprob

  test("unigram logprob: corpus-frequency scoring") {
    val d = docs((1L, "a a b"), (2L, "c"))
    // corpus: a×2, b×1, c×1 (total 4) → p(a)=.5, p(b)=p(c)=.25
    val out = TextAnalysis.unigramLogprob(d, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val lnHalf = math.log(0.5); val lnQ = math.log(0.25)
    assert(out == Seq(
      (1L, 3L, math.rint((2 * lnHalf + lnQ) / 3 * 1e4) / 1e4),
      (2L, 1L, math.rint(lnQ * 1e4) / 1e4)))
  }

  // ----------------------------------------------------------- streaming

  test("map-only curation ops run unchanged in a structured stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val src = input.toDF().toDF("doc_id", "text", "lang")
    // the PII scrub + quality scoring + deterministic sampling stack is
    // pure map-only expressions, so the same columns drive a streaming
    // query with no state, watermark, or mode restrictions
    val out = src
      .filter(graft.operators.Sampling.unitUniform53(col("doc_id")) >= 0) // pure fn, keeps all
      .select(col("doc_id"), graft.operators.Pii.redact(col("text")).as("red"),
        graft.operators.TextAnalysis.qualityColumns(col("text")).head)
    val q = out.writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, "ping bob@example.com now", "en"), (2L, "clean text", "en"))
      q.processAllAvailable()
      val rows = spark.table("curation_stream").orderBy("doc_id").collect()
      assert(rows.length == 2)
      assert(rows(0).getString(1) == "ping <EMAIL> now")
      assert(rows(1).getString(1) == "clean text")
    } finally q.stop()

    // chunking is likewise stateless map-only — streams without
    // watermark or mode restrictions
    val input2 = MemoryStream[(Long, String)]
    val chunks = TextAnalysis.chunkTokens(
      input2.toDF().toDF("doc_id", "text"), "text", "doc_id",
      chunkSize = 3, stride = 2)
    val q2 = chunks.writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      input2.addData((1L, "a b c d e"))
      q2.processAllAvailable()
      val rows = spark.table("chunk_stream").orderBy("chunk_idx").collect()
      assert(rows.map(_.getAs[String]("chunk_text")).toSeq ==
        Seq("a b c", "c d e", "e"))
    } finally q2.stop()

    // the logistic quality classifier is a pure projection too — the
    // scan-side keep/drop filter applies per micro-batch with no state
    val input3 = MemoryStream[(Long, String)]
    val scored = TextAnalysis.qualityClassify(
      input3.toDF().toDF("doc_id", "text"), "text", "doc_id")
    val q3 = scored.writeStream.format("memory").queryName("qc_stream")
      .outputMode("append").start()
    try {
      input3.addData(
        (1L, "the report is ready and it covers the plan for this launch"),
        (2L, "%%% $$$ ### !!!"))
      q3.processAllAvailable()
      val rows = spark.table("qc_stream").orderBy("doc_id").collect()
      assert(rows.length == 2)
      assert(rows(0).getBoolean(5) && !rows(1).getBoolean(5))
      // batch/stream parity on the score itself
      val batchScore = TextAnalysis.qualityClassify(
        Seq((1L, "the report is ready and it covers the plan for this launch"))
          .toDF("doc_id", "text"), "text", "doc_id")
        .collect().head.getDouble(4)
      assert(rows(0).getDouble(4) == batchScore)
    } finally q3.stop()
  }

  // -------------------------------------------------------- quantization

  test("int8 quantization: scale, checksum, reconstruction error") {
    import spark.implicits._
    val d = Seq((0L, Array(1.27f, -1.27f, 0.635f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(d, "embedding", "vec_id").collect()(0)
    assert(math.abs(out.getDouble(1) - 0.01) < 1e-9)        // scale = 1.27/127
    assert(out.getLong(2) == (127L - 127L + 64L + 0L))      // q = 127,-127,64,0
    // err: |0.635 - 64*0.01| = 0.005 on one of four dims
    assert(math.abs(out.getDouble(3) - 0.005 / 4) < 1e-6)
  }

  test("quantization q_sum is an exact cross-engine checksum on the corpus") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.quantizeInt8(e, "embedding", "vec_id")
    assert(out.count() == e.count())
    // every quantized coordinate is in the int8 range by construction
    val bad = out.filter(abs(col("q_sum")) > 127L * 64).count()
    assert(bad == 0)
  }

  test("tfidf keywords: idf suppresses ubiquitous terms, tf lifts repeats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common alpha alpha alpha"),
      (2L, "common beta"),
      (3L, "common gamma gamma"),
      (4L, "common delta")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .tfidfKeywords(docs, "text", "doc_id", topK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getString(1)).toMap
    // 'common' appears in every doc → idf = ln(1) = 0 → never ranks
    // above a doc-specific term
    assert(out((1L, 1)) == "alpha")
    assert(out((2L, 1)) == "beta")
    assert(out((3L, 1)) == "gamma")
    // rank-2 term for doc 1 is 'common' (tfidf 0.0) — ties on 0 break
    // alphabetically and it is the only other term
    assert(out((1L, 2)) == "common")
  }

  test("shard stats: deterministic, order-independent, complete partition") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, s"w$i token body")).toDF("doc_id", "text")
    val a = graft.operators.Sampling.shardStats(docs, "text", "doc_id", 16)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = graft.operators.Sampling.shardStats(docs.repartition(7).orderBy(rand(42)),
        "text", "doc_id", 16)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b, "shard assignment depends on input order/partitioning")
    assert(a.keySet == (0 until 16).toSet)
    assert(a.values.map(_._1).sum == 1000L)
    // hash balance: no shard more than 2× the mean on 1000 docs
    assert(a.values.map(_._1).max <= 125L, s"skewed: $a")
  }

  test("embedding outliers: planted far vector ranks first") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(7)
    val normal = (0L until 200L).map(i =>
      (i, Array.fill(dim)((rnd.nextDouble() * 0.2 - 0.1).toFloat), 0))
    // one planted vector far outside the cloud
    val far = Seq((999L, Array.fill(dim)(5.0f), 0))
    val df = (normal ++ far).toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity
      .embOutliers(df, "embedding", "vec_id", k = 4, iters = 2, topN = 5)
      .collect()
    assert(out.head.getLong(0) == 999L, s"planted outlier not first: ${out.toSeq}")
    assert(out.head.getDouble(2) > out(1).getDouble(2) * 10)
  }

  test("budget select: bucketed cumsum keeps best buckets within budget") {
    import spark.implicits._
    // one group, scores 0.9/0.8/0.7 with 10 tokens each; budget = 60%
    // of 30 = 18 → buckets 0.9 (cum 10) and 0.8 (cum 20 > 18? no —
    // cum 20 exceeds 18, so only 0.9 fits)
    val df = Seq(
      (1L, "en", 0.9, 10L), (2L, "en", 0.8, 10L), (3L, "en", 0.7, 10L),
      (4L, "de", 0.5, 4L), (5L, "de", 0.4, 4L)
    ).toDF("doc_id", "lang", "quality_score", "q_tokens")
    val out = Sampling.budgetSelect(df, "lang", "quality_score", "q_tokens", 0.6)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("en") == ((0.9, 1L, 10L)), s"en: ${out.get("en")}")
    // de: budget = floor(8*0.6) = 4 → only the 0.5 bucket (cum 4 ≤ 4)
    assert(out("de") == ((0.5, 1L, 4L)), s"de: ${out.get("de")}")
  }

  test("budget select: unrounded scores are re-bucketed, not per-doc") {
    import spark.implicits._
    // 1000 docs whose raw scores are all distinct doubles but collapse
    // to 2 buckets after the internal round(4) — the guard that keeps
    // the cumsum window bounded when a caller skips the rounding step
    val df = spark.range(1000).select(
      col("id").as("doc_id"), lit("en").as("lang"),
      (lit(0.9) + when(col("id") % 2 === 0, lit(0)).otherwise(lit(0.05))
        + col("id").cast("double") * 1e-9).as("quality_score"),
      lit(10L).as("q_tokens"))
    // bucket frame is bounded by rounded-score cardinality (2), not docs
    val sB = round(col("quality_score").cast("double"), 4)
    val nBuckets = df.groupBy(col("lang"), sB).count().count()
    assert(nBuckets == 2L, s"expected 2 rounded buckets, got $nBuckets")
    val out = Sampling.budgetSelect(df, "lang", "quality_score", "q_tokens", 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    // budget = 5000 of 10000 tokens → exactly the better half-bucket
    // (0.95, 500 docs, 5000 tokens); with per-doc buckets the threshold
    // would be some raw 0.95000…x value, not the rounded 0.95
    assert(out("en") == ((0.95, 500L, 5000L)), s"en: ${out.get("en")}")
  }

  test("minhash estimator error: identical docs estimate exactly 1.0") {
    import graft.operators.Dedup
    val same = "alpha beta gamma delta epsilon zeta eta theta"
    val df = docs(
      1L -> same,
      2L -> same,                       // identical → sig match on all perms
      3L -> "totally different words entirely here now today ok")
    val out = Dedup.minhashEstimateError(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.contains((1L, 2L)), s"identical pair missing: $out")
    assert(out((1L, 2L)) == ((1.0, 1.0, 0.0)))
    // doc 3 shares no shingle with 1/2 → no bands shared → no pair rows
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("ngram novelty: first occurrence wins, short docs score zero") {
    import graft.operators.Dedup
    val df = docs(
      1L -> "a b c d",      // shingles {a b c, b c d} — both first here
      2L -> "a b c x",      // {a b c} seen in doc 1, {b c x} novel → 0.5
      3L -> "tiny doc")     // < 3 tokens → no shingles → novelty 0
    val out = Dedup.ngramNovelty(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((0L, 0L, 0.0)))
  }

  test("quality classifier: score replays the weight map; junk drops") {
    val df = docs(
      1L -> "the report is ready and it covers the plan for this launch",
      2L -> "%%% $$$ ### !!! @@@ ^^^ &&& *** ((( )))")
    val out = TextAnalysis.qualityClassify(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(4), r.getBoolean(5))).toMap
    // replay doc 1 by hand from the emitted (rounded) features
    val w = TextAnalysis.QualityWeights
    val nTok = 12.0; val stop = math.rint(7.0 / 12 * 1e4) / 1e4
    val avgLen = math.rint(47.0 / 12 * 1e4) / 1e4 // 47 non-ws chars
    val z = w("intercept") + w("log1p_tokens") * math.log1p(nTok) +
      w("stopword_ratio") * stop + w("punct_ratio") * 0.0 +
      w("avg_token_len") * avgLen
    val expected = math.rint(1.0 / (1.0 + math.exp(-z)) * 1e4) / 1e4
    assert(out(1L)._1 == expected, s"got ${out(1L)._1}, want $expected")
    assert(out(1L)._2, "clean English sentence should be kept")
    assert(!out(2L)._2, "pure-punctuation junk should drop")
    assert(out(1L)._1 > out(2L)._1)
  }

  test("dataset card: dup rate counts repeated texts within the slice") {
    import spark.implicits._
    val df = Seq(
      (1L, "same text", "web", "en"),
      (2L, "same text", "web", "en"),
      (3L, "other text here", "web", "en"),
      (4L, "solo", "book", "de")
    ).toDF("doc_id", "text", "source", "lang")
    val out = TextAnalysis.datasetCard(df, "text", "source", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(6))).toMap
    assert(out(("web", "en")) == ((3L, 2L, 7L, math.rint(1.0 / 3 * 1e4) / 1e4)))
    assert(out(("book", "de")) == ((1L, 1L, 1L, 0.0)))
  }

  test("embedding dim stats: hand-computed mean/std/min/max per dim") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 10.0f)),
      (2L, Array(3.0f, 10.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.embDimStats(df, "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out(0) == ((2L, 2.0, math.rint(math.sqrt(2.0) * 1e4) / 1e4, 1.0, 3.0)))
    assert(out(1) == ((2L, 10.0, 0.0, 10.0, 10.0)))
  }

  // ------------------------------------------------- char entropy / gopher

  test("CharEntropy: exact values, empty string, supplementary codepoints") {
    import graft.functions.CharEntropy
    assert(CharEntropy.entropy("") == 0.0)
    assert(CharEntropy.entropy("aaaa") == 0.0)
    assert(CharEntropy.entropy("aabb") == 1.0) // 2 symbols, uniform
    assert(CharEntropy.entropy("abcd") == 2.0) // 4 symbols, uniform
    // surrogate pair counts as ONE codepoint: 𝄞 (U+1D11E) + 'a' ×2 ⇒
    // 3 codepoints {𝄞:1, a:2} ⇒ H = log2(3) − 2/3 ≈ 0.9183
    val h = CharEntropy.entropy("𝄞aa")
    assert(math.abs(h - (math.log(3) / math.log(2) - 2.0 / 3.0)) < 1e-12, h.toString)
  }

  test("CharEntropy expression: codegen path matches interpreted eval") {
    import graft.functions.CharEntropy.char_entropy
    import spark.implicits._
    val d = Seq("aabb", "", "mixed content 123", "𝄞aa")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val viaExpr = d.select(col("doc_id"), char_entropy(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((t, i) <- Seq("aabb", "", "mixed content 123", "𝄞aa").zipWithIndex)
      assert(viaExpr(i.toLong) == graft.functions.CharEntropy.entropy(t),
        s"row $i mismatch")
    // null propagates
    val n = d.select(char_entropy(lit(null).cast("string"))).head()
    assert(n.isNullAt(0))
  }

  test("gopher rules: per-rule flags and conjunctive keep on crafted docs") {
    val d = docs(
      // passes all rules: 12 words, sane lengths, stopwords, alphabetic
      (1L, "the cat and the dog sat with all of that good grace"),
      // too short (3 words) — fails r_word_count and r_stopwords
      (2L, "tiny doc here"),
      // no stopwords — fails r_stopwords only (12 alpha words, len ok)
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu"),
      // numeric words — fails r_alpha_words (0/10 alphabetic)
      (4L, "11 22 33 44 55 66 77 88 99 101 the off"))
    val out = TextAnalysis.gopherRules(d, "text", "doc_id", minWords = 10)
      .orderBy("doc_id").collect()
    def flags(i: Int) = (out(i).getAs[Boolean]("r_word_count"),
      out(i).getAs[Boolean]("r_stopwords"), out(i).getAs[Boolean]("r_alpha_words"),
      out(i).getAs[Boolean]("keep"))
    assert(flags(0) == ((true, true, true, true)))
    assert(flags(1) == ((false, false, true, false)))
    assert(flags(2) == ((true, false, true, false)))
    // doc 4: 12 words, 2 alphabetic ("the","off" — but "off" isn't a
    // stopword; only "the" counts) ⇒ alpha frac 2/12 < 0.8, stop 1 < 2
    assert(flags(3) == ((true, false, false, false)))
  }
}
