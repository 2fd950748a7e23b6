package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Exact-substring span dedup: sliding-window first-occurrence keeps,
  * maximal merged spans, offset-shift sensitivity the aligned-segment
  * operators can't see. */
class ExactSubstrSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def spans(rows: Seq[(Long, String)], win: Int = 3) = {
    import spark.implicits._
    Dedup.exactSubstrSpans(rows.toDF("doc_id", "text"), "text", "doc_id", win)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toList
  }

  test("a shifted duplicate substring is found at any offset") {
    // doc1 repeats doc0's 5-token phrase shifted by one token — the
    // aligned segmenter would miss it; sliding windows must not.
    val got = spans(Seq(
      (0L, "a b c d e x y"),
      (1L, "z a b c d e w")), win = 3)
    // doc1 windows (a b c)@1 (b c d)@2 (c d e)@3 duplicate doc0's —
    // one maximal span covering tokens 1..5
    assert(got == List((1L, 1L, 5L, 3L)))
  }

  test("first occurrence (min doc, pos) keeps; later repeats are spans") {
    val got = spans(Seq(
      (0L, "p q r p q r"),     // self-repeat: window (p q r)@3 duplicates @0
      (1L, "p q r s t u")), win = 3)
    assert(got.contains((0L, 3L, 5L, 1L)), s"intra-doc repeat: $got")
    assert(got.contains((1L, 0L, 2L, 1L)), s"cross-doc repeat: $got")
  }

  test("overlapping and adjacent dup windows merge into one maximal span") {
    val base = "m n o p q r s t"
    val got = spans(Seq((0L, base), (1L, base)), win = 3)
    // doc1 duplicates every window → a single span covering the doc
    assert(got == List((1L, 0L, 7L, 6L)))
  }

  test("distant repeats in one doc stay separate spans") {
    val got = spans(Seq(
      (0L, "a b c x1 x2 x3 x4 x5 a b c"),
      (9L, "unrelated words here only once")), win = 3)
    assert(got == List((0L, 8L, 10L, 1L)),
      s"only the second occurrence is a dup span: $got")
  }

  test("no duplicated windows → empty output; short docs contribute nothing") {
    val got = spans(Seq((0L, "a b"), (1L, "c d e f"), (2L, "g h i")), win = 3)
    assert(got.isEmpty)
  }

  test("SubstrCorpusIndex: build→save→load→probe finds corpus-verbatim spans") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a b c d e f g"),
      (1L, "h i j k l m n")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "x y a b c d e z"),   // tokens 2..6 verbatim in doc0
      (11L, "u v w q r s t")      // novel
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("substridx").toString
    Dedup.SubstrCorpusIndex.build(corpus, "text", "doc_id", winTokens = 3)
      .save(dir)
    val got = Dedup.SubstrCorpusIndex.load(spark, dir)
      .spansOf(batch, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == List((10L, 2L, 6L, 3L)), s"got=$got")
  }

  test("SubstrCorpusIndex.appendTo: later batches see appended corpus; dup rows harmless") {
    import spark.implicits._
    val corpus = Seq((0L, "a b c d e")).toDF("doc_id", "text")
    val more = Seq((1L, "p q r s t"), (2L, "a b c d e")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("substridx2").toString
    Dedup.SubstrCorpusIndex.build(corpus, "text", "doc_id", winTokens = 3)
      .save(dir)
    // append includes hashes already present (doc2 repeats doc0) — the
    // semi-join must not double-count them
    Dedup.SubstrCorpusIndex.load(spark, dir)
      .appendTo(dir, more, "text", "doc_id")
    val batch = Seq((10L, "z p q r s w"), (11L, "z a b c d w"))
      .toDF("doc_id", "text")
    val got = Dedup.SubstrCorpusIndex.load(spark, dir)
      .spansOf(batch, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 1L, 4L, 2L), (11L, 1L, 4L, 2L)), s"got=$got")
  }

  test("exactSubstrApply: cuts the dup span, keeps first occurrence and edges") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b c d e x y"),
      (1L, "z a b c d e w")).toDF("doc_id", "text")
    val spans = Dedup.exactSubstrSpans(df, "text", "doc_id", 3)
    val got = Dedup.exactSubstrApply(df, "text", "doc_id", spans)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toList
    assert(got == List(
      (0L, 7L, 0L, "a b c d e x y"),
      (1L, 7L, 5L, "z w")), s"got=$got")
  }

  test("exactSubstrApply: fully-duplicated doc empties; span-less doc unchanged") {
    import spark.implicits._
    val base = "m n o p q"
    val df = Seq((0L, base), (1L, base), (2L, "u v w x y")).toDF("doc_id", "text")
    val spans = Dedup.exactSubstrSpans(df, "text", "doc_id", 3)
    val got = Dedup.exactSubstrApply(df, "text", "doc_id", spans)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toList
    assert(got == List(
      (0L, 5L, 0L, base),
      (1L, 5L, 5L, ""),
      (2L, 5L, 0L, "u v w x y")), s"got=$got")
  }

  test("substrSpansVsCorpus: batch-vs-corpus spans, batch-internal repeats ignored") {
    import spark.implicits._
    val corpus = Seq((0L, "a b c d e")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "x a b c y"),          // corpus-verbatim window
      (11L, "p q r p q r p q r")   // only batch-internal repeats → no span
    ).toDF("doc_id", "text")
    val got = Dedup.substrSpansVsCorpus(batch, corpus, "text", "doc_id", 3)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == List((10L, 1L, 3L, 1L)), s"got=$got")
  }

  test("SubstrCorpusIndex probe: the corpus-sided scan streams against a broadcast batch") {
    import spark.implicits._
    val corpus = Seq((0L, "a b c d e f g h")).toDF("doc_id", "text")
    val batch = Seq((10L, "x a b c y")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("substridx3").toString
    Dedup.SubstrCorpusIndex.build(corpus, "text", "doc_id", winTokens = 3)
      .save(dir)
    val plan = Dedup.SubstrCorpusIndex.load(spark, dir)
      .spansOf(batch, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe must broadcast the batch windows, not shuffle the index:\n$plan")
  }

  test("plan: hash-keyed windows, no ScalaUDF, no cartesian") {
    import spark.implicits._
    val df = Seq((0L, "a b c d e"), (1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Dedup.exactSubstrSpans(df, "text", "doc_id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("CartesianProduct"))
  }
}
