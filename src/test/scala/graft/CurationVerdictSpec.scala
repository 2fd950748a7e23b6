package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Funnel, TextAnalysis}

/** Round-7 additions: multi-signal curation verdict, logprob mixture
  * buckets, directional containment, dedup keep-list, last-touch
  * attribution. Each test pins the semantics the DuckDB oracle can't
  * isolate: gate priority, boundary inclusivity, the containment-vs-
  * Jaccard divergence, and cluster-representative selection. */
class CurationVerdictSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ------------------------------------------------- quality ensemble

  test("ensemble names the FIRST failing gate in priority order") {
    // doc 1: too short (fails word_count AND stopwords — word_count wins)
    // doc 2: healthy English prose — kept, null reason
    // doc 3: enough words but no stopwords and low alpha — alpha first
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away with great speed to find some food there"
    val nums = (1 to 12).map(i => s"${i}23456").mkString(" ")
    val d = docs((1L, "tiny doc"), (2L, good), (3L, nums))
    val out = TextAnalysis.qualityEnsemble(d, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("reject_reason") == "word_count")
    assert(!out(0).getAs[Boolean]("keep"))
    assert(out(1).getAs[String]("reject_reason") == null)
    assert(out(1).getAs[Boolean]("keep"))
    // doc 3: 12 words passes word_count; mean len 6 passes; all-digit
    // words fail alpha_word_frac BEFORE the stopword gate can fire
    assert(out(2).getAs[String]("reject_reason") == "alpha_words")
  }

  test("ensemble is map-only: zero exchanges in the plan") {
    val d = docs((1L, "a b c"))
    val plan = TextAnalysis.qualityEnsemble(d, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }

  // ------------------------------------------------- logprob buckets

  test("logprob buckets: negative floors and per-lang share sums to 1") {
    import spark.implicits._
    val d = Seq(
      (1L, "aa aa aa aa", "en"), // high-prob tokens
      (2L, "aa aa aa aa", "en"),
      (3L, "zz yy xx w117 qq", "en"), // singletons: low logprob
      (4L, "bb bb", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.logprobBuckets(d, "text", "doc_id", "lang")
      .collect()
    val en = out.filter(_.getAs[String]("lang") == "en")
    assert(math.abs(en.map(_.getAs[Double]("lang_share")).sum - 1.0) < 0.001)
    // singleton-token doc must land in a strictly lower bucket than the
    // repeated-token docs
    val buckets = out.filter(_.getAs[String]("lang") == "en")
      .map(r => r.getAs[Int]("ppl_bucket") -> r.getAs[Long]("n_docs")).toMap
    assert(buckets.size == 2 && buckets.keys.min < buckets.keys.max)
    assert(buckets(buckets.keys.max) == 2L) // the two aa-docs share a bucket
  }

  // ---------------------------------------------------- containment

  test("containment catches subset pairs symmetric Jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta"
    val big = small + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val d = docs((1L, small), (2L, big))
    // Jaccard = 4/44 ≈ 0.09 → ngramJaccardPairs at 0.5 finds nothing
    val jac = Dedup.ngramJaccardPairs(d, "text", "doc_id", n = 3,
      threshold = 0.5).count()
    assert(jac == 0L)
    // containment(small→big) = 1.0 → containmentPairs finds the pair
    val out = Dedup.containmentPairs(d, "text", "doc_id", n = 3,
      threshold = 0.8).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Double]("contain_a") == 1.0)
    assert(r.getAs[Double]("contain_b") < 0.2)
  }

  // ------------------------------------------------------- keep-list

  test("keep-list: representative is min id; singletons keep themselves") {
    val a = "one two three four five six seven eight nine ten"
    val d = docs((5L, a), (9L, a + " eleven"), (3L, a + " twelve"),
      (42L, "totally different content with many unrelated words here"))
    val out = Dedup.dedupKeepList(d, "text", "doc_id", n = 3,
      threshold = 0.5).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Long]("rep_id"), r.getAs[Boolean]("keep"))).toMap
    assert(byId(3L) == (3L, true))   // min id of the near-dup cluster
    assert(byId(5L) == (3L, false))
    assert(byId(9L) == (3L, false))
    assert(byId(42L) == (42L, true)) // singleton
    assert(out.count(_.getAs[Boolean]("keep")) == 2)
  }

  test("keep-list from precomputed pairs equals the self-mining variant") {
    val a = "one two three four five six seven eight nine ten"
    val d = docs((5L, a), (9L, a + " eleven"), (3L, a + " twelve"),
      (42L, "totally different content with many unrelated words here"))
    val pairs = Dedup.minhashLshJaccardPairs(d, "text", "doc_id", n = 3,
      threshold = 0.5)
    val fromPairs = Dedup.dedupKeepListFromPairs(d, "doc_id", pairs)
      .orderBy("doc_id").collect().toSeq
    val mined = Dedup.dedupKeepList(d, "text", "doc_id", n = 3,
      threshold = 0.5).orderBy("doc_id").collect().toSeq
    assert(fromPairs == mined)
    // and it composes with a FOREIGN pair source: containment pairs
    // through the same apply step drop the contained doc
    val small = "alpha beta gamma delta epsilon zeta"
    val big = small + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val d2 = docs((7L, small), (2L, big))
    val cPairs = Dedup.containmentPairs(d2, "text", "doc_id", n = 3,
      threshold = 0.8).select("id_a", "id_b")
    val applied = Dedup.dedupKeepListFromPairs(d2, "doc_id", cPairs)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(applied.values.count(identity) == 1) // one rep per component
  }

  test("containment keep-list keeps the SUPERSET doc, not the min id") {
    val small = "alpha beta gamma delta epsilon zeta"
    val big = small + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    // the CONTAINED doc carries the smaller id: min-id policy would
    // keep the quote and drop the container — exactly backwards
    val d = docs((1L, small), (2L, big),
      (50L, "totally different content with many unrelated words here"))
    val out = Dedup.dedupKeepListContainment(d, "text", "doc_id", n = 3,
      threshold = 0.8).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Long]("rep_id"), r.getAs[Boolean]("keep"))).toMap
    assert(byId(2L) == (2L, true), "container must be the representative")
    assert(byId(1L) == (2L, false), "contained doc must drop to the container")
    assert(byId(50L) == (50L, true))
  }

  // ----------------------------------------------------- attribution

  test("last-touch attribution: latest in-window touch, inclusive instant") {
    import spark.implicits._
    val ev = Seq(
      // user 1: click @100s, view @200s, purchase @200s (same instant
      // as the view — inclusive: the view attributes)
      (1L, 100000000L, 1L, "click"),
      (2L, 200000000L, 1L, "view"),
      (3L, 200000000L, 1L, "purchase"),
      // user 2: touch 8 days before purchase → out of 7-day window
      (4L, 0L, 2L, "view"),
      (5L, 8L * 86400 * 1000000L, 2L, "purchase"),
      // user 3: no touch at all
      (6L, 500000000L, 3L, "purchase"))
      .toDF("event_id", "us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = Funnel.lastTouchAttribution(ev, Seq("view", "click"),
        "purchase", windowMicros = 7L * 86400 * 1000000L)
      .orderBy("event_id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("touch_event_id") == 2L) // the same-instant view
    assert(out(0).getAs[String]("touch_type") == "view")
    assert(out(0).getAs[Long]("micros_since_touch") == 0L)
    assert(out(1).getAs[Any]("touch_event_id") == null) // out of window
    assert(out(2).getAs[Any]("touch_event_id") == null) // no touch
  }

  test("attribution same-microsecond touches: max event id wins") {
    import spark.implicits._
    val ev = Seq(
      (1L, 100L, 1L, "view"),
      (2L, 100L, 1L, "click"), // same µs as event 1 — id 2 is the pick
      (3L, 200L, 1L, "purchase"))
      .toDF("event_id", "us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = Funnel.lastTouchAttribution(ev, Seq("view", "click"),
        "purchase", windowMicros = 1000000L).collect()
    assert(out.head.getAs[Long]("touch_event_id") == 2L)
    assert(out.head.getAs[String]("touch_type") == "click")
  }
}
