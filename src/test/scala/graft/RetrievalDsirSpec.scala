package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dsir, Retrieval}

/** BM25 retrieval (in-query + persisted postings index) and DSIR
  * importance resampling. Hand-checkable corpora here; the DuckDB
  * oracles re-verify both on the real corpus. */
class RetrievalDsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "spark window agg window window"),
      (1L, "spark table scan scan"),
      (2L, "customer table query table"),
      (3L, "the quick brown fox"),
      (4L, "spark spark spark window agg agg")
    ).toDF("doc_id", "text")
  }

  private def queries = {
    import spark.implicits._
    Seq(("q1", "spark"), ("q1", "window"), ("q2", "customer")).toDF("query_id", "term")
  }

  test("bm25TopK: rarer terms outrank common ones; rank is dense per query") {
    import spark.implicits._
    val got = Retrieval.bm25TopK(docs, "text", "doc_id", queries, k = 10)
      .as[(String, Int, Long, Double)].collect()
    val q2 = got.filter(_._1 == "q2")
    assert(q2.map(_._3).toSet == Set(2L), "only doc 2 contains 'customer'")
    val q1 = got.filter(_._1 == "q1").sortBy(_._2)
    assert(q1.map(_._2).toList == (1 to q1.length).toList, "dense ranks")
    // docs 0 and 4 match both query terms; doc 3 matches neither
    assert(q1.map(_._3).toSet == Set(0L, 1L, 4L))
    assert(q1.head._3 == 4L || q1.head._3 == 0L,
      "a two-term doc must outrank the single-term doc 1")
  }

  test("bm25 scores are scale-monotone in tf and inversely in df") {
    import spark.implicits._
    val got = Retrieval.bm25TopK(docs, "text", "doc_id", queries, k = 10)
      .as[(String, Int, Long, Double)].collect()
    val scoreOf = got.map(r => (r._1, r._3) -> r._4).toMap
    // 'customer' (df=1) in doc2 must beat any 'spark' (df=3) single hit
    assert(scoreOf(("q2", 2L)) > 0.0)
  }

  test("Bm25Index: build→save→load→probe equals the in-query operator") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Retrieval.Bm25Index.build(docs, "text", "doc_id", nBuckets = 8).save(dir)
    val served = Retrieval.Bm25Index.load(spark, dir).topK(queries, k = 10)
      .as[(String, Int, Long, Double)].collect().toSet
    val direct = Retrieval.bm25TopK(docs, "text", "doc_id", queries, k = 10)
      .as[(String, Int, Long, Double)].collect().toSet
    assert(served == direct)
  }

  test("Bm25Index probe prunes the postings scan to the query-term buckets") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx2").toString
    Retrieval.Bm25Index.build(docs, "text", "doc_id", nBuckets = 8).save(dir)
    val idx = Retrieval.Bm25Index.load(spark, dir)
    val plan = idx.topK(queries, k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [bucket"),
      s"postings scan must carry a bucket partition filter:\n$plan")
  }

  test("Bm25Index.topK --max-df-frac: stop terms drop, rare terms still rank, exact when 1.0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25_cap").toString
    Retrieval.Bm25Index.build(docs, "text", "doc_id", nBuckets = 8).save(dir)
    val idx = Retrieval.Bm25Index.load(spark, dir)
    // df: spark=3/5, window=2/5, customer=1/5
    // frac 0.5 drops 'spark' (0.6 > 0.5); q1 scores on 'window' alone
    val capped = idx.topK(queries, k = 10, maxDfFrac = 0.5)
      .as[(String, Int, Long, Double)].collect()
    val q1 = capped.filter(_._1 == "q1")
    assert(q1.map(_._3).toSet == Set(0L, 4L),
      s"q1 must rank only the 'window' docs, got ${q1.toList}")
    // 'customer' (df 0.2) survives the cap — q2 unchanged
    assert(capped.filter(_._1 == "q2").map(_._3).toSet == Set(2L))
    // frac 1.0 is byte-identical to the uncapped probe
    val exact = idx.topK(queries, k = 10).collect().toSet
    assert(idx.topK(queries, k = 10, maxDfFrac = 1.0).collect().toSet == exact)
    // a query whose every term is capped returns no rows
    val allStop = Seq(("q3", "spark")).toDF("query_id", "term")
    assert(idx.topK(allStop, k = 10, maxDfFrac = 0.5).count() == 0)
  }

  test("Bm25Index.appendTo: incremental build equals full rebuild") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25idx3").toString
    val first = docs.filter(col("doc_id") < 3)
    val rest = docs.filter(col("doc_id") >= 3)
    Retrieval.Bm25Index.build(first, "text", "doc_id", nBuckets = 8).save(dir)
    Retrieval.Bm25Index.load(spark, dir).appendTo(dir, rest, "text", "doc_id")
    val appended = Retrieval.Bm25Index.load(spark, dir).topK(queries, k = 10)
      .as[(String, Int, Long, Double)].collect().toSet
    val full = Retrieval.bm25TopK(docs, "text", "doc_id", queries, k = 10)
      .as[(String, Int, Long, Double)].collect().toSet
    assert(appended == full)
  }

  test("dsir importanceWeights: docs matching the target score higher") {
    import spark.implicits._
    val d = Seq(
      (0L, "good clean prose with structure", "tgt"),
      (1L, "good clean prose with style", "tgt"),
      (2L, "good clean prose with care", "raw"),
      (3L, "zz xx qq ww vv kk", "raw"),
      (4L, "zz xx qq ww vv jj", "raw")
    ).toDF("doc_id", "text", "pool")
    val w = Dsir.importanceWeights(d, "text", "doc_id",
        col("pool") === "tgt", nBuckets = 16)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w(2L) > w(3L),
      "target-like raw doc must outweigh the junk docs: " + w)
    assert(w(0L) > w(4L))
  }

  test("dsir importanceWeights: featureless docs carry zero weight") {
    import spark.implicits._
    val d = Seq((0L, "a b c"), (1L, "x")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(d, "text", "doc_id",
        col("doc_id") === 0L, nBuckets = 16)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(w(1L) == ((0L, 0.0)), "single-token doc has no bigram features")
  }

  test("dsir select: deterministic, ordered by gumbel key, n rows") {
    import spark.implicits._
    val d = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) "alpha beta gamma delta" else "noise blob junk spam"))
      .toDF("doc_id", "text")
    val s1 = Dsir.select(d, "text", "doc_id", col("doc_id") % 2 === 0, n = 10,
      nBuckets = 16).collect()
    val s2 = Dsir.select(d, "text", "doc_id", col("doc_id") % 2 === 0, n = 10,
      nBuckets = 16).collect()
    assert(s1.map(_.getLong(0)).toList == s2.map(_.getLong(0)).toList)
    assert(s1.length == 10)
    val keys = s1.map(_.getDouble(3))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b }, "desc keys")
    // the target-like half should dominate the selection
    val even = s1.count(_.getLong(0) % 2 == 0)
    assert(even > 5, s"importance resample should favor the target: $even/10")
  }

  test("DsirRef: build→save→load→scoreOf equals the in-query weights") {
    import spark.implicits._
    val d = Seq(
      (0L, "good clean prose here", "en"),
      (1L, "good clean prose there", "en"),
      (2L, "zz xx qq ww", "de"),
      (3L, "good clean zz xx", "de")
    ).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("dsirref").toString
    Dsir.DsirRef.build(d, "text", "doc_id", col("lang") === "en",
      nBuckets = 16).save(dir)
    val served = Dsir.DsirRef.load(spark, dir).scoreOf(d, "text", "doc_id")
      .as[(Long, Long, Double)].collect().toSet
    val direct = Dsir.importanceWeights(d, "text", "doc_id",
      col("lang") === "en", nBuckets = 16)
      .as[(Long, Long, Double)].collect().toSet
    assert(served == direct)
  }

  test("DsirRef.appendTo: incremental reference equals full rebuild") {
    import spark.implicits._
    val d = (0L until 20L).map(i =>
      (i, s"tok${i % 5} tok${(i + 1) % 5} tok${(i + 2) % 7}",
        if (i % 3 == 0) "en" else "de")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("dsirref2").toString
    val tgt = col("lang") === "en"
    Dsir.DsirRef.build(d.filter(col("doc_id") < 10), "text", "doc_id", tgt,
      nBuckets = 16).save(dir)
    Dsir.DsirRef.load(spark, dir)
      .appendTo(dir, d.filter(col("doc_id") >= 10), "text", "doc_id", tgt)
    val appended = Dsir.DsirRef.load(spark, dir).scoreOf(d, "text", "doc_id")
      .as[(Long, Long, Double)].collect().toSet
    val dir2 = java.nio.file.Files.createTempDirectory("dsirref3").toString
    Dsir.DsirRef.build(d, "text", "doc_id", tgt, nBuckets = 16).save(dir2)
    val full = Dsir.DsirRef.load(spark, dir2).scoreOf(d, "text", "doc_id")
      .as[(Long, Long, Double)].collect().toSet
    assert(appended == full)
  }

  test("DsirRef: out-of-reference buckets score the uniform smoothing, finite") {
    import spark.implicits._
    val ref = Seq((0L, "alpha beta gamma", "en")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("dsirref4").toString
    Dsir.DsirRef.build(ref, "text", "doc_id", col("lang") === "en",
      nBuckets = 256).save(dir)
    // a batch doc whose bigrams the tiny reference never saw
    val batch = Seq((7L, "nu xi omicron pi rho")).toDF("doc_id", "text")
    val got = Dsir.DsirRef.load(spark, dir).scoreOf(batch, "text", "doc_id")
      .as[(Long, Long, Double)].collect().head
    assert(got._2 == 4L)
    assert(!got._3.isNaN && !got._3.isInfinite, s"finite OOV score: $got")
  }

  test("dsir/bm25 plans: no ScalaUDF, feature hashing stays codegen") {
    val dPlan = Dsir.importanceWeights(docs, "text", "doc_id",
      col("doc_id") < 2, nBuckets = 16).queryExecution.executedPlan.toString
    val bPlan = Retrieval.bm25TopK(docs, "text", "doc_id", queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(!dPlan.contains("ScalaUDF") && !bPlan.contains("ScalaUDF"))
    assert(!dPlan.contains("CartesianProduct") && !bPlan.contains("CartesianProduct"))
  }

  test("gradedRels: rel = distinct query terms contained, matchless docs absent") {
    import spark.implicits._
    val rels = Retrieval.gradedRels(docs, "text", "doc_id", queries)
      .as[(String, Long, Int)].collect().toSet
    // q1 {spark, window}: doc0 both, doc1 spark, doc4 both; q2 {customer}: doc2
    assert(rels == Set(("q1", 0L, 2), ("q1", 1L, 1), ("q1", 4L, 2),
      ("q2", 2L, 1)), s"got $rels")
  }

  test("evalTopK: a perfect ranking scores ndcg = mrr = 1.0") {
    import spark.implicits._
    val rels = Seq(("q1", 10L, 3), ("q1", 11L, 2), ("q1", 12L, 1))
      .toDF("query_id", "id", "rel")
    val results = Seq(("q1", 1, 10L), ("q1", 2, 11L), ("q1", 3, 12L))
      .toDF("query_id", "rank", "id")
    val r = Retrieval.evalTopK(results, rels, 3).collect().head
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 &&
      r.getDouble(3) == 1.0, s"got $r")
  }

  test("evalTopK: quantized DCG fold matches hand math; unretrieved rel-3 doc caps the ideal") {
    import spark.implicits._
    // corpus rels: 20 -> 3 (NOT retrieved), 11 -> 2, 12 -> 1
    val rels = Seq(("q1", 20L, 3), ("q1", 11L, 2), ("q1", 12L, 1))
      .toDF("query_id", "id", "rel")
    // retrieved: rank1 irrelevant, rank2 rel 2, rank3 rel 1
    val results = Seq(("q1", 1, 99L), ("q1", 2, 11L), ("q1", 3, 12L))
      .toDF("query_id", "rank", "id")
    val disc = Retrieval.ndcgDiscounts(3)
    def cQ(rel: Int, rank: Int): Long =
      math.floor(((1L << rel) - 1).toDouble / disc(rank - 1) * 1e12 + 0.5).toLong
    val expNdcg = BigDecimal((cQ(0, 1) + cQ(2, 2) + cQ(1, 3)).toDouble /
      (cQ(3, 1) + cQ(2, 2) + cQ(1, 3)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Retrieval.evalTopK(results, rels, 3).collect().head
    assert(r.getDouble(1) == expNdcg, s"ndcg=${r.getDouble(1)} exp=$expNdcg")
    assert(r.getDouble(2) == 0.5, s"mrr=${r.getDouble(2)}")
    assert(r.getDouble(3) == 0.666667, s"p_at_k=${r.getDouble(3)}")
  }

  test("evalTopK: a query with no relevant docs gives NULL ndcg/mrr, zero precision") {
    import spark.implicits._
    val rels = Seq(("qx", 50L, 1)).toDF("query_id", "id", "rel")
      .where(col("rel") > 99) // empty relevance frame, typed
    val results = Seq(("q1", 1, 7L), ("q1", 2, 8L)).toDF("query_id", "rank", "id")
    val r = Retrieval.evalTopK(results, rels, 2).collect().head
    assert(r.isNullAt(1) && r.isNullAt(2) && r.getDouble(3) == 0.0, s"got $r")
  }
}
