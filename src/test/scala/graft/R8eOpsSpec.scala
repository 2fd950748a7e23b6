package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{FuzzyLink, Funnel, Retrieval}

/** Round-8 session-7 operators: RRF hybrid fusion, blocked-Levenshtein
  * record linkage (+ canonicalization map), Markov event-transition
  * matrix. Hand-checkable inputs here; the DuckDB oracles re-verify
  * each on the real corpus. */
class R8eOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- rrfFuse ----

  test("rrfFuse: both-list docs outrank single-list docs; absent terms contribute 0") {
    import spark.implicits._
    // q1: doc 10 is rank 1 in both lists; doc 20 sparse-only rank 2;
    // doc 30 dense-only rank 2.
    val sparse = Seq(("q1", 1, 10L), ("q1", 2, 20L)).toDF("query_id", "rank", "doc_id")
    val dense = Seq(("q1", 1, 10L), ("q1", 2, 30L)).toDF("query_id", "rank", "doc_id")
    val out = Retrieval.rrfFuse(sparse, dense, "doc_id", k = 10)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(10L, 20L, 30L))
    val exp1 = BigDecimal(2.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal(1.0 / 62).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getDouble(3) == exp1)
    // docs 20 and 30 share the same rrf (1/62) — tie breaks on doc id
    assert(out(1).getDouble(3) == exp2 && out(2).getDouble(3) == exp2)
    assert(out(1).getLong(2) < out(2).getLong(2))
  }

  test("rrfFuse: fusion is per-query (no cross-query leakage)") {
    import spark.implicits._
    val a = Seq(("q1", 1, 1L), ("q2", 1, 2L)).toDF("query_id", "rank", "doc_id")
    val b = Seq(("q1", 1, 1L), ("q2", 1, 3L)).toDF("query_id", "rank", "doc_id")
    val out = Retrieval.rrfFuse(a, b, "doc_id", k = 5)
    assert(out.count() == 3)
    assert(out.filter(col("query_id") === "q2").count() == 2)
  }

  test("denseTopK: ranks by rounded cosine with id tie-break") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),  // cos 1.0 vs anchor
      (2L, Array(0.0f, 1.0f)),  // cos 0.0
      (3L, Array(1.0f, 1.0f))   // cos ~0.7071
    ).toDF("vec_id", "embedding")
    val anchors = Seq(("qa", Array(1.0, 0.0))).toDF("query_id", "qv")
    val out = Retrieval.denseTopK(vecs, "embedding", "vec_id", anchors,
      k = 2, idOut = "doc_id").orderBy(col("rank")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 3L))
    assert(out(0).getDouble(3) == 1.0)
  }

  // ---- FuzzyLink ----

  test("blockedPairs: within-block pairs under maxDist, with pair mass") {
    import spark.implicits._
    // "red bolt"×2, "ted bolt"×3 (dist 1, same block), "red gear" (other
    // block), "azure bolt" (same block, dist > 2).
    val rows = Seq.fill(2)("red bolt") ++ Seq.fill(3)("ted bolt") ++
      Seq("red gear", "azure bolt")
    val df = rows.toDF("p_name")
    val pairs = FuzzyLink.blockedPairs(df, "p_name",
      regexp_extract(col("name"), "[^ ]+$", 0), maxDist = 2).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getString(0) == "red bolt" && p.getString(1) == "ted bolt")
    assert(p.getInt(2) == 1 && p.getLong(3) == 6L)
  }

  test("blockedPairs: blocking excludes cross-block near-matches") {
    import spark.implicits._
    // lev("red bolt", "red bolts") = 1 but blocks differ — the blocking
    // tradeoff, accepted by construction (choose blocks accordingly).
    val df = Seq("red bolt", "red bolts").toDF("p_name")
    assert(FuzzyLink.blockedPairs(df, "p_name",
      regexp_extract(col("name"), "[^ ]+$", 0), maxDist = 2).isEmpty)
  }

  test("canonicalMap: transitive cluster folds to min name; unmatched map to self") {
    import spark.implicits._
    val df = Seq("aa bolt", "ab bolt", "bb bolt", "zz gear").toDF("p_name")
    val blockExpr = regexp_extract(col("name"), "[^ ]+$", 0)
    // maxDist 2: aa~ab (1), ab~bb (1), aa~bb (2) — one cluster.
    val pairs = FuzzyLink.blockedPairs(df, "p_name", blockExpr, maxDist = 2)
    val dict = FuzzyLink.dictionary(df, "p_name", blockExpr)
    val canon = FuzzyLink.canonicalMap(pairs, dict).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(canon("aa bolt") == "aa bolt")
    assert(canon("ab bolt") == "aa bolt")
    assert(canon("bb bolt") == "aa bolt")
    assert(canon("zz gear") == "zz gear")
  }

  test("canonicalMap: chain crossing fold rounds converges to global min") {
    import spark.implicits._
    // A path graph a-b-c-d-e where only adjacent names pair: min label
    // must propagate the full diameter.
    val names = Seq("aaaa x", "aaab x", "aabb x", "abbb x", "bbbb x")
    val df = names.toDF("p_name")
    val blockExpr = regexp_extract(col("name"), "[^ ]+$", 0)
    val pairs = FuzzyLink.blockedPairs(df, "p_name", blockExpr, maxDist = 1)
    assert(pairs.count() == 4) // exactly the path edges
    val dict = FuzzyLink.dictionary(df, "p_name", blockExpr)
    val canon = FuzzyLink.canonicalMap(pairs, dict).collect()
    assert(canon.forall(_.getString(1) == "aaaa x"))
  }

  // ---- transitionMatrix ----

  test("transitionMatrix: counts adjacent pairs per user, rows normalize to 1") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Int) = new java.sql.Timestamp(ts.getTime + sec * 1000L)
    // user 1: a->b->a ; user 2: a->b. Transitions: a->b ×2, b->a ×1.
    val ev = Seq(
      (1L, 1L, "a", at(0)), (2L, 1L, "b", at(1)), (3L, 1L, "a", at(2)),
      (4L, 2L, "a", at(0)), (5L, 2L, "b", at(1))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val m = Funnel.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(m(("a", "b")) == (2L, 1.0))
    assert(m(("b", "a")) == (1L, 1.0))
    assert(m.size == 2)
  }

  test("transitionMatrix: same-microsecond ties order by event id") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      (1L, 1L, "a", ts), (2L, 1L, "b", ts), (3L, 1L, "c", ts)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val m = Funnel.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(m == Set(("a", "b"), ("b", "c")))
  }
}
