package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{CorpusDiff, IntervalJoin, TextAnalysis, UrlOps}

/** Round-8 session-4 operators: bucketized interval joins, PMI
  * collocations, interpolated bigram LM scoring, corpus snapshot diff,
  * URL canonicalization. Hand-checkable inputs here; the DuckDB oracles
  * re-verify each on the real corpus. */
class R8cOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("pointInInterval: containment matches, one row per (point, interval)") {
    import spark.implicits._
    val pts = Seq(1L, 5L, 10L, 15L, 25L).toDF("p")
    val ivs = Seq(("A", 0L, 10L), ("B", 9L, 20L), ("C", 100L, 110L))
      .toDF("name", "lo", "hi")
    val got = IntervalJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 4L)
      .select("p", "name").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "A"), (5L, "A"), (10L, "A"), (10L, "B"), (15L, "B")))
  }

  test("pointInInterval: bucket width does not change the result") {
    import spark.implicits._
    val pts = (0L to 40L by 3).toDF("p")
    val ivs = Seq((2L, 9L), (9L, 9L), (30L, 41L)).toDF("lo", "hi")
    def run(w: Long) =
      IntervalJoin.pointInInterval(pts, "p", ivs, "lo", "hi", w)
        .select("p", "lo", "hi").as[(Long, Long, Long)].collect().toSet
    assert(run(1L) == run(5L) && run(5L) == run(1000L))
  }

  test("intervalOverlap: inclusive bounds, exactly one row per overlapping pair") {
    import spark.implicits._
    val l = Seq(("L1", 0L, 10L), ("L2", 0L, 5L), ("L3", 50L, 60L))
      .toDF("ln", "lo1", "hi1")
    val r = Seq(("R1", 5L, 30L), ("R2", 11L, 20L)).toDF("rn", "lo2", "hi2")
    val got = IntervalJoin.intervalOverlap(l, "lo1", "hi1", r, "lo2", "hi2", 4L)
      .select("ln", "rn").as[(String, String)].collect().toList
    // L1×R1 share buckets 1 and 2 — dedup must keep exactly one copy;
    // L2×R1 touch only at the inclusive instant 5.
    assert(got.sorted == List(("L1", "R1"), ("L2", "R1")))
  }

  test("pmiCollocations: the always-together pair tops the list; floor holds") {
    import spark.implicits._
    val docs = (Seq.fill(8)("new york") ++
      Seq("alpha beta gamma", "beta gamma delta", "gamma delta alpha",
          "delta alpha beta")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 3, topN = 10)
      .collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getString(0) == "new" && top.getString(1) == "york")
    assert(top.getDouble(3) > 0.0)
    assert(out.forall(_.getLong(2) >= 3))
  }

  test("bigramLogprob: dominant word order outscores the rare inversion") {
    import spark.implicits._
    val docs = ((0 until 10).map(i => (i.toLong, "good morning")) :+
      (10L, "morning good")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogprob(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    val dominant = out(0).getDouble(2)
    val rare = out(10).getDouble(2)
    assert(dominant > rare)
    // exact: ln(0.7·(10/11) + 0.3·(11/22)) vs ln(0.7·(1/11) + 0.3·(11/22))
    assert(math.abs(dominant - math.log(0.7 * 10.0 / 11 + 0.3 * 0.5)) < 1e-4)
    assert(math.abs(rare - math.log(0.7 / 11 + 0.3 * 0.5)) < 1e-4)
  }

  test("bigramLogprob: <2-token docs report (0, 0.0)") {
    import spark.implicits._
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogprob(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 0 && out(0).getDouble(2) == 0.0)
    assert(out(1).getLong(1) == 0 && out(1).getDouble(2) == 0.0)
    assert(out(2).getLong(1) == 1)
  }

  test("corpusDiff: added/removed/changed/unchanged classified per id") {
    import spark.implicits._
    val o = Seq((1L, "a", "s"), (2L, "b", "s"), (3L, "c", "s"))
      .toDF("doc_id", "text", "source")
    val n = Seq((2L, "b", "s"), (3L, "c2", "s"), (4L, "d", "s"))
      .toDF("doc_id", "text", "source")
    val got = CorpusDiff.diff(o, n, "doc_id", "text", Seq("source"))
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("normalizeUrl: full canonicalization chain") {
    import spark.implicits._
    val cases = Seq(
      // authority case, default port, www, trailing slash, fragment
      ("HTTPS://WWW.Site.COM:443/A/B/#frag", "https://site.com/A/B"),
      // utm params dropped, real param kept, order preserved
      ("https://site.com/p?utm_source=x&q=2&utm_id=7", "https://site.com/p?q=2"),
      // utm-only query: the '?' goes too
      ("https://site.com/p/?utm_source=x", "https://site.com/p"),
      // :80 is default for http only — kept on https
      ("https://site.com:80/p", "https://site.com:80/p"),
      ("http://Site.com:80/P?x=1", "http://site.com/P?x=1"),
      // path/query case preserved; non-default port preserved
      ("http://h.io:8080/Q?Utm=keepme", "http://h.io:8080/Q?Utm=keepme"))
    val got = cases.map(_._1).toDF("u")
      .select(UrlOps.normalizeUrl(col("u"))).as[String].collect().toList
    assert(got == cases.map(_._2).toList)
  }

  test("domainSuffixes + blocklist: a domain blocks itself and subdomains") {
    import spark.implicits._
    val sfx = Seq("a.b.example.io").toDF("h")
      .select(UrlOps.domainSuffixes(col("h"))).as[Seq[String]].collect().head
    assert(sfx == Seq("a.b.example.io", "b.example.io", "example.io"))
    val urls = Seq(
      ("g1", "https://a.deep.blocked.org/x"),
      ("g1", "https://blocked.org/y"),
      ("g1", "https://fine.org/z")).toDF("grp", "raw")
    val block = Seq("blocked.org").toDF("domain")
    val out = UrlOps.urlDedupStats(urls, "raw", "grp", block).collect().head
    assert(out.getLong(1) == 3 && out.getLong(4) == 2) // n_raw, n_blocked
  }

  test("trainingOrder: pure function of ids — input order/partitioning irrelevant") {
    import spark.implicits._
    import graft.operators.Sampling
    val ids = (0L until 200L).toDF("id")
    val a = Sampling.trainingOrder(ids, "id", 4)
      .as[(Long, Int, Long)].collect().toSet
    val b = Sampling.trainingOrder(
        ids.orderBy(rand(7)).repartition(7), "id", 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b)
    // every shard's positions are 1..n with no gaps
    val byShard = a.groupBy(_._2)
    assert(byShard.values.forall { rs =>
      rs.map(_._3).toList.sorted == (1L to rs.size).toList })
    // the interleave is roughly balanced
    assert(byShard.values.map(_.size).max <=
      2 * byShard.values.map(_.size).min)
  }

  test("pageRank: path-graph symmetry, hub advantage, isolated node holds base") {
    import spark.implicits._
    import graft.operators.Graph
    val edges = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0))
      .toDF("s", "d", "w")
    val nodes = Seq("a", "b", "c", "d", "e").toDF("n")
    val pr = Graph.pageRank(edges, "s", "d", "w", nodes, "n", iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr("a") - pr("d")) < 1e-9) // symmetric ends
    assert(math.abs(pr("b") - pr("c")) < 1e-9)
    assert(pr("b") > pr("a")) // middles collect more mass
    assert(math.abs(pr("e") - 0.15 / 5) < 1e-9) // isolated: base score only
    assert(pr.values.forall(v => v > 0 && v < 1))
  }

  test("bpeApply: merge-rank priority, leftmost non-overlap, cascade to fixpoint") {
    import spark.implicits._
    import graft.functions.BpeApply.bpe_apply
    def enc(text: String, merges: Seq[(String, String)]): Seq[String] =
      Seq(text).toDF("t").select(bpe_apply(col("t"), merges))
        .as[Seq[String]].collect().head
    // rank 0 beats rank 1 even though (a,b) appears first in the text
    assert(enc("a b c", Seq(("b", "c"), ("a", "b"))) == Seq("a", "b_c"))
    // leftmost non-overlapping occurrences fuse in one round
    assert(enc("a a a", Seq(("a", "a"))) == Seq("a_a", "a"))
    // all occurrences of the winning pair fuse, then the loop re-scans
    assert(enc("a b a b", Seq(("a", "b"))) == Seq("a_b", "a_b"))
    // chained merges over the FUSED symbol apply when ranked
    assert(enc("a b c", Seq(("a", "b"), ("a_b", "c"))) == Seq("a_b_c"))
    // no table hit → identity; empty/whitespace → empty
    assert(enc("x y z", Seq(("p", "q"))) == Seq("x", "y", "z"))
    assert(enc("   ", Seq(("a", "b"))) == Seq.empty)
  }

  test("bpeCompressionStats: compression < 1 when merges hit; no ScalaUDF") {
    import spark.implicits._
    val docs = (Seq.fill(6)("new york city") ++ Seq("other words here"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t, "en") }
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.bpeCompressionStats(docs, "text", "lang", topN = 2)
    assert(!out.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    val r = out.collect().head
    // top-2 merges are (new,york) and (york,city); once new_york fuses,
    // york is consumed — each "new york city" goes 3 → 2 tokens
    assert(r.getLong(2) == 21 && r.getLong(3) == 15)
    assert(r.getDouble(4) == 0.7143)
  }

  test("writeTrainingShards: shard dirs land in deterministic pos order") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (0L until 120L).map(i => (i, s"doc $i")).toDF("id", "text")
    val path = java.nio.file.Files.createTempDirectory("shards").toString
    Sampling.writeTrainingShards(df, "id", path, nShards = 3)
    val order = Sampling.trainingOrder(df.select(col("id")), "id", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    for (s <- 0 until 3) {
      val expect = order.filter(_._2 == s).sortBy(_._3).map(_._1).toList
      val got = spark.read.parquet(s"$path/shard=$s")
        .select("id").as[Long].collect().toList
      assert(got == expect, s"shard $s order mismatch")
    }
  }

  test("compactParquet: many small files become few; rows unchanged") {
    import spark.implicits._
    import graft.operators.Maintenance
    val in = java.nio.file.Files.createTempDirectory("cmp_in").toString
    val out = java.nio.file.Files.createTempDirectory("cmp_out").toString
    (0L until 5000L).toDF("id").repartition(64)
      .write.mode("overwrite").parquet(in)
    def files(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files(in) == 64)
    Maintenance.compactParquet(spark, in, out, targetBytes = 1L << 30)
    assert(files(out) == 1)
    assert(spark.read.parquet(out).count() == 5000)
  }

  test("writeSorted: output files cover disjoint key ranges (prunable stats)") {
    import spark.implicits._
    import graft.operators.Maintenance
    val out = java.nio.file.Files.createTempDirectory("sorted_out").toString
    val df = (0L until 10000L).map(i => (i * 2654435761L % 10000, i))
      .toDF("k", "v")
    Maintenance.writeSorted(df, Seq("k"), nFiles = 4, out)
    val fs = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(fs.length == 4)
    val ranges = fs.map { f =>
      val r = spark.read.parquet(f).agg(min(col("k")), max(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // disjoint, ordered ranges ⇒ a point filter prunes to ONE file
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, s"overlapping file ranges: $hi vs $lo")
    }
    assert(spark.read.parquet(out).count() == 10000)
  }

  test("heavy_hitters: hot keys surface with bracketing counts under any partitioning") {
    import spark.implicits._
    import graft.operators.Skew
    val rows = Seq.fill(5000)("hot") ++ Seq.fill(1000)("warm") ++
      (0 until 2000).map(i => s"cold_$i")
    val df = rows.toDF("k").repartition(13)
    val out = Skew.hotKeys(df, "k", k = 2, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 2)
    val (h, hLo, hHi) = out(0)
    assert(h == "hot" && hLo <= 5000 && 5000 <= hHi,
      s"hot bracket [$hLo,$hHi] misses 5000")
    val (w, wLo, wHi) = out(1)
    assert(w == "warm" && wLo <= 1000 && 1000 <= wHi)
    // partitioning must not change WHICH clearly-hot keys surface
    val out2 = Skew.hotKeys(rows.reverse.toDF("k").repartition(3), "k", 2, 64)
      .collect().map(_.getString(0)).toSeq
    assert(out2 == Seq("hot", "warm"))
  }

  test("hostOf / registeredDomain") {
    import spark.implicits._
    val got = Seq("https://a.b.example.io/x?q=1").toDF("u")
      .select(UrlOps.hostOf(col("u")).as("h"))
      .select(col("h"), UrlOps.registeredDomain(col("h")))
      .as[(String, String)].collect().head
    assert(got == (("a.b.example.io", "example.io")))
  }
}
