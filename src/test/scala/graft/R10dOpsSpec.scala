package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 session-4 additions: Mann–Kendall trend, DAU/WAU/MAU
  * stickiness, two-proportion power card — each pinned to a
  * hand-computed fixture. */
class R10dOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def day(i: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 12:00:00")

  test("mannKendall: strictly increasing daily counts, no ties") {
    import spark.implicits._
    import graft.operators.TimeSeries
    // counts 1,2,3,4,5 over five days: every pair concordant, so
    // S = C(5,2) = 10; no ties ⇒ Var = 5·4·15/18 = 16.6667;
    // z = (10−1)/√16.6667 = 2.2045.
    val ev = (1 to 5).flatMap(d => (1 to d).map(j =>
      (day(d), "a", j))).toDF("ts", "k", "j")
    val r = TimeSeries.mannKendallTrend(ev, col("k"), col("ts")).head()
    assert(r.getLong(1) == 5 && r.getLong(2) == 10L)
    assert(r.getDouble(3) == 16.6667)
    assert(r.getDouble(4) == 2.2045)
  }

  test("mannKendall: tie correction and a flat series") {
    import spark.implicits._
    import graft.operators.TimeSeries
    // counts 2,2,2 (all tied): S = 0 and the tie term kills the
    // variance entirely — n(n-1)(2n+5) = 3·2·11 = 66 = Σt(t-1)(2t+5)
    // for one tie group of 3 ⇒ Var = 0 ⇒ z is NULL.
    val ev = (1 to 3).flatMap(d => Seq(1, 2).map(j =>
      (day(d), "flat", j))).toDF("ts", "k", "j")
    val r = TimeSeries.mannKendallTrend(ev, col("k"), col("ts")).head()
    assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0 && r.isNullAt(4))
  }

  test("stickiness: dau/wau/mau over a hand-built user-day grid") {
    import spark.implicits._
    import graft.operators.TimeSeries
    // day1: users {1,2}; day2: {1}; day9: {3}. With a 7-day week and
    // 28-day month window: day2's wau covers days 1–2 ⇒ {1,2};
    // day9's wau covers days 3–9 ⇒ {3}, but its mau covers 1–9 ⇒ all 3.
    val ev = Seq((1L, day(1)), (2L, day(1)), (1L, day(2)), (3L, day(9)))
      .toDF("user_id", "ts")
    val r = TimeSeries.stickiness(ev, col("user_id"), col("ts"))
      .orderBy(col("d"))
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((2L, 2L, 2L), (1L, 2L, 2L), (1L, 1L, 3L)))
    // only OBSERVED days report — no phantom rows for days 3..8
    assert(r.length == 3)
  }

  test("powerTwoProportion: hand-computed n at p1=0.5") {
    import spark.implicits._
    import graft.operators.Metrics
    // p1 = 0.5, p2 = 0.55, pbar = 0.525:
    // num = 1.959964·√(2·0.525·0.475) + 0.841621·√(0.25 + 0.2475)
    //     = 1.959964·0.706222 + 0.841621·0.705337 = 1.977800
    // n = ⌈num²/0.0025⌉ = ⌈1564.68…⌉ = 1565.
    val df = (1 to 8).map(i => ("seg", i % 2 == 0)).toDF("g", "conv")
    val r = Metrics.powerTwoProportion(df, col("g"), col("conv")).head()
    assert(r.getLong(1) == 8 && r.getLong(2) == 4)
    assert(r.getDouble(3) == 0.5 && r.getDouble(4) == 0.55)
    assert(r.getLong(5) == 1565L)
  }

  test("kCore: pendant peels, cascade empties a path") {
    import spark.implicits._
    import graft.operators.Graph
    // triangle a-b-c plus pendant d on a: at k=2, round 1 drops d
    // (degree 1); the triangle keeps degree 2 everywhere and survives.
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"))
      .toDF("x", "y")
    val r = Graph.kCore(tri, "x", "y", k = 2, iters = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // path a-b-c-d at k=2: the ends peel, then the middle — the
    // cascade needs MULTIPLE rounds and ends empty.
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("x", "y")
    assert(Graph.kCore(path, "x", "y", k = 2, iters = 3).count() == 0)
  }

  test("linkPrediction: square graph scores its two diagonals") {
    import spark.implicits._
    import graft.operators.Graph
    // 4-cycle a-b-c-d: the only distance-2 non-edges are the diagonals
    // (a,c) and (b,d), each with CN {the other two} = 2, all degrees 2
    // ⇒ jaccard = 2/(2+2−2) = 1.0 and RA = 1/2 + 1/2 = 1.0.
    val sq = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"))
      .toDF("x", "y")
    val r = Graph.linkPrediction(sq, "x", "y", topN = 10).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4)))
    assert(r.toSeq == Seq(("a", "c", 2L, 1.0, 1.0),
      ("b", "d", 2L, 1.0, 1.0)))
  }

  test("tCloseness: mirrored 75/25 classes give EMD exactly 0.25") {
    import spark.implicits._
    import graft.operators.Pii
    // class A is 3×v0+1×v1, class B the mirror; global mix is 50/50.
    // For m=2: EMD = |p_cls(0) − 0.5| = 0.25 in both classes.
    val df = (Seq.fill(3)(("A", 0)) ++ Seq(("A", 1)) ++
      Seq(("B", 0)) ++ Seq.fill(3)(("B", 1))).toDF("cls", "v")
    val r = Pii.tCloseness(df, Seq("cls"), "v").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 0.25 && r.getDouble(3) == 0.25)
    // identical mixes ⇒ t = 0 even though the values differ per row
    val same = Seq(("A", 0), ("A", 1), ("B", 0), ("B", 1)).toDF("cls", "v")
    assert(Pii.tCloseness(same, Seq("cls"), "v").head().getDouble(2) == 0.0)
  }

  test("fdAudit: violating and holding FDs get exact verdicts") {
    import spark.implicits._
    import graft.operators.DataQuality.{FdSpec, fdAudit}
    val df = Seq(("a", 1), ("a", 1), ("b", 1), ("b", 2)).toDF("l", "r")
    val rows = fdAudit(Seq(
      FdSpec("l->r", df, Seq("l"), "r"),
      FdSpec("r->l", df, Seq("r"), "l"))).orderBy(col("fd")).collect()
    val lr = rows(0)
    assert(lr.getString(0) == "l->r" && lr.getLong(1) == 2 &&
      lr.getLong(2) == 1 && lr.getLong(3) == 2 && lr.getLong(4) == 2 &&
      !lr.getBoolean(5))
    // r=1 maps to {a,b}, r=2 maps to {b}: also violated, 3 rows inside
    val rl = rows(1)
    assert(rl.getLong(2) == 1 && rl.getLong(3) == 3 && !rl.getBoolean(5))
  }

  test("lexicalDiversity: Yule's K on a 3-token fixture") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // "a a b": N=3, V=2, hapax=1, Σc² = 4+1 ⇒ K = 1e4·(5−3)/9 = 2222.2222
    val df = Seq(("g", "a a b")).toDF("src", "text")
    val r = TextAnalysis.lexicalDiversity(df, "text", col("src")).head()
    assert(r.getLong(1) == 3 && r.getLong(2) == 2 && r.getLong(3) == 1)
    assert(r.getDouble(4) == 0.666667 && r.getDouble(5) == 0.5)
    assert(r.getDouble(6) == 2222.2222)
  }

  test("evalMap: AP@5 on a hand-ranked list") {
    import spark.implicits._
    import graft.operators.Retrieval
    // ranks (a,b,c); relevant {a, c, d} ⇒ P(1)=1, P(3)=2/3, R=3:
    // AP = (1 + 0.666667)/3 = 0.555556 after 1e-12 term quantization.
    val res = Seq(("q", 1, "a"), ("q", 2, "b"), ("q", 3, "c"))
      .toDF("query_id", "rank", "id")
    val rels = Seq(("q", "a", 1), ("q", "c", 1), ("q", "d", 1))
      .toDF("query_id", "id", "rel")
    val r = Retrieval.evalMap(res, rels, 5).head()
    assert(r.getLong(1) == 2 && r.getLong(2) == 3)
    assert(r.getDouble(3) == 0.555556)
    // rank > k must not credit: same list with d at rank 6 is unchanged
    val res6 = res.unionAll(Seq(("q", 6, "d")).toDF("query_id", "rank", "id"))
    assert(Retrieval.evalMap(res6, rels, 5).head().getDouble(3) == 0.555556)
  }

  test("daviesBouldin: two 2-point clusters, all quantities exact") {
    import spark.implicits._
    import graft.operators.Similarity
    // k-means(k=2, iters=1) lands centroids at [5,0] and [5,2]:
    // every point sits 5 from its centroid ⇒ S_i = 5; M = 2
    // ⇒ R_i = (5+5)/2 = 5 and DB = 5.
    val df = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0f, 2f)),
      (3L, Array(10f, 0f)), (4L, Array(10f, 2f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.daviesBouldin(df, "embedding", "vec_id",
      k = 2, iters = 1).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) == 2 && r.getDouble(2) == 5.0 &&
        r.getDouble(3) == 5.0 && r.getDouble(4) == 5.0)
    }
  }

  test("ewmaControl: flat series never alarms; fold replays the exact recursion") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val flat = (1 to 6).map(i => (day(i), "flat")).toDF("ts", "k")
    val rf = TimeSeries.ewmaControl(flat, col("k"), col("ts")).head()
    assert(rf.getLong(1) == 6 && rf.getDouble(4) == 1.0 &&
      rf.getLong(5) == 0L && rf.isNullAt(6))
    // alternating 1-vs-3 counts: replay the identical double recursion
    // locally and require exact agreement on the final EWMA level
    val ev = (1 to 8).flatMap { i =>
      val n = if (i % 2 == 0) 3 else 1
      (1 to n).map(_ => (day(i), "alt"))
    }.toDF("ts", "k")
    val xs = (1 to 8).map(i => if (i % 2 == 0) 3.0 else 1.0)
    val (lam, mu) = (0.2, xs.sum / 8)
    val sigma = math.sqrt(xs.map(x => x * x).sum / 8 - mu * mu)
    def lim(w: Double) =
      3.0 * sigma * math.sqrt(lam / (2 - lam) * (1 - w))
    var z = xs.head; var w = 0.8 * 0.8; var na = 0
    if (math.abs(z - mu) > lim(w)) na += 1 // t=1 is checked too
    for (x <- xs.tail) {
      z = lam * x + (1 - lam) * z; w = w * (0.8 * 0.8)
      if (math.abs(z - mu) > lim(w)) na += 1
    }
    val ra = TimeSeries.ewmaControl(ev, col("k"), col("ts")).head()
    assert(ra.getDouble(4) == math.rint(z * 1e4) / 1e4)
    assert(ra.getDouble(3) == math.rint(sigma * 1e4) / 1e4)
    assert(ra.getLong(5) == na.toLong)
  }

  test("pacf: Durbin-Levinson on the 1..6 linear series") {
    import spark.implicits._
    import graft.operators.TimeSeries
    // x = 1..6: r1 = 0.5, r2 = 1/17.5, r3 = −4.75/17.5
    // ⇒ φ11 = 0.5, φ22 = (r2−r1²)/(1−r1²) = −0.2571,
    //   φ33 = −0.178776/0.700408 = −0.2552 (hand-run recursion).
    val ev = (1 to 6).flatMap(d => (1 to d).map(_ => (day(d), "lin")))
      .toDF("ts", "k")
    val r = TimeSeries.pacf(ev, col("k"), col("ts")).head()
    assert(r.getLong(1) == 6)
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == -0.2571)
    assert(r.getDouble(4) == -0.2552)
  }

  test("markdownProfile: all four construct kinds counted") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val text = "# t\nplain\n- a\n- b\n```\nx\n```\nsee [a](b)"
    val r = TextAnalysis.markdownProfile(
      Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id").head()
    assert(r.getLong(1) == 8 && r.getLong(2) == 1 && r.getLong(3) == 2 &&
      r.getLong(4) == 2 && r.getLong(5) == 1 && r.getInt(6) == 4)
    // prose with none of them scores zero
    val p = TextAnalysis.markdownProfile(
      Seq((2L, "just two lines\nof prose")).toDF("doc_id", "text"),
      "text", "doc_id").head()
    assert(p.getInt(6) == 0 && p.getLong(1) == 2)
  }

  test("hhi: 50/50 duopoly scores 5000, monopoly 10000") {
    import spark.implicits._
    import graft.operators.Metrics
    val df = Seq(("duo", "a", 10L), ("duo", "b", 10L), ("mono", "x", 7L))
      .toDF("g", "u", "v")
    val r = Metrics.hhi(df, col("g"), col("u"), col("v"))
      .orderBy(col("g")).collect()
    assert(r(0).getLong(1) == 2 && r(0).getDouble(3) == 0.5 &&
      r(0).getDouble(4) == 5000.0 && r(0).getDouble(5) == 2.0)
    assert(r(1).getDouble(4) == 10000.0 && r(1).getDouble(5) == 1.0)
  }

  test("markovAttribution: removing the only converting channel zeroes p") {
    import spark.implicits._
    import graft.operators.Funnel
    // user 1: view → purchase; user 2: click → (no conversion).
    // P(conv from start) = 0.5, carried entirely by 'view':
    // removing view ⇒ 0 (effect 1.0, full share); removing click ⇒
    // unchanged (effect 0).
    val ev = Seq(
      (1L, day(1), 10L, "view"), (1L, day(2), 11L, "purchase"),
      (2L, day(1), 20L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Funnel.markovAttribution(ev, "purchase",
        channels = Seq("view", "click"), rounds = 6)
      .orderBy(col("channel")).collect()
    val click = r(0); val view = r(1)
    assert(view.getString(0) == "view" && click.getString(0) == "click")
    assert(view.getDouble(1) == 0.5 && click.getDouble(1) == 0.5)
    assert(view.getDouble(2) == 0.0 && click.getDouble(2) == 0.5)
    assert(view.getDouble(3) == 1.0 && click.getDouble(3) == 0.0)
    assert(view.getDouble(4) == 1.0 && click.getDouble(4) == 0.0)
  }

  test("markovAttribution: journeys truncate at the first conversion") {
    import spark.implicits._
    import graft.operators.Funnel
    // view → purchase → click: the post-conversion click must not
    // create transitions, so click's removal effect is exactly 0.
    val ev = Seq(
      (1L, day(1), 1L, "view"), (1L, day(2), 2L, "purchase"),
      (1L, day(3), 3L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Funnel.markovAttribution(ev, "purchase",
        channels = Seq("view", "click"), rounds = 6)
      .orderBy(col("channel")).collect()
    assert(r(0).getDouble(1) == 1.0)          // p_conv_full
    assert(r(0).getDouble(3) == 0.0)          // click removal effect
    assert(r(1).getDouble(3) == 1.0)          // view carries everything
  }

  test("lpaCommunities: bridge between two triangles splits them") {
    import spark.implicits._
    import graft.operators.Graph
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")).toDF("x", "y")
    val r = Graph.lpaCommunities(edges, "x", "y", iters = 4)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.values.toSeq.sorted == Seq(3L, 3L))
    assert(r.size == 2)
  }

  test("cliffsDelta: complete dominance is +1, ties land at 0") {
    import spark.implicits._
    import graft.operators.Metrics
    // arm 0 values {3,4} all beat arm 1 values {1,2}: gt = 4, lt = 0,
    // δ = 4/4 = 1 (note: gt counts arm-0 ABOVE arm-1).
    val dom = Seq(("g", 0, 3L), ("g", 0, 4L), ("g", 1, 1L), ("g", 1, 2L))
      .toDF("g", "v", "x")
    val r = Metrics.cliffsDelta(dom, col("g"), col("v"), col("x")).head()
    assert(r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.getLong(3) == 4 && r.getLong(4) == 0)
    assert(r.getDouble(5) == 1.0 && r.getString(6) == "large")
    // identical distributions: δ = 0, negligible
    val tie = Seq(("g", 0, 5L), ("g", 1, 5L)).toDF("g", "v", "x")
    val rt = Metrics.cliffsDelta(tie, col("g"), col("v"), col("x")).head()
    assert(rt.getDouble(5) == 0.0 && rt.getString(6) == "negligible")
  }

  test("brownForsythe: equal spread about different centers gives F = 0") {
    import spark.implicits._
    import graft.operators.Metrics
    // group a = {1,3} (median 1, |dev| = {0,2}); group b = {10,12}
    // (median 10, |dev| = {0,2}): deviations identical ⇒ SSB = 0 and
    // F = 0 — the test correctly ignores the location shift. SS units
    // are cents² per the anovaOneWay contract: per group the cents
    // deviations {0,200} have SS 2·100² = 20000 ⇒ SSW = 40000.
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 12.0))
      .toDF("g", "x")
    val r = Metrics.brownForsythe(df, col("g"), col("x")).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 4)
    assert(r.getDouble(2) == 0.0)       // ssb
    assert(r.getDouble(3) == 40000.0)   // ssw in cents²
    assert(r.getDouble(5) == 0.0)       // F
  }

  test("distinctN: repeated bigrams shrink distinct-2") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // "a b a b a": 1-grams 5 total 2 unique; 2-grams {a b, b a, a b,
    // b a} = 4 total 2 unique; 3-grams 3 total 2 unique.
    val df = Seq(("s", "a b a b a")).toDF("src", "text")
    val r = TextAnalysis.distinctN(df, "text", col("src"))
      .orderBy(col("n")).collect()
    assert(r(0).getLong(2) == 5 && r(0).getLong(3) == 2 &&
      r(0).getDouble(4) == 0.4)
    assert(r(1).getLong(2) == 4 && r(1).getLong(3) == 2 &&
      r(1).getDouble(4) == 0.5)
    assert(r(2).getLong(2) == 3 && r(2).getLong(3) == 2)
  }

  test("hurstAggVar: linear-trend series replayed against local OLS") {
    import spark.implicits._
    import graft.operators.TimeSeries
    // counts = 1..16 per day; replicate block variances + the
    // 1e-6-quantized ln-ln OLS locally and demand exact agreement.
    val ev = (1 to 16).flatMap(d => (1 to d).map(_ => (day(d), "t")))
      .toDF("ts", "k")
    val xs = (1 to 16).map(_.toDouble)
    def varOf(v: Seq[Double]) = {
      val m = v.sum / v.length
      v.map(x => x * x).sum / v.length - m * m
    }
    val pts = Seq(1, 2, 4, 8).flatMap { m =>
      val sums = xs.grouped(m).filter(_.length == m).map(_.sum).toSeq
      val vm = varOf(sums) / (m * m)
      if (sums.length >= 2 && vm > 0)
        Some((math.floor(math.log(m.toDouble) * 1e6 + 0.5).toLong,
          math.floor(math.log(vm) * 1e6 + 0.5).toLong))
      else None
    }
    val np = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (np * sxy - sx * sy).toDouble / (np * sxx - sx * sx)
    val h = BigDecimal(1.0 + slope / 2.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = TimeSeries.hurstAggVar(ev, col("k"), col("ts")).head()
    assert(r.getLong(1) == 4 && r.getDouble(3) == h)
    // flat series: every block variance is 0 ⇒ no usable points ⇒ the
    // key drops out of the result entirely (same as the oracle)
    val flat = (1 to 8).map(d => (day(d), "f")).toDF("ts", "k")
    assert(TimeSeries.hurstAggVar(flat, col("k"), col("ts")).count() == 0)
  }

  test("paragraphDupStats: shared paragraph counted once per doc") {
    import spark.implicits._
    import graft.operators.CleaningSignals
    val docs = Seq((1L, "s", "intro\n\nshared"),
      (2L, "s", "other\n\nshared"), (3L, "s", "solo"))
      .toDF("doc_id", "source", "text")
    val r = CleaningSignals
      .paragraphDupStats(docs, "text", "doc_id", "source").head()
    assert(r.getLong(1) == 5 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 0.4)
    // dup chars 2·6 of total 5+6+5+6+4 = 26
    assert(r.getDouble(4) == 0.461538)
  }

  test("classBalanceCard: every label keeps the minority count, hash-ranked") {
    import spark.implicits._
    import graft.operators.Sampling
    import graft.functions.SplitMix64
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (10L, "b"))
      .toDF("vec_id", "label")
    val r = Sampling.classBalanceCard(df, "vec_id", "label")
      .orderBy(col("label")).collect()
    assert(r(0).getLong(1) == 3 && r(0).getLong(2) == 1)
    assert(r(1).getLong(1) == 1 && r(1).getLong(2) == 1 &&
      r(1).getLong(3) == 10L)
    // label a keeps the id with the smallest splitmix hash
    val expect = Seq(1L, 2L, 3L).minBy(id => SplitMix64.mix(id) >>> 11)
    assert(r(0).getLong(3) == expect)
  }

  test("srmCheck: 10-vs-0 flags, 3-vs-1 does not") {
    import spark.implicits._
    import graft.operators.Metrics
    val ev = ((1 to 10).map(i => ("bad", i * 2L)) ++
      Seq(("ok", 0L), ("ok", 2L), ("ok", 4L), ("ok", 1L)))
      .toDF("g", "u")
    val r = Metrics.srmCheck(ev, col("g"), col("u"), col("u") % 2)
      .orderBy(col("g")).collect()
    assert(r(0).getLong(1) == 10 && r(0).getLong(2) == 0 &&
      r(0).getDouble(3) == 10.0 && r(0).getBoolean(4))
    assert(r(1).getLong(1) == 3 && r(1).getLong(2) == 1 &&
      r(1).getDouble(3) == 1.0 && !r(1).getBoolean(4))
  }

  test("madOutliers: one spike day flags, robust median pair unmoved") {
    import spark.implicits._
    import graft.operators.TimeSeries
    // counts 2,2,2,2,2,2,3,50: median 2, deviations {0×6,1,48},
    // MAD = 0? nearest-rank p50 of {0,0,0,0,0,0,1,48} = 0 ⇒ mad 0 ⇒
    // no z defined. Use 1,2,1,2,1,2,1,50: median (rank 4 of sorted
    // 1,1,1,1,2,2,2,50) = 1; dev {0×4,1×3,49}: MAD p50 = 0… also 0.
    // Take 1,2,3,4,5,6,7,100: median = 4, dev {3,2,1,0,1,2,3,96},
    // MAD = 2 ⇒ z(100) = 0.6745·96/2 = 32.376 > 3.5 ⇒ 1 outlier (the
    // z of day 7 is 0.6745·3/2 = 1.01, under threshold).
    val ev = ((1 to 7).flatMap(d => (1 to d).map(_ => (day(d), "t"))) ++
      (1 to 100).map(_ => (day(8), "t"))).toDF("ts", "k")
    val r = TimeSeries.madOutliers(ev, col("k"), col("ts")).head()
    assert(r.getLong(1) == 8 && r.getLong(2) == 4 && r.getLong(3) == 2)
    assert(r.getLong(4) == 1 && r.getDouble(5) == 32.376)
    assert(r.getDate(6).toString == "2024-01-08")
  }

  test("priceIndices: pure price doubling doubles every index") {
    import spark.implicits._
    import graft.operators.Metrics
    // one item, qty 10 both periods, price mass 1000 → 2000 cents:
    // L = P = F = 2 exactly.
    val df = Seq((1L, 2020, 1000L, 10L), (1L, 2021, 2000L, 10L))
      .toDF("i", "t", "cents", "q")
    val r = Metrics.priceIndices(df, col("i"), col("t"), col("cents"),
      col("q")).head()
    assert(r.getInt(0) == 2021 && r.getLong(1) == 1)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 2.0 &&
      r.getDouble(4) == 2.0)
    // quantity shift with constant prices: indices stay exactly 1
    val q2 = Seq((1L, 2020, 1000L, 10L), (1L, 2021, 3000L, 30L))
      .toDF("i", "t", "cents", "q")
    val r2 = Metrics.priceIndices(q2, col("i"), col("t"), col("cents"),
      col("q")).head()
    assert(r2.getDouble(2) == 1.0 && r2.getDouble(3) == 1.0)
  }

  test("holtWinters: flat series is an exact fixed point; replay matches") {
    import spark.implicits._
    import graft.operators.TimeSeries
    // flat 21 days at count 3: l stays 3, b stays 0, every seasonal
    // stays 0 ⇒ forecast 3, amplitude 0 — all exact.
    val flat = (1 to 21).flatMap(d => (1 to 3).map(_ => (day(d), "f")))
      .toDF("ts", "k")
    val rf = TimeSeries.holtWinters(flat, col("k"), col("ts")).head()
    assert(rf.getLong(1) == 21 && rf.getDouble(2) == 3.0 &&
      rf.getDouble(3) == 0.0 && rf.getDouble(4) == 3.0 &&
      rf.getDouble(5) == 0.0)
    // 16-day alternating 1/3 with m=2: replay the identical recursion
    // locally and demand exact agreement on every output.
    val ev = (1 to 16).flatMap { i =>
      (1 to (if (i % 2 == 0) 3 else 1)).map(_ => (day(i), "alt"))
    }.toDF("ts", "k")
    val xs = (1 to 16).map(i => if (i % 2 == 0) 3.0 else 1.0)
    val (m, a, b, g) = (2, 0.3, 0.1, 0.2)
    val l0 = xs.take(m).sum / m
    val b0 = (xs.slice(m, 2 * m).sum / m - l0) / m
    var (l, bt) = (l0, b0)
    var ss = xs.take(m).map(_ - l0).toVector
    for (x <- xs.drop(2 * m)) {
      val lp = a * (x - ss.head) + (1 - a) * (l + bt)
      val bp = b * (lp - l) + (1 - b) * bt
      ss = ss.tail :+ (g * (x - lp) + (1 - g) * ss.head)
      l = lp; bt = bp
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = TimeSeries.holtWinters(ev, col("k"), col("ts"), m = 2).head()
    assert(r.getDouble(2) == r6(l) && r.getDouble(3) == r6(bt))
    assert(r.getDouble(4) == r6(l + bt + ss.head))
    assert(r.getDouble(5) == r6(ss.max - ss.min))
    // fewer than 2m days: the key is dropped (no valid init)
    val short = (1 to 10).map(d => (day(d), "s")).toDF("ts", "k")
    assert(TimeSeries.holtWinters(short, col("k"), col("ts")).count() == 0)
  }

  test("powerTwoComponents: axis-aligned variance separates exactly") {
    import spark.implicits._
    import graft.operators.Pca
    // C = diag(100, 1, 0): PC1 = e0, PC2 = e1 (both sign-pinned
    // positive), λ1 = 100, λ2 = 1, total 101, ratio 0.01. The
    // quantized iteration kills the cross-component residue
    // ((λ2/λ1)^8 ≪ 1e-12).
    val df = Seq(
      (1L, Array(10f, 1f, 0f)), (2L, Array(10f, -1f, 0f)),
      (3L, Array(-10f, 1f, 0f)), (4L, Array(-10f, -1f, 0f)))
      .toDF("vec_id", "embedding")
    val r = Pca.powerTwoComponents(df, "vec_id", "embedding", iters = 8)
      .collect()
    val l1 = r.map(_.getDouble(1)).toSeq
    val l2 = r.map(_.getDouble(2)).toSeq
    assert(l1 == Seq(1.0, 0.0, 0.0) && l2 == Seq(0.0, 1.0, 0.0))
    assert(r.head.getDouble(3) == 100.0 && r.head.getDouble(4) == 1.0)
    assert(r.head.getDouble(5) == 101.0)
    assert(r.head.getDouble(8) == 0.01)
    // deflation orthogonality: v1·v2 = 0 exactly on this fixture
    assert(l1.zip(l2).map(p => p._1 * p._2).sum == 0.0)
  }

  test("trigramLogprob: memorized corpus scores ln(0.7-ish), order matters") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // single doc "a b c": one trigram, c123/c12 = 1, c23/c(b) = 1,
    // c(c)/N = 1/3 ⇒ p = 0.6 + 0.3 + 0.1/3 = 0.933333,
    // avg_logprob = ln(0.933333…) = −0.0690 (4 dp).
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.trigramLogprob(df, "text", "doc_id").head()
    assert(r.getLong(1) == 1)
    val p = 0.6 + 0.3 + 0.1 * (1.0 / 3.0)
    assert(r.getDouble(2) ==
      BigDecimal(math.log(p)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    // a 2-token doc has no trigram: zero row, logprob 0
    val short = Seq((2L, "a b")).toDF("doc_id", "text")
    val rs = TextAnalysis.trigramLogprob(short, "text", "doc_id").head()
    assert(rs.getLong(1) == 0 && rs.getDouble(2) == 0.0)
  }

  test("gateOverlapMatrix: planted doc failing two gates co-counts") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // doc 1 is short AND stopword-free (fails both gates); doc 2 is a
    // long stopword-rich clean doc (passes everything).
    val clean = ("the be to of and that have with " * 3).trim
    val df = Seq((1L, "xyz abc"), (2L, clean)).toDF("doc_id", "text")
    val rows = TextAnalysis.gateOverlapMatrix(df, "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    val sf = rows.find(r => r._1 == "short" && r._2 == "few_stopwords").get
    assert(sf._3 == 1 && sf._4 == 1 && sf._5 == 1 && sf._6 == 1.0)
    // short vs symbol_heavy: no co-failure
    val ss = rows.find(r => r._1 == "short" && r._2 == "symbol_heavy").get
    assert(ss._5 == 0 && ss._6 == 0.0)
    assert(rows.length == 6)
  }

  test("intervalUnion: overlaps merge, gaps split, coverage exact") {
    import spark.implicits._
    import graft.operators.IntervalJoin
    // [0,10] ∪ [5,20] merge to [0,20]; [30,40] is its own segment:
    // covered = 20 + 10 = 30 over span 40 ⇒ 0.75. A contained
    // interval [31,35] must add nothing.
    val iv = Seq((1L, 0L, 10L), (1L, 5L, 20L), (1L, 30L, 40L),
      (1L, 31L, 35L)).toDF("u", "s", "e")
    val r = IntervalJoin.intervalUnion(iv, col("u"), col("s"), col("e"))
      .head()
    assert(r.getLong(1) == 4 && r.getLong(2) == 2)
    assert(r.getLong(3) == 30 && r.getLong(4) == 40)
    assert(r.getDouble(5) == 0.75)
  }

  test("runsTest: perfect alternation maximizes runs, a block minimizes") {
    import spark.implicits._
    import graft.operators.TimeSeries
    // alternating 1,3 counts over 10 days, median 1 (nearest-rank of
    // {1×5,3×5} at rank 5) ⇒ ties at 1 excluded, leaving five 3-days:
    // all above ⇒ n0 = 0 ⇒ z undefined. Use counts {1,5} alternating
    // with one 3-day to fix the median at 3: days 1..4 alternate 1/5,
    // day 5 = 3 (excluded), days 6..9 alternate 5/1. Signs:
    // 0,1,0,1,1,0,1,0 ⇒ runs = 7, n1 = n0 = 4.
    val cnt = Seq(1, 5, 1, 5, 3, 5, 1, 5, 1)
    val ev = cnt.zipWithIndex.flatMap { case (c, i) =>
      (1 to c).map(_ => (day(i + 1), "t"))
    }.toDF("ts", "k")
    val r = TimeSeries.runsTest(ev, col("k"), col("ts")).head()
    assert(r.getLong(1) == 4 && r.getLong(2) == 4 && r.getLong(3) == 7)
    // E[R] = 2·16/8 + 1 = 5; Var = 32·(32−8)/(64·7) = 1.714286;
    // z = (7−5)/√1.714286 = 1.5275
    assert(r.getDouble(4) == 5.0)
    assert(r.getDouble(5) == 1.5275)
  }

  test("theilDecomposition: equal values give 0; between-only splits clean") {
    import spark.implicits._
    import graft.operators.Metrics
    // all units equal ⇒ T = 0 everywhere
    val eq = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val r0 = Metrics.theilDecomposition(eq, col("g"), col("v")).head()
    assert(r0.getDouble(2) == 0.0 && r0.getDouble(3) == 0.0 &&
      r0.getDouble(4) == 0.0)
    // within-group equality, between-group gap: T_within = 0 and
    // T_total = T_between exactly. μ = 3; group a: (1/3)ln(1/3)·2,
    // group b: (5/3)ln(5/3)·2; T = [(1/3)ln(1/3)+(5/3)ln(5/3)]/2.
    val btw = Seq(("a", 1L), ("a", 1L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val r1 = Metrics.theilDecomposition(btw, col("g"), col("v")).head()
    assert(r1.getDouble(4) == 0.0) // within
    assert(r1.getDouble(2) == r1.getDouble(3)) // total == between
    val t = (1.0 / 3 * math.log(1.0 / 3) + 5.0 / 3 * math.log(5.0 / 3)) / 2
    assert(math.abs(r1.getDouble(2) - t) < 1e-6)
  }

  test("essCard: uniform weights give ESS = n; one dominant weight ~ 1") {
    import spark.implicits._
    import graft.operators.Metrics
    val uni = Seq(("g", 0.7), ("g", 0.7), ("g", 0.7), ("g", 0.7))
      .toDF("src", "logw")
    val r = Metrics.essCard(uni, col("src"), col("logw")).head()
    assert(r.getLong(1) == 4 && r.getDouble(2) == 4.0 &&
      r.getDouble(3) == 1.0)
    // one weight e^20 dominant: ESS collapses toward 1
    val dom = Seq(("g", 20.0), ("g", 0.0), ("g", 0.0)).toDF("src", "logw")
    val rd = Metrics.essCard(dom, col("src"), col("logw")).head()
    assert(rd.getDouble(2) >= 1.0 && rd.getDouble(2) < 1.001)
  }

  test("activityStreaks: islands split on gaps, last streak is the recent one") {
    import spark.implicits._
    import graft.operators.Funnel
    // active days 1,2,3, 6,7, 10: longest = 3, last streak = 1 (day 10)
    val ev = Seq(1, 2, 3, 6, 7, 10).map(d => (1L, day(d)))
      .toDF("user_id", "ts")
    val r = Funnel.activityStreaks(ev, col("user_id"), col("ts")).head()
    assert(r.getLong(1) == 6 && r.getLong(2) == 3 && r.getLong(3) == 1)
    assert(r.getDate(4).toString == "2024-01-10")
  }

  test("thresholdCurve: counts are monotone non-increasing in the threshold") {
    import spark.implicits._
    import graft.operators.Dedup
    val pairs = Seq((1L, 2L, 0.95), (1L, 3L, 0.6), (4L, 5L, 0.45),
      (2L, 3L, 0.95)).toDF("id_a", "id_b", "jaccard")
    val rows = Dedup.thresholdCurve(pairs, Seq(0.4, 0.7, 0.9))
      .orderBy(col("threshold")).collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(4L, 2L, 2L))
    // doc 3 appears as id_b in two pairs — dropped once, not twice
    assert(rows.map(_.getLong(2)).toSeq == Seq(3L, 2L, 2L))
  }

  test("cohensD: unit shift over unit variance gives d = 1 exactly-ish") {
    import spark.implicits._
    import graft.operators.Metrics
    // arm 0: {100, 300} (mean 200); arm 1: {0, 200} (mean 100):
    // both sample variances are 20000, pooled sd = √20000,
    // d = 100/141.42 = 0.7071; g = d·(1 − 3/7) = 0.4041.
    val df = Seq(("g", 0, 100L), ("g", 0, 300L), ("g", 1, 0L),
      ("g", 1, 200L)).toDF("g", "v", "x")
    val r = Metrics.cohensD(df, col("g"), col("v"), col("x")).head()
    assert(r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 1.0) // means /100
    assert(r.getDouble(5) == 0.7071)
    assert(r.getDouble(6) == BigDecimal(0.7071067811865475 * (1.0 - 3.0 / 7.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("rankMigration: entered/dropped/stayed classified correctly") {
    import spark.implicits._
    import graft.operators.Metrics
    // period 0 top-2: a(10), b(5); period 1 top-2: a(8), c(9) →
    // a stays (1 → 2, gain −1), b drops, c enters.
    val df = Seq((0, "a", 10L), (0, "b", 5L), (0, "c", 1L),
      (1, "a", 8L), (1, "c", 9L)).toDF("p", "k", "v")
    val rows = Metrics.rankMigration(df, col("p"), col("k"), col("v"),
        k = 2).orderBy(col("key")).collect()
    val a = rows(0); val b = rows(1); val c = rows(2)
    assert(a.getString(4) == "stayed" && a.getInt(1) == 1 &&
      a.getInt(2) == 2 && a.getInt(3) == -1)
    assert(b.getString(4) == "dropped" && b.isNullAt(2))
    assert(c.getString(4) == "entered" && c.isNullAt(1) &&
      c.getInt(2) == 1)
  }

  test("interruptedTimeSeries: perfect trend continuation has zero effect") {
    import spark.implicits._
    import graft.operators.TimeSeries
    // counts = i over 8 days: pre = days 1–4 fit y = x exactly, post
    // prediction 5+6+7+8 = 26 = actual ⇒ effect 0. Then a level jump:
    // post counts i+10 ⇒ abs effect 40, rel = 40/26.
    val flat = (1 to 8).flatMap(d => (1 to d).map(_ => (day(d), "t")))
      .toDF("ts", "k")
    val r = TimeSeries.interruptedTimeSeries(flat, col("k"), col("ts"))
      .head()
    assert(r.getLong(1) == 4 && r.getLong(2) == 4)
    assert(r.getLong(3) == 26 && r.getDouble(4) == 26.0)
    assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0)
    val jump = (1 to 8).flatMap { d =>
      val c = if (d <= 4) d else d + 10
      (1 to c).map(_ => (day(d), "j"))
    }.toDF("ts", "k")
    val rj = TimeSeries.interruptedTimeSeries(jump, col("k"), col("ts"))
      .head()
    assert(rj.getLong(3) == 66 && rj.getDouble(5) == 40.0)
    assert(rj.getDouble(6) == BigDecimal(40.0 / 26)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("powerTwoProportion: degenerate all/none conversion gives NULL n") {
    import spark.implicits._
    import graft.operators.Metrics
    val df = Seq(("all", true), ("all", true), ("none", false))
      .toDF("g", "conv")
    val r = Metrics.powerTwoProportion(df, col("g"), col("conv"))
      .orderBy(col("g")).collect()
    assert(r(0).isNullAt(5) && r(1).isNullAt(5))
  }
}
