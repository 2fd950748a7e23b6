package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 additions: the KS drift gate against a persisted
  * reference, the Damerau–Levenshtein input cap, and the mojibake
  * false-positive fix. */
class R10OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ksVsReference: 0 for an identical batch, 1 for disjoint supports") {
    import spark.implicits._
    import graft.operators.Drift
    val ref = Seq(("a", 5.0), ("a", 5.0), ("a", 25.0), ("a", 25.0),
      ("b", 5.0), ("b", 25.0)).toDF("grp0", "value")
    val tmp = java.nio.file.Files.createTempDirectory("ks_ref").toString
    Drift.DriftRef.build(ref, "grp0", "value", 20.0).save(tmp)
    val loaded = Drift.DriftRef.load(spark, tmp)
    // identical batch: CDFs coincide at every bin → D = 0
    val same = loaded.ksOf(ref, "grp0", "value")
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(same == Map("a" -> 0.0, "b" -> 0.0))
    // fully shifted batch for group a: disjoint bins → D = 1
    val shifted = Seq(("a", 105.0), ("a", 125.0)).toDF("grp0", "value")
    val d = loaded.ksOf(shifted, "grp0", "value")
      .collect().map(r => (r.getString(0), if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(d("a") == 1.0)
    // group b absent from the batch → NULL, not 0 and not an error
    assert(d.get("b").forall(_ == -1.0))
  }

  test("ksVsReference: hand-computed sup-gap on a partial shift") {
    import spark.implicits._
    import graft.operators.Drift
    // ref bins: {0: 2, 1: 2} → CDF .5, 1 ; batch {0: 1, 1: 3} → .25, 1
    // D = .25, exact integer form: |2*4 - 1*4| / (4*4) = 4/16
    val ref = Seq(("g", 5.0), ("g", 15.0), ("g", 25.0), ("g", 35.0))
      .toDF("grp0", "value")
    val batch = Seq(("g", 5.0), ("g", 25.0), ("g", 25.0), ("g", 35.0))
      .toDF("grp0", "value")
    val d = Drift.ksVsReference(batch,
      Drift.referenceHistogram(ref, "grp0", "value", 20.0),
      "grp0", "value", 20.0).head()
    assert(d.getLong(1) == 4 && d.getLong(2) == 4 && d.getDouble(3) == 0.25)
  }

  test("damerau_levenshtein: document-length inputs are refused loudly") {
    import graft.functions.DamerauLevenshtein
    val big = "x" * (DamerauLevenshtein.MaxLen + 1)
    val e = intercept[IllegalArgumentException] {
      DamerauLevenshtein.distance(big, "short")
    }
    assert(e.getMessage.contains("cap"))
    // at the cap it still computes
    val atCap = "y" * DamerauLevenshtein.MaxLen
    assert(DamerauLevenshtein.distance(atCap, atCap) == 0)
  }

  test("mojibake: damage digraphs flagged, legitimate Ã text passes") {
    import spark.implicits._
    import graft.operators.CleaningSignals
    val df = Seq(
      (1L, "broken cafÃ© mojibake"),          // Ã + © (0080–00BF) → damage
      (2L, "JOÃO lives in SÃO PAULO"),        // Ã + letter → clean
      (3L, "quoted â€™ apostrophe damage"),   // â€ + ™ → damage
      (4L, "totally ordinary ascii text"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        CleaningSignals.encClean(col("text")).as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))
  }

  test("battles: cells canonicalize, Wilson brackets the rate, BT ranks dominance") {
    import spark.implicits._
    import graft.operators.Battles
    // A beats B 3/4, B beats C 3/3, A beats C 2/2 — strict dominance A > B > C
    val fights = Seq(
      ("A", "B", true), ("A", "B", true), ("B", "A", false), ("B", "A", true),
      ("B", "C", true), ("B", "C", true), ("C", "B", false),
      ("C", "A", false), ("A", "C", true))
      .toDF("ma", "mb", "a_won")
    val cells = Battles.cells(fights, col("ma"), col("mb"), col("a_won"))
    val cm = cells.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(cm == Map(("A", "B") -> (4L, 3L), ("B", "C") -> (3L, 3L),
      ("A", "C") -> (2L, 2L)))
    val w = Battles.winRateWilson(cells).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val (p, lo, hi) = w(("A", "B"))
    assert(p == 0.75 && lo < 0.75 && 0.75 < hi && lo > 0 && hi < 1)
    // n=3, w=3: the Wilson LOWER bound pulls well off 1 where Wald
    // would pin 1±0; the upper bound is exactly 1 at p̂=1 by algebra
    val (_, lo2, hi2) = w(("B", "C"))
    assert(lo2 > 0.3 && lo2 < 0.5 && hi2 == 1.0)
    val s = Battles.btStrengths(cells, iters = 20).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s("A") > s("B") && s("B") > s("C"), s.toString)
    assert(math.abs(s.values.sum - 1.0) < 1e-4)
    // partition-invariance of the quantized fixed point
    val s2 = Battles.btStrengths(cells.repartition(7), iters = 20).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s == s2)
  }

  test("anovaOneWay: exact cents decomposition and known F") {
    import spark.implicits._
    import graft.operators.Metrics
    // groups {1,2,3} and {4,5,6}: SSB=6.75·... in cents²: values in
    // dollars → cents 100..600; SST=17500·1e?; hand: means 200 vs 500,
    // grand 350; SSB = 2·3·150² = 135000; SSW = 2·(100²·2/..)= each
    // group Σ(c-mean)² = 20000 ⇒ SSW=40000; F=(135000/1)/(40000/4)=13.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Metrics.anovaOneWay(df, col("g"), col("v")).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 6)
    assert(r.getDouble(2) == 135000.0 && r.getDouble(3) == 40000.0 &&
      r.getDouble(4) == 175000.0)
    assert(r.getDouble(5) == 13.5)
    // identical groups → SSB 0, F 0
    val r2 = Metrics.anovaOneWay(
      Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v"),
      col("g"), col("v")).head()
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(5) == 0.0)
  }

  test("sortedNeighborhoodPairs: window candidates only, partitions bound the sort") {
    import spark.implicits._
    import graft.operators.FuzzyLink
    val df = Seq("apple", "applf", "appzz", "azzzz", "bpple").toDF("n")
    val pairs = FuzzyLink.sortedNeighborhoodPairs(df, "n",
        substring(col("name"), 1, 1), col("name"), window = 3, maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // within-window pairs under dist ≤ 2: apple–applf (1), apple–appzz
    // (2), applf–appzz (2), appzz–azzzz (2); apple–azzzz is 3 positions
    // apart → never a candidate; bpple is dist 1 from apple but in
    // partition 'b' → the documented sorted-blocks miss
    assert(pairs == Set(("apple", "applf"), ("apple", "appzz"),
      ("applf", "appzz"), ("appzz", "azzzz")))
  }

  test("pairOverlap: HLL inclusion-exclusion tracks true intersections") {
    import spark.implicits._
    import graft.operators.Cardinality
    // A = 1..1000, B = 501..1500 (true ∩ = 500), C = 2001..2200 (disjoint)
    val rows = (1 to 1000).map(i => ("A", i.toString)) ++
      (501 to 1500).map(i => ("B", i.toString)) ++
      (2001 to 2200).map(i => ("C", i.toString))
    val df = rows.toDF("g", "k")
    val ov = Cardinality.pairOverlap(
        Cardinality.registersOf(df, "g", "k", p = 9), p = 9)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(5), r.getDouble(6))).toMap
    // inclusion–exclusion differences three ±1.04/√512 sketches, so
    // the intersection error is several times a single sketch's — a
    // ±30% band is the honest contract at p=9
    val (abInter, abJac) = ov(("A", "B"))
    assert(math.abs(abInter - 500) < 150, s"A∩B est $abInter")
    assert(abJac > 0.2 && abJac < 0.5, s"A∩B jaccard $abJac")
    // disjoint sets: the estimate hovers around 0 inside the same
    // noise band (and may go negative — reported raw by design)
    val (acInter, _) = ov(("A", "C"))
    assert(math.abs(acInter) < 150, s"A∩C est $acInter (true 0)")
  }

  test("pca power iteration: recovers a planted dominant direction") {
    import spark.implicits._
    import graft.operators.Pca
    // x_i = t_i·w + small noise on an orthogonal axis, w = (3,4)/5
    val rnd = new java.util.SplittableRandom(7)
    val rows = (0 until 400).map { i =>
      val t = rnd.nextDouble() * 10 - 5
      val e = rnd.nextDouble() * 0.4 - 0.2
      (i.toLong, Array(t * 0.6 + e * 0.8, t * 0.8 - e * 0.6))
    }
    val df = rows.toDF("id", "emb")
    val out = Pca.powerTopComponent(df, "id", "emb", iters = 8)
    val m = out.collect().map(r => r.getInt(0) ->
      (r.getDouble(2), r.getDouble(5))).toMap
    val (l0, expl) = m(0); val (l1, _) = m(1)
    val cos = math.abs(l0 * 0.6 + l1 * 0.8)
    assert(cos > 0.999, s"loadings ($l0, $l1) vs planted (0.6, 0.8)")
    assert(expl > 0.95, s"explained_ratio $expl")
    // partition-invariance of the quantized contract
    val out2 = Pca.powerTopComponent(df.repartition(13), "id", "emb", 8)
    assert(out.collect().toSeq == out2.collect().toSeq)
    graft.operators.CacheScope.drain()
  }

  test("zTwoSidedP + bhAdjust: A&S polynomial and step-up control behave") {
    import spark.implicits._
    import graft.operators.Metrics
    val z = Seq(0.0, 1.96, 6.0).toDF("z")
    val p = z.select(Metrics.zTwoSidedP(col("z")).as("p"))
      .collect().map(_.getDouble(0))
    assert(math.abs(p(0) - 1.0) < 1e-6)
    assert(math.abs(p(1) - 0.05) < 1e-3)
    assert(p(2) < 1e-8)
    // BH on hand p-values: raw p·m/i = .005 .025 .05 .05 .9 — already
    // monotone, so the step-up running min leaves them unchanged
    val pv = Seq(("a", 0.001), ("b", 0.01), ("c", 0.03), ("d", 0.04),
      ("e", 0.9)).toDF("k", "p")
    val adj = Metrics.bhAdjust(pv, col("k"), col("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(adj("a") - 0.005) < 1e-12)
    assert(math.abs(adj("b") - 0.025) < 1e-12)
    assert(math.abs(adj("c") - 0.05) < 1e-12)
    assert(math.abs(adj("d") - 0.05) < 1e-12)
    assert(math.abs(adj("e") - 0.9) < 1e-12)
    // a non-monotone raw sequence IS flattened by the running min
    val pv2 = Seq(("a", 0.01), ("b", 0.011)).toDF("k", "p")
    val adj2 = Metrics.bhAdjust(pv2, col("k"), col("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // raw: .02, .011 → step-up: min tail → a gets .011
    assert(math.abs(adj2("a") - 0.011) < 1e-12 &&
      math.abs(adj2("b") - 0.011) < 1e-12)
  }

  test("bigramLogprobKn: continuation backoff scores contexts, not frequency") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // "york" only ever follows "new" (1 context); "the" follows many
    val docs = Seq(
      (1L, "new york new york new york"),
      (2L, "a the b the c the d the"),
      (3L, "zz")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogprobKn(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 5 && out(2L)._1 == 7)
    assert(out(1L)._2 < 0.0 && out(2L)._2 < 0.0)
    // single-token doc: no bigrams, 0-defaulted
    assert(out(3L) == (0L, 0.0))
    graft.operators.CacheScope.drain()
  }

  test("lineBoilerplate: repeated lines across docs flagged, per-doc text kept") {
    import spark.implicits._
    import graft.operators.CleaningSignals
    val docs = Seq(
      (1L, "unique text one\nCOPYRIGHT FOOTER"),
      (2L, "unique text two\nCOPYRIGHT FOOTER"),
      (3L, "unique text three\nCOPYRIGHT FOOTER\nalso mine"),
      (4L, "no footer here")).toDF("doc_id", "text")
    val out = CleaningSignals.lineBoilerplate(docs, "text", "doc_id",
        minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    // footer appears in 3 distinct docs → boiler; unique lines kept
    assert(out(1L) == (2L, 1L, "unique text one".length.toLong))
    assert(out(3L)._2 == 1L && out(3L)._1 == 3L)
    assert(out(4L) == (1L, 0L, "no footer here".length.toLong))
  }

  test("scriptMix: routes mixed-script docs before language-id") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "pure ascii words"),
      (2L, "latin 中文 mix"),
      (3L, "русский 1984")).toDF("doc_id", "text")
    val out = TextAnalysis.scriptMix(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(3))).toMap
    // (n_latin, n_han, n_cyrillic, n_digit)
    assert(out(1L) == (14L, 0L, 0L, 0L))
    assert(out(2L) == (8L, 2L, 0L, 0L))
    assert(out(3L) == (0L, 0L, 7L, 4L))
  }

  test("cusumDrift: planted level shift alarms, stationary series does not") {
    import spark.implicits._
    import graft.operators.TimeSeries
    // "flat": 10/day for 30 days; "shift": 10/day for 20 days then
    // 30/day for 10 — the shift must alarm AFTER day 20, flat never
    val rows = (for {
      day <- 1 to 30
      n = 10
      i <- 1 to n
    } yield ("flat", f"2026-01-$day%02d 12:00:00", i)) ++
      (for {
        day <- 1 to 30
        n = if (day <= 20) 10 else 30
        i <- 1 to n
      } yield ("shift", f"2026-01-$day%02d 12:00:00", i))
    val ev = rows.toDF("event_type", "tss", "i")
      .select(col("event_type"), to_timestamp(col("tss")).as("ts"))
    val out = TimeSeries.cusumDrift(ev, col("event_type"), col("ts"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3),
          Option(r.getDate(5)).map(_.toString))).toMap
    val (nf, mf, af) = out("flat")
    assert(nf == 30 && mf == 0.0 && af.isEmpty,
      s"flat series must not alarm: $out")
    val (ns, ms, as_) = out("shift")
    assert(ns == 30 && ms > 0.0, s"shift must drift: $out")
    assert(as_.exists(_ >= "2026-01-21"), s"alarm must follow the shift: $out")
  }

  test("passAtK: matches the closed form on hand counts") {
    import spark.implicits._
    import graft.operators.Classifier
    // n=10, c=3: pass@1 = 3/10; pass@5 = 1 - C(7,5)/C(10,5) = 1 - 21/252
    val att = (1 to 10).map(i => ("t1", i <= 3)) ++
      (1 to 4).map(i => ("t2", false)) ++   // n=4 < 5 → pass@5 NULL
      (1 to 6).map(i => ("t3", i <= 5))     // n-c=1 < 5 → pass@5 = 1
    val out = Classifier.passAtK(att.toDF("t", "ok"), col("t"), col("ok"),
        ks = Seq(1, 5)).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    assert(out("t1")._1 == 0.3)
    assert(out("t1")._2.contains(BigDecimal(1.0 - 21.0 / 252.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue))
    assert(out("t2") == (0.0, None), "pass@5 undefined below 5 attempts")
    assert(out("t3")._2.contains(1.0), "n-c < k cannot fail all k")
  }

  test("dialogChecks: alternation, boundary roles, empty turns") {
    import spark.implicits._
    import graft.operators.SftPack
    val turns = Seq(
      // good: user → assistant → user → assistant
      ("c1", 1, 1, "user", "hi"), ("c1", 2, 2, "assistant", "hello"),
      ("c1", 3, 3, "user", "more"), ("c1", 4, 4, "assistant", "sure"),
      // bad: double-user, empty content, assistant-first
      ("c2", 1, 1, "assistant", "hi"), ("c2", 2, 2, "user", ""),
      ("c2", 3, 3, "user", "again"))
      .toDF("cv", "o", "tx", "r", "ct")
    val rendered = SftPack.renderTurns(turns, col("cv"), col("o"),
      col("tx"), col("r"), col("ct"))
    val out = SftPack.dialogChecks(rendered).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6))).toMap
    assert(out("c1") == (0L, 0L, true, true, true))
    assert(out("c2") == (1L, 1L, false, false, false))
  }

  test("rfm: quintile scores rank the obvious extremes, segments name them") {
    import spark.implicits._
    import graft.operators.Metrics
    // 10 customers: cust i places i orders of $100·i, last order on
    // day i — cust 10 is recent+frequent+big (champion), cust 1 stale+
    // rare+small (lost)
    val rows = for { i <- 1 to 10; j <- 1 to i }
      yield (i.toLong, f"2026-02-$i%02d 08:00:00", 100.0 * i)
    val o = rows.toDF("ck", "dts", "amt")
      .select(col("ck"), to_timestamp(col("dts")).as("dt"), col("amt"))
    val out = Metrics.rfm(o, col("ck"), col("dt"), col("amt"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7))).toMap
    assert(out(10L) == (5, 5, 5, "champion"), out(10L).toString)
    assert(out(1L) == (1, 1, 1, "lost"), out(1L).toString)
    // scores span the full 1..5 range on 10 customers
    assert(out.values.map(_._2).toSet == Set(1, 2, 3, 4, 5))
  }

  test("evalTopK: below-cutoff relevant hits no longer credit p@k or MRR") {
    import spark.implicits._
    import graft.operators.Retrieval
    // one query, 10 results; the ONLY relevant docs sit at ranks 6..10
    val results = (1 to 10).map(r => ("q1", r, r.toLong)).toDF("query_id", "rank", "id")
    val rels = (6L to 10L).map(id => ("q1", id, 1)).toDF("query_id", "id", "rel")
    val m = Retrieval.evalTopK(results, rels, k = 5).head()
    // ndcg: dcg over ranks 1..5 is 0 → 0-valued (idcg > 0); mrr/p@k null/0
    assert(m.getDouble(1) == 0.0)
    assert(m.isNullAt(2), "MRR must not credit a rank-6 hit at k=5")
    assert(m.getDouble(3) == 0.0, "p@k must not count below-cutoff hits")
  }
}
