package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 session-3 additions: HITS hubs/authorities and the Markov
  * stationary distribution (quantized, renormalized power iteration).
  */
class R10cOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hits: authorities and hubs separate on a directed fan") {
    import spark.implicits._
    import graft.operators.Graph
    // a -> b, a -> c, b -> c : c is the top authority (two in-edges),
    // a the top hub (routes into both), and the pure-source/pure-sink
    // ends score exactly zero on the opposite side.
    val edges = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L))
      .toDF("src", "dst", "w")
    val r = Graph.hits(edges, "src", "dst", "w", iters = 4)
      .collect().map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2)))
      .toMap
    assert(r("c")._2 > r("b")._2 && r("b")._2 > r("a")._2)
    assert(r("a")._1 > r("b")._1 && r("b")._1 > r("c")._1)
    assert(r("a")._2 == 0.0 && r("c")._1 == 0.0)
    // L1 normalization holds after rounding (12 dp): sums within 1e-9
    assert(math.abs(r.values.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("hits: partition-invariant (quantized long mass)") {
    import spark.implicits._
    import graft.operators.Graph
    val edges = (1 to 40).map(i =>
      (s"n${i % 7}", s"n${(i * 3) % 7}", (i % 5 + 1).toLong))
      .toDF("src", "dst", "w").filter(col("src") =!= col("dst"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.hits(df, "src", "dst", "w", iters = 5)
        .collect().map(x => (x.getString(0), x.getDouble(1), x.getDouble(2)))
        .sortBy(_._1).toSeq
    assert(run(edges.repartition(1)) == run(edges.repartition(13)))
  }

  test("stationary: symmetric 2-cycle and 3-cycle are exactly uniform") {
    import spark.implicits._
    import graft.operators.Graph
    val two = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("s", "d", "w")
    val r2 = Graph.stationary(two, "s", "d", "w", iters = 12)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r2 == Map("a" -> 0.5, "b" -> 0.5))
    val three = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("s", "d", "w")
    val r3 = Graph.stationary(three, "s", "d", "w", iters = 6)
      .collect().map(_.getDouble(1))
    // 1/3 under the quantize-then-round-12 contract
    assert(r3.forall(_ == 0.333333333333))
  }

  test("logRank: symmetric arms score exactly zero") {
    import spark.implicits._
    import graft.operators.Survival
    // users 1/3 (arm 1) mirror users 2/4 (arm 0) exactly: at every
    // duration n_a = n_b and d_a = d_b, so E_a = d/2 = observed
    // and chi2 = 0 by construction.
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    val ev = Seq(
      (1L, at(0), "view"), (1L, at(2), "purchase"),
      (2L, at(0), "view"), (2L, at(2), "purchase"),
      (3L, at(0), "view"), (3L, at(5), "view"),
      (4L, at(0), "view"), (4L, at(5), "view")
    ).toDF("user_id", "ts", "event_type")
    val r = Survival.logRank(ev, "purchase", col("user_id") % 2).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2) // users per arm
    assert(r.getLong(2) == 1)                      // observed arm-a events
    assert(r.getDouble(3) == 1.0)                  // expected = d/2 = 1
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("logRank: one-sided conversion shifts chi2 off zero") {
    import spark.implicits._
    import graft.operators.Survival
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    // arm 1 converts fast, arm 0 never converts
    val ev = Seq(
      (1L, at(0), "view"), (1L, at(1), "purchase"),
      (3L, at(0), "view"), (3L, at(1), "purchase"),
      (2L, at(0), "view"), (2L, at(9), "view"),
      (4L, at(0), "view"), (4L, at(9), "view")
    ).toDF("user_id", "ts", "event_type")
    val r = Survival.logRank(ev, "purchase", col("user_id") % 2).head()
    assert(r.getLong(2) == 2 && r.getDouble(3) < 2.0) // obs 2, exp 1
    assert(r.getDouble(4) > 0.0 && r.getDouble(5) > 0.0)
  }

  test("sprtBernoulli: hand-computed LLR and decisive tails") {
    import spark.implicits._
    import graft.operators.Metrics
    // day 1: 4 trials 0 successes; day 2: +4 trials +4 successes
    val df = Seq(
      ("d1", 0), ("d1", 0), ("d1", 0), ("d1", 0),
      ("d2", 1), ("d2", 1), ("d2", 1), ("d2", 1)
    ).toDF("day", "y")
    val out = Metrics.sprtBernoulli(df, col("day"), col("y") === 1,
        p0 = 0.2, p1 = 0.8, alpha = 0.05, beta = 0.05)
      .orderBy(col("period")).collect()
    val c2 = math.log(0.2 / 0.8)
    assert(out(0).getLong(1) == 4 && out(0).getLong(2) == 0)
    assert(out(0).getDouble(3) ==
      BigDecimal(4 * c2).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // day 1: llr = 4*ln(1/4) ≈ -5.545 <= ln(1/19) ≈ -2.944 -> accept H0
    // day 2 cumulative 4/8: llr = 4c1 + 4c2 = 0 -> back to continue
    assert(out(0).getString(4) == "accept_h0")
    assert(out(1).getDouble(3) == 0.0)
    assert(out(1).getString(4) == "continue")
  }

  test("rakeKeywords: hand-computed degree/frequency phrase scores") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // "spark. fast spark engine" -> phrases "spark" (len 1) and
    // "fast spark engine" (len 3); spark: freq 2 deg 4 -> 2.0,
    // fast/engine: freq 1 deg 3 -> 3.0; phrase scores 2.0 and 8.0
    val df = Seq((1L, "Spark. Fast Spark engine")).toDF("doc_id", "text")
    val r = TextAnalysis.rakeKeywords(df, "text", "doc_id", topK = 10)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    assert(r.toSeq == Seq(("fast spark engine", 1L, 8.0),
      ("spark", 1L, 2.0)))
  }

  test("rakeKeywords: stopwords split runs; >maxLen runs dropped") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "green apple and blue sky"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val phrases = TextAnalysis.rakeKeywords(df, "text", "doc_id", topK = 10)
      .collect().map(_.getString(0)).toSet
    // "and" is a delimiter; the 6-token stopword-free run in doc 2
    // exceeds maxLen=4 and must be dropped, not truncated
    assert(phrases == Set("green apple", "blue sky"))
  }

  test("textRank: symmetric 2-node graph ranks 0.5/0.5, minCount prunes") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = Seq((1L, "xx yy xx yy xx yy"), (2L, "pp qq"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.textRank(df, "text", topK = 10, iters = 5,
        minCount = 2)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // (pp,qq) occurs once -> pruned by minCount; xx<->yy symmetric
    assert(r == Map("xx" -> 0.5, "yy" -> 0.5))
  }

  test("itemNeighbors: min-support prune and exact cosine") {
    import spark.implicits._
    import graft.operators.Basket
    val f = Seq((1L, "A"), (1L, "B"), (1L, "C"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (4L, "C"), (4L, "D"))
      .toDF("o", "p")
    val rows = Basket.itemNeighbors(f, "o", "p", minSupport = 2, k = 5)
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getDouble(3), x.getInt(4)))
      .toSet
    // only (A,B) survives support>=2; cos = 3/sqrt(3*3) = 1.0
    assert(rows == Set(("A", "B", 3L, 1.0, 1), ("B", "A", 3L, 1.0, 1)))
  }

  test("referentialAudit: orphan and NULL-key accounting") {
    import spark.implicits._
    import graft.operators.DataQuality
    val child = Seq(Some(1L), Some(2L), None).toDF("fk")
    val parent = Seq(1L).toDF("pk")
    val r = DataQuality.referentialAudit(Seq(
      DataQuality.FkSpec("c->p", child, "fk", parent, "pk"))).head()
    assert(r.getLong(1) == 3 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 0.666667)
  }

  test("hbosOutliers: thin-bin vector tops the list with exact score") {
    import spark.implicits._
    import graft.operators.Similarity
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f)), (4L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.hbosOutliers(vecs, "embedding", "vec_id",
      dims = 2, binWidth = 0.25, topN = 4).collect()
    assert(r.head.getLong(0) == 4L)
    // 2 * (ln 4 - ln 1) quantized at 1e-9 then rounded to 6 dp
    assert(r.head.getDouble(1) == 2.772589)
    assert(r.last.getDouble(1) == 0.575364)
  }

  test("holtSmoothing: hand-folded level, trend, forecast") {
    import spark.implicits._
    import graft.operators.TimeSeries
    // hourly counts 10,12,11,15: init s=12 b=2;
    // x=11: s=13.1 b=1.82; x=15: s=14.944 b=1.8248 -> forecast 16.7688
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = Seq(10, 12, 11, 15).zipWithIndex.flatMap { case (n, h) =>
      (1 to n).map(i =>
        (new java.sql.Timestamp(base + h * 3600000L + i * 1000L), "t"))
    }
    val ev = rows.toDF("ts", "event_type")
    val r = TimeSeries.holtSmoothing(ev, alpha = 0.3, beta = 0.2).head()
    assert(r.getLong(1) == 4)
    assert(math.abs(r.getDouble(2) - 14.944) < 1e-9)
    assert(math.abs(r.getDouble(3) - 1.8248) < 1e-9)
    assert(math.abs(r.getDouble(4) - 16.7688) < 1e-9)
  }

  test("burstiness: metronome arrivals score cv2 = 0, fano = 0") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val ev = (0 until 12).map(h =>
      (new java.sql.Timestamp(base + h * 3600000L), "t", h.toLong))
      .toDF("ts", "event_type", "event_id")
    val r = TimeSeries.burstiness(ev, col("event_type"), col("ts"),
      col("event_id")).head()
    assert(r.getLong(1) == 11 && r.getLong(2) == 12)
    assert(r.getDouble(3) == 3600.0) // mean gap seconds
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("gapAudit: hole accounting") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val ev = Seq(0, 1, 5).map(h =>
      (new java.sql.Timestamp(base + h * 3600000L), "t"))
      .toDF("ts", "event_type")
    val r = TimeSeries.gapAudit(ev, col("event_type"), col("ts")).head()
    assert(r.getLong(1) == 3 && r.getLong(2) == 6 && r.getLong(3) == 3)
    assert(r.getDouble(4) == 0.5)
  }

  test("quantileNormalize: shifted group maps onto pooled deciles") {
    import spark.implicits._
    import graft.operators.Metrics
    val df = ((1 to 10).map(v => ("A", v.toLong, v.toLong)) ++
      (1 to 10).map(v => ("B", v + 100L, v + 100L)))
      .toDF("g0", "v0", "id0")
    val r = Metrics.quantileNormalize(df, col("g0"), col("v0"), col("id0"))
      .collect()
      .map(x => (x.getString(0), x.getInt(1)) ->
        (x.getLong(3), x.getLong(4))).toMap
    // B's decile 1 (value 101) aligns with the pooled decile-1 upper 2
    assert(r(("B", 1)) == (101L, 2L))
    assert(r(("A", 10)) == (10L, 110L))
  }

  test("ucbPolicy: exploration bonus picks the sparse arm") {
    import spark.implicits._
    import graft.operators.Metrics
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(day: Int, i: Int) =
      new java.sql.Timestamp(base + day * 86400000L + i * 1000L)
    val ev = Seq(
      (ts(0, 1), "A", 1.0), (ts(0, 2), "A", 1.0), (ts(0, 3), "B", 5.0),
      (ts(1, 1), "A", 1.0), (ts(1, 2), "B", 1.0)
    ).toDF("ts", "arm0", "v")
    val r = Metrics.ucbPolicy(ev, col("arm0"), col("ts"), col("v"))
      .collect()
    assert(r.length == 1) // day 1 has no history -> only day 2 emits
    val exp = BigDecimal(5.0 + math.sqrt(2.0 * math.log(3) / 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.head.getString(1) == "B" && r.head.getDouble(3) == exp)
  }

  test("caliperAtt: radius match and exact ATT") {
    import spark.implicits._
    import graft.operators.Metrics
    val units = Seq(
      (1, 5L, 1000L),  // treated: cov 5, outcome 10.00
      (0, 4L, 500L), (0, 6L, 700L), (0, 10L, 99999L))
      .toDF("tr0", "cov0", "y0")
    val r = Metrics.caliperAtt(units, col("tr0"), col("cov0"), col("y0"),
      caliper = 2).head()
    assert(r.getLong(0) == 1 && r.getLong(1) == 3 && r.getLong(2) == 1)
    assert(r.getDouble(3) == 4.0) // (1000 - 600)/100
  }

  test("alsRank1: exact single-user half-step and zero RMSE") {
    import spark.implicits._
    import graft.operators.Factorize
    // one user, ratings A=4 B=2, one iteration:
    // u = (4+2)/2 = 3; vA = 12/9 = 4/3; vB = 6/9 = 2/3; exact fit
    val r = Seq((1L, "A", 4L), (1L, "B", 2L)).toDF("u0", "i0", "r0")
    val out = Factorize.alsRank1(r, "u0", "i0", "r0", iters = 1)
      .collect().map(x => x.getString(0) ->
        (x.getDouble(1), x.getDouble(3))).toMap
    assert(out("A")._1 == 1.333333333333 && out("B")._1 == 0.666666666667)
    assert(out("A")._2 == 0.0) // rank-1 reproduces a rank-1 matrix
  }

  test("heapsFit: exact recovery of a planted power law") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // V = 2 * N^0.5 exactly at three points
    val g = Seq((100L, 20L), (400L, 40L), (10000L, 200L))
      .toDF("n_tokens_cum", "vocab_cum")
    val r = TextAnalysis.heapsFit(g, "n_tokens_cum", "vocab_cum").head()
    assert(r.getLong(0) == 3)
    assert(r.getDouble(1) == 0.5 && r.getDouble(2) == 2.0)
    assert(r.getDouble(3) == 1.0)
  }

  test("gappedSeq3Support: greedy witness finds only a->b->a") {
    import spark.implicits._
    import graft.operators.Funnel
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(m: Int) = new java.sql.Timestamp(base + m * 60000L)
    val ev = Seq((1L, "a", ts(1)), (1L, "b", ts(5)), (1L, "a", ts(10)))
      .toDF("user_id", "event_type", "ts")
    val r = Funnel.gappedSeq3Support(ev, topK = 10)
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2),
        x.getLong(3), x.getDouble(4)))
    assert(r.toSeq == Seq(("a", "b", "a", 1L, 1.0)))
  }

  test("alsRank2: near-exact fit on a rank-1 matrix, partition-invariant") {
    import spark.implicits._
    import graft.operators.Factorize
    val r = Seq((1L, 10L, 4L), (1L, 11L, 2L), (2L, 10L, 8L),
      (2L, 11L, 4L)).toDF("u0", "i0", "r0")
    def run(df: org.apache.spark.sql.DataFrame) =
      Factorize.alsRank2(df, "u0", "i0", "r0", iters = 2)
        .collect().map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2),
          x.getDouble(4))).sortBy(_._1).toSeq
    val a = run(r.repartition(1))
    // ridge shrinkage keeps rmse small but nonzero on a rank-1 matrix
    assert(a.head._4 < 0.5, s"rmse ${a.head._4}")
    assert(a == run(r.repartition(7)))
  }

  test("poissonTrend: flat series is an exact fixed point") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // 5 events on each of 6 days: init (ln 5, 0) has zero gradient
    val ev = (0 until 6).flatMap(d => (1 to 5).map(i =>
      (new java.sql.Timestamp(base + d * 86400000L + i * 1000L), "t")))
      .toDF("ts", "event_type")
    val r = TimeSeries.poissonTrend(ev, col("event_type"), col("ts"),
      iters = 3).head()
    assert(r.getLong(1) == 6)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 1.0)
    assert(math.abs(r.getDouble(2) - math.log(5.0)) < 1e-6)
  }

  test("poissonTrend: recovers a planted exponential growth rate") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val ev = (0 until 10).flatMap { d =>
      val n = math.round(10.0 * math.exp(0.1 * d)).toInt
      (1 to n).map(i =>
        (new java.sql.Timestamp(base + d * 86400000L + i * 1000L), "t"))
    }.toDF("ts", "event_type")
    val r = TimeSeries.poissonTrend(ev, col("event_type"), col("ts"),
      iters = 3).head()
    assert(math.abs(r.getDouble(3) - 0.1) < 0.02, s"b1 ${r.getDouble(3)}")
  }

  test("brier: uninformative model scores 0.25 with zero skill") {
    import spark.implicits._
    import graft.operators.Classifier
    val d = Seq((1L, "the and of", "en"), (2L, "der und das", "de"))
      .toDF("doc_id", "text", "lang")
    // bias-only zero weight -> margin 0 -> p = 0.5 everywhere
    val w = Seq((-1L, 0.0)).toDF("bucket", "weight")
    val r = Classifier.brier(d, "text", "doc_id", col("lang") === "en",
      w, nBuckets = 64).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 1)
    assert(r.getDouble(3) == 0.25 && r.getDouble(4) == 0.0)
  }

  test("ece: uninformative p=0.5 model has ECE = |0.5 - base_rate|") {
    import spark.implicits._
    import graft.operators.Classifier
    // 4 docs, 1 positive: all p=0.5 land in bin 5;
    // ECE = |4*0.5 - 1|/4 = 0.25; max bin gap identical
    val d = Seq((1L, "the and of", "en"), (2L, "a b", "de"),
      (3L, "c d", "de"), (4L, "e f", "de")).toDF("doc_id", "text", "lang")
    val w = Seq((-1L, 0.0)).toDF("bucket", "weight")
    val r = Classifier.ece(d, "text", "doc_id", col("lang") === "en", w)
      .head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 1)
    assert(r.getDouble(2) == 0.25 && r.getDouble(3) == 0.25)
  }

  test("conformal: uniform scores give full coverage at the threshold") {
    import spark.implicits._
    import graft.operators.Classifier
    // zero weights -> p=0.5 -> every score 0.5; threshold 0.5;
    // every test doc covered; both classes in every set -> size 2
    val d = (1L to 8L).map(i => (i, s"tok$i x", if (i <= 4) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val w = Seq((-1L, 0.0)).toDF("bucket", "weight")
    val r = Classifier.conformal(d, "text", "doc_id",
      col("lang") === "en", w, alpha = 0.1).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 4)
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 2.0)
  }

  test("diffInDiff: hand-computed four-cell estimate") {
    import spark.implicits._
    import graft.operators.Metrics
    // treated: 100 -> 300 cents; control: 100 -> 200
    // DiD = (3.00 - 1.00) - (2.00 - 1.00) = 1.00
    val units = Seq(
      (1, 1, 100L), (1, 2, 300L),
      (0, 1, 100L), (0, 2, 200L)).toDF("tr0", "pd0", "y0")
    val r = Metrics.diffInDiff(units, col("tr0"), col("pd0"), col("y0"))
      .head()
    assert(r.getLong(0) == 4)
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 3.0)
    assert(r.getDouble(5) == 1.0)
  }

  test("llrCollocations: perfect collocation dominates an independent pair") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // "aa bb" always together (5 times); "cc" pairs with varied words
    val docs = ((1 to 5).map(i => (i.toLong, "aa bb")) ++
      (6 to 10).map(i => (i.toLong, s"cc w$i cc v$i")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.llrCollocations(docs, "text", minCount = 5,
      topN = 5).collect()
    assert(r.nonEmpty)
    assert(r.head.getString(0) == "aa" && r.head.getString(1) == "bb")
    assert(r.head.getDouble(3) > 0)
  }

  test("embIsotropy: identical unit vectors have mean pairwise cos 1") {
    import spark.implicits._
    import graft.operators.Similarity
    val same = (1L to 5L).map(i => (i, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.embIsotropy(same, "embedding", "vec_id").head()
    assert(r.getLong(0) == 5 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
    // orthogonal pair in 2d: sum vector (1,1), s2 = 2, n = 2 -> cos 0
    val orth = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r2 = Similarity.embIsotropy(orth, "embedding", "vec_id").head()
    assert(r2.getDouble(2) == 0.0)
  }

  test("winsorizedStats: clipping pulls in a planted outlier") {
    import spark.implicits._
    import graft.operators.Metrics
    // 19 values of 1.00 + one 1000.00 outlier: p95 clip = 1.00
    // (ceil(0.95*20)=19th of 20 sorted), winsorized mean = 1.00
    val df = ((1 to 19).map(_ => ("t", 1.0)) :+ ("t", 1000.0))
      .toDF("g0", "v0")
    val r = Metrics.winsorizedStats(df, col("g0"), col("v0")).head()
    assert(r.getLong(1) == 20)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 50.95 && r.getDouble(5) == 1.0)
  }

  test("neymanAllocation: budget splits by N_h*S_h and sums exactly") {
    import spark.implicits._
    import graft.operators.Metrics
    // stratum a: high variance {0, 100}x5; stratum b: constant 50
    val rows = (1 to 5).flatMap(i => Seq(("a", 0L), ("a", 100L))) ++
      (1 to 10).map(_ => ("b", 50L))
    val df = rows.toDF("h0", "y0")
    val out = Metrics.neymanAllocation(df, col("h0"), col("y0"),
        budget = 10)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    // S_a = 50, S_b = 0 -> all 10 go to a
    assert(out("a") == 10 && out("b") == 0)
    assert(out.values.sum == 10)
  }

  test("olsByGroup: exact fit of a planted line") {
    import spark.implicits._
    import graft.operators.Metrics
    // y = 3x + 2 exactly over x in 0..4
    val df = (0L to 4L).map(x => ("g", x, 3 * x + 2)).toDF("g0", "x0", "y0")
    val r = Metrics.olsByGroup(df, col("g0"), col("x0"), col("y0")).head()
    assert(r.getLong(1) == 5)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 1.0)
  }

  test("exactPercentilesByGroup: nearest-rank thresholds") {
    import spark.implicits._
    import graft.operators.Metrics
    // values 1..10: p50 = 5th = 5, p90 = 9th = 9, p99 = ceil(9.9)=10th
    val df = (1L to 10L).map(v => ("g", v)).toDF("g0", "v0")
    val r = Metrics.exactPercentilesByGroup(df, col("g0"), col("v0"),
      Seq(50, 90, 99)).head()
    assert(r.getLong(1) == 10)
    assert(r.getLong(2) == 5 && r.getLong(3) == 9 && r.getLong(4) == 10)
  }

  test("sequentialRules: later-order pairs only, distinct customers") {
    import spark.implicits._
    import graft.operators.Basket
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // cust 1: order 10 (A) on day1, order 11 (B) on day2 -> A->B
    // cust 2: same pattern -> support 2; B->A never (no later order)
    val orders = Seq(
      (10L, 1L, d("2024-01-01")), (11L, 1L, d("2024-01-02")),
      (20L, 2L, d("2024-01-01")), (21L, 2L, d("2024-01-02")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq((10L, "A"), (11L, "B"), (20L, "A"), (21L, "B"))
      .toDF("l_orderkey", "l_partkey")
    val r = Basket.sequentialRules(li, orders, minSupport = 2, topK = 10)
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getDouble(3)))
    assert(r.toSeq == Seq(("A", "B", 2L, 1.0)))
  }

  test("cramersV: perfect association scores 1, independence 0") {
    import spark.implicits._
    import graft.operators.Metrics
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a0", "b0")
    val r1 = Metrics.cramersV(perfect, col("a0"), col("b0")).head()
    assert(r1.getLong(0) == 4 && r1.getDouble(4) == 1.0)
    // uniform 2x2 grid: observed == expected everywhere -> chi2 = 0
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a0", "b0")
    val r2 = Metrics.cramersV(indep, col("a0"), col("b0")).head()
    assert(r2.getDouble(3) == 0.0 && r2.getDouble(4) == 0.0)
  }

  test("stationary: converges to 2/3-1/3 on the self-loop chain") {
    import spark.implicits._
    import graft.operators.Graph
    // P(a,a)=.5, P(a,b)=.5, P(b,a)=1  =>  pi = (2/3, 1/3)
    val e = Seq(("a", "a", 1L), ("a", "b", 1L), ("b", "a", 2L))
      .toDF("s", "d", "w")
    val r = Graph.stationary(e, "s", "d", "w", iters = 12)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("a") - 2.0 / 3) < 1e-3)
    assert(math.abs(r("b") - 1.0 / 3) < 1e-3)
  }
}
