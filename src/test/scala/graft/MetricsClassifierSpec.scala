package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Classifier, Funnel, Metrics}

/** Model-in-the-loop curation: confusion-matrix metrics, rank-sum AUC,
  * and the in-engine LR trainer. Hand-checkable fixtures here; the
  * DuckDB oracles re-verify on the real corpus. */
class MetricsClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- classifierMetrics ----

  test("classifierMetrics: perfect classifier scores 1.0 everywhere, kappa 1") {
    import spark.implicits._
    val df = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("gold", "pred")
    val m = Metrics.classifierMetrics(df, "gold", "pred").collect()
    assert(m.forall(r => r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0 &&
      r.getDouble(6) == 1.0 && r.getDouble(7) == 1.0 && r.getDouble(8) == 1.0))
  }

  test("classifierMetrics: constant predictor has kappa 0") {
    import spark.implicits._
    // gold a/b 50:50, predicts always 'a': p_o = 0.5, p_e = 0.5, κ = 0.
    val df = Seq(("a", "a"), ("b", "a"), ("a", "a"), ("b", "a"))
      .toDF("gold", "pred")
    val m = Metrics.classifierMetrics(df, "gold", "pred").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("a").getDouble(8) == 0.0) // kappa
    assert(m("a").getDouble(4) == 0.5) // precision of 'a' = 2/4
    assert(m("a").getDouble(5) == 1.0) // recall of 'a' = 2/2
    assert(m("b").getLong(2) == 0L)    // n_pred for 'b'
    assert(m("b").getDouble(4) == 0.0 && m("b").getDouble(6) == 0.0)
  }

  test("classifierMetrics: hand-checked asymmetric confusion") {
    import spark.implicits._
    // gold: a×3 b×1; pred: a correct ×2, a→b ×1, b correct ×1
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
      .toDF("gold", "pred")
    val m = Metrics.classifierMetrics(df, "gold", "pred").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("a").getDouble(4) == 1.0)    // precision a = 2/2
    assert(m("a").getDouble(5) == 0.6667) // recall a = 2/3
    assert(m("b").getDouble(4) == 0.5)    // precision b = 1/2
    assert(m("a").getDouble(7) == 0.75)   // accuracy = 3/4
    // p_e = (3·2 + 1·2)/16 = 0.5 ⇒ κ = (0.75−0.5)/0.5 = 0.5
    assert(m("a").getDouble(8) == 0.5)
  }

  // ---- rankSumAuc ----

  test("rankSumAuc: perfect separation is 1.0, reversed is 0.0") {
    import spark.implicits._
    val up = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("s", "y")
    assert(Metrics.rankSumAuc(up, "s", col("y")).head().getDouble(2) == 1.0)
    val down = Seq((4L, false), (3L, false), (2L, true), (1L, true))
      .toDF("s", "y")
    assert(Metrics.rankSumAuc(down, "s", col("y")).head().getDouble(2) == 0.0)
  }

  test("rankSumAuc: all-tied scores give exactly 0.5 via average ranks") {
    import spark.implicits._
    val df = Seq((7L, true), (7L, false), (7L, true), (7L, false))
      .toDF("s", "y")
    val r = Metrics.rankSumAuc(df, "s", col("y")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.5)
  }

  test("rankSumAuc: partial tie hand-check") {
    import spark.implicits._
    // scores: 1(neg), 2(neg), 2(pos), 3(pos). avg rank of the 2-tie =
    // 2.5. R+ = 2.5 + 4 = 6.5 ⇒ AUC = (13 − 2·3)/(2·2·2) = 0.875
    val df = Seq((1L, false), (2L, false), (2L, true), (3L, true))
      .toDF("s", "y")
    assert(Metrics.rankSumAuc(df, "s", col("y")).head().getDouble(2) == 0.875)
  }

  // ---- averagePrecision ----

  test("averagePrecision: perfect ranking is 1.0; hand-checked mix") {
    import spark.implicits._
    val perfect = Seq((4L, true, 1L), (3L, true, 2L), (2L, false, 3L),
      (1L, false, 4L)).toDF("s", "y", "id")
    val p = Metrics.averagePrecision(perfect, "s", col("y"), col("id")).head()
    assert(p.getLong(0) == 4L && p.getLong(1) == 2L)
    assert(p.getDouble(2) == 1.0)
    // ranks desc: s=4 pos (P@1=1), s=3 neg, s=2 pos (P@3=2/3), s=1 neg
    // AP = (1 + 2/3)/2 = 0.833333 at the 1e-12 quantization
    val mix = Seq((4L, true, 1L), (3L, false, 2L), (2L, true, 3L),
      (1L, false, 4L)).toDF("s", "y", "id")
    val m = Metrics.averagePrecision(mix, "s", col("y"), col("id")).head()
    assert(m.getDouble(2) == 0.833333, m.toString)
  }

  test("averagePrecision: id tiebreak pins tied scores; no positives is NULL") {
    import spark.implicits._
    // all scores tied: order is by id — pos at ranks 1,3 of 4
    val tied = Seq((5L, true, 1L), (5L, false, 2L), (5L, true, 3L),
      (5L, false, 4L)).toDF("s", "y", "id")
    val t1 = Metrics.averagePrecision(tied, "s", col("y"), col("id")).head()
    assert(t1.getDouble(2) == 0.833333, t1.toString)
    // partition-invariance of the two-phase pass
    val t2 = Metrics.averagePrecision(tied.repartition(7), "s", col("y"),
      col("id")).head()
    assert(t1 == t2)
    val none = Seq((2L, false, 1L), (1L, false, 2L)).toDF("s", "y", "id")
    assert(Metrics.averagePrecision(none, "s", col("y"), col("id"))
      .head().isNullAt(2))
  }

  // ---- trainLogReg ----

  private def corpus = {
    import spark.implicits._
    // planted separable vocab: positives say "good", negatives "bad"
    (1 to 40).map { i =>
      if (i % 2 == 0) (i.toLong, "good stuff here", 1)
      else (i.toLong, "bad junk there", 0)
    }.toDF("id", "text", "y")
  }

  test("trainLogReg: learns to separate planted vocab (train acc 100%)") {
    val w = Classifier.trainLogReg(corpus, "text", "id", col("y") === 1,
      nBuckets = 64, iters = 3, lr = 1.0)
    val scored = Classifier.scoreLogReg(corpus, "text", "id", w, nBuckets = 64)
      .join(corpus.select(col("id"), col("y")), "id")
    val acc = scored
      .filter((col("margin") > 0) === (col("y") === 1)).count()
    assert(acc == 40L, s"train accuracy ${acc}/40")
  }

  test("trainLogReg: weights are partition-invariant (12-dp contract)") {
    val w1 = Classifier.trainLogReg(corpus.repartition(1), "text", "id",
      col("y") === 1, nBuckets = 64, iters = 3, lr = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w7 = Classifier.trainLogReg(corpus.repartition(7), "text", "id",
      col("y") === 1, nBuckets = 64, iters = 3, lr = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w1 == w7)
  }

  test("LrModel: save → load → scoreOf matches in-memory scoring") {
    val m = Classifier.LrModel.train(corpus, "text", "id", col("y") === 1,
      nBuckets = 64, iters = 3)
    val dir = java.nio.file.Files.createTempDirectory("lr_model").toString
    m.save(dir)
    val loaded = Classifier.LrModel.load(spark, dir)
    assert(loaded.nBuckets == 64)
    val a = m.scoreOf(corpus, "text", "id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = loaded.scoreOf(corpus, "text", "id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("LrModel.refine: warm start keeps absent buckets, novel buckets enter") {
    import spark.implicits._
    val m = Classifier.LrModel.train(corpus, "text", "id", col("y") === 1,
      nBuckets = 64, iters = 3)
    val dir = java.nio.file.Files.createTempDirectory("lr_refine").toString
    m.save(dir)
    val w0 = m.weights.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the refinement batch shares NO vocabulary with the corpus
    val batch = (1 to 10).map(i =>
      (1000L + i, if (i % 2 == 0) "novel positive words" else "other negative words",
        i % 2 == 0)).toDF("id", "text", "y")
    val m2 = m.refine(dir, batch, "text", "id", col("y"), iters = 2)
    val w1 = m2.weights.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // original vocab buckets absent from the batch keep their weight
    assert(w0.filter { case (k, _) => k != -1L && !w1.contains(k) }.isEmpty)
    val kept = (w0.keySet - (-1L)).filter(k => w1.contains(k) && w0(k) != 0.0)
    // batch vocab hashes to different buckets with overwhelming odds;
    // any shared bucket would be a collision — require MOST kept
    assert(kept.count(k => w1(k) == w0(k)) >= kept.size - 2,
      "absent buckets must keep their weights")
    // the persisted model was overwritten with the refined weights
    val reloaded = Classifier.LrModel.load(spark, dir).weights.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(reloaded == w1)
    assert(w1.size >= w0.size, "novel buckets enter the vector")
  }

  test("LrModel.gate: keeps rows above the margin threshold, schema intact") {
    val m = Classifier.LrModel.train(corpus, "text", "id", col("y") === 1,
      nBuckets = 64, iters = 3)
    val gated = m.gate(corpus, "text", "id", threshold = 0.0)
    assert(gated.columns.toSeq == corpus.columns.toSeq)
    val keptY = gated.select(col("y")).distinct().collect().map(_.getInt(0))
    assert(keptY.toSeq == Seq(1), "only positives clear the 0 threshold")
    assert(gated.count() == 20)
  }

  test("calibration: bins partition the corpus and rates are hand-checkable") {
    val w = Classifier.trainLogReg(corpus, "text", "id", col("y") === 1,
      nBuckets = 64, iters = 3)
    val cal = Classifier.calibration(corpus, "text", "id", col("y") === 1,
      w, nBuckets = 64, nBins = 10).collect()
    assert(cal.map(_.getLong(1)).sum == 40L, "bins must partition the corpus")
    // planted vocab separates perfectly: every doc's bin is pure
    cal.foreach { r =>
      val obs = r.getDouble(3)
      assert(obs == 0.0 || obs == 1.0, s"pure corpus must give pure bins: $r")
      val meanP = r.getDouble(2)
      // predicted mass must sit on the same side as the observations
      assert((obs == 1.0) == (meanP > 0.5), s"calibrated side: $r")
    }
  }

  test("topPaths: counts 3-step paths per user with top-k tie-break") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Int) = new java.sql.Timestamp(ts.getTime + sec * 1000L)
    // user 1: a b c d  → paths abc, bcd ; user 2: a b c → abc
    val ev = Seq(
      (1L, 1L, "a", at(0)), (2L, 1L, "b", at(1)), (3L, 1L, "c", at(2)),
      (4L, 1L, "d", at(3)),
      (5L, 2L, "a", at(0)), (6L, 2L, "b", at(1)), (7L, 2L, "c", at(2))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.operators.Funnel.topPaths(ev, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.head == ("a", "b", "c", 2L))
    assert(out.toSet == Set(("a", "b", "c", 2L), ("b", "c", "d", 1L)))
  }

  test("kaplanMeier: hand-checked curve with a censored user at risk") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(ts.getTime + min * 60000L)
    // u1 converts in hour 1, u2+u4 in hour 2, u3 never (censored at the
    // corpus horizon 02:30 → duration 2, still at risk through hour 2)
    val ev = Seq(
      (1L, 1L, "view", at(0)), (2L, 1L, "purchase", at(90)),
      (3L, 2L, "view", at(0)), (4L, 2L, "purchase", at(130)),
      (5L, 3L, "view", at(0)),
      (6L, 4L, "view", at(0)), (7L, 4L, "purchase", at(150))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val km = graft.operators.Survival.kaplanMeier(ev, "purchase")
      .orderBy(col("dur_h")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // S(1) = 1 − 1/4 = 0.75 ; S(2) = 0.75 · (1 − 2/3) = 0.25
    assert(km.toSeq == Seq((1L, 4L, 1L, 0.75), (2L, 3L, 2L, 0.25)))
  }

  test("kaplanMeier: all-remaining-convert tail hits exactly 0.0") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(ts.getTime + min * 60000L)
    val ev = Seq(
      (1L, 1L, "view", at(0)), (2L, 1L, "purchase", at(10)),
      (3L, 2L, "view", at(0)), (4L, 2L, "purchase", at(20))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val km = graft.operators.Survival.kaplanMeier(ev, "purchase").collect()
    assert(km.length == 1 && km.head.getDouble(3) == 0.0 &&
      km.head.getLong(2) == 2L)
  }

  test("numericProfile: completeness/cardinality/range per column in one pass") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, 10.0), (null, 30.0), (2.0, null))
      .toDF("a", "b")
    val p = graft.operators.Profile.numericProfile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("a").getLong(1) == 4L && p("a").getLong(2) == 1L &&
      p("a").getLong(3) == 2L)
    assert(p("a").getDouble(4) == 1.0 && p("a").getDouble(5) == 2.0)
    assert(p("a").getDouble(6) == 1.6667) // mean of 1,2,2
    assert(p("b").getLong(2) == 1L && p("b").getDouble(6) == 16.6667)
    // one row per column, never per data row
    assert(graft.operators.Profile.numericProfile(df, Seq("a")).count() == 1L)
  }

  test("twoProportionZ: hand-checked z and NULL on the degenerate case") {
    import spark.implicits._
    // A: 5/10 convert, B: 2/10. pooled p = 0.35, se = √(0.2275·0.2),
    // z = 0.3/0.2133074 = 1.4064
    val units = ((1 to 10).map(i => (0, i <= 5)) ++
      (1 to 10).map(i => (1, i <= 2))).toDF("v", "f")
    val r = graft.operators.Metrics.twoProportionZ(units, col("v"), col("f"))
      .head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 0.5 && r.getDouble(5) == 0.2)
    assert(r.getDouble(6) == 0.3 && r.getDouble(7) == 1.4064)
    // everyone converts: pooled variance 0 ⇒ z undefined, NULL not error
    val sat = Seq((0, true), (1, true)).toDF("v", "f")
    assert(graft.operators.Metrics.twoProportionZ(sat, col("v"), col("f"))
      .head().isNullAt(7))
  }

  test("chiSquare: hand-checked 2x2 and zero-cell grid materialization") {
    import spark.implicits._
    // O = [[10,20],[20,10]] ⇒ E = 15 everywhere ⇒ χ² = 4·25/15 = 6.6667
    val df = (Seq.fill(10)(("x", 0)) ++ Seq.fill(20)(("x", 1)) ++
      Seq.fill(20)(("y", 0)) ++ Seq.fill(10)(("y", 1))).toDF("r", "c")
    val r1 = graft.operators.Metrics.chiSquare(df, col("r"), col("c")).head()
    assert(r1.getDouble(0) == 6.6667 && r1.getLong(1) == 1L)
    // (y,1) never occurs: its E = 2.5 still contributes (0−E)²/E = 2.5;
    // χ² = 0.8333+2.5+0.8333+2.5 = 6.6667 (an absent-cell implementation
    // would read 4.1667)
    val dz = (Seq.fill(5)(("x", 0)) ++ Seq.fill(5)(("x", 1)) ++
      Seq.fill(10)(("y", 0))).toDF("r", "c")
    val r2 = graft.operators.Metrics.chiSquare(dz, col("r"), col("c")).head()
    assert(r2.getDouble(0) == 6.6667 && r2.getLong(1) == 1L)
  }

  test("fimTransform: PSM pieces reassemble the original; short docs pass through") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "tiny")).toDF("doc_id", "text")
    val out = graft.operators.Packing.fimTransform(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val orig = "the quick brown fox jumps over the lazy dog again and again"
    val r1 = out(1L)
    val fim = r1.getString(4)
    val pre = fim.stripPrefix("<|fim_prefix|>").split("<\\|fim_suffix\\|>")(0)
    val suf = fim.split("<\\|fim_suffix\\|>")(1).split("<\\|fim_middle\\|>")(0)
    val mid = fim.split("<\\|fim_middle\\|>")(1)
    assert(pre + mid + suf == orig, "P+M+S must reassemble the doc")
    assert(pre.length == r1.getLong(2) && mid.nonEmpty &&
      mid.length == (r1.getLong(3) - r1.getLong(2)))
    assert(suf.length >= orig.length / 3 - 1, "suffix keeps >= ~a third")
    // short doc: untouched, null pivots
    assert(out(2L).getString(4) == "tiny" && out(2L).isNullAt(2))
  }

  test("triangleStats: hand-checked triangle, wedge, and coefficient counts") {
    import spark.implicits._
    // K3 on {1,2,3} plus pendant edge (3,4): Δ=1, wedges = 1+1+3+0 = 5,
    // C = 3/5 = 0.6. Duplicate + reversed edges must canonicalize away.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (2L, 1L),
      (1L, 2L)).toDF("a", "b")
    val r = graft.operators.Graph.triangleStats(edges, "a", "b").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 1L && r.getDouble(3) == 0.6)
    // triangle-free graph: zero triangles, zero coefficient
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r2 = graft.operators.Graph.triangleStats(path, "a", "b").head()
    assert(r2.getLong(2) == 0L && r2.getDouble(3) == 0.0)
  }

  test("expSmoothing: hand-checked fold, init-from-first, order-independence") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(h: Int) = new java.sql.Timestamp(ts.getTime + h * 3600000L)
    // hour counts per type "a": [2, 1, 4] ⇒ s1=2, s2=0.3+1.4=1.7,
    // s3=1.2+1.19=2.39
    val rows = Seq.fill(2)(("a", at(0))) ++ Seq(("a", at(1))) ++
      Seq.fill(4)(("a", at(2)))
    val ev = rows.zipWithIndex
      .map { case ((k, t0), i) => (i.toLong, k, t0) }
      .toDF("event_id", "event_type", "ts")
    val out = graft.operators.TimeSeries.expSmoothing(ev).head()
    assert(out.getLong(1) == 3L && out.getDouble(2) == 2.39)
    // shuffled input order folds identically (sort_array fixes it)
    val out2 = graft.operators.TimeSeries
      .expSmoothing(ev.orderBy(rand(42))).head()
    assert(out2.getDouble(2) == 2.39)
    // single bucket: level = the first (only) count
    val one = Seq((1L, "b", at(0)), (2L, "b", at(0)))
      .toDF("event_id", "event_type", "ts")
    assert(graft.operators.TimeSeries.expSmoothing(one).head()
      .getDouble(2) == 2.0)
  }

  test("associationRules: hand-checked support/confidence/lift; quantity rows don't inflate") {
    import spark.implicits._
    // orders: {1:AB, 2:AB, 3:ABC, 4:C} with item A duplicated in order 1
    // (two lineitem rows) — support must stay DISTINCT-based.
    val rows = Seq((1L, "A"), (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "C"), (4L, "C"))
    val df = rows.toDF("o", "p")
    val out = graft.operators.Basket.associationRules(df, "o", "p",
      minSupport = 2, topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // (A,B): support 3, conf 3/3 = 1.0, lift = 3·4/(3·3) = 1.3333
    assert(out(("A", "B")) == (3L, 1.0, 1.3333))
    assert(!out.contains(("A", "C")), "support 1 must prune at minSupport 2")
  }

  test("cohortLtv: revenue accumulates per cohort over age") {
    import spark.implicits._
    val d0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(day: Int) = new java.sql.Timestamp(d0.getTime + day * 86400000L)
    val ev = Seq(
      (1L, 1L, "view", at(0), 0.0), (2L, 1L, "purchase", at(0), 10.0),
      (3L, 1L, "purchase", at(2), 5.0),
      (4L, 2L, "signup", at(1), 0.0), (5L, 2L, "purchase", at(3), 7.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val m = Funnel.cohortLtv(ev).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(m(("2024-01-01", 0)) == (1L, 10.0, 10.0))
    assert(m(("2024-01-01", 2)) == (1L, 5.0, 15.0))
    assert(m(("2024-01-02", 2)) == (1L, 7.0, 7.0))
  }

  test("gini: 0 on perfect equality, known value on hand distribution") {
    import spark.implicits._
    val eq = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0)).toDF("id", "v")
    assert(Metrics.gini(eq, "v", "id").head().getDouble(2) == 0.0)
    // x = [1,2,3,4]: G = 2·(1+4+9+16)/(4·10) − 5/4 = 1.5 − 1.25 = 0.25
    val sk = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("id", "v")
    assert(Metrics.gini(sk, "v", "id").head().getDouble(2) == 0.25)
    // one unit holds everything: G = (n−1)/n
    val mono = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 12.0)).toDF("id", "v")
    assert(Metrics.gini(mono, "v", "id").head().getDouble(2) == 0.75)
  }

  test("diversity: uniform maximizes entropy, degenerate collapses") {
    import spark.implicits._
    val uni = (1 to 40).map(i => s"s${i % 4}").toDF("k")
    val r = Metrics.diversity(uni, "k").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 40L)
    assert(r.getDouble(2) ==
      BigDecimal(math.log(4.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(r.getDouble(3) == 0.25 && r.getDouble(4) == 4.0)
    val one = Seq.fill(10)("only").toDF("k")
    val r1 = Metrics.diversity(one, "k").head()
    assert(r1.getDouble(2) == 0.0 && r1.getDouble(3) == 1.0 &&
      r1.getDouble(4) == 1.0)
  }

  test("zOrderWrite: files cover rectangles — both columns prune, not just the leading one") {
    import spark.implicits._
    import graft.operators.Maintenance
    // 64×64 grid: every (a, b) point once
    val grid = (for { a <- 0 until 64; b <- 0 until 64 }
      yield (a.toLong, b.toLong)).toDF("a", "b")
    def avgRange(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy(col("f"))
        .agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getLong(1))
      spans.sum.toDouble / spans.length
    }
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    val linDir = java.nio.file.Files.createTempDirectory("lin").toString
    Maintenance.zOrderWrite(grid, "a", "b", nFiles = 16, zDir, bits = 6)
    Maintenance.writeSorted(grid, Seq("a"), nFiles = 16, linDir)
    // linear sort by a: each file is a slab — full b range (~63) per
    // file; z-order: each file is a ~16×16 rectangle — both ranges small
    assert(avgRange(linDir, "b") > 50.0, "slab baseline sanity")
    assert(avgRange(zDir, "a") < 32.0 && avgRange(zDir, "b") < 32.0,
      s"z-order must bound BOTH dims: a=${avgRange(zDir, "a")} b=${avgRange(zDir, "b")}")
    // nothing lost in the rewrite
    assert(spark.read.parquet(zDir).count() == 64L * 64L)
  }

  test("zValue: hand-checked interleave") {
    import spark.implicits._
    import graft.operators.Maintenance
    // a=0b11 (even positions), b=0b01 (odd): z = 1 + 2·1 + 4·1 + 8·0 = 7
    val df = Seq((3L, 1L)).toDF("a", "b")
    assert(df.select(Maintenance.zValue(col("a"), col("b"), 4))
      .head().getLong(0) == 7L)
    // pure a ⇒ even bits only; pure b ⇒ odd bits only
    val d2 = Seq((15L, 0L), (0L, 15L)).toDF("a", "b")
    val zs = d2.select(Maintenance.zValue(col("a"), col("b"), 4))
      .collect().map(_.getLong(0)).toSet
    assert(zs == Set(0x55L, 0xAAL))
  }

  test("benfordProfile: exact digit extraction, shares sum to 1, Benford data fits") {
    import spark.implicits._
    import graft.operators.Profile
    // values crossing scales; 0.095 → 9.5 cents → HALF_UP 10 cents →
    // digit 1 (cents-domain extraction, not the raw string);
    // non-positive rows drop
    val df = Seq(1.23, 12.3, 123.0, 9999.99, 0.095, -5.0, 0.0).toDF("v")
    val p = Profile.benfordProfile(df, "v").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(p == Map(1 -> 4L, 9 -> 1L))
    val shares = Profile.benfordProfile(df, "v").collect()
      .map(_.getDouble(2)).sum
    assert(math.abs(shares - 1.0) < 1e-3)
    // a geometric series IS Benford-distributed: deviations stay small
    val geo = (0 until 2000).map(i => math.pow(1.007, i)).toDF("v")
    val dev = Profile.benfordProfile(geo, "v").collect()
      .map(r => math.abs(r.getDouble(4))).max
    assert(dev < 0.02, s"geometric series must fit Benford, max dev $dev")
  }

  test("clusterSafeFolds: twins share a fold; folds bounded and populated") {
    import spark.implicits._
    import graft.operators.Sampling
    val docs = (1L to 400L).toDF("doc_id")
    // clusters: (2i, 2i+1) are twins
    val clusters = (1L to 400L).map(i => (i, i / 2 * 2))
      .toDF("doc_id", "cluster_id")
    val f = Sampling.clusterSafeFolds(docs, "doc_id", clusters, "doc_id",
      "cluster_id", k = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(f.values.forall(v => v >= 0 && v < 5))
    assert((1L to 199L).forall(i => f(2 * i) == f(2 * i + 1)),
      "near-twins must share a fold")
    assert(f.values.toSet.size == 5, "all folds populated at this scale")
  }

  test("robust stats convention: nearest-rank-lower median and MAD") {
    import spark.implicits._
    // values [1, 2, 100, 1000]: n=4, idx = floor(1.5)+1 = 2 ⇒ median 2;
    // deviations sorted [0, 1, 98, 998] ⇒ mad = 1. The outliers that
    // wreck mean/stddev leave median/MAD at the bulk.
    val ev = Seq(1.0, 2.0, 100.0, 1000.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "t", v) }
      .toDF("event_id", "event_type", "value")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val g = ev.groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("value"))).as("v"),
        count(lit(1)).as("n"))
    val idx = (floor(lit(0.5) * (col("n") - 1)) + 1).cast("int")
    val r = g.withColumn("m", element_at(col("v"), idx))
      .withColumn("dv", sort_array(transform(col("v"), x => abs(x - col("m")))))
      .select(col("m"), element_at(col("dv"), idx)).head()
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 1.0)
  }

  test("funnelStageLatency: hand-checked gaps over the earliest-completion chain") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Int) = new java.sql.Timestamp(ts.getTime + sec * 1000L)
    // u1: a@0 → b@10 (gap 10 s); u2: a@0 → b@30 (gap 30 s); u3: a only
    val ev = Seq(
      (1L, 1L, "a", at(0)), (2L, 1L, "b", at(10)),
      (3L, 2L, "a", at(0)), (4L, 2L, "b", at(30)),
      (5L, 3L, "a", at(0))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Funnel.funnelStageLatency(ev, Seq("a", "b")).head()
    assert(out.getLong(2) == 2L)
    // sorted gaps [10, 30]: p50 idx = floor(0.5)+1 = 1 ⇒ 10 s;
    // p90 idx = floor(0.9)+1 = 1 ⇒ 10 s (nearest-rank-lower at n=2)
    assert(out.getDouble(3) == 10.0 && out.getDouble(4) == 10.0)
  }

  test("degreeHistogram: canonicalized degrees; shares sum to 1") {
    import spark.implicits._
    // K3 + pendant (with a duplicate + reversed edge): degrees
    // {1:2, 2:2, 3:3, 4:1} ⇒ histogram {1→1, 2→2, 3→1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (2L, 1L))
      .toDF("a", "b")
    val h = graft.operators.Graph.degreeHistogram(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(h.view.mapValues(_._1).toMap == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    assert(math.abs(h.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("topShares: hand-checked concentration with ceil top-k counts") {
    import spark.implicits._
    // 10 units: one holds 91, the rest 1 each. top-1% of 10 = ceil(0.1)
    // = 1 unit ⇒ 91/100; top-20% = 2 units ⇒ 92/100.
    val df = ((1L, 91.0) +: (2L to 10L).map(i => (i, 1.0))).toDF("id", "v")
    val r = Metrics.topShares(df, "v", "id").head()
    assert(r.getLong(0) == 10L && r.getDouble(1) == 100.0)
    assert(r.getDouble(2) == 0.91 && r.getDouble(5) == 0.92)
    // uniform: top-p% holds exactly ceil(n·p/100)/n of the mass
    val u = (1L to 100L).map(i => (i, 2.0)).toDF("id", "v")
    val ru = Metrics.topShares(u, "v", "id").head()
    assert(ru.getDouble(2) == 0.01 && ru.getDouble(5) == 0.2)
  }

  test("zipfProfile: harmonic corpus slopes to -1, uniform corpus is flat") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // token w_k appears floor(1000/k) times: frequencies ARE 1/rank
    val harmonic = (1 to 50).flatMap(k =>
      Seq.fill(1000 / k)(s"w$k")).mkString(" ")
    val hz = TextAnalysis.zipfProfile(Seq(harmonic).toDF("text"), "text")
      .head()
    assert(math.abs(hz.getDouble(1) - (-1.0)) < 0.05,
      s"harmonic slope ${hz.getDouble(1)}")
    // every token equally frequent: slope ~ 0
    val uniform = (1 to 50).flatMap(k => Seq.fill(20)(s"u$k")).mkString(" ")
    val uz = TextAnalysis.zipfProfile(Seq(uniform).toDF("text"), "text")
      .head()
    assert(math.abs(uz.getDouble(1)) < 0.01, s"uniform slope ${uz.getDouble(1)}")
    assert(uz.getLong(0) == 50L)
  }

  test("trainLogReg: bias-only corpus converges toward the base rate") {
    import spark.implicits._
    // identical text everywhere: only the shared buckets + bias can
    // move, and they move toward log-odds of the 25% positive rate
    // (negative margin for every doc)
    val df = (1 to 40).map(i => (i.toLong, "same same", i % 4 == 0))
      .toDF("id", "text", "y")
    val w = Classifier.trainLogReg(df, "text", "id", col("y"),
      nBuckets = 64, iters = 3, lr = 1.0)
    val margins = Classifier.scoreLogReg(df, "text", "id", w, nBuckets = 64)
      .select(col("margin")).distinct().collect()
    assert(margins.length == 1 && margins.head.getDouble(0) < 0)
  }
}
