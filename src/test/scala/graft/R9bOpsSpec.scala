package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CmsSketch

/** Round-9 widening: Count–Min sketch (the fourth mergeable sketch —
  * the point-frequency primitive) and the session's new scan-side
  * operators. */
class R9bOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // order-independent SQL registration: getOrCreate may return a
    // session another suite built WITHOUT spark.sql.extensions, so
    // install directly into the live registry (the config path itself
    // is pinned by the isolated-session test below)
    GraftExtensions.install(s)
    s
  }

  import spark.implicits._

  /** 500 keys, key i occurring i+1 times — skewed, deterministic. */
  private lazy val freqDf: DataFrame =
    (0 until 500).flatMap(i => Seq.fill(i + 1)(s"key$i")).toDF("k")

  // ------------------------------------------------------- count–min

  test("cms_sketch: counter table is bit-identical under any partitioning") {
    def table(parts: Int): Seq[Long] =
      freqDf.repartition(parts)
        .agg(CmsSketch.cms_sketch(col("k"), 3, 10).as("t"))
        .head.getSeq[Long](0)
    val t1 = table(1)
    val t4 = table(4)
    val t13 = table(13)
    assert(t1 == t4 && t4 == t13,
      "CMS merge is elementwise addition — exact under any merge order")
    assert(t1.length == 3 * 1024)
    // every row of counters holds the full update mass
    val n = 500 * 501 / 2
    (0 until 3).foreach { r =>
      assert(t1.slice(r * 1024, (r + 1) * 1024).sum == n.toLong,
        s"row $r must sum to N=$n")
    }
  }

  test("cms_sketch: estimates are one-sided (est >= exact) with bounded overestimate") {
    val sketch = freqDf.agg(CmsSketch.cms_sketch(col("k"), 3, 10).as("t"))
    val exact = freqDf.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
    val est = exact.crossJoin(broadcast(sketch))
      .select(col("k"), col("cnt"),
        CmsSketch.cmsEstimate(col("t"), col("k"), 3, 10).as("est"))
      .collect()
    assert(est.length == 500)
    val n = 500 * 501 / 2
    est.foreach { row =>
      val (cnt, e) = (row.getLong(1), row.getLong(2))
      assert(e >= cnt, s"${row.getString(0)}: CMS never underestimates")
      // deterministic hash family => this generous epsilon*N bound
      // (epsilon = 5/w vs the e/w theory bound; the worst key in this
      // fixture lands at 382 = 3.1·N/w) is stable, not flaky
      assert(e - cnt <= 5L * n / 1024,
        s"${row.getString(0)}: overestimate ${e - cnt} too large")
    }
    // min-over-rows should beat any single row on aggregate: the mean
    // overestimate stays well under one row's expected collision mass N/w
    val meanOver = est.map(r => r.getLong(2) - r.getLong(1)).sum.toDouble / 500
    assert(meanOver <= n.toDouble / 1024, f"mean overestimate $meanOver%.1f")
  }

  test("cmsInnerProduct: join-size estimate is one-sided and near-exact when sparse") {
    val a = (0 until 100).flatMap(i => Seq.fill(i % 5 + 1)(s"u$i")).toDF("k")
    val b = (50 until 150).flatMap(i => Seq.fill(i % 3 + 1)(s"u$i")).toDF("k")
    val sa = a.agg(CmsSketch.cms_sketch(col("k"), 3, 10).as("ta"))
    val sb = b.agg(CmsSketch.cms_sketch(col("k"), 3, 10).as("tb"))
    val est = sa.crossJoin(sb)
      .select(CmsSketch.cmsInnerProduct(col("ta"), col("tb"), 3, 10))
      .head.getLong(0)
    // exact join size on the shared keys u50..u99
    val exact = (50 until 100).map(i => (i % 5 + 1).toLong * (i % 3 + 1)).sum
    assert(est >= exact, s"inner product never underestimates: $est vs $exact")
    // ~150 keys in 1024 cells: collisions are rare, estimate is tight
    assert(est <= exact + exact / 2, s"est $est too loose for a sparse table")
  }

  test("cms_sketch: SQL registration via GraftExtensions") {
    freqDf.createOrReplaceTempView("cms_in")
    val t = spark.sql(
      "SELECT cms_sketch(k, 3, 10) AS t FROM cms_in").head.getSeq[Long](0)
    assert(t.length == 3 * 1024 && t.slice(0, 1024).sum == 500L * 501 / 2)
  }

  test("spark.sql.extensions config path registers on a FRESH session") {
    // pin the production registration route (spark-submit --conf
    // spark.sql.extensions=graft.GraftExtensions). The conf value is
    // read off the SparkContext's STATIC conf at session build, and the
    // suite-shared context was created without it — so replicate the
    // two steps Spark's applyExtensions performs on that conf string
    // (load the class by name, zero-arg-instantiate as a
    // SparkSessionExtensions => Unit) and hand the result to the
    // builder; the injector then runs at session build, no install().
    spark // force the shared context up first
    val ext = Class.forName("graft.GraftExtensions",
        true, Thread.currentThread().getContextClassLoader)
      .getConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val fresh = SparkSession.builder()
        .master("local[4]")
        .withExtensions(ext)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val v = fresh.sql(
        "SELECT cms_sketch(k, 3, 10) AS t FROM VALUES ('a'),('a'),('b') t(k)")
        .head.getSeq[Long](0)
      assert(v.length == 3 * 1024 && v.slice(0, 1024).sum == 3L)
      assert(fresh.sql("SELECT ip4_to_int('10.0.0.1') AS v")
        .head.getLong(0) == 167772161L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("cms_sketch: rejects non-string keys at analysis time") {
    val e = intercept[Exception] {
      freqDf.select(length(col("k")).as("n"))
        .agg(CmsSketch.cms_sketch(col("n"), 3, 10)).collect()
    }
    assert(e.getMessage.contains("STRING") ||
      e.getMessage.toLowerCase.contains("type"), e.getMessage)
  }

  // --------------------------------------------- aho–corasick blocklist

  import graft.functions.MultiPatternStats

  /** Greedy leftmost non-overlapping count — the contract reference. */
  private def naiveCount(text: String, p: String): Long = {
    var n = 0L; var i = text.indexOf(p)
    while (i >= 0) { n += 1; i = text.indexOf(p, i + p.length) }
    n
  }

  test("multi_match: equals per-pattern indexOf greedy scan, incl. overlap shapes") {
    // classic AC fixture: patterns that are suffixes/prefixes of each
    // other, plus self-overlapping "aa" (non-overlap: "aaaa" -> 2)
    val pats = Seq("he", "she", "his", "hers", "aa")
    val texts = Seq(
      "ushers", "she sells seashells", "aaaa", "hishers",
      "", "xyz", "hehehehe", "shehisheraa aahers")
    val rows = texts.toDF("t")
      .select(col("t"), MultiPatternStats.multi_match(col("t"), pats).as("m"))
      .select(col("t"), col("m.total_hits"), col("m.n_patterns"),
        col("m.first_pattern"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val expTotal = pats.map(naiveCount(t, _)).sum
      val expN = pats.count(naiveCount(t, _) > 0)
      val expFirst = pats.zipWithIndex
        .map { case (p, i) => (t.indexOf(p), i, p) }
        .filter(_._1 >= 0)
        .sortBy { case (pos, i, _) => (pos, i) }
        .headOption.map(_._3).orNull
      assert(r.getLong(1) == expTotal, s"'$t' total")
      assert(r.getInt(2) == expN, s"'$t' n_patterns")
      assert(r.getString(3) == expFirst, s"'$t' first")
    }
  }

  test("multi_match: two occurrences in one projection codegen-compile cleanly") {
    // regression shape from the media fingerprint janino collision:
    // GenerateUnsafeProjection throws on codegen failure instead of
    // silently falling back to the interpreter
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, CreateNamedStruct, Literal}
    import org.apache.spark.sql.types.StringType
    val in = BoundReference(0, StringType, nullable = true)
    val e1 = MultiPatternStats(in, Seq("ab", "ba"))
    val e2 = MultiPatternStats(in, Seq("cd"))
    GenerateUnsafeProjection.generate(Seq(
      CreateNamedStruct(Seq(Literal("a"), e1, Literal("b"), e2))))
  }

  test("blocklist_hits: map-only plan, no exchanges, no UDFs") {
    val df = SparkEntry.queries("blocklist_hits")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p.take(600))
    assert(!p.contains("Join"), "scan-side gate must not join")
    assert(df.where(col("blocked")).count() > 0, "fixture phrases must hit")
  }

  // -------------------------------------------- readability / divergence

  import graft.operators.TextAnalysis

  test("readability: ARI from exact counts on a known fixture") {
    val df = Seq(
      (1L, "the cat sat on mats. it was a big cat!"),
      (2L, "word"),
      (3L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.readability(df, "text").collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    // chars: 29 non-ws; words: 10; sentences: 2
    assert(r1.getLong(1) == 29 && r1.getLong(2) == 10 && r1.getLong(3) == 2)
    val exp = math.floor((4.71 * 29.0 / 10 + 0.5 * 10.0 / 2 - 21.43) * 1e4 + 0.5) / 1e4
    assert(r1.getDouble(4) == exp)
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getLong(3) == 1, "no punctuation -> sentence floor 1")
    val r3 = out.find(_.getLong(0) == 3L).get
    assert(r3.isNullAt(4), "zero words -> null ARI, not a div-by-zero")
  }

  test("vocabDivergence: zero on identical halves, ~ln 2 on disjoint vocab") {
    val same = (0L until 40L).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val zero = TextAnalysis.vocabDivergence(same, "text",
      col("doc_id") % 2 === 0).head
    assert(zero.getDouble(1) == 0.0 && zero.getDouble(3) == 0.0)
    // halves share no tokens: JS approaches its ln(2) upper bound
    val disj = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) "aa bb cc dd" else "xx yy zz ww"))
      .toDF("doc_id", "text")
    val d = TextAnalysis.vocabDivergence(disj, "text",
      col("doc_id") % 2 === 0).head
    // add-one smoothing leaks ~1/(N+V) mass to the absent side at these
    // small counts, pulling JS (0.508 here) below the asymptotic ln 2
    assert(d.getDouble(3) > 0.4 && d.getDouble(3) <= math.log(2) + 1e-9,
      s"js=${d.getDouble(3)}")
    assert(d.getDouble(1) > 0 && d.getDouble(2) > 0)
  }

  test("vocabDivergence: quantized sums are partition-invariant") {
    val docs = (0L until 200L).map(i =>
      (i, s"tok${i % 37} tok${i % 11} tok${(i * 7) % 23} filler common"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.vocabDivergence(docs.repartition(1), "text",
      col("doc_id") % 2 === 0).head
    val b = TextAnalysis.vocabDivergence(docs.repartition(13), "text",
      col("doc_id") % 2 === 0).head
    assert(a == b, "long-quantized term sums must not move with partitioning")
  }

  test("text_readability: map-only plan, no exchanges") {
    val df = SparkEntry.queries("text_readability")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF") && !p.contains("Join"), p.take(600))
  }

  // ------------------------------------- cluster quality / knn outliers

  import graft.operators.Similarity

  /** Two tight, well-separated direction clusters + one isolated vector. */
  private lazy val clusteredVecs: DataFrame = {
    def mk(base: Array[Float], i: Int): Array[Float] =
      base.zipWithIndex.map { case (x, d) => x + 0.01f * ((i + d) % 3) }
    val a = (0 until 20).map(i => (i.toLong, mk(Array(1f, 0f, 0f, 0f), i)))
    val b = (0 until 20).map(i => (100L + i, mk(Array(0f, 1f, 0f, 0f), i)))
    val outlier = Seq((999L, Array(0f, 0f, 1f, 0f)))
    (a ++ b ++ outlier).toDF("vec_id", "embedding")
  }

  test("clusterSilhouette: high separation score on separated clusters, partition-invariant") {
    val two = clusteredVecs.filter(col("vec_id") < 500)
    val s1 = Similarity.clusterSilhouette(two.repartition(1),
      "embedding", "vec_id", k = 2, iters = 3).collect()
    val s7 = Similarity.clusterSilhouette(two.repartition(7),
      "embedding", "vec_id", k = 2, iters = 3).collect()
    assert(s1.toSeq == s7.toSeq, "quantized mean must not move with partitioning")
    assert(s1.length == 2)
    s1.foreach { r =>
      assert(r.getLong(1) == 20)
      assert(r.getDouble(2) > 0.8,
        s"cell ${r.getInt(0)}: separated clusters score high, got ${r.getDouble(2)}")
    }
  }

  test("knnDistOutliers: the isolated vector ranks first") {
    val out = Similarity.knnDistOutliers(clusteredVecs,
      "embedding", "vec_id", k = 5, topN = 3).collect()
    assert(out.head.getLong(0) == 999L, s"got ${out.map(_.getLong(0)).toSeq}")
    // orthogonal to both clusters: 5th-NN cosine near 0 vs near 1 inside
    assert(out.head.getDouble(1) < 0.1)
    assert(out(1).getDouble(1) > 0.9, "cluster members are dense")
  }

  test("emb_knn_outliers: TakeOrdered, no cartesian in the blocked sweep") {
    val df = SparkEntry.queries("emb_knn_outliers")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("CartesianProduct"), "blocked equi-join, not cartesian")
  }

  test("vocabMissingMass: Good-Turing N1/N and Chao1 on a counted fixture") {
    val df = Seq(
      ("en", "a a b c"),          // V=3 N=4 N1=2(b,c) N2=1(a? no a=2) ...
      ("fr", "x x x y y y"))      // V=2 N=6 N1=0 N2=0 -> mass 0, chao1 null
      .toDF("lang", "text")
    val out = TextAnalysis.vocabMissingMass(df, "lang", "text").collect()
    val en = out.find(_.getString(0) == "en").get
    // en: counts a=2, b=1, c=1 -> V=3, N=4, N1=2, N2=1
    assert(en.getLong(1) == 3 && en.getLong(2) == 4 &&
      en.getLong(3) == 2 && en.getLong(4) == 1)
    assert(en.getDouble(5) == 0.5)
    assert(en.getDouble(6) == 3 + 2.0 * 2 / (2.0 * 1)) // chao1 = V + N1^2/(2 N2)
    val fr = out.find(_.getString(0) == "fr").get
    assert(fr.getDouble(5) == 0.0 && fr.isNullAt(6),
      "no singletons -> zero missing mass; no doubletons -> no Chao1")
  }

  test("psiBetween: near-zero on identical distributions, large on a planted shift") {
    import graft.operators.Drift
    val base = (0 until 400).map(i => ("m", (i % 20).toDouble)).toDF("g", "x")
    val same = Drift.psiBetween(base, base, "g", "x", binWidth = 1.0).head
    assert(same.getDouble(2) == 0.0, s"identical halves drift 0, got $same")
    val shifted = (0 until 400).map(i => ("m", (i % 20) + 30.0)).toDF("g", "x")
    val far = Drift.psiBetween(base, shifted, "g", "x", binWidth = 1.0).head
    assert(far.getDouble(2) > 5.0, s"disjoint supports must alarm, got $far")
  }

  test("weightedSampleN: weight-proportional inclusion, no replacement, no zero-weight rows") {
    import graft.operators.Sampling
    // 400 strata, each with item A (weight 3) and item B (weight 1):
    // P(A sampled at n=1) = 3/4 — deterministic given the id hash
    val df = (0 until 400).flatMap { s =>
      Seq((s * 2L, s"s$s", "A", 3L), (s * 2L + 1, s"s$s", "B", 1L))
    }.toDF("doc_id", "stratum", "item", "w")
    val picked = Sampling.weightedSampleN(df, "doc_id", "stratum", "w", n = 1)
      .select("stratum", "item").collect()
    assert(picked.length == 400, "exactly one pick per stratum")
    val aShare = picked.count(_.getString(1) == "A") / 400.0
    assert(aShare > 0.65 && aShare < 0.85,
      s"weight-3 item should win ~75%, got $aShare")
    // without replacement at n = stratum size: every positive-weight row
    // exactly once; zero-weight rows never appear
    val withZero = df.withColumn("w",
      when(col("item") === "B", 0L).otherwise(col("w")))
    val all = Sampling.weightedSampleN(withZero, "doc_id", "stratum", "w", n = 2)
    assert(all.count() == 400 &&
      all.filter(col("item") === "B").count() == 0,
      "zero-weight rows are never sampled")
  }

  test("subwordVocab: counts and compression scores on a known fixture; TakeOrdered plan") {
    val df = Seq((1L, "abab abab"), (2L, "abab xy")).toDF("doc_id", "text")
    val out = TextAnalysis.subwordVocab(df, "text", minLen = 2, maxLen = 4,
      topV = 10, minCount = 2)
    val rows = out.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "abab" x3 tokens: each yields ab(2), ba(1), aba(1), bab(1), abab(1)
    assert(rows("ab") == (6L, 6L))
    assert(rows("abab") == (3L, 9L), "long piece scores len-1 per occurrence")
    assert(rows("aba") == (3L, 6L) && rows("bab") == (3L, 6L))
    assert(!rows.contains("xy"), "below the count floor")
    assert(out.head.getString(0) == "abab", "highest compression gain first")
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("corrMatrix: exact +1/-1 on linear columns, NULL on zero variance") {
    import graft.operators.Profile
    val df = (1 to 50).map { i =>
      (i.toDouble, 2.0 * i + 3, 100.0 - i, 7.0) }
      .toDF("x", "y2x", "neg", "konst")
    val out = Profile.corrMatrix(df, Seq("x", "y2x", "neg", "konst"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(out(("x", "y2x")) == 1.0)
    assert(out.get(("neg", "x")).orElse(out.get(("x", "neg"))).contains(-1.0))
    assert(out.get(("konst", "x")).orElse(out.get(("x", "konst"))).contains(null),
      "zero-variance column yields NULL, not NaN")
    assert(out.size == 6)
  }

  test("mutualInformation: 0 on independent, NMI 1 on identical columns") {
    import graft.operators.Metrics
    // perfectly independent uniform grid: every (a, b) cell equal count
    val ind = (0 until 400).map(i => (s"a${i % 4}", s"b${(i / 4) % 5}"))
      .toDF("u", "v")
    val mi0 = Metrics.mutualInformation(ind, col("u"), col("v")).head
    assert(mi0.getDouble(0) == 0.0, s"independent -> MI 0, got $mi0")
    // identical columns: MI = H(A), NMI = 1
    val same = (0 until 300).map(i => (s"k${i % 6}", s"k${i % 6}")).toDF("u", "v")
    val mi1 = Metrics.mutualInformation(same, col("u"), col("v")).head
    assert(mi1.getDouble(0) == mi1.getDouble(1), "MI(A;A) = H(A)")
    assert(math.abs(mi1.getDouble(3) - 1.0) < 1e-9, s"NMI 1, got $mi1")
  }

  // --------------------------------------------------------- cuped

  test("cuped: matches the closed-form reference; reduces variance on correlated units") {
    import java.sql.Timestamp
    import graft.operators.Metrics
    // per-user pre value x correlated with post value y = 2x + unit drift;
    // ts places each event deterministically before/after the midpoint
    val rows = (0 until 40).flatMap { u =>
      val x = 10.0 + (u % 7)
      val y = 2.0 * x + (u % 3)
      Seq((u.toLong, Timestamp.valueOf("2024-01-01 00:00:10"), x),
        (u.toLong, Timestamp.valueOf("2024-01-01 00:10:00"), y))
    }.toDF("user_id", "ts", "value")
    val out = Metrics.cuped(rows, col("ts"), col("user_id"),
      col("user_id") % 2, col("value")).head

    // closed-form reference on the unit frame (exact integer cents)
    val units = (0 until 40).map { u =>
      val x = math.floor((10.0 + (u % 7)) * 100 + 0.5).toLong
      val y = math.floor((2.0 * (10.0 + (u % 7)) + (u % 3)) * 100 + 0.5).toLong
      (u % 2, x, y)
    }
    val n = units.length.toLong
    val (sx, sy) = (units.map(_._2).sum, units.map(_._3).sum)
    val sxy = units.map(t => t._2 * t._3).sum
    val (sxx, syy) = (units.map(t => t._2 * t._2).sum, units.map(t => t._3 * t._3).sum)
    val theta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(out.getDouble(3) == math.rint(theta * 1e6) / 1e6 ||
      math.abs(out.getDouble(3) - theta) < 1e-6, s"theta ${out.getDouble(3)} vs $theta")
    // y is nearly a linear function of x => variance reduction ~ rho^2 high
    assert(out.getDouble(10) > 0.9, s"var_reduction ${out.getDouble(10)}")
    // adjusted diff exists and both arms have units
    assert(!out.isNullAt(9) && out.getLong(1) == 20 && out.getLong(2) == 20)
  }

  test("cuped: Var(X)=0 degenerates to NULL theta, raw means survive") {
    import java.sql.Timestamp
    import graft.operators.Metrics
    val rows = (0 until 10).flatMap { u =>
      Seq((u.toLong, Timestamp.valueOf("2024-01-01 00:00:10"), 5.0),
        (u.toLong, Timestamp.valueOf("2024-01-01 00:10:00"), (u % 4).toDouble))
    }.toDF("user_id", "ts", "value")
    val out = Metrics.cuped(rows, col("ts"), col("user_id"),
      col("user_id") % 2, col("value")).head
    assert(out.isNullAt(3) && out.isNullAt(6) && out.isNullAt(7),
      "constant X has no theta / adjusted means")
    assert(!out.isNullAt(4) && !out.isNullAt(5), "raw means still report")
  }

  test("q_cms_freq: top-k via TakeOrdered; sketch side broadcast") {
    val df = SparkEntry.queries("q_cms_freq")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("CartesianProduct"),
      "1-row sketch must broadcast, not cartesian")
    assert(df.count() == 10)
  }
}
