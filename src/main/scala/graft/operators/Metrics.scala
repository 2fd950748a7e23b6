package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation metrics for model-in-the-loop curation: once a classifier
  * (lang-id, quality gate, the trained LR of [[Classifier]]) scores the
  * corpus, these quantify it — per-class precision/recall/F1 with
  * corpus accuracy and Cohen's κ from the confusion matrix, and
  * tie-corrected Mann–Whitney AUC for ranking scores.
  *
  * Everything reduces to integer counts first (one corpus-sized
  * aggregation), then does its handful of divisions on the tiny
  * classes²- or distinct-scores-sized frame — so results are exact and
  * engine-replayable, no sampling, no double summation over the scan.
  */
object Metrics {

  /** Per-class precision/recall/F1 from a (gold, pred) frame, with
    * corpus accuracy and Cohen's κ repeated on every row (they ride the
    * 1-row aggregate cross-joined in — the documented tiny-broadcast
    * pattern). Classes = union of gold and predicted labels; undefined
    * ratios (no predictions / no gold for a class) come out 0.0.
    *
    * κ = (p_o − p_e)/(1 − p_e) with p_e = Σ_c g_c·p_c / N² — the
    * products run in double (g·p overflows long at ~3·10⁹ rows/class).
    */
  def classifierMetrics(df: DataFrame, goldCol: String,
                        predCol: String): DataFrame = {
    val cm = df.select(col(goldCol).as("gold"), col(predCol).as("pred"))
      .groupBy(col("gold"), col("pred")).agg(count(lit(1)).as("n"))
    val g = cm.groupBy(col("gold").as("label")).agg(sum("n").as("n_gold"))
    val p = cm.groupBy(col("pred").as("label")).agg(sum("n").as("n_pred"))
    val tp = cm.filter(col("gold") === col("pred"))
      .select(col("gold").as("label"), col("n").as("n_correct"))
    val per = g.join(p, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left")
      .na.fill(0L, Seq("n_gold", "n_pred", "n_correct"))
    val tot = cm.agg(sum("n").as("n_total"),
      sum(when(col("gold") === col("pred"), col("n")).otherwise(lit(0L)))
        .as("n_ok"))
    val pe = per.agg(
      sum(col("n_gold").cast("double") * col("n_pred")).as("pe_num"))
    val prec = when(col("n_pred") > 0,
      col("n_correct").cast("double") / col("n_pred")).otherwise(lit(0.0))
    val rec = when(col("n_gold") > 0,
      col("n_correct").cast("double") / col("n_gold")).otherwise(lit(0.0))
    val f1 = when(prec + rec > 0,
      lit(2.0) * prec * rec / (prec + rec)).otherwise(lit(0.0))
    val po = col("n_ok").cast("double") / col("n_total")
    val peC = col("pe_num") /
      (col("n_total").cast("double") * col("n_total"))
    per.crossJoin(broadcast(tot)).crossJoin(broadcast(pe))
      .select(col("label"), col("n_gold"), col("n_pred"), col("n_correct"),
        round(prec, 4).as("precision"), round(rec, 4).as("recall"),
        round(f1, 4).as("f1"),
        round(po, 4).as("accuracy"),
        round((po - peC) / (lit(1.0) - peC), 4).as("kappa"))
  }

  /** Distributed global rank over `sortCols` (unique per row) — the
    * two-phase range-partitioned rank, shared machinery in
    * [[Ranks.globalRank]]. */
  private def globalRank(df: DataFrame, sortCols: Seq[Column],
                         rankName: String): DataFrame =
    Ranks.globalRank(df, sortCols, rankName)

  /** Gini coefficient of a non-negative value distribution (revenue
    * concentration, source-size inequality):
    * `G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n` over ascending ranks.
    * Values round to cents BEFORE ranking so the sort order is
    * engine-stable (the exact-cents discipline); rank ties break on
    * the unit id. One unit-keyed agg, a range-partitioned two-phase
    * [[globalRank]] (no single-task sort of the units frame), one
    * final aggregation. */
  def gini(units: DataFrame, valueCol: String, idCol: String): DataFrame = {
    val v = units.select(col(idCol).as("id"),
      round(col(valueCol), 2).as("x"))
    globalRank(v, Seq(col("x"), col("id")), "i")
      .agg(count(lit(1)).as("n"), round(sum(col("x")), 2).as("total"),
        sum(col("i").cast("double") * col("x")).as("ix"))
      .select(col("n"), col("total"),
        round(lit(2.0) * col("ix") / (col("n") * col("total")) -
          (col("n") + lit(1.0)) / col("n"), 6).as("gini"))
  }

  /** Pareto concentration: the revenue share held by the top 1/5/10/20
    * percent of units — the interpretable cut-point companion to
    * [[gini]]. Top-k counts are exact integers (⌈n·p/100⌉ =
    * (n·p+99) div 100); values round to cents before the
    * (value desc, id) ranking so the order is engine-stable. One
    * range-partitioned two-phase [[globalRank]] (no single-task sort),
    * one conditional aggregation. */
  def topShares(units: DataFrame, valueCol: String, idCol: String,
                pcts: Seq[Int] = Seq(1, 5, 10, 20)): DataFrame = {
    val v = units.select(col(idCol).as("id"),
      round(col(valueCol), 2).as("x"))
    val ranked = globalRank(v, Seq(col("x").desc, col("id")), "rk")
    val tot = ranked.agg(count(lit(1)).as("n"),
      round(sum(col("x")), 2).as("total"))
    val shares = pcts.map { p =>
      round(sum(when(col("rk") <= expr(s"(n * $p + 99) DIV 100"), col("x"))
        .otherwise(lit(0.0))) / col("total"), 6).as(s"top${p}_share")
    }
    ranked.crossJoin(broadcast(tot))
      .groupBy(col("n"), col("total"))
      .agg(shares.head, shares.tail: _*)
  }

  /** Diversity indices of a categorical distribution (corpus source
    * mixture, label balance): Shannon entropy H = −Σ p·ln p, Simpson
    * index Σ p², and the effective category count e^H. One group
    * count over the scan; everything else on the categories frame. */
  def diversity(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum(col("c")).as("n_total"))
    counts.crossJoin(broadcast(tot))
      .select((col("c").cast("double") / col("n_total")).as("p"),
        col("n_total"))
      .agg(count(lit(1)).as("n_categories"),
        first(col("n_total")).as("n_total"),
        round(-sum(col("p") * log(col("p"))), 6).as("shannon"),
        round(sum(col("p") * col("p")), 6).as("simpson"))
      // e^H from the ROUNDED H so both engines exponentiate the same
      // double
      .withColumn("effective_n", round(exp(col("shannon")), 4))
  }

  /** Two-proportion z-test over a binary unit-level frame
    * (`variantCol` ∈ {0 = A, 1 = B}, `flagCol` = converted): the
    * experiment readout. Counts aggregate exactly; the z statistic
    * `(p_a − p_b)/√(p̂(1−p̂)(1/n_a + 1/n_b))` with pooled p̂ is a fixed
    * dag of IEEE-correctly-rounded ops over those counts, so both
    * engines produce identical doubles. One unit-keyed aggregation,
    * then arithmetic on a 2-row frame. */
  def twoProportionZ(units: DataFrame, variantCol: Column,
                     flagCol: Column): DataFrame = {
    val agg = units.select(variantCol.cast("int").as("v"),
        flagCol.cast("long").as("f"))
      .agg(
        sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("v") === 0, col("f")).otherwise(0L)).as("conv_a"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("v") === 1, col("f")).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    // degenerate experiments (0% or 100% pooled conversion, or an empty
    // arm) have no defined z — emit NULL rather than divide by zero
    // (Spark 4 ANSI mode makes that an error, not an Inf)
    agg.select(col("n_a"), col("conv_a"),
      when(col("n_a") > 0, round(pa, 4)).as("rate_a"),
      col("n_b"), col("conv_b"),
      when(col("n_b") > 0, round(pb, 4)).as("rate_b"),
      when(col("n_a") > 0 && col("n_b") > 0, round(pa - pb, 4))
        .as("rate_diff"),
      when(col("n_a") > 0 && col("n_b") > 0 && se > 0,
        round((pa - pb) / se, 4)).as("z"))
  }

  /** CUPED variance-reduced experiment readout (Deng et al., "Improving
    * the Sensitivity of Online Controlled Experiments by Utilizing
    * Pre-Experiment Data", WSDM 2013): per unit, X = pre-period value,
    * Y = experiment-period value; θ = Cov(X,Y)/Var(X) pooled;
    * Y' = Y − θ·(X − X̄) removes the X-explained variance, shrinking
    * the readout's error bars by ≈ ρ² with the SAME point estimate in
    * expectation. The pre/post boundary is the integer midpoint of the
    * event-time range (epoch µs, exact both engines).
    *
    * Determinism: per-unit sums are EXACT integer cents, every moment
    * (Σx, Σy, Σxy, Σx², Σy², per-arm sums) is an integer sum — so θ
    * and each output is one fixed dag of IEEE doubles over integers,
    * engine-replayable at any partitioning. One unit-keyed agg + one
    * 1-row moment agg. At extreme scale the cents products (xy ≤
    * cents²) approach long range — swap the moment columns to
    * DECIMAL(38) sums, same shape. Degenerate inputs (empty arm,
    * Var(X) = 0) yield NULL adjusted columns, not a divide-by-zero. */
  def cuped(events: DataFrame, tsCol: Column, unitCol: Column,
            variantCol: Column, valueCol: Column): DataFrame = {
    val cents = floor(valueCol * 100 + 0.5).cast("long")
    val rows = events.select(unitCol.as("u"), variantCol.cast("int").as("v"),
      unix_micros(tsCol).as("t"), cents.as("c"))
    val bounds = rows.agg(((min(col("t")) + max(col("t"))) / 2)
      .cast("long").as("mid"))
    val units = rows.crossJoin(broadcast(bounds))
      .groupBy(col("u"))
      .agg(max(col("v")).as("v"),
        sum(when(col("t") <= col("mid"), col("c")).otherwise(0L)).as("x"),
        sum(when(col("t") > col("mid"), col("c")).otherwise(0L)).as("y"))
    val m = units.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("v") === 0, col("x")).otherwise(0L)).as("sx_a"),
      sum(when(col("v") === 0, col("y")).otherwise(0L)).as("sy_a"),
      sum(when(col("v") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("v") === 1, col("x")).otherwise(0L)).as("sx_b"),
      sum(when(col("v") === 1, col("y")).otherwise(0L)).as("sy_b"))
    val covNum = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val varXNum = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val varYNum = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val theta = covNum / varXNum
    val xBar = col("sx").cast("double") / col("n")
    def meanD(s: Column, n: Column): Column = s.cast("double") / n / 100.0
    def adjMean(sy: Column, sx: Column, n: Column): Column =
      (sy.cast("double") / n - theta * (sx.cast("double") / n - xBar)) / 100.0
    val okTheta = col("n") > 0 && varXNum > 0
    val okA = col("n_a") > 0
    val okB = col("n_b") > 0
    m.select(col("n"), col("n_a"), col("n_b"),
      when(okTheta, round(theta, 6)).as("theta"),
      when(okA, round(meanD(col("sy_a"), col("n_a")), 6)).as("mean_a"),
      when(okB, round(meanD(col("sy_b"), col("n_b")), 6)).as("mean_b"),
      when(okTheta && okA,
        round(adjMean(col("sy_a"), col("sx_a"), col("n_a")), 6)).as("adj_mean_a"),
      when(okTheta && okB,
        round(adjMean(col("sy_b"), col("sx_b"), col("n_b")), 6)).as("adj_mean_b"),
      when(okA && okB,
        round(meanD(col("sy_a"), col("n_a")) - meanD(col("sy_b"), col("n_b")), 6))
        .as("diff"),
      when(okTheta && okA && okB,
        round(adjMean(col("sy_a"), col("sx_a"), col("n_a"))
          - adjMean(col("sy_b"), col("sx_b"), col("n_b")), 6)).as("adj_diff"),
      when(okTheta && varYNum > 0,
        round(theta * theta * (varXNum / varYNum), 6)).as("var_reduction"))
  }

  /** Mutual information between two categorical columns — the
    * strength-of-association companion to [[chiSquare]] (χ² answers
    * "is there dependence", MI answers "how many nats does knowing A
    * tell you about B" — and normalized MI is comparable across
    * tables). I(A;B) = Σ p(a,b)·ln(p(a,b)·N²/(nₐ·n_b·N))… computed as
    * (n/N)·ln(n·N/(nₐ·n_b)) — every log argument a ratio of exact
    * integers, every term quantized to a long at 1e-12 before the sum
    * (associative ⇒ partition-invariant, the engine's standard
    * contract for information measures). One contingency agg over the
    * scan; margins and entropies on the cells-sized frame. */
  def mutualInformation(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    def quant(x: Column): Column = floor(x * lit(1e12) + 0.5).cast("long")
    val cells = df.select(aCol.as("a"), bCol.as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    val ra = cells.groupBy(col("a")).agg(sum(col("n")).as("na"))
    val rb = cells.groupBy(col("b")).agg(sum(col("n")).as("nb"))
    val tot = cells.agg(sum(col("n")).as("nn"))
    val joined = cells.join(ra, "a").join(rb, "b").crossJoin(broadcast(tot))
    val miTerm = (col("n").cast("double") / col("nn")) *
      log((col("n") * col("nn")).cast("double") / (col("na") * col("nb")))
    val mi = joined.agg(sum(quant(miTerm)).as("smi"))
    val ha = ra.crossJoin(broadcast(tot))
      .agg(sum(quant((col("na").cast("double") / col("nn")) *
        log(col("nn").cast("double") / col("na")))).as("sha"))
    val hb = rb.crossJoin(broadcast(tot))
      .agg(sum(quant((col("nb").cast("double") / col("nn")) *
        log(col("nn").cast("double") / col("nb")))).as("shb"))
    mi.crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .select(
        round(col("smi").cast("double") / 1e12, 6).as("mi"),
        round(col("sha").cast("double") / 1e12, 6).as("h_a"),
        round(col("shb").cast("double") / 1e12, 6).as("h_b"),
        when(col("sha") > 0 && col("shb") > 0,
          round(col("smi").cast("double") /
            sqrt(col("sha").cast("double") * col("shb").cast("double")), 6))
          .as("nmi"))
  }

  /** Pearson chi-square independence statistic for two categorical
    * columns: χ² = Σ (O − E)²/E with E = row·col/N, plus the degrees
    * of freedom. One contingency aggregation over the scan; the
    * expected-count arithmetic runs on the cells-sized frame (margins
    * ride broadcast window sums over it). */
  def chiSquare(df: DataFrame, rowCol: Column, colCol: Column): DataFrame = {
    val cells = df.select(rowCol.as("r"), colCol.as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("o"))
    // materialize the FULL r×c grid (cross join of the two tiny label
    // dims): a category pair that never co-occurs still contributes
    // its expected count to the statistic — (0 − E)²/E = E
    val full = cells.select(col("r")).distinct()
      .crossJoin(cells.select(col("c")).distinct())
      .join(cells, Seq("r", "c"), "left")
      .na.fill(0L, Seq("o"))
    val wr = Window.partitionBy(col("r"))
    val wc = Window.partitionBy(col("c"))
    val wAll = Window.partitionBy()
    val e = (sum(col("o")).over(wr).cast("double") *
      sum(col("o")).over(wc)) / sum(col("o")).over(wAll)
    val enriched = full.select(col("r"), col("c"), col("o"), e.as("e"))
    val dims = enriched.agg(
      countDistinct(col("r")).as("nr"), countDistinct(col("c")).as("nc"),
      sum((col("o") - col("e")) * (col("o") - col("e")) / col("e"))
        .as("chi2raw"))
    dims.select(round(col("chi2raw"), 4).as("chi2"),
      ((col("nr") - 1) * (col("nc") - 1)).as("dof"))
  }

  /** Tie-corrected Mann–Whitney AUC of `scoreCol` ranking `labelCol`
    * (boolean/0-1) positives above negatives. Exact integer rank-sum
    * arithmetic: per distinct score, 2·avg_rank = 2·cum_before + cnt + 1
    * (always integer), so the only floating step is the final division —
    * AUC = (2R₊ − n₊(n₊+1)) / (2·n₊·n₋).
    *
    * Scale shape: one corpus-sized (score → cnt, cnt_pos) partial agg,
    * then a cumulative window over the DISTINCT-score frame — bounded
    * by the score domain (integer signal scores here), not the corpus.
    * For unbounded real-valued scores, bucket or sketch first. Long
    * arithmetic holds to ~10⁹ positives; past that, widen to decimal. */
  /** Mann–Whitney U (Wilcoxon rank-sum) per group with tie correction
    * — the nonparametric two-sample location test: "did variant A's
    * value distribution shift vs B" without the normality assumption
    * the [[twoProportionZ]]/[[cuped]] readouts lean on. U for arm A,
    * plus the tie-corrected normal approximation
    * z = (U − n_a·n_b/2) / σ with
    * σ² = n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1))).
    *
    * Scale shape: the same average-rank trick as [[rankSumAuc]] — one
    * groupBy onto (group, value) tie blocks, one cumulative window
    * PARTITIONED BY group (never a global sort), then a groups-sized
    * agg. Rank sums stay in integer math (Σ ta·(2·cum+t+1) is exact;
    * the /2 happens once in double), so any engine replays the value
    * bit-for-bit. Degenerate arms (empty, or all values tied) emit
    * NULL z rather than a division by zero. */
  def mannWhitney(df: DataFrame, grpCol: Column, variantCol: Column,
                  valueCol: Column): DataFrame = {
    val byVal = df
      .select(grpCol.as("g"), variantCol.cast("int").as("v"), valueCol.as("x"))
      .groupBy(col("g"), col("x"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("v") === 0, 1L).otherwise(0L)).as("ta"))
    val w = Window.partitionBy(col("g")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = byVal
      .withColumn("cum", coalesce(sum(col("t")).over(w), lit(0L)))
      .groupBy(col("g"))
      .agg(sum(col("ta")).as("n_a"),
        sum(col("t") - col("ta")).as("n_b"),
        sum(col("ta") * (lit(2L) * col("cum") + col("t") + lit(1L))).as("ra2"),
        sum(col("t") * col("t") * col("t") - col("t")).as("ties3"))
    val n = col("n_a") + col("n_b")
    val u = col("ra2").cast("double") / 2.0 -
      col("n_a").cast("double") * (col("n_a") + lit(1L)) / 2.0
    val sigma2 = col("n_a").cast("double") * col("n_b") / 12.0 *
      ((n + lit(1L)).cast("double") -
        col("ties3").cast("double") / (n * (n - lit(1L))).cast("double"))
    agg.select(col("g"), col("n_a"), col("n_b"),
      round(u, 4).as("u"),
      when(col("n_a") > 0 && col("n_b") > 0 && sigma2 > 0.0,
        round((u - col("n_a").cast("double") * col("n_b") / 2.0) /
          sqrt(sigma2), 4)).as("z"))
  }

  /** Kendall tau-b rank correlation between two series observed on the
    * same keys (e.g. daily revenue vs daily active users): concordant
    * minus discordant pairs over the tie-corrected geometric-mean
    * denominator. Exact integer pair counts → engine-replayable.
    *
    * Scale shape: tau is O(n²) by definition, so this runs on an
    * ALREADY-AGGREGATED frame (days, cohorts, buckets — bounded by
    * construction), never on raw events; the self-join is the
    * documented bounded-frame cross shape ([[chiSquare]]'s grid
    * argument). Callers aggregate first. */
  def kendallTau(pairsFrame: DataFrame, keyCol: Column,
                 xCol: Column, yCol: Column): DataFrame = {
    val p = pairsFrame.select(keyCol.as("k"), xCol.as("x"), yCol.as("y"))
    val a = p.select(col("k").as("k1"), col("x").as("x1"), col("y").as("y1"))
    val b = p.select(col("k").as("k2"), col("x").as("x2"), col("y").as("y2"))
    val joined = a.join(b, col("k1") < col("k2"))
    val cmpX = when(col("x1") < col("x2"), 1).when(col("x1") > col("x2"), -1)
      .otherwise(0)
    val cmpY = when(col("y1") < col("y2"), 1).when(col("y1") > col("y2"), -1)
      .otherwise(0)
    joined.agg(
        count(lit(1)).as("n0"),
        sum(when(cmpX * cmpY === 1, 1L).otherwise(0L)).as("nc"),
        sum(when(cmpX * cmpY === -1, 1L).otherwise(0L)).as("nd"),
        sum(when(cmpX === 0, 1L).otherwise(0L)).as("tx"),
        sum(when(cmpY === 0, 1L).otherwise(0L)).as("ty"))
      .select(col("n0"), col("nc"), col("nd"),
        when((col("n0") > col("tx")) && (col("n0") > col("ty")),
          round((col("nc") - col("nd")).cast("double") /
            sqrt((col("n0") - col("tx")).cast("double") *
              (col("n0") - col("ty")).cast("double")), 4)).as("tau_b"))
  }

  def rankSumAuc(df: DataFrame, scoreCol: String,
                 labelCol: Column): DataFrame = {
    val byScore = df
      .select(col(scoreCol).as("s"),
        labelCol.cast("long").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("cpos"))
    // the cumulative runs over the DISTINCT-scores frame, which for
    // continuous scores is ~n rows — two-phase range-partitioned
    // prefix sum, never a single-task Window.orderBy cumulative
    // (scores are unique per row after the groupBy, so the order is
    // total and the two-phase sum is exact)
    Ranks.globalCumSumExcl(byScore, Seq(col("s")), col("cnt"), "cum")
      .agg(sum(col("cpos")).as("n_pos"),
        sum(col("cnt") - col("cpos")).as("n_neg"),
        sum(col("cpos") * (lit(2L) * col("cum") + col("cnt") + lit(1L)))
          .as("r2"))
      .select(col("n_pos"), col("n_neg"),
        round((col("r2") - col("n_pos") * (col("n_pos") + lit(1L)))
            .cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Average precision (the rank-sum area under the precision–recall
    * curve): AP = (1/n_pos) Σ over positive rows of P@k, with k the
    * row's 1-based rank by (score desc, id) and P@k the positive count
    * through rank k. The PR companion to [[rankSumAuc]]'s ROC view —
    * under heavy class imbalance (the usual quality-classifier
    * regime) ROC-AUC saturates while AP still discriminates.
    *
    * Determinism: the id tiebreak makes the rank order total, so both
    * engines walk the identical permutation; each precision term
    * quantizes to a long at 1e-12 before its (order-free) sum — one
    * final division. Scale shape: ONE two-phase pass
    * ([[Ranks.globalRankAndCumSumExcl]]) computes rank and cumulative
    * positives together — no unpartitioned window over the
    * corpus-scaled scores frame, then a single aggregation. */
  def averagePrecision(df: DataFrame, scoreCol: String, labelCol: Column,
                       idCol: Column): DataFrame = {
    val base = df.select(col(scoreCol).as("s"),
      labelCol.cast("long").as("y"), idCol.as("id"))
    val ranked = Ranks.globalRankAndCumSumExcl(base,
      Seq(col("s").desc, col("id")), col("y"), "k", "pprev")
    ranked.agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"),
        sum(when(col("y") === 1,
          floor((col("pprev") + lit(1L)).cast("double") / col("k")
            * lit(1e12) + lit(0.5)).cast("long")).otherwise(lit(0L)))
          .as("apq"))
      .select(col("n"), col("n_pos"),
        when(col("n_pos") > 0,
          round(col("apq").cast("double") / lit(1e12) / col("n_pos"), 6))
          .as("avg_precision"))
  }

  /** Two-sample Kolmogorov–Smirnov distance per group: the largest gap
    * between the two arms' empirical CDFs — the distribution-level
    * drift/experiment readout that sees shape changes (variance,
    * bimodality) a mean-based z-test misses, and a location-free
    * companion to [[mannWhitney]]. Emits the exact D plus the
    * scaled statistic K = D·√(n_a·n_b/n) whose asymptotic critical
    * values (1.36 at α=.05) are distribution-free.
    *
    * Scale shape: same tie-block discipline as [[mannWhitney]] — one
    * groupBy onto (group, value) blocks with per-arm counts, INCLUSIVE
    * cumulative windows partitioned by group, group totals as an
    * unordered window over the same partition (no second scan). The
    * sup-gap runs in EXACT integer math: D = max|cum_a·n_b − cum_b·n_a|
    * / (n_a·n_b), so both engines agree bit-for-bit before the one
    * final division. Degenerate arms emit NULL. */
  def ksTest(df: DataFrame, grpCol: Column, variantCol: Column,
             valueCol: Column): DataFrame = {
    val byVal = df
      .select(grpCol.as("g"), variantCol.cast("int").as("v"), valueCol.as("x"))
      .groupBy(col("g"), col("x"))
      .agg(sum(when(col("v") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("v") =!= 0, 1L).otherwise(0L)).as("cb"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g"))
    val gaps = byVal
      .withColumn("cuma", sum(col("ca")).over(wCum))
      .withColumn("cumb", sum(col("cb")).over(wCum))
      .withColumn("n_a", sum(col("ca")).over(wAll))
      .withColumn("n_b", sum(col("cb")).over(wAll))
      .groupBy(col("g"))
      .agg(max(abs(col("cuma") * col("n_b") - col("cumb") * col("n_a")))
          .as("dnum"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
    val d = col("dnum").cast("double") /
      (col("n_a").cast("double") * col("n_b").cast("double"))
    gaps.select(col("g"), col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0, round(d, 6)).as("ks_d"),
      when(col("n_a") > 0 && col("n_b") > 0,
        round(d * sqrt(col("n_a").cast("double") * col("n_b") /
          (col("n_a") + col("n_b")).cast("double")), 4)).as("ks_stat"))
  }

  /** Period-over-period contribution decomposition: which segment moved
    * the metric — Δtotal = Σ_seg Δ_seg exactly, each segment's delta,
    * its share of the total move, and a magnitude rank. The window
    * splits at its own date midpoint (floor-half of the observed span),
    * so the readout is self-contained and engine-replayable.
    *
    * Scale shape: one 1-row min/max date agg broadcast back over the
    * scan (the tiny-broadcast pattern), one (segment, period) partial
    * agg, then segments-sized math. Cents stay exact longs; the one
    * division guards the Δtotal = 0 degenerate window with NULL. */
  def periodContribution(df: DataFrame, segCol: Column, tsCol: Column,
                         centsCol: Column): DataFrame = {
    val base = df.select(segCol.as("seg"), to_date(tsCol).as("d"),
      centsCol.cast("long").as("cents"))
    val span = base.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val mid = expr("date_add(d0, CAST(floor(datediff(d1, d0) / 2) AS INT))")
    val byPeriod = base.crossJoin(broadcast(span))
      .withColumn("p", when(col("d") <= mid, 1).otherwise(2))
      .groupBy(col("seg"))
      .agg(sum(when(col("p") === 1, col("cents")).otherwise(0L)).as("rev_p1"),
        sum(when(col("p") === 2, col("cents")).otherwise(0L)).as("rev_p2"))
      .withColumn("delta", col("rev_p2") - col("rev_p1"))
    val total = byPeriod.agg(sum(col("delta")).as("total_delta"))
    val ranked = byPeriod.crossJoin(broadcast(total))
      .withColumn("seg_rank", row_number().over(
        Window.orderBy(abs(col("delta")).desc, col("seg"))))
    ranked.select(col("seg"), col("rev_p1"), col("rev_p2"), col("delta"),
      when(col("total_delta") =!= 0,
        round(col("delta").cast("double") /
          col("total_delta").cast("double"), 4)).as("share_of_move"),
      col("seg_rank"))
  }

  /** 53-bit integer thresholds of the Poisson(1) CDF for k = 0..8:
    * T_k = ⌊CDF(k)·2^53⌋. A bootstrap weight draws as
    * w = Σ_k [u53 ≥ T_k] (so w = 0 below T_0, and the 1.1e-7 tail mass
    * past k = 8 truncates to w = 9). Computed ONCE here and interpolated
    * verbatim into the DuckDB oracle text, so both engines compare the
    * same integer constants — the Sampling.thresholdFor contract. */
  val poissonThresholds: Seq[Long] = {
    var fact = 1.0
    var s = 0.0
    (0 until 9).map { k =>
      if (k > 0) fact *= k
      s += 1.0 / fact
      (math.exp(-1.0) * s * (1L << 53)).toLong
    }
  }

  /** Poisson-bootstrap confidence interval for the per-group mean —
    * the bootstrap shape that survives 100 TB: classic resampling needs
    * n draws WITH replacement per replicate (a shuffle per replicate);
    * the Poisson(1) approximation (Chamandy et al., Google 2012) gives
    * every unit an independent deterministic weight per replicate, so
    * ALL b replicates ride one explode + one partial aggregation —
    * map-side combine collapses to groups×b rows before the exchange,
    * and the driver never sees unit-level data.
    *
    * Weights draw from splitmix64(id·b + r + 1) against the integer
    * [[poissonThresholds]], so every replicate is bit-replayable by the
    * oracle. `centsCol` must be an EXACT integer value column (caller
    * quantizes — the corrMatrix contract); replicate means are then one
    * long/long division both engines compute identically. CI bounds are
    * exact nearest-rank order statistics over the ≤ b replicate means
    * (empty replicates — every weight 0, only possible for tiny groups
    * — drop, and the ranks adapt). */
  def poissonBootstrapCI(units: DataFrame, grpCol: Column, idCol: Column,
                         centsCol: Column, b: Int = 64): DataFrame = {
    require(b >= 8, "poissonBootstrapCI: need at least 8 replicates")
    val base = units.select(grpCol.as("g"), idCol.cast("long").as("id"),
      centsCol.cast("long").as("cents"))
    val reps = base
      .withColumn("r", explode(array((0 until b).map(lit(_)): _*)))
      .withColumn("u53", shiftrightunsigned(
        graft.functions.SplitMix64.splitmix64(
          col("id") * lit(b.toLong) + col("r") + lit(1L)), 11))
    val wExpr = poissonThresholds.map(t =>
      when(col("u53") >= t, 1L).otherwise(0L)).reduce(_ + _)
    val repMeans = reps.withColumn("w", wExpr)
      .groupBy(col("g"), col("r"))
      .agg(sum(col("w") * col("cents")).as("swx"), sum(col("w")).as("sw"))
      .where(col("sw") > 0)
      .select(col("g"),
        (col("swx").cast("double") / col("sw").cast("double")).as("m"))
    val ci = repMeans.groupBy(col("g"))
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      .select(col("g"), size(col("ms")).cast("long").as("n_rep"),
        element_at(col("ms"),
          ceil(size(col("ms")) * 0.025).cast("int")).as("ci_lo"),
        element_at(col("ms"),
          ceil(size(col("ms")) * 0.975).cast("int")).as("ci_hi"))
    val pt = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n_units"), sum(col("cents")).as("tc"))
      .select(col("g"), col("n_units"),
        (col("tc").cast("double") / col("n_units").cast("double"))
          .as("mean_c"))
    pt.join(ci, Seq("g"))
      .select(col("g"), col("n_units"), col("mean_c"), col("n_rep"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Spearman rank correlation per group between two columns: Pearson
    * over tie-averaged ranks — the monotone-association readout that is
    * outlier-immune where raw Pearson is not, and O(n log n) where
    * [[kendallTau]]'s pair counting is O(n²) (so THIS is the form that
    * runs on raw scan-sized data; tau stays on bounded frames).
    *
    * Scale shape: doubled average ranks 2r = 2·cum + t + 1 stay integer
    * (the [[mannWhitney]] trick, applied per axis), and all 2nd-order
    * moments accumulate as exact decimal(38,0) sums (the corrMatrix
    * contract — n·(2n)² products overflow longs past ~3M rows/group),
    * so rho is one fixed IEEE dag both engines replay. Two tie-block
    * aggs + two cumulative windows per axis, one groups-sized finish;
    * NULL rho when either axis is constant. */
  def spearman(df: DataFrame, grpCol: Column, xCol: Column,
               yCol: Column): DataFrame = {
    val base = df.select(grpCol.as("g"), xCol.as("x"), yCol.as("y"))
    // doubled tie-averaged rank of column c within group, joined back by
    // (g, c) — the tie-block frame is distinct-values-sized
    def ranked(in: DataFrame, c: String, out: String): DataFrame = {
      val blocks = in.groupBy(col("g"), col(c))
        .agg(count(lit(1)).as("t"))
      val w = Window.partitionBy(col("g")).orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, -1)
      val r = blocks
        .withColumn(out,
          (lit(2L) * coalesce(sum(col("t")).over(w), lit(0L)) +
            col("t") + lit(1L)).cast("decimal(18,0)"))
        .drop("t")
      in.join(r, Seq("g", c))
    }
    val withRanks = ranked(ranked(base, "x", "rx"), "y", "ry")
    val m = withRanks.groupBy(col("g")).agg(
      count(lit(1)).as("n"),
      sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
      sum(col("rx") * col("rx")).as("sxx"),
      sum(col("ry") * col("ry")).as("syy"),
      sum(col("rx") * col("ry")).as("sxy"))
    val n = col("n").cast("decimal(38,0)")
    val covNum = (n * col("sxy") - col("sx") * col("sy")).cast("double")
    def varNum(s: String, ss: String) =
      (n * col(ss) - col(s) * col(s)).cast("double")
    m.select(col("g"), col("n"),
      when(varNum("sx", "sxx") > 0 && varNum("sy", "syy") > 0,
        round(covNum /
          sqrt(varNum("sx", "sxx") * varNum("sy", "syy")), 6)).as("rho"))
  }

  /** RFM customer segmentation (Hughes 1994 — the classic recency/
    * frequency/monetary quintile scoring): per customer, days since
    * last order (vs the corpus horizon), order count, and exact-cents
    * spend, each scored 1–5 by ntile in deterministic order (metric,
    * then customer id — both engines' standard SQL ntile splits
    * identically given the same order). Recency ntiles ASCENDING on
    * days-since (fewer days = score 5 after the 6−n flip); f/m
    * ascending so higher = better directly.
    *
    * Scale shape: one exact groupBy to the per-customer frame
    * (scratch-cached — the corpus-horizon 1-row agg and the scoring
    * path both read it), then three two-phase [[Ranks.globalNtile]]
    * passes. No unpartitioned window anywhere: customers scale with
    * the corpus, and at 100× a global `ntile` window would funnel
    * every customer through ONE task three times. */
  def rfm(orders: DataFrame, custCol: Column, dateCol: Column,
          amountCol: Column, buckets: Int = 5): DataFrame = {
    val cents = floor(amountCol * 100 + 0.5).cast("long")
    val per = CacheScope.scratch(orders
      .select(custCol.as("cust"), to_date(dateCol).as("dt"), cents.as("c"))
      .groupBy(col("cust"))
      .agg(max(col("dt")).as("last_dt"),
        count(lit(1)).as("frequency"),
        sum(col("c")).as("cents")))
    val horizon = per.agg(max(col("last_dt")).as("horizon"))
    val base = per.crossJoin(broadcast(horizon))
      .withColumn("recency_days",
        datediff(col("horizon"), col("last_dt")).cast("long"))
    def score(df: DataFrame, c: Column, name: String) =
      Ranks.globalNtile(df, Seq(c, col("cust")), buckets, name)
    val tiled = score(score(score(base,
        col("recency_days"), "x"), col("frequency"), "f_raw"),
      col("cents"), "m_raw")
    tiled.select(col("cust").as("custkey"), col("recency_days"),
        col("frequency"), round(col("cents").cast("double") / 100.0, 2)
          .as("monetary"),
        (lit(buckets + 1) - col("x")).cast("int").as("r_score"),
        col("f_raw").cast("int").as("f_score"),
        col("m_raw").cast("int").as("m_score"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4 &&
          col("m_score") >= 4, lit("champion"))
        .when(col("r_score") >= 4 && col("f_score") <= 2, lit("new"))
        .when(col("r_score") <= 2 && col("f_score") >= 4, lit("at_risk"))
        .when(col("r_score") <= 2 && col("f_score") <= 2, lit("lost"))
        .otherwise(lit("regular")))
  }

  /** Two-sided normal p-value from a z score via the Abramowitz–Stegun
    * 7.1.26 erf polynomial (max abs error 1.5e-7 — far below the 6-dp
    * output rounding): p = poly(t)·e^(−x²), x = |z|/√2,
    * t = 1/(1 + 0.3275911x). Elementary ops only (one exp, one Horner
    * chain), written in the exact association order the SQL replay
    * uses — the p-value CONTRACT is "this polynomial", not libm's Φ,
    * so both engines agree bit-for-bit. */
  def zTwoSidedP(z: Column): Column = {
    val x = abs(z) / lit(math.sqrt(2.0))
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t + lit(-1.453152027)) * t +
      lit(1.421413741)) * t + lit(-0.284496736)) * t + lit(0.254829592)) * t
    poly * exp(-(x * x))
  }

  /** Benjamini–Hochberg step-up FDR adjustment over a per-key p-value
    * frame: p_adj(i) = min_{j ≥ i} p(j)·m/j, capped at 1 — the
    * multiple-comparisons control a metric battery needs before
    * declaring ANY per-segment result significant (at m segments,
    * α·m false alarms arrive by construction without it).
    *
    * Scale note: the windows run UNPARTITIONED by design — this
    * operates on per-key STATISTICS frames (segments, metrics,
    * cohorts), bounded by construction, never on raw events. Ties
    * break on the key, so ranks and the running min are deterministic
    * and SQL-replayable. */
  def bhAdjust(df: DataFrame, keyCol: Column, pCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(keyCol.as("k"), pCol.as("p"))
      .filter(col("p").isNotNull)
    val wRank = Window.orderBy(col("p"), col("k"))
    val wTail = Window.orderBy(col("p").desc, col("k").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("i", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("p_adj",
        least(lit(1.0), min(col("p") * col("m") / col("i")).over(wTail)))
      .select(col("k"), col("p"), col("p_adj"))
  }

  /** One-way ANOVA over `valueCol` by `grpCol`: the k-group
    * generalization of the two-sample readouts above — F, η²
    * (SSB/SST), and the exact sum-of-squares decomposition. The
    * between/total sums are built from EXACT integer moments (cents
    * quantization, per-group Σc and Σc² as longs; the squared-sum
    * terms are single long products cast to double once — one
    * deterministic rounding each, no order-dependent float folds),
    * each quantized term summed as longs ⇒ partition-invariant and
    * SQL-replayable. One groupBy + one k-row fold; no second data
    * pass.
    *
    * Units: ssb/ssw/sst are in cents² (the exact integers); F and η²
    * are unit-free. Degenerate inputs (k < 2 or n ≤ k or SSW = 0)
    * emit NULL F rather than ±Inf. */
  def anovaOneWay(df: DataFrame, grpCol: Column, valueCol: Column): DataFrame = {
    val c = floor(valueCol * 100 + 0.5).cast("long")
    // decimal(38,0) moments: per-row cents and cents² fit longs, but
    // their corpus-scale sums need 128-bit headroom (DuckDB's
    // sum(BIGINT) → HUGEINT is the oracle-side mirror)
    val g = df.select(grpCol.as("g"), c.as("c"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("ng"),
        sum(col("c").cast("decimal(20,0)")).as("sg"),
        sum((col("c") * col("c")).cast("decimal(20,0)")).as("sgg"))
    val m = g.agg(
      count(lit(1)).as("k"),
      sum(col("ng")).as("n"),
      sum(col("sg")).as("s"),
      sum(col("sgg")).as("ss"),
      // Σ_g ⌊Sg²/ng⌉ — Sg·Sg is an exact decimal product; one cast to
      // double, one division, one floor ⇒ a deterministic integer per
      // group, then exact addition across groups
      sum(floor((col("sg") * col("sg")).cast("double") / col("ng") + lit(0.5))
        .cast("decimal(38,0)")).as("bq"))
    val grand = floor((col("s") * col("s")).cast("double") / col("n") + lit(0.5))
      .cast("decimal(38,0)")
    val ssb = (col("bq") - grand).cast("double")
    val sst = (col("ss") - grand).cast("double")
    val ssw = sst - ssb
    val dfb = (col("k") - 1).cast("double")
    val dfw = (col("n") - col("k")).cast("double")
    m.select(col("k"), col("n"),
      round(ssb, 4).as("ssb"), round(ssw, 4).as("ssw"), round(sst, 4).as("sst"),
      when(col("k") > 1 && col("n") > col("k") && ssw > 0,
        round((ssb / dfb) / (ssw / dfw), 4)).as("f_stat"),
      when(sst > 0, round(ssb / sst, 6)).as("eta_sq"))
  }

  /** Wald sequential probability ratio test (SPRT, Wald 1945) on a
    * Bernoulli stream, read out as a per-period decision trace: after
    * each period, LLR_n = k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) with
    * the classic decision bounds ln((1−β)/α) / ln(β/(1−α)) — the
    * "stop the experiment early" monitor a fixed-horizon z-test
    * ([[twoProportionZ]]) cannot provide without peeking bias.
    *
    * Determinism: the four log constants are computed ONCE in Scala
    * and ride both engines as interpolated literals (the cross-engine
    * libm contract of the nDCG discounts); cumulative n/k are exact
    * longs via a window over the period frame (bounded by the calendar
    * span, never the event count), and LLR is the same two-product
    * expression in both engines. The decision compares the UNROUNDED
    * LLR in both.
    *
    * Scale shape: one period-keyed partial agg over the scan + one
    * global window over the bounded period frame. */
  def sprtBernoulli(df: DataFrame, periodCol: Column, successCol: Column,
                    p0: Double, p1: Double, alpha: Double = 0.05,
                    beta: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      "sprtBernoulli needs distinct p0, p1 in (0, 1)")
    val c1 = math.log(p1 / p0)
    val c2 = math.log((1 - p1) / (1 - p0))
    val upper = math.log((1 - beta) / alpha)
    val lower = math.log(beta / (1 - alpha))
    val daily = df
      .select(periodCol.as("period"), successCol.cast("long").as("y"))
      .groupBy(col("period"))
      .agg(count(lit(1)).as("t"), sum(col("y")).as("s"))
    val w = Window.orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val llr = col("k") * lit(c1) + (col("n") - col("k")) * lit(c2)
    daily
      .withColumn("n", sum(col("t")).over(w))
      .withColumn("k", sum(col("s")).over(w))
      .select(col("period"), col("n"), col("k"),
        round(llr, 6).as("llr"),
        when(llr >= lit(upper), lit("accept_h1"))
          .when(llr <= lit(lower), lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
  }

  /** Decile-level quantile normalization across groups: each group's
    * value distribution is mapped onto the pooled distribution by
    * decile — the cross-source score-alignment step mixture designers
    * apply before comparing quality scores from differently-scaled
    * sources. Deciles are `ntile(10)` with the (value, id) tie order,
    * so both engines cut identically; output is the per-(group,
    * decile) card: member count, the group's decile upper bound, and
    * the pooled upper bound it maps to.
    *
    * Scale shape: two two-phase ntile passes ([[Ranks.globalNtile]]
    * pooled, [[Ranks.groupedNtile]] per group — no unpartitioned
    * window, and a DOMINANT source no longer funnels through one task
    * either), scratch-cached because the pooled and per-group aggs
    * both read the tiled frame, + one (group, decile) agg + one
    * broadcast join of the 10-row pooled frame. */
  def quantileNormalize(df: DataFrame, grpCol: Column, valCol: Column,
                        idCol: Column): DataFrame = {
    val base = df.select(grpCol.as("g"), valCol.as("v"), idCol.as("id"))
    val tiled = CacheScope.scratch(
      Ranks.globalNtile(
        Ranks.groupedNtile(base, Seq("g"), Seq(col("v"), col("id")),
          10, "decile"),
        Seq(col("v"), col("id")), 10, "pooled_decile")
        // keep ntile()'s int type so the output schema is unchanged
        .withColumn("decile", col("decile").cast("int"))
        .withColumn("pooled_decile", col("pooled_decile").cast("int")))
    val pooled = tiled.groupBy(col("pooled_decile").as("decile"))
      .agg(max(col("v")).as("pooled_upper"))
    tiled.groupBy(col("g"), col("decile"))
      .agg(count(lit(1)).as("n"), max(col("v")).as("src_upper"))
      .join(broadcast(pooled), "decile")
      .select(col("g"), col("decile"), col("n"), col("src_upper"),
        col("pooled_upper"))
  }

  /** UCB1 policy replay (Auer et al. 2002) over a day-bucketed reward
    * stream: arms = keys, one step per day; at day d each arm's index
    * is mean reward through d−1 plus the √(2·ln N / n_i) exploration
    * bonus, and the replay records which arm the policy would pull.
    * The offline what-if for "should routing/crawl budget follow a
    * bandit" — fully deterministic because rewards are cents-exact
    * cumulative integers and ties break on the arm name.
    *
    * Scale shape: one (arm, day) partial agg over the scan, then all
    * windows run on the (arms × days)-bounded frame.
    *
    * Replay caveats (both mirrored exactly by the oracle): an arm
    * competes on a day only if it logged ≥1 event that day (densify
    * with a calendar×arms frame for sparse feeds), and unexplored
    * arms (n_i = 0) are excluded from the argmax rather than
    * force-pulled, so day 1 emits no pick. */
  def ucbPolicy(df: DataFrame, armCol: Column, tsCol: Column,
                rewardCol: Column): DataFrame = {
    val daily = df
      .select(armCol.as("arm"), to_date(tsCol).as("day"),
        round(rewardCol * 100, 0).cast("long").as("cents"))
      .groupBy(col("arm"), col("day"))
      .agg(count(lit(1)).as("t"), sum(col("cents")).as("rc"))
    val wArm = Window.partitionBy(col("arm")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = daily
      .withColumn("n_i", coalesce(sum(col("t")).over(wArm), lit(0L)))
      .withColumn("r_i", coalesce(sum(col("rc")).over(wArm), lit(0L)))
    val wDay = Window.partitionBy(col("day"))
    val wPick = Window.partitionBy(col("day"))
      .orderBy(col("ucb").desc, col("arm").asc)
    cum
      .withColumn("n_total", sum(col("n_i")).over(wDay))
      .filter(col("n_i") > 0 && col("n_total") > col("n_i"))
      .withColumn("ucb",
        col("r_i").cast("double") / 100.0 / col("n_i") +
          sqrt(lit(2.0) * log(col("n_total")) / col("n_i")))
      .withColumn("pick", row_number().over(wPick))
      .filter(col("pick") === 1)
      .select(col("day"), col("arm").as("chosen_arm"), col("n_i"),
        round(col("ucb"), 6).as("ucb"))
  }

  /** Caliper-matched treatment effect (radius matching, the
    * deterministic cousin of greedy 1-NN propensity matching): treated
    * units match EVERY control within `caliper` on the integer
    * covariate; ATT = mean over matched treated of (own outcome −
    * mean matched-control outcome). The causal readout [[cuped]]'s
    * variance reduction does not give — CUPED adjusts, matching
    * estimates the effect on the treated. Outcomes are cents-exact;
    * the per-treated diff quantizes to a long at 1e-6 before the
    * final fold.
    *
    * Scale shape: the match is a band join on the bounded-integer
    * covariate — realized as an equi-join on the covariate bucket
    * after exploding each control into its ±caliper buckets (2c+1
    * copies, never a cross join). */
  def caliperAtt(units: DataFrame, treatCol: Column, covCol: Column,
                 outcomeCentsCol: Column, caliper: Int = 2): DataFrame = {
    val base = units.select(treatCol.cast("int").as("tr"),
      covCol.cast("long").as("cov"), outcomeCentsCol.as("y"))
    val treated = base.filter(col("tr") === 1)
      .select(col("cov"), col("y"))
    val controls = base.filter(col("tr") === 0)
      .select(explode(sequence(col("cov") - caliper,
        col("cov") + caliper)).as("cov"), col("y").as("yc"))
    val matched = treated
      .join(controls.groupBy(col("cov"))
        .agg(count(lit(1)).as("n_c"), sum(col("yc")).as("sy_c")), Seq("cov"),
        "left")
      .filter(col("n_c").isNotNull)
      .select((col("y").cast("double") -
        col("sy_c").cast("double") / col("n_c")).as("diff"))
    val naive = base.groupBy(col("tr"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val nt = naive.filter(col("tr") === 1)
      .select(col("n").as("n_treated"), col("sy").as("syt"))
    val nc = naive.filter(col("tr") === 0)
      .select(col("n").as("n_controls"), col("sy").as("syc"))
    matched
      .agg(count(lit(1)).as("n_matched"),
        sum(floor(col("diff") * lit(1e6) + lit(0.5))).as("dq"))
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nc))
      .select(col("n_treated"), col("n_controls"), col("n_matched"),
        round(col("dq") / lit(1e6) / col("n_matched") / 100.0, 4)
          .as("att"),
        round((col("syt").cast("double") / col("n_treated") -
          col("syc").cast("double") / col("n_controls")) / 100.0, 4)
          .as("naive_diff"))
  }

  /** Difference-in-differences on a two-period, two-group design:
    * DiD = (T₂−T₁) − (C₂−C₁) over per-unit period outcomes — the
    * parallel-trends causal readout completing the experiment family
    * (z-test → CUPED → matching → DiD). `periodCol` must be 1/2,
    * `treatCol` 0/1, outcomes integer cents. Everything is exact
    * integer sums until the four means divide once; the estimate is a
    * difference of four exact-ratio doubles, same expression both
    * engines. One (group, period) agg over the unit frame. */
  def diffInDiff(units: DataFrame, treatCol: Column, periodCol: Column,
                 outcomeCentsCol: Column): DataFrame = {
    val cells = units
      .select(treatCol.cast("int").as("tr"), periodCol.cast("int").as("pd"),
        outcomeCentsCol.cast("long").as("y"))
      .groupBy(col("tr"), col("pd"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    def mean(tr: Int, pd: Int) =
      max(when(col("tr") === tr && col("pd") === pd,
        col("sy").cast("double") / col("n") / 100.0))
    cells.agg(
        sum(col("n")).as("n_units_periods"),
        mean(1, 1).as("t1"), mean(1, 2).as("t2"),
        mean(0, 1).as("c1"), mean(0, 2).as("c2"))
      .select(col("n_units_periods"),
        round(col("t1"), 4).as("treated_pre"),
        round(col("t2"), 4).as("treated_post"),
        round(col("c1"), 4).as("control_pre"),
        round(col("c2"), 4).as("control_post"),
        round((col("t2") - col("t1")) - (col("c2") - col("c1")), 4)
          .as("did"))
  }

  /** Winsorized summary per group: exact nearest-rank p05/p95 clip
    * points on integer cents via tie-block cumulative counts
    * (PARTITIONED BY group — never a global sort), and the clipped
    * mean as an exact long fold — the outlier-robust location estimate
    * whose breakdown the plain mean lacks, with everything integer
    * until the final division. */
  def winsorizedStats(df: DataFrame, grpCol: Column, valueCol: Column,
                      loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    val blocks = df
      .select(grpCol.as("g"),
        round(valueCol * 100, 0).cast("long").as("c"))
      .groupBy(col("g"), col("c")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("g")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = blocks.withColumn("cum", sum(col("cnt")).over(w))
    val totals = blocks.groupBy(col("g"))
      .agg(sum(col("cnt")).as("n"), sum(col("c") * col("cnt")).as("sc"))
      // ceil(n·p/100) in exact integer form
      .withColumn("kLo", expr(s"(n * $loPct + 99) DIV 100"))
      .withColumn("kHi", expr(s"(n * $hiPct + 99) DIV 100"))
    val thr = cum.join(totals, "g")
      .groupBy(col("g"))
      .agg(min(when(col("cum") >= col("kLo"), col("c"))).as("p_lo"),
        min(when(col("cum") >= col("kHi"), col("c"))).as("p_hi"))
    blocks.join(thr, "g").join(totals.select(col("g"), col("n"), col("sc")), "g")
      .groupBy(col("g"))
      .agg(first(col("n")).as("n"), first(col("sc")).as("sc"),
        first(col("p_lo")).as("p_lo"), first(col("p_hi")).as("p_hi"),
        sum(least(greatest(col("c"), col("p_lo")), col("p_hi")) *
          col("cnt")).as("scw"))
      .select(col("g"), col("n"),
        round(col("p_lo") / lit(100.0), 2).as("p05"),
        round(col("p_hi") / lit(100.0), 2).as("p95"),
        round(col("sc").cast("double") / col("n") / 100.0, 4).as("mean"),
        round(col("scw").cast("double") / col("n") / 100.0, 4)
          .as("winsorized_mean"))
  }

  /** Neyman-optimal stratified-sample allocation (Neyman 1934):
    * n_h ∝ N_h·S_h, integerized by the largest-remainder method — the
    * planning table for "given a labeling budget of n, how many docs
    * per stratum". Determinism: S_h comes from exact integer moments,
    * the N_h·S_h weight quantizes to a long at 1e-6, and both the
    * floor shares and the remainder distribution are pure integer
    * arithmetic with name-ordered tie-break, so the allocation is
    * bit-identical cross-engine. One strata-sized frame end to end
    * after a single exact groupBy over the scan. */
  def neymanAllocation(df: DataFrame, stratumCol: Column,
                       valueCol: Column, budget: Long): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val m = df.select(stratumCol.as("h"), valueCol.cast("long").as("y"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("nh"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
    val mean = col("sy").cast("double") / col("nh")
    val variance = col("syy").cast("double") / col("nh") - mean * mean
    val weighted = m.select(col("h"), col("nh"),
      sqrt(variance).as("sh"),
      floor(col("nh") * sqrt(variance) * lit(1e6) + lit(0.5))
        .cast("long").as("wq"))
    val tot = weighted.agg(sum(col("wq")).as("wt"))
    val based = weighted.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($budget * wq) DIV wt"))
      .withColumn("rem", expr(s"$budget * wq - (($budget * wq) DIV wt) * wt"))
    val spare = based.agg((lit(budget) - sum(col("base"))).as("spare"))
    val wR = Window.orderBy(col("rem").desc, col("h").asc)
    based.withColumn("rk", row_number().over(wR))
      .crossJoin(broadcast(spare))
      .select(col("h"), col("nh").as("n_pop"), round(col("sh"), 4).as("std"),
        (col("base") +
          when(col("rk") <= col("spare"), 1L).otherwise(0L)).as("n_alloc"))
      .withColumn("sampling_fraction",
        round(col("n_alloc").cast("double") / col("n_pop"), 6))
  }

  /** Per-group OLS of integer series: slope, intercept, r² from EXACT
    * integer moments (decimal accumulators) — regression as one
    * partial agg over the scan, no solver. Both inputs must already
    * be integers (cast exact); the five moment sums and both
    * closed-form numerators stay in integer/decimal arithmetic, so
    * only the final divisions are doubles and the fit replays
    * bit-for-bit. */
  def olsByGroup(df: DataFrame, grpCol: Column, xIntCol: Column,
                 yIntCol: Column): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val m = df.select(grpCol.as("g"), xIntCol.cast("long").as("x"),
        yIntCol.cast("long").as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(dec(col("x"))).as("sx"),
        sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
    val n = dec(col("n"))
    val cov = (n * col("sxy") - col("sx") * col("sy")).cast("double")
    val varx = (n * col("sxx") - col("sx") * col("sx")).cast("double")
    val vary = (n * col("syy") - col("sy") * col("sy")).cast("double")
    val slope = cov / varx
    m.select(col("g"), col("n"),
      when(varx > 0, round(slope, 6)).as("slope"),
      when(varx > 0, round(
        (col("sy").cast("double") - slope * col("sx").cast("double")) /
          col("n"), 6)).as("intercept"),
      when(varx > 0 && vary > 0, round(cov * cov / (varx * vary), 6))
        .as("r2"))
  }

  /** Exact nearest-rank percentiles per group over an INTEGER value —
    * tie-block cumulative counts PARTITIONED BY group (never a global
    * sort), thresholds as min value with cum ≥ ⌈q·n⌉ in pure integer
    * arithmetic. `qs` are percents (50, 90, 99). */
  def exactPercentilesByGroup(df: DataFrame, grpCol: Column,
                              valueIntCol: Column,
                              qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 100))
    val blocks = df.select(grpCol.as("g"), valueIntCol.cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = blocks.withColumn("cum", sum(col("cnt")).over(w))
    val totals = blocks.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
    val aggs = qs.map(q =>
      min(when(col("cum") >= expr(s"(n * $q + 99) DIV 100"), col("v")))
        .as(s"p$q"))
    cum.join(totals, "g")
      .groupBy(col("g"))
      .agg(first(col("n")).as("n"), aggs: _*)
  }

  /** Cramér's V association strength between two categorical columns:
    * χ² over the full r×c contingency grid normalized to [0,1] —
    * the effect-size companion to [[chiSquare]]'s significance test
    * (a huge n makes any χ² "significant"; V says whether the
    * association is material). Exact integer cell/margin counts; the
    * χ² fold quantizes each cell term to a long at 1e-6 before the
    * grid-bounded sum. */
  def cramersV(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.select(aCol.as("a"), bCol.as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val ra = cells.groupBy(col("a")).agg(sum(col("o")).as("na"))
    val cb = cells.groupBy(col("b")).agg(sum(col("o")).as("nb"))
    val n = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("r"), countDistinct(col("b")).as("c"))
    // the FULL r×c grid: an empty cell still contributes (0−E)²/E —
    // dropping it silently deflates χ² exactly on the strongly-
    // associated tables where it matters most (caught by the
    // perfect-association spec: V read 0.707 instead of 1)
    val grid = ra.crossJoin(cb)
      .join(cells, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val e = col("na").cast("double") * col("nb") / col("n")
    val term = (col("o").cast("double") - e) * (col("o") - e) / e
    grid.crossJoin(broadcast(n))
      .agg(first(col("n")).as("n"), first(col("r")).as("r"),
        first(col("c")).as("c"),
        sum(floor(term * lit(1e6) + lit(0.5))).as("chiq"))
      .select(col("n"), col("r"), col("c"),
        round(col("chiq") / lit(1e6), 4).as("chi2"),
        when(least(col("r"), col("c")) > 1,
          round(sqrt(col("chiq") / lit(1e6) /
            (col("n").cast("double") *
              (least(col("r"), col("c")) - lit(1L)))), 6)).as("cramers_v"))
  }

  /** Cohen's d / Hedges' g standardized mean difference per group
    * between two variants, from EXACT integer cents moments:
    * d = (μ₀−μ₁)/s_p with the pooled sample SD, g = d·(1−3/(4n−9)) —
    * the parametric effect size next to [[cliffsDelta]]'s ordinal one
    * (d assumes roughly-normal interval data and rewards it with a
    * familiar scale; δ assumes nothing). One groupBy; all doubles are
    * post-aggregation scalar algebra. */
  def cohensD(df: DataFrame, grpCol: Column, variantCol: Column,
              valueCol: Column): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val e = df.select(grpCol.as("g"), variantCol.cast("int").as("v"),
      valueCol.cast("long").as("x"))
    val agg = e.groupBy(col("g")).agg(
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("na"),
      sum(when(col("v") === 1, 1L).otherwise(0L)).as("nb"),
      sum(when(col("v") === 0, col("x")).otherwise(0L)).as("sa"),
      sum(when(col("v") === 1, col("x")).otherwise(0L)).as("sb"),
      sum(when(col("v") === 0, dec(col("x")) * col("x"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("qa"),
      sum(when(col("v") === 1, dec(col("x")) * col("x"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("qb"))
    val ma = col("sa").cast("double") / col("na")
    val mb = col("sb").cast("double") / col("nb")
    val ssa = col("qa").cast("double") - col("sa").cast("double") * ma
    val ssb = col("qb").cast("double") - col("sb").cast("double") * mb
    val n = col("na") + col("nb")
    val sp = sqrt((ssa + ssb) / (n - 2).cast("double"))
    val d = (ma - mb) / sp
    agg.select(col("g"), col("na"), col("nb"),
      round(ma / 100.0, 4).as("mean_a"),
      round(mb / 100.0, 4).as("mean_b"),
      when(col("na") > 1 && col("nb") > 1 && sp > 0, round(d, 4))
        .as("cohens_d"),
      when(col("na") > 1 && col("nb") > 1 && sp > 0,
        round(d * (lit(1.0) - lit(3.0) / (lit(4.0) * n - 9)), 4))
        .as("hedges_g"))
  }

  /** Top-k rank migration between two periods: rank keys by value in
    * each period (value desc, key asc — a total order), keep ranks ≤ k
    * on either side, and report the movement — entered / dropped /
    * stayed with the rank delta. The leaderboard-churn card: "is the
    * head of this distribution stable across snapshots", the
    * ranking-level companion to [[periodContribution]]'s value-level
    * split. Two bounded rank windows + one full-outer equi-join. */
  def rankMigration(df: DataFrame, periodCol: Column, keyCol: Column,
                    valueCol: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val units = df.select(periodCol.cast("int").as("p"), keyCol.as("key"),
        valueCol.as("v"))
      .groupBy(col("p"), col("key")).agg(sum(col("v")).as("tv"))
    // two-phase top-k (the stratifiedExactN contract): each partition
    // streams out at most k rows per period before the exact rank —
    // the one-phase window would sort a whole period in one task
    val pruned = PartitionPrune.firstNPerKey(units, "p",
      Seq(col("tv").desc, col("key")), k)
    val w = Window.partitionBy(col("p"))
      .orderBy(col("tv").desc, col("key"))
    val ranked = pruned.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
    val r1 = ranked.filter(col("p") === 0)
      .select(col("key"), col("rk").as("rank_1"))
    val r2 = ranked.filter(col("p") === 1)
      .select(col("key"), col("rk").as("rank_2"))
    r1.join(r2, Seq("key"), "full_outer")
      .select(col("key"), col("rank_1"), col("rank_2"),
        (col("rank_1") - col("rank_2")).as("rank_gain"),
        when(col("rank_1").isNull, "entered")
          .when(col("rank_2").isNull, "dropped")
          .otherwise("stayed").as("status"))
  }

  /** Theil T inequality with exact between/within decomposition
    * (Theil 1967): T = (1/N)Σ(vᵢ/μ)ln(vᵢ/μ), split as
    * T_between = Σ_g s_g·ln(μ_g/μ) plus Σ_g s_g·T_within_g with
    * s_g = X_g/X — the decomposable inequality measure [[gini]] isn't
    * (Gini has no clean between/within split; Theil answers "is the
    * inequality BETWEEN nations or INSIDE them"). Positive values
    * only. Every ln term quantizes to a long at 1e-9 before its sum
    * (the cross-engine ln precedent of the BM25/Zipf oracles); group
    * sums are exact integers. One groupBy + one broadcast of the
    * 1-row totals. */
  def theilDecomposition(df: DataFrame, grpCol: Column,
                         valueCol: Column): DataFrame = {
    val base = df.select(grpCol.as("g"), valueCol.cast("long").as("v"))
      .filter(col("v") > 0)
    val gstats = base.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("v")).as("xg"))
    val tot = gstats.agg(sum(col("ng")).as("n"), sum(col("xg")).as("x"))
    val withT = base.join(gstats, "g").crossJoin(broadcast(tot))
    val mu = col("x").cast("double") / col("n")
    val mug = col("xg").cast("double") / col("ng")
    val ttq = floor((col("v") / mu) * log(col("v") / mu) * 1e9 + 0.5)
      .cast("long")
    val twq = floor((col("v") / mug) * log(col("v") / mug) * 1e9 + 0.5)
      .cast("long")
    val perG = withT.groupBy(col("g"))
      .agg(first(col("ng")).as("ng"), first(col("xg")).as("xg"),
        first(col("n")).as("n"), first(col("x")).as("x"),
        sum(ttq).as("tq"), sum(twq).as("wsum"))
    val share = col("xg").cast("double") / col("x")
    val contribQ = floor(share *
      (col("wsum").cast("double") / 1e9 / col("ng")) * 1e9 + 0.5)
      .cast("long")
    val btwQ = floor(share * log(
      (col("xg").cast("double") / col("ng")) /
        (col("x").cast("double") / col("n"))) * 1e9 + 0.5).cast("long")
    perG.agg(sum(col("ng")).as("n_units"),
        count(lit(1)).as("n_groups"),
        sum(col("tq")).as("tqs"),
        sum(contribQ).as("wq"), sum(btwQ).as("bq"),
        first(col("n")).as("nn"))
      .select(col("n_units"), col("n_groups"),
        round(col("tqs").cast("double") / 1e9 / col("nn"), 6)
          .as("theil_total"),
        round(col("bq").cast("double") / 1e9, 6).as("theil_between"),
        round(col("wq").cast("double") / 1e9, 6).as("theil_within"))
  }

  /** Effective sample size of importance weights per group:
    * ESS = (Σw)²/Σw² (Kong 1992) over w = exp(logw − max logw) — the
    * "how many docs is this reweighted corpus really worth" readout
    * next to the DSIR weights (an ESS ratio near 1/N means one
    * document dominates the resample). Max-shift first, then each w
    * quantizes to a long at 1e-12; the two sums are exact integers
    * until the final ratio. */
  def essCard(weights: DataFrame, grpCol: Column,
              logwCol: Column): DataFrame = {
    val base = weights.select(grpCol.as("g"), logwCol.as("lw"))
    val mx = base.groupBy(col("g")).agg(max(col("lw")).as("mw"))
    val q = base.join(mx, "g")
      .withColumn("wq",
        floor(exp(col("lw") - col("mw")) * 1e12 + 0.5).cast("long"))
    q.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("wq").cast("decimal(38,0)")).as("sw"),
        sum(col("wq").cast("decimal(38,0)") * col("wq")).as("sw2"))
      .select(col("g"), col("n"),
        round(col("sw").cast("double") * col("sw").cast("double") /
          col("sw2").cast("double"), 4).as("ess"),
        round(col("sw").cast("double") * col("sw").cast("double") /
          col("sw2").cast("double") / col("n"), 6).as("ess_ratio"))
  }

  /** Laspeyres / Paasche / Fisher price indices per period against the
    * base (first) period: with per-(item, period) exact integer price
    * mass sp (cents) and quantity mass sq,
    *   L_t = Σ (sp_t/sq_t)·sq_0 / Σ sp_0   (base-period basket)
    *   P_t = Σ sp_t / Σ (sp_0/sq_0)·sq_t   (current-period basket)
    *   F_t = √(L_t·P_t)
    * over items traded in BOTH periods (the matched basket). Each
    * unit-price×quantity term quantizes to a long at 1e-6 before its
    * sum — the index is a ratio of two order-free integer folds. The
    * inflation readout for "are prices drifting across my corpus
    * snapshots", one (item, period) groupBy + one equi-join on item. */
  def priceIndices(df: DataFrame, itemCol: Column, periodCol: Column,
                   priceCentsCol: Column, qtyCol: Column): DataFrame = {
    val cell = df.groupBy(itemCol.as("i"), periodCol.as("t"))
      .agg(sum(priceCentsCol).as("sp"), sum(qtyCol).as("sq"))
      .filter(col("sq") > 0)
    val base = cell.agg(min(col("t"))).head().get(0) // 1-row bounded pull
    // an empty / all-filtered input has no base period: every filter
    // below would silently compare against NULL and return an empty
    // frame — fail loudly instead (same posture as the KnowDb
    // guardrail: a mis-wired pipeline should not look like deflation)
    require(base != null,
      "priceIndices: input has no (item, period) cells with positive " +
        "quantity — no base period to index against")
    val b = cell.filter(col("t") === lit(base))
      .select(col("i"), col("sp").as("sp0"), col("sq").as("sq0"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val j = cell.filter(col("t") =!= lit(base)).join(b, "i")
    val lNum = floor((dec(col("sp")) * col("sq0")).cast("double") /
      col("sq") * 1e6 + 0.5).cast("long")
    val pDen = floor((dec(col("sp0")) * col("sq")).cast("double") /
      col("sq0") * 1e6 + 0.5).cast("long")
    val agg = j.groupBy(col("t"))
      .agg(count(lit(1)).as("n_items"),
        sum(lNum).as("ln"), sum(col("sp0")).as("ld"),
        sum(col("sp")).as("pn"), sum(pDen).as("pd"))
    val lasp = col("ln").cast("double") / 1e6 / col("ld")
    val paas = col("pn").cast("double") / (col("pd").cast("double") / 1e6)
    agg.select(col("t").as("period"), col("n_items"),
        when(col("ld") > 0, round(lasp, 6)).as("laspeyres"),
        when(col("pd") > 0, round(paas, 6)).as("paasche"),
        when(col("ld") > 0 && col("pd") > 0,
          round(sqrt(lasp * paas), 6)).as("fisher"))
  }

  /** Sample-ratio-mismatch check per group: distinct units by variant
    * against the expected 50/50 split — χ² = (n_a−n_b)²/n with 1 df and
    * the α=0.05 flag (3.841). The FIRST sanity gate on any experiment
    * readout: a significant SRM means the assignment (not the metric)
    * is broken, and every downstream z/MWU/CUPED number is void.
    * Exact integer unit counts; one distinct + one groupBy. */
  def srmCheck(df: DataFrame, grpCol: Column, unitCol: Column,
               variantCol: Column): DataFrame = {
    val units = df.select(grpCol.as("g"), unitCol.as("u"),
      variantCol.cast("int").as("v")).distinct()
    val agg = units.groupBy(col("g"))
      .agg(sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("n_b"))
    val n = col("n_a") + col("n_b")
    val chi2 = ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
      .cast("double") / n
    agg.select(col("g"), col("n_a"), col("n_b"),
      when(n > 0, round(chi2, 6)).as("chi2"),
      when(n > 0, chi2 > 3.841).as("srm_flag"))
  }

  /** Cliff's delta ordinal effect size per group between two variants:
    * δ = (#(a>b) − #(a<b)) / (n_a·n_b) — the assumption-free "how
    * often does A beat B" companion to [[mannWhitney]]'s significance
    * (a tiny δ can still be "significant" at scale; δ says whether it
    * matters). Counted EXACTLY via the tie-block cumulative trick:
    * group values into distinct-value blocks, one partitioned window
    * gives the strictly-below mass, products and sums stay long
    * integers until the single final division. Magnitude labels use
    * Romano et al. 2006 thresholds (0.147/0.33/0.474).
    *
    * Scale: same contract as MWU — windows partition BY GROUP over
    * the bounded distinct-value frame, never a global sort. */
  def cliffsDelta(df: DataFrame, grpCol: Column, variantCol: Column,
                  valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = df.select(grpCol.as("g"), variantCol.cast("int").as("v"),
      valueCol.as("x"))
    val bv = e.groupBy(col("g"), col("x"))
      .agg(sum(when(col("v") === 0, 1L).otherwise(0L)).as("ta"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("tb"))
    val wBelow = Window.partitionBy(col("g")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("g"))
    val cum = bv
      .withColumn("bBelow", coalesce(sum(col("tb")).over(wBelow), lit(0L)))
      .withColumn("bTot", sum(col("tb")).over(wAll))
    val agg = cum.groupBy(col("g")).agg(
      sum(col("ta")).as("n_a"), first(col("bTot")).as("n_b"),
      sum(col("ta") * col("bBelow")).as("gt"),
      sum(col("ta") * (col("bTot") - col("bBelow") - col("tb"))).as("lt"))
    val delta = (col("gt") - col("lt")).cast("double") /
      (col("n_a").cast("double") * col("n_b"))
    agg.select(col("g"), col("n_a"), col("n_b"), col("gt"), col("lt"),
      when(col("n_a") > 0 && col("n_b") > 0, round(delta, 6)).as("delta"),
      when(col("n_a") > 0 && col("n_b") > 0,
        when(abs(delta) < 0.147, "negligible")
          .when(abs(delta) < 0.33, "small")
          .when(abs(delta) < 0.474, "medium")
          .otherwise("large")).as("magnitude"))
  }

  /** Brown–Forsythe homogeneity-of-variance test: one-way ANOVA over
    * the absolute deviations from each group's MEDIAN (the
    * robust-center Levene variant) — the precondition check the
    * equal-variance readouts (ANOVA itself, pooled-σ z tests) assume
    * and never verify. Medians are exact nearest-rank over integer
    * cents; |c − med| stays integer into [[anovaOneWay]]'s exact
    * moment machinery. */
  def brownForsythe(df: DataFrame, grpCol: Column,
                    valueCol: Column): DataFrame = {
    val base = df.select(grpCol.as("g"),
      floor(valueCol * 100 + 0.5).cast("long").as("c"))
    val med = exactPercentilesByGroup(base, col("g"), col("c"), Seq(50))
      .select(col("g"), col("p50"))
    val y = base.join(med, "g")
      .select(col("g"), (abs(col("c") - col("p50")).cast("double") /
        lit(100.0)).as("y"))
    anovaOneWay(y, col("g"), col("y"))
  }

  /** Herfindahl–Hirschman concentration per group: units' value shares
    * squared and summed (0–10,000 scale), the top unit's share, and the
    * effective competitor count 1/Σs² — the market-concentration
    * readout next to [[gini]]'s inequality and [[diversity]]'s
    * entropy (HHI is what reads a 2-supplier 50/50 split as "5000,
    * effectively 2 players").
    *
    * Values aggregate exactly per (group, unit) first; each squared
    * share quantizes to a long at 1e-10 before the per-group sum, so
    * partial-agg order can't move the fold. Two groupBys, one join on
    * the bounded unit frame. */
  def hhi(df: DataFrame, grpCol: Column, unitCol: Column,
          valueCol: Column): DataFrame = {
    val units = df.groupBy(grpCol.as("g"), unitCol.as("u"))
      .agg(sum(valueCol).as("v"))
    val tot = units.groupBy(col("g"))
      .agg(count(lit(1)).as("n_units"), sum(col("v")).as("tv"),
        max(col("v")).as("mv"))
    val share = col("v").cast("double") / col("tv")
    units.join(tot, "g")
      .groupBy(col("g"))
      .agg(first(col("n_units")).as("n_units"),
        first(col("tv")).as("total"),
        first(col("mv")).as("mv"),
        sum(floor(share * share * lit(1e10) + lit(0.5)).cast("long"))
          .as("hq"))
      .select(col("g"), col("n_units"), col("total"),
        round(col("mv").cast("double") / col("total"), 6).as("top_share"),
        round(col("hq").cast("double") / lit(1e6), 2).as("hhi"),
        when(col("hq") > 0, round(lit(1e10) / col("hq"), 4))
          .as("n_effective"))
  }

  /** Experiment-design power card: per group, the baseline conversion
    * p₁ = Σconv/n (exact integer counts), the target p₂ = p₁·(1+MDE)
    * capped below 1, and the per-arm sample size for a two-proportion
    * z-test at the given α/power,
    *
    *   n = ⌈(z_{α/2}·√(2p̄(1−p̄)) + z_β·√(p₁(1−p₁)+p₂(1−p₂)))² / (p₁−p₂)²⌉
    *
    * with p̄ = (p₁+p₂)/2 — the "how long must this experiment run"
    * readout that belongs next to [[twoProportionZ]]'s verdict. The
    * normal quantiles ride as Scala literals (the documented
    * cross-engine libm contract: no probit in either engine), so both
    * engines evaluate the identical arithmetic tree on exact inputs.
    * One groupBy; everything after is per-group scalar math. */
  def powerTwoProportion(df: DataFrame, grpCol: Column, convCol: Column,
                         relMde: Double = 0.10, zAlpha: Double = PowerZAlpha,
                         zBeta: Double = PowerZBeta): DataFrame = {
    val base = df.groupBy(grpCol.as("g"))
      .agg(count(lit(1)).as("n"),
        sum(when(convCol, 1L).otherwise(0L)).as("conv"))
    val p1 = col("conv").cast("double") / col("n")
    val p2 = least(p1 * lit(1.0 + relMde), lit(0.999))
    val pbar = (p1 + p2) / 2.0
    val num = lit(zAlpha) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar)) +
      lit(zBeta) * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
    val nArm = ceil(num * num / ((p1 - p2) * (p1 - p2))).cast("long")
    base.select(col("g"), col("n"), col("conv"),
      round(p1, 6).as("p1"), round(p2, 6).as("p2"),
      when(col("conv") > 0 && p1 < lit(0.999), nArm).as("n_per_arm"))
  }

  /** z_{0.975} and z_{0.80} — the published two-sided-5%/80%-power
    * normal quantiles [[powerTwoProportion]] interpolates into both
    * engines (neither ships a probit). */
  val PowerZAlpha = 1.959963984540054
  val PowerZBeta = 0.8416212335729143

  /** SPRT constants for oracle interpolation — the exact literals
    * [[sprtBernoulli]] bakes into the plan. */
  def sprtConstants(p0: Double, p1: Double, alpha: Double,
                    beta: Double): (Double, Double, Double, Double) =
    (math.log(p1 / p0), math.log((1 - p1) / (1 - p0)),
      math.log((1 - beta) / alpha), math.log(beta / (1 - alpha)))
}
