package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series smoothing over bucketed event counts — the forecasting
  * primitive the hourly-anomaly operator's z-scores don't provide: a
  * one-step-ahead level via simple exponential smoothing,
  * `s₁ = x₁, s_t = α·x_t + (1−α)·s_{t−1}` (the forecast for t+1 IS the
  * level). α near 1 tracks, α near 0 smooths.
  *
  * Scale shape: one (key, bucket) partial aggregation over the scan,
  * then the fold runs per key over its bucket-count ARRAY — bounded by
  * the observation span in buckets (hundreds to thousands of doubles
  * per key), deterministic because `sort_array` fixes the fold order
  * and both engines execute the identical left-to-right op sequence
  * (DuckDB `list_reduce` replays it exactly — same init-from-first
  * convention). Keys fold independently; no window over the scan.
  */
object TimeSeries {

  def expSmoothing(events: DataFrame, keyCol: String = "event_type",
                   tsCol: String = "ts", alpha: Double = 0.3,
                   bucketUs: Long = 3600000000L): DataFrame = {
    val hourly = events
      .select(col(keyCol).as("k"),
        expr(s"unix_micros($tsCol) DIV $bucketUs").as("bucket"))
      .groupBy(col("k"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val seq0 = hourly.groupBy(col("k"))
      .agg(count(lit(1)).as("n_buckets"),
        sort_array(collect_list(struct(col("bucket"), col("cnt"))))
          .as("ord"))
      .select(col("k"), col("n_buckets"),
        transform(col("ord"), e => e.getField("cnt")).as("xs"))
    seq0.select(col("k").as(keyCol), col("n_buckets"),
      round(aggregate(
        slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
        element_at(col("xs"), 1),
        (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc), 6)
        .as("level"))
  }

  /** Holt double-exponential smoothing per key (level + trend,
    * Holt 1957): `s_t = α·x_t + (1−α)(s_{t−1}+b_{t−1})`,
    * `b_t = β(s_t−s_{t−1}) + (1−β)b_{t−1}`, init `s=x₂, b=x₂−x₁`
    * (fold starts at x₃; the t=2 step under this init is the
    * identity). One-step forecast = s_n + b_n — the trend-aware
    * upgrade of [[expSmoothing]]'s flat level.
    *
    * Same determinism contract as [[expSmoothing]]: per key the fold
    * runs left-to-right over the sort_array-ordered bucket-count
    * array with the identical scalar op sequence in both engines
    * (DuckDB replays it via list_reduce with the init element
    * prepended — its list_reduce has no init argument, so both the
    * init and each x ride a uniform {v,s,b} struct). Keys with a
    * single bucket emit NULL level/trend. */
  def holtSmoothing(events: DataFrame, keyCol: String = "event_type",
                    tsCol: String = "ts", alpha: Double = 0.3,
                    beta: Double = 0.2,
                    bucketUs: Long = 3600000000L): DataFrame = {
    val hourly = events
      .select(col(keyCol).as("k"),
        expr(s"unix_micros($tsCol) DIV $bucketUs").as("bucket"))
      .groupBy(col("k"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val seq0 = hourly.groupBy(col("k"))
      .agg(count(lit(1)).as("n_buckets"),
        sort_array(collect_list(struct(col("bucket"), col("cnt"))))
          .as("ord"))
      .select(col("k"), col("n_buckets"),
        transform(col("ord"), e => e.getField("cnt")).as("xs"))
    val a = lit(alpha); val na = lit(1.0 - alpha)
    val bb = lit(beta); val nb = lit(1.0 - beta)
    def sNext(acc: Column, x: Column): Column =
      a * x + na * (acc.getField("s") + acc.getField("b"))
    val init = struct(element_at(col("xs"), 2).as("s"),
      (element_at(col("xs"), 2) - element_at(col("xs"), 1)).as("b"))
    val fin = aggregate(
      slice(col("xs"), lit(3), greatest(size(col("xs")) - 2, lit(0))),
      init,
      (acc, x) => struct(sNext(acc, x).as("s"),
        (bb * (sNext(acc, x) - acc.getField("s")) +
          nb * acc.getField("b")).as("b")))
    seq0.select(col("k").as(keyCol), col("n_buckets"),
      when(col("n_buckets") >= 2, round(fin.getField("s"), 6)).as("level"),
      when(col("n_buckets") >= 2, round(fin.getField("b"), 6)).as("trend"),
      when(col("n_buckets") >= 2,
        round(fin.getField("s") + fin.getField("b"), 6)).as("forecast"))
  }

  /** Theil–Sen robust trend per key: the MEDIAN of all pairwise slopes
    * (c_j − c_i)/(d_j − d_i) over the key's daily-count series — the
    * outlier-resistant answer to "is this event type growing", immune
    * to the single traffic spike that wrecks an OLS fit (breakdown
    * point 29.3%, Sen 1968).
    *
    * Scale shape: slopes are O(days²) per key, so the pair join runs on
    * the aggregated per-(key, day) frame — bounded by the calendar, not
    * the event count (a year is ~66k pairs/key) — and is an equi-join
    * on the key, never a cartesian across keys. The median is Spark's
    * exact interpolated `percentile` over that bounded pair frame,
    * matching DuckDB's `median` for the oracle. */
  def theilSen(events: DataFrame, keyCol: Column, tsCol: Column,
               valueAgg: Column): DataFrame = {
    val daily = events
      .groupBy(keyCol.as("k"), unix_date(to_date(tsCol)).as("d"))
      .agg(valueAgg.as("c"))
    val a = daily.select(col("k"), col("d").as("d1"), col("c").as("c1"))
    val b = daily.select(col("k").as("k2"), col("d").as("d2"), col("c").as("c2"))
    a.join(b, col("k") === col("k2") && col("d1") < col("d2"))
      .select(col("k"),
        ((col("c2") - col("c1")).cast("double") /
          (col("d2") - col("d1")).cast("double")).as("slope"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)"), 4).as("sen_slope"))
  }

  /** Single-changepoint detection per key over the daily series: the
    * split point that maximizes the between-segment SSE reduction
    * gain(t) = S_L²/n_L + S_R²/n_R − S²/n (the depth-1 step of binary
    * segmentation / CART's variance split — the level-shift alarm that
    * the hourly z-score anomaly can't localize). `cp_day` is the LAST
    * day of the left segment.
    *
    * Scale shape: one (key, day) partial agg, cumulative windows
    * partitioned by key over the days-bounded frame, the argmax as a
    * per-key rank window — never a scan-sized window. Prefix sums are
    * exact longs squared in decimal(38,0) (longs overflow past ~3e9
    * total volume per key), so the gain is one fixed IEEE dag both
    * engines replay; ties break on the earlier day. */
  def changepoint(events: DataFrame, keyCol: Column, tsCol: Column,
                  valueAgg: Column): DataFrame = {
    val daily = events
      .groupBy(keyCol.as("k"), to_date(tsCol).as("d"))
      .agg(valueAgg.cast("long").as("c"))
    val byDay = Window.partitionBy(col("k")).orderBy(col("d"))
    val wCum = byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("k"))
    def sq(c: Column) =
      (c.cast("decimal(38,0)") * c.cast("decimal(38,0)")).cast("double")
    val cand = daily
      .withColumn("i", row_number().over(byDay))
      .withColumn("sl", sum(col("c")).over(wCum))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s", sum(col("c")).over(wAll))
      .where(col("i") < col("n"))
      .withColumn("gain",
        sq(col("sl")) / col("i") +
          sq(col("s") - col("sl")) / (col("n") - col("i")) -
          sq(col("s")) / col("n"))
    val wBest = Window.partitionBy(col("k"))
      .orderBy(col("gain").desc, col("d"))
    cand.withColumn("rn", row_number().over(wBest)).where(col("rn") === 1)
      .select(col("k"), col("d").as("cp_day"), col("n").as("n_days"),
        round(col("gain"), 4).as("gain"),
        round(col("sl").cast("double") / col("i"), 4).as("mean_before"),
        round((col("s") - col("sl")).cast("double") / (col("n") - col("i")),
          4).as("mean_after"))
  }

  /** Autocorrelation function of the per-key daily-count series at lags
    * 1..maxLag — the diagnostic that tells a pipeline whether its
    * metric has weekly structure worth a seasonal model (pairs with
    * [[graft.operators.Metrics]]' seasonality decomposition).
    *
    * Index-based ACF over the observed-day series (days with zero
    * events don't produce rows, so lags count observed days, the same
    * convention the repo's other daily-series ops use). All sufficient
    * statistics are exact integer/decimal sums — Σx, Σx², Σx·x₊ₖ and
    * the head/tail sums per lag — collected by ONE window pass (all
    * `lead` columns share the window spec, so Catalyst evaluates them
    * in a single Window operator) plus one partial agg per key; the
    * only floating-point work is the final per-(key,lag) expression,
    * written with the same association shape the oracle replays, so the
    * result is bit-deterministic under any partitioning. Constant
    * series (zero variance) yield NULL r. */
  /** CUSUM upward-drift statistic over per-key daily counts (Page
    * 1954), in the prefix-sum closed form that makes the sequential
    * recursion window-expressible:
    *   S_t = max(0, S_{t−1} + x_t − μ − kσ)
    *       = P_t − min(0, min_{j≤t} P_j),  P = running Σ(x − μ − kσ).
    * Output per key: series length, σ, max drift statistic, the day it
    * peaked, and the FIRST alarm day where S crossed hσ (NULL = no
    * alarm) — the "when did this segment's volume start drifting"
    * readout, the sequential complement to the retrospective
    * changepoint query. Standard k=0.5, h=4 defaults.
    *
    * Determinism: μ and σ are single double expressions off exact
    * integer moments; the running sums evaluate sequentially in day
    * order inside each key partition — the same order in any engine,
    * so the doubles agree bit-for-bit. One groupBy + one ordered
    * window pass per key; no global sort. */
  def cusumDrift(events: DataFrame, keyCol: Column, tsCol: Column,
                 k: Double = 0.5, h: Double = 4.0): DataFrame = {
    val daily = events
      .groupBy(keyCol.as("k"), to_date(tsCol).as("d"))
      .agg(count(lit(1)).as("c"))
    val byKey = Window.partitionBy(col("k"))
    val byDay = Window.partitionBy(col("k")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = daily
      .withColumn("n", count(lit(1)).over(byKey))
      .withColumn("s1", sum(col("c")).over(byKey))
      .withColumn("s2", sum(col("c") * col("c")).over(byKey))
    val mu = col("s1").cast("double") / col("n")
    val sigma = sqrt(greatest(
      col("s2").cast("double") / col("n") - mu * mu, lit(0.0)))
    // per-day deviation quantized to integers at 1e-6 BEFORE the
    // running sum: windowed double sums are engine-internal association
    // (segment trees vs streaming), integer prefix sums are exact under
    // any association — the only doubles left are the single-expression
    // μ/σ and the final /1e6 readout
    val withP = stats
      .withColumn("mu", mu).withColumn("sigma", sigma)
      .withColumn("zq",
        floor((col("c").cast("double") - col("mu") - lit(k) * col("sigma"))
          * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("p", sum(col("zq")).over(byDay))
      .withColumn("s",
        col("p") - least(lit(0L), min(col("p")).over(byDay)))
    val withS = withP.withColumn("smax", max(col("s")).over(byKey))
    withS.groupBy(col("k"))
      .agg(first(col("n")).as("n_days"),
        round(first(col("sigma")), 4).as("sigma"),
        round(first(col("smax")).cast("double") / lit(1e6), 4)
          .as("max_cusum"),
        min(when(col("s") === col("smax"), col("d"))).as("peak_day"),
        min(when(col("s").cast("double") >
          lit(h) * col("sigma") * lit(1e6), col("d"))).as("alarm_day"))
  }

  /** Poisson trend regression per key: daily counts modeled as
    * y_d ~ Poisson(exp(β0 + β1·x_d)) with x = day − first day, fit by
    * `iters` Newton–Raphson steps (closed-form 2×2 solve — no matrix
    * library). exp(β1) is the multiplicative daily growth rate with
    * its natural uncertainty-free replay: the GLM answer to "is this
    * feed growing" that [[theilSen]] answers robustly but without a
    * rate model.
    *
    * Determinism: init β = (ln ȳ, 0) from exact integer sums; each
    * step's six moment sums quantize to longs at 1e-6 over the
    * calendar-bounded daily frame; β components round to 12 dp per
    * step; exp/ln on identical doubles (the LR sigmoid precedent).
    *
    * Scale shape: one (key, day) partial agg over the scan; the
    * iteration joins a keys-sized β frame back to the daily frame —
    * both bounded by calendar × key cardinality. */
  def poissonTrend(events: DataFrame, keyCol: Column, tsCol: Column,
                   iters: Int = 3): DataFrame = {
    // decimal accumulators: at production volumes a 1e6-scaled
    // mu*x^2 term is ~1e15 per day and the calendar sum passes 2^53
    def q(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("decimal(38,0)")
    val daily = events
      .groupBy(keyCol.as("k"), unix_date(to_date(tsCol)).as("d"))
      .agg(count(lit(1)).cast("double").as("y"))
    val xd = daily.groupBy(col("k")).agg(min(col("d")).as("d0"))
    val pts = daily.join(xd, "k")
      .select(col("k"), (col("d") - col("d0")).cast("double").as("x"),
        col("y"))
      .localCheckpoint()
    var beta = pts.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      .select(col("k"), col("n"),
        round(log(col("sy") / col("n")), 12).as("b0"),
        lit(0.0).as("b1"))
    for (_ <- 1 to iters) {
      val mu = exp(col("b0") + col("b1") * col("x"))
      val stepAgg = pts.join(beta, "k")
        .select(col("k"), col("n"), col("b0"), col("b1"), col("x"),
          col("y"), mu.as("mu"))
        .groupBy(col("k"))
        .agg(first(col("n")).as("n"), first(col("b0")).as("pb0"),
          first(col("b1")).as("pb1"),
          sum(q(col("y") - col("mu"))).as("g0"),
          sum(q((col("y") - col("mu")) * col("x"))).as("g1"),
          sum(q(col("mu"))).as("h00"),
          sum(q(col("mu") * col("x"))).as("h01"),
          sum(q(col("mu") * col("x") * col("x"))).as("h11"))
      def u(c: Column) = c.cast("double") / lit(1e6)
      val (g0, g1) = (u(col("g0")), u(col("g1")))
      val (h00, h01, h11) = (u(col("h00")), u(col("h01")), u(col("h11")))
      val det = h00 * h11 - h01 * h01
      beta = stepAgg.select(col("k"), col("n"),
        round(col("pb0") + (h11 * g0 - h01 * g1) / det, 12).as("b0"),
        round(col("pb1") + (h00 * g1 - h01 * g0) / det, 12).as("b1"))
    }
    beta.select(col("k"), col("n").as("n_days"),
      round(col("b0"), 6).as("b0"), round(col("b1"), 6).as("b1"),
      round(exp(col("b1")), 6).as("daily_rate_ratio"))
  }

  /** Arrival burstiness per key: CV² of inter-arrival gaps (within
    * calendar day — cross-midnight gaps are schedule artifacts, and
    * the day bound caps the ordering-window partition at a day's
    * per-key volume; salt hot keys by sub-day buckets past that) and
    * the Fano factor of hourly counts (variance/mean; 1 = Poisson,
    * above = bursty). Gap moments ride decimal(38,0) — a squared
    * microsecond gap overflows a long — and every division happens
    * once, at the end, in double.
    *
    * Scale shape: one (key, day)-partitioned ordering window for the
    * gaps + two bounded aggs; the Fano side is a (key, bucket) partial
    * agg over the scan, never ordered. */
  def burstiness(events: DataFrame, keyCol: Column, tsCol: Column,
                 idCol: Column,
                 bucketUs: Long = 3600000000L): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val us = unix_micros(tsCol)
    val w = Window.partitionBy(col("k"), col("d"))
      .orderBy(col("t"), col("id"))
    val gaps = events
      .select(keyCol.as("k"), to_date(tsCol).as("d"), us.as("t"),
        idCol.as("id"))
      .withColumn("g", col("t") - lag(col("t"), 1).over(w))
      .filter(col("g").isNotNull)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_gaps"), sum(dec(col("g"))).as("sg"),
        sum(dec(col("g")) * dec(col("g"))).as("sgg"))
    val hourly = events
      .select(keyCol.as("k"), us.as("t"))
      .select(col("k"), expr(s"t DIV $bucketUs").as("b"))
      .groupBy(col("k"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("c")).as("sc"),
        sum(dec(col("c")) * dec(col("c"))).as("scc"))
    val mg = col("sg").cast("double") / col("n_gaps")
    val cv2 = (col("sgg").cast("double") / col("n_gaps") - mg * mg) /
      (mg * mg)
    val mc = col("sc").cast("double") / col("n_buckets")
    val fano = (col("scc").cast("double") / col("n_buckets") - mc * mc) / mc
    gaps.join(hourly, "k")
      .select(col("k"), col("n_gaps"), col("n_buckets"),
        round(mg / lit(1e6), 3).as("mean_gap_s"),
        when(col("n_gaps") > 0 && col("sg") > 0, round(cv2, 6)).as("cv2"),
        when(col("sc") > 0, round(fano, 6)).as("fano_hourly"))
  }

  /** Time-series coverage audit per key: observed vs spanned buckets
    * and the longest internal run of missing buckets — the "does this
    * feed have holes" check that catches a dead collector faster than
    * any distribution test. All windows run over the distinct-bucket
    * frame (calendar-bounded, never the event count). */
  def gapAudit(events: DataFrame, keyCol: Column, tsCol: Column,
               bucketUs: Long = 3600000000L): DataFrame = {
    val buckets = events
      .select(keyCol.as("k"), unix_micros(tsCol).as("t"))
      .select(col("k"), expr(s"t DIV $bucketUs").as("b"))
      .distinct()
    val w = Window.partitionBy(col("k")).orderBy(col("b"))
    buckets
      .withColumn("gap", col("b") - lag(col("b"), 1).over(w) - 1)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_observed"),
        (max(col("b")) - min(col("b")) + 1).as("span"),
        coalesce(max(col("gap")), lit(0L)).as("max_gap"))
      .select(col("k"), col("n_observed"), col("span"), col("max_gap"),
        round(col("n_observed").cast("double") / col("span"), 6)
          .as("coverage"))
  }

  def acf(events: DataFrame, keyCol: Column, tsCol: Column,
          maxLag: Int): DataFrame = {
    val daily = events
      .groupBy(keyCol.as("k"), to_date(tsCol).as("d"))
      .agg(count(lit(1)).as("c"))
    val byDay = Window.partitionBy(col("k")).orderBy(col("d"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val withLeads = (1 to maxLag).foldLeft(daily) { (df, kk) =>
      df.withColumn(s"l$kk", lead(col("c"), kk).over(byDay))
    }
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(dec(col("c")) * dec(col("c"))).as("sxx")) ++
      (1 to maxLag).flatMap { kk =>
        val lk = col(s"l$kk")
        Seq(sum(dec(col("c")) * dec(lk)).as(s"sxy$kk"),
          sum(when(lk.isNotNull, col("c"))).as(s"sh$kk"),
          sum(lk).as(s"st$kk"),
          count(lk).as(s"m$kk"))
      }
    val t = withLeads.groupBy(col("k")).agg(aggs.head, aggs.tail: _*)
    val xbar = col("s").cast("double") / col("n")
    val den = col("sxx").cast("double") - col("s").cast("double") * xbar
    val perLag = (1 to maxLag).map { kk =>
      val num = col(s"sxy$kk").cast("double") -
        xbar * col(s"sh$kk").cast("double") -
        xbar * col(s"st$kk").cast("double") +
        col(s"m$kk").cast("double") * xbar * xbar
      struct(lit(kk).as("lag"), col(s"m$kk").as("n_pairs"),
        when(den > 0, round(num / den, 4)).as("r"))
    }
    t.select(col("k"), col("n").as("n_days"),
        explode(array(perLag: _*)).as("x"))
      .select(col("k"), col("x.lag").as("lag"), col("n_days"),
        col("x.n_pairs").as("n_pairs"), col("x.r").as("r"))
      .where(col("n_pairs") > 0) // a lag past the series has no ACF
  }

  /** Wald–Wolfowitz runs test per key over daily counts: days above
    * the exact nearest-rank median become 1, below become 0, ties at
    * the median are EXCLUDED (the standard treatment), and the run
    * count R is tested against E[R] = 2n₁n₀/(n₁+n₀)+1 — "is this
    * series random, trending, or oscillating" (too few runs ⇒
    * clustering/trend; too many ⇒ alternation), the distribution-free
    * sanity check before fitting anything. Exact integers throughout;
    * one partitioned window for the run boundaries. */
  def runsTest(events: DataFrame, keyCol: Column,
               tsCol: Column): DataFrame = {
    val daily = events
      .groupBy(keyCol.as("k"), to_date(tsCol).as("d"))
      .agg(count(lit(1)).as("c"))
    val med = Metrics.exactPercentilesByGroup(daily, col("k"), col("c"),
        Seq(50))
      .select(col("g").as("k"), col("p50").as("med"))
    val signs = daily.join(med, "k")
      .filter(col("c") =!= col("med"))
      .withColumn("sg", when(col("c") > col("med"), 1L).otherwise(0L))
    val w = Window.partitionBy(col("k")).orderBy(col("d"))
    val withPrev = signs.withColumn("pv", lag(col("sg"), 1).over(w))
    val agg = withPrev.groupBy(col("k"))
      .agg(sum(col("sg")).as("n1"),
        sum(lit(1L) - col("sg")).as("n0"),
        (sum(when(col("pv").isNull || col("pv") =!= col("sg"), 1L)
          .otherwise(0L))).as("r"))
    val n = col("n1") + col("n0")
    val er = lit(2.0) * col("n1") * col("n0") / n + lit(1.0)
    val vr = lit(2.0) * col("n1") * col("n0") *
      (lit(2.0) * col("n1") * col("n0") - col("n1") - col("n0")) /
      (n.cast("double") * n * (n - 1))
    agg.select(col("k"), col("n1"), col("n0"), col("r").as("runs"),
      when(col("n1") > 0 && col("n0") > 0, round(er, 4)).as("expected"),
      when(col("n1") > 0 && col("n0") > 0 && vr > 0,
        round((col("r").cast("double") - er) / sqrt(vr), 4)).as("z"))
  }

  /** Holt–Winters ADDITIVE SEASONAL smoothing per key over daily
    * counts (Winters 1960), period m: the third member of the
    * smoothing family — [[expSmoothing]] reads level, [[holtSmoothing]]
    * adds trend, this adds the weekly shape. Classic init (l₀ = mean
    * of week 1, b₀ = (mean week 2 − mean week 1)/m, s_i = x_i − l₀),
    * then for t > 2m:
    *   l' = α(x−s_{t−m}) + (1−α)(l+b);  b' = β(l'−l) + (1−β)b;
    *   s_t = γ(x−l') + (1−γ)s_{t−m}
    * with the seasonal vector carried as a sliding array INSIDE the
    * fold state — the aggregate() struct fold extended to an array
    * field, same identical-double-sequence contract as Holt, so the
    * whole thing replays as a recursive CTE with a LIST column.
    * Keys with fewer than 2m days are dropped (no valid init).
    * Output: final level/trend, next-step forecast l+b+s_next, and the
    * seasonal amplitude max(s)−min(s). */
  def holtWinters(events: DataFrame, keyCol: Column, tsCol: Column,
                  m: Int = 7, alpha: Double = 0.3, beta: Double = 0.1,
                  gamma: Double = 0.2): DataFrame = {
    val daily = events
      .groupBy(keyCol.as("k"), to_date(tsCol).as("d"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val seq0 = daily.groupBy(col("k"))
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("d"), col("cnt")))).as("ord"))
      .select(col("k"), col("n_days"),
        transform(col("ord"), e => e.getField("cnt")).as("xs"))
      .filter(col("n_days") >= 2 * m)
    val a = lit(alpha); val na = lit(1.0 - alpha)
    val bb = lit(beta); val nb = lit(1.0 - beta)
    val g = lit(gamma); val ng = lit(1.0 - gamma)
    def winSum(from: Int) =
      aggregate(slice(col("xs"), lit(from), lit(m)), lit(0.0),
        (acc, x) => acc + x)
    val l0 = winSum(1) / m
    val b0 = (winSum(m + 1) / m - l0) / m
    val ss0 = transform(slice(col("xs"), lit(1), lit(m)), x => x - l0)
    val init = struct(l0.as("l"), b0.as("b"), ss0.as("ss"))
    def lNext(acc: Column, x: Column): Column =
      a * (x - element_at(acc.getField("ss"), 1)) +
        na * (acc.getField("l") + acc.getField("b"))
    val fin = aggregate(
      slice(col("xs"), lit(2 * m + 1),
        greatest(size(col("xs")) - 2 * m, lit(0))),
      init,
      (acc, x) => struct(
        lNext(acc, x).as("l"),
        (bb * (lNext(acc, x) - acc.getField("l")) +
          nb * acc.getField("b")).as("b"),
        concat(slice(acc.getField("ss"), 2, m - 1),
          array(g * (x - lNext(acc, x)) +
            ng * element_at(acc.getField("ss"), 1))).as("ss")))
    seq0.select(col("k"), col("n_days"),
      round(fin.getField("l"), 6).as("level"),
      round(fin.getField("b"), 6).as("trend"),
      round(fin.getField("l") + fin.getField("b") +
        element_at(fin.getField("ss"), 1), 6).as("forecast"),
      round(array_max(fin.getField("ss")) -
        array_min(fin.getField("ss")), 6).as("seasonal_amplitude"))
  }

  /** Interrupted-time-series effect per key (the CausalImpact-style
    * counterfactual readout, linear-trend flavor): fit y = a + b·x by
    * exact-moment OLS on the PRE-midpoint daily counts, extrapolate
    * into the post period, and compare actual to predicted mass —
    * absolute and relative effect. The "did the launch change the
    * level" answer when there is no control arm (DiD's sibling for
    * n_arms = 1). Day indices are small exact integers, OLS moments
    * are exact longs, each per-day prediction quantizes at 1e-6
    * before the post-period sum. */
  def interruptedTimeSeries(events: DataFrame, keyCol: Column,
                            tsCol: Column): DataFrame = {
    val daily = events
      .groupBy(keyCol.as("k"), to_date(tsCol).as("d"))
      .agg(count(lit(1)).as("c"))
    val idx = daily.withColumn("i",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("d"))))
    val n = idx.groupBy(col("k")).agg(count(lit(1)).as("nd"))
    val base = idx.join(n, "k")
      .withColumn("pre", col("i") <= col("nd") / 2)
    val ols = base.filter(col("pre"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("np"), sum(col("i")).as("sx"),
        sum(col("c")).as("sy"), sum(col("i") * col("c")).as("sxy"),
        sum(col("i") * col("i")).as("sxx"))
      // a 1-day pre-period has no slope (np·sxx − sx² = 0): drop the
      // key rather than divide by zero — Spark's non-ANSI divide
      // yields NULL but an IEEE replay yields inf/NaN, so the only
      // engine-agnostic contract is "≥2 pre-period days or no row"
      .filter(col("np") >= 2)
    val den = (col("np") * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    val slope = (col("np") * col("sxy") - col("sx") * col("sy"))
      .cast("double") / den
    val icept = (col("sy").cast("double") - slope * col("sx")) / col("np")
    val withFit = base.filter(!col("pre"))
      .join(ols, "k")
      .withColumn("predq",
        floor((icept + slope * col("i")) * 1e6 + 0.5).cast("long"))
    withFit.groupBy(col("k"))
      .agg(first(col("np")).as("n_pre"), count(lit(1)).as("n_post"),
        sum(col("c")).as("actual_post"),
        sum(col("predq")).as("pq"))
      .select(col("k"), col("n_pre"), col("n_post"), col("actual_post"),
        round(col("pq").cast("double") / 1e6, 4).as("predicted_post"),
        round(col("actual_post").cast("double") -
          col("pq").cast("double") / 1e6, 4).as("abs_effect"),
        when(col("pq") > 0,
          round((col("actual_post").cast("double") -
            col("pq").cast("double") / 1e6) /
            (col("pq").cast("double") / 1e6), 6)).as("rel_effect"))
  }

  /** MAD robust-outlier card per key over daily counts
    * (Iglewicz–Hoaglin 1993): modified z = 0.6745·(c − median)/MAD
    * with MAD = median(|c − median|), flag |z| > 3.5 — the outlier
    * detector that survives the outliers themselves (a traffic spike
    * inflates σ and hides itself from a plain z-score; the median pair
    * doesn't move). Medians are exact nearest-rank integers
    * ([[graft.operators.Metrics.exactPercentilesByGroup]]); z is one
    * deterministic rational per day. */
  def madOutliers(events: DataFrame, keyCol: Column, tsCol: Column,
                  thresh: Double = 3.5): DataFrame = {
    val daily = events
      .groupBy(keyCol.as("k"), to_date(tsCol).as("d"))
      .agg(count(lit(1)).as("c"))
    val med = Metrics.exactPercentilesByGroup(daily, col("k"), col("c"),
        Seq(50))
      .select(col("g").as("k"), col("p50").as("med"))
    val withDev = daily.join(med, "k")
      .withColumn("dev", abs(col("c") - col("med")))
    val mad = Metrics.exactPercentilesByGroup(withDev, col("k"),
        col("dev"), Seq(50))
      .select(col("g").as("k"), col("p50").as("mad"))
    val z = lit(0.6745) * (col("c") - col("med")).cast("double") /
      col("mad")
    withDev.join(mad, "k")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_days"),
        first(col("med")).as("median"), first(col("mad")).as("mad"),
        sum(when(col("mad") > 0 && abs(z) > thresh, 1L).otherwise(0L))
          .as("n_outliers"),
        round(max(when(col("mad") > 0, abs(z))), 4).as("max_abs_z"),
        min(when(col("mad") > 0 && abs(z) > thresh, col("d")))
          .as("first_outlier_day"))
  }

  /** Hurst exponent per key by the aggregated-variance method
    * (Taqqu–Teverovsky–Willinger 1995): block-average the daily series
    * at sizes m ∈ {1,2,4,8}, regress ln Var(mean_m) on ln m — for a
    * self-similar process Var ~ m^{2H−2}, so H = 1 + slope/2. H ≈ 0.5
    * is memoryless; H → 1 means long-range dependence (bursts cluster
    * — the "is this series self-similar" readout next to ACF's fixed
    * lags).
    *
    * Block sums are exact integers; each Var is exact moments with ONE
    * division pair; ln(m) rides as Scala literals and both ln(Var) and
    * x quantize to longs at 1e-6 before the 4-point OLS, which then
    * runs in exact integer algebra until the final slope division. */
  def hurstAggVar(events: DataFrame, keyCol: Column, tsCol: Column,
                  ms: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    val daily = events
      .groupBy(keyCol.as("k"), to_date(tsCol).as("d"))
      .agg(count(lit(1)).as("c"))
    val idx = daily.withColumn("i",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("d"))))
    val perM = ms.map { m =>
      val blocks = idx.withColumn("b", expr(s"(i - 1) DIV $m"))
        .groupBy(col("k"), col("b"))
        .agg(count(lit(1)).as("bn"), sum(col("c")).as("bs"))
        .filter(col("bn") === m) // complete blocks only
      blocks.groupBy(col("k"))
        .agg(count(lit(1)).as("nb"), sum(col("bs")).as("s1"),
          sum(col("bs").cast("decimal(38,0)") * col("bs")).as("s2"))
        .select(col("k"), lit(m).as("m"), col("nb"),
          ((col("s2").cast("double") / col("nb") -
            (col("s1").cast("double") / col("nb")) *
              (col("s1").cast("double") / col("nb"))) /
            lit((m * m).toDouble)).as("varm"))
    }.reduce(_ unionAll _)
    val xLit = ms.tail.foldLeft(
      when(col("m") === ms.head, lit(math.log(ms.head.toDouble)))) {
      (acc, m) => acc.when(col("m") === m, lit(math.log(m.toDouble)))
    }
    val pts = perM.filter(col("nb") >= 2 && col("varm") > 0)
      .withColumn("xq", floor(xLit * 1e6 + 0.5).cast("long"))
      .withColumn("yq", floor(log(col("varm")) * 1e6 + 0.5).cast("long"))
    val o = pts.groupBy(col("k")).agg(count(lit(1)).as("np"),
      sum(col("xq")).as("sx"), sum(col("yq")).as("sy"),
      sum(col("xq") * col("yq")).as("sxy"),
      sum(col("xq") * col("xq")).as("sxx"))
    val slope = (col("np") * col("sxy") - col("sx") * col("sy"))
      .cast("double") /
      (col("np") * col("sxx") - col("sx") * col("sx")).cast("double")
    o.select(col("k"), col("np").as("n_scales"),
      when(col("np") >= 3, round(slope, 4)).as("slope"),
      when(col("np") >= 3, round(lit(1.0) + slope / 2.0, 4)).as("hurst"))
  }

  /** Partial autocorrelation at lags 1–3 per key via the closed-form
    * Durbin–Levinson recursion over the exact-moment ACF values:
    * φ₁₁ = r₁, φ₂₂ = (r₂−r₁²)/(1−r₁²), and φ₃₃ from the order-2
    * coefficients — "does lag k explain anything AFTER lags < k", the
    * AR-order readout [[acf]] alone can't give (a pure AR(1) shows
    * geometric ACF at every lag but PACF cuts off after 1).
    *
    * Same bounded daily-count moment shapes as [[acf]] (decimal
    * products, one groupBy); the Durbin–Levinson algebra is per-key
    * scalar math on deterministic doubles — both engines evaluate the
    * identical expression tree. */
  def pacf(events: DataFrame, keyCol: Column, tsCol: Column): DataFrame = {
    val daily = events
      .groupBy(keyCol.as("k"), to_date(tsCol).as("d"))
      .agg(count(lit(1)).as("c"))
    val byDay = Window.partitionBy(col("k")).orderBy(col("d"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val withLeads = (1 to 3).foldLeft(daily) { (df, kk) =>
      df.withColumn(s"l$kk", lead(col("c"), kk).over(byDay))
    }
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(dec(col("c")) * dec(col("c"))).as("sxx")) ++
      (1 to 3).flatMap { kk =>
        val lk = col(s"l$kk")
        Seq(sum(dec(col("c")) * dec(lk)).as(s"sxy$kk"),
          sum(when(lk.isNotNull, col("c"))).as(s"sh$kk"),
          sum(lk).as(s"st$kk"),
          count(lk).as(s"m$kk"))
      }
    val t0 = withLeads.groupBy(col("k")).agg(aggs.head, aggs.tail: _*)
    val xbar = col("s").cast("double") / col("n")
    val den = col("sxx").cast("double") - col("s").cast("double") * xbar
    def num(kk: Int) = col(s"sxy$kk").cast("double") -
      xbar * col(s"sh$kk").cast("double") -
      xbar * col(s"st$kk").cast("double") +
      col(s"m$kk").cast("double") * xbar * xbar
    val withR = t0
      .withColumn("r1", when(den > 0, num(1) / den))
      .withColumn("r2", when(den > 0, num(2) / den))
      .withColumn("r3", when(den > 0, num(3) / den))
    val d2 = lit(1.0) - col("r1") * col("r1")
    val p22 = (col("r2") - col("r1") * col("r1")) / d2
    val p21 = col("r1") - p22 * col("r1")
    val d3 = lit(1.0) - p21 * col("r1") - p22 * col("r2")
    val p33 = (col("r3") - p21 * col("r2") - p22 * col("r1")) / d3
    withR.select(col("k"), col("n").as("n_days"),
      round(col("r1"), 4).as("pacf1"),
      when(abs(d2) > 1e-12, round(p22, 4)).as("pacf2"),
      when(abs(d2) > 1e-12 && abs(d3) > 1e-12, round(p33, 4)).as("pacf3"))
  }

  /** EWMA control chart per key over daily counts (Roberts 1959; the
    * SPC chart with the time-varying startup limits): z_1 = x_1,
    * z_t = λx_t + (1−λ)z_{t−1}, alarm when |z_t − μ| exceeds
    * L·σ·√(λ/(2−λ)·(1−(1−λ)^{2t})). Where [[expSmoothing]] reads the
    * smoothed LEVEL, this reads the CONTROL verdict — alarm count,
    * first alarm index, final excursion — the small-persistent-shift
    * detector next to [[cusumDrift]]'s cumulative one.
    *
    * μ/σ come from exact integer daily-count moments; the recursion
    * folds per key over the bounded sorted day array via aggregate()
    * carrying (z, w=(1−λ)^{2t}, i, n_alarms, first_alarm) — the Holt
    * contract: both engines execute the IDENTICAL double sequence, so
    * the fold replays as a recursive CTE. */
  def ewmaControl(events: DataFrame, keyCol: Column, tsCol: Column,
                  lambda: Double = 0.2, l: Double = 3.0): DataFrame = {
    val daily = events
      .groupBy(keyCol.as("k"), to_date(tsCol).as("d"))
      .agg(count(lit(1)).as("c"))
    val base = daily.groupBy(col("k"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"),
        sort_array(collect_list(struct(col("d"), col("c")))).as("ord"))
      .withColumn("xs",
        transform(col("ord"), e => e.getField("c").cast("double")))
    val mu = col("s1").cast("double") / col("n_days")
    val sigma = sqrt(greatest(
      col("s2").cast("double") / col("n_days") - mu * mu, lit(0.0)))
    val lam = lit(lambda); val nl = lit(1.0 - lambda)
    val w2 = lit((1.0 - lambda) * (1.0 - lambda))
    val f = lit(lambda / (2.0 - lambda))
    val withStats = base.withColumn("mu", mu).withColumn("sigma", sigma)
    def limit(w: Column) =
      lit(l) * col("sigma") * sqrt(f * (lit(1.0) - w))
    val x1 = element_at(col("xs"), 1)
    val b1 = abs(x1 - col("mu")) > limit(w2)
    val init = struct(x1.as("z"), w2.as("w"), lit(1).as("i"),
      when(b1, 1L).otherwise(0L).as("na"),
      when(b1, 1).otherwise(lit(null).cast("int")).as("fa"))
    val fin = aggregate(
      slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
      init,
      (acc, x) => {
        val zp = lam * x + nl * acc.getField("z")
        val wp = acc.getField("w") * w2
        val br = abs(zp - col("mu")) > limit(wp)
        val ip = acc.getField("i") + 1
        struct(zp.as("z"), wp.as("w"), ip.as("i"),
          (acc.getField("na") + when(br, 1L).otherwise(0L)).as("na"),
          coalesce(acc.getField("fa"),
            when(br, ip).otherwise(lit(null).cast("int"))).as("fa"))
      })
    withStats.select(col("k"), col("n_days"),
      round(col("mu"), 4).as("mean"),
      round(col("sigma"), 4).as("sigma"),
      round(fin.getField("z"), 4).as("ewma_final"),
      fin.getField("na").as("n_alarms"),
      fin.getField("fa").as("first_alarm_i"))
  }

  /** Mann–Kendall trend test per key over daily event counts:
    * S = Σ_{i<j} sign(c_j − c_i) ordered by day, tie-corrected variance
    * Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18 over the tie
    * groups of the count value, and the continuity-corrected normal
    * z = (S∓1)/√Var(S). The nonparametric companion to [[theilSen]]:
    * Sen answers "how steep", MK answers "is there a monotone trend at
    * all" without assuming a functional form.
    *
    * Scale: the pairwise self-join runs on the DAILY-COUNT frame —
    * bounded by calendar days per key regardless of raw event volume,
    * the same contract as the Kendall/Theil–Sen operators. S and the
    * tie sums are exact longs; doubles appear only in the final z. */
  def mannKendallTrend(events: DataFrame, keyCol: Column,
                       tsCol: Column): DataFrame = {
    val daily = events
      .groupBy(keyCol.as("k"), to_date(tsCol).as("d"))
      .agg(count(lit(1)).as("c"))
    val b = daily.select(col("k").as("kb"), col("d").as("db"),
      col("c").as("cb"))
    val sgn = when(col("cb") > col("c"), 1L)
      .when(col("cb") < col("c"), -1L).otherwise(0L)
    val s = daily.join(b, col("k") === col("kb") && col("d") < col("db"))
      .groupBy(col("k")).agg(sum(sgn).as("s"))
    val ties = daily.groupBy(col("k"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("k"))
      .agg(sum(col("t")).as("n"),
        sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)).as("tsum"))
    val varS = (col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) -
      col("tsum")).cast("double") / 18.0
    val z = when(col("s") > 0,
        (col("s") - 1).cast("double") / sqrt(varS))
      .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(varS))
      .otherwise(lit(0.0))
    ties.join(s, Seq("k"))
      .select(col("k"), col("n").as("n_days"), col("s"),
        round(varS, 4).as("var_s"),
        when(varS > 0, round(z, 4)).as("z"))
  }

  /** Rolling DAU/WAU/MAU stickiness: per day, the distinct actives that
    * day against the trailing `weekDays`- and `monthDays`-day distinct
    * actives, plus the dau/wau and dau/mau engagement ratios product
    * analytics watches.
    *
    * Scale: one exact distinct shrinks raw events to |users|·|days|
    * user-day rows; each then fans out MAP-SIDE to its ≤`monthDays`
    * trailing report days (a bounded sequence explode — no range join,
    * no BNLJ, no per-day re-scan), and one groupBy counts the three
    * distinct-user sets. Fan-out is a constant factor, never
    * quadratic; report days past the observed calendar are dropped by
    * a broadcast semi-join on the bounded day frame. */
  def stickiness(events: DataFrame, userCol: Column, tsCol: Column,
                 weekDays: Int = 7, monthDays: Int = 28): DataFrame = {
    val userDays = events
      .select(userCol.as("u"), to_date(tsCol).as("d")).distinct()
    val days = userDays.select(col("d").as("rd")).distinct()
    val fan = userDays
      .select(col("u"), col("d"),
        explode(sequence(lit(0), lit(monthDays - 1))).as("o"))
      .select(col("u"), col("o"), date_add(col("d"), col("o")).as("rd"))
      .join(broadcast(days), Seq("rd"), "left_semi")
    fan.groupBy(col("rd"))
      .agg(
        countDistinct(when(col("o") === 0, col("u"))).as("dau"),
        countDistinct(when(col("o") < weekDays, col("u"))).as("wau"),
        countDistinct(col("u")).as("mau"))
      .select(col("rd").as("d"), col("dau"), col("wau"), col("mau"),
        round(col("dau").cast("double") / col("wau"), 4).as("dau_wau"),
        round(col("dau").cast("double") / col("mau"), 4).as("dau_mau"))
  }
}
