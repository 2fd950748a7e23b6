package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top principal component of an embedding column by power iteration
  * (von Mises): v ← normalize(Ĉv), Ĉ the centered second-moment
  * matrix, never materialized — each round is ONE pass computing
  * per-row projections x̂·v and the per-dim back-projection
  * Σ_r x̂_d (x̂·v). The readout a curation pipeline wants from it: the
  * dominant direction's loadings, its variance share (explained_ratio
  * — "is this corpus effectively one-dimensional?", the classic
  * anisotropy/rogue-dimension diagnostic for embedding spaces), and
  * the per-dim means.
  *
  * Scale shape (r13 optimization — guide §2.3/§2.4 "aggregate before
  * you shuffle / remove shuffles outright"): the centered relation
  * stays ARRAY-NATIVE, (id, x̂[D]) — one scratch-cached row per input
  * row, never exploded. Each power round is then a single
  * whole-stage-codegen pass: the projection x̂·v is a ROW-LOCAL
  * quantized dot product against the round's vector literal (no join,
  * no shuffle — the pre-r13 exploded layout paid an exchange for the
  * per-id regroup plus a second exchange + join per round), and the
  * per-dim back-projection is ONE global aggregate of D partial sums
  * (map-side combine; only D decimals cross the network) feeding the
  * D-bounded driver collect. `iters` passes total — the standard
  * power-iteration cost; converges at the λ₂/λ₁ rate. At corpus scale
  * this shuffles ZERO rows per round where the exploded layout
  * shuffled N·D rows twice.
  *
  * Determinism contract (SQL-replayable, partition-invariant,
  * UNCHANGED from the exploded layout — the oracle replays the same
  * integers): every cross-ROW sum quantizes summands to integers at
  * 1e9 (projections, back-projections, final variance folds — the
  * cross-row folds still accumulate as decimal(38,0) for 128-bit
  * headroom; the per-ROW dot product is a D-bounded long sum, exactly
  * the same integers the decimal fold produced). The cross-DIM
  * normalizer quantizes at 1e12 after a scale-free division by the
  * max-|w| component; the new v rounds to 12 dp each round with its
  * sign pinned positive at the max-|w| dimension (ties → smallest d).
  * The oracle replays the identical arithmetic as unrolled
  * MATERIALIZED CTEs (SparkEntry `emb_pca_power`).
  */
object Pca {

  private def q9(c: Column) =
    floor(c * lit(1e9) + lit(0.5)).cast("decimal(38,0)")

  /** Per-term 1e9 quantizer for the ROW-LOCAL (D-bounded) folds: the
    * same floor(x·1e9 + 0.5) integers as [[q9]], held as long — D
    * terms of ≲1e12 each stay far inside long range, and equal the
    * decimal fold bit-for-bit. */
  private def q9l(c: Column) = floor(c * lit(1e9) + lit(0.5)).cast("long")

  private def arrLit(a: Array[Double]): Column = array(a.map(lit): _*)

  /** Row-local quantized dot product Σ_d floor(x̂_d·v_d·1e9 + 0.5) —
    * null terms (ragged/null elements) are skipped, matching the
    * exploded layout's null-skipping decimal sum. */
  private def dotQ(xhCol: Column, v: Array[Double]): Column =
    aggregate(
      filter(zip_with(xhCol, arrLit(v), (x, s) => q9l(x * s)),
        t => t.isNotNull),
      lit(0L), (acc, t) => acc + t)

  /** Row-local quantized sum of squares Σ_d floor(x̂_d²·1e9 + 0.5). */
  private def sqQ(xhCol: Column): Column =
    aggregate(
      filter(transform(xhCol, x => q9l(x * x)), t => t.isNotNull),
      lit(0L), (acc, t) => acc + t)

  /** The quantized power-iteration loop over a centered (id, x̂[D])
    * relation — shared by the top-component and the deflated
    * second-component paths. One job per round: row-local projection,
    * one global D-column aggregate, one D-sized collect. */
  private def iterate(xh: DataFrame, dims: Int, iters: Int): Array[Double] = {
    var v = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    for (_ <- 1 to iters) {
      // one round = ONE tiny-plan aggregate (see
      // [[graft.functions.PcaPowerStep]]): the D-column wide-agg +
      // higher-order-function formulation paid ~100 ms/round of pure
      // analysis+planning at D = 64
      val row = xh.agg(graft.functions.PcaPowerStep
          .pca_power_step(col("xh"), v.toSeq).as("w"))
        .collect()(0)
      val ws = row.getSeq[java.math.BigDecimal](0)
      val wq = Array.tabulate(dims)(d => BigInt(ws(d).toBigInteger))
      val mq = wq.map(_.abs).max
      require(mq > BigInt(0), "pca: zero back-projection (degenerate input)")
      // sign pin: dimension with max |wq|, ties → smallest d
      val dStar = wq.indexWhere(_.abs == mq)
      val sgn = if (wq(dStar) < 0) -1.0 else 1.0
      val u = wq.map(x => x.doubleValue / mq.doubleValue)
      var sqSum = 0L
      var d = 0
      while (d < dims) {
        sqSum += math.floor(u(d) * u(d) * 1e12 + 0.5).toLong; d += 1 }
      val norm = math.sqrt(sqSum / 1e12)
      // floor-quantize (not BigDecimal/round): pure double ops shared
      // bit-exactly with the SQL replay's floor(x*1e12 + 0.5)/1e12
      v = u.map(x => math.floor(sgn * x / norm * 1e12 + 0.5) / 1e12)
    }
    v
  }

  private case class Centered(xh: DataFrame, dims: Int, n: Long,
                              mu: Array[Double])

  /** Cast + center, array-native: the scratch-cached (id, x̂[D])
    * relation every power-iteration path reads, plus the D-bounded
    * means pull (one wide aggregate — per-dim quantized sums and
    * presence counts — instead of an explode + per-dim shuffle). */
  private def center(df: DataFrame, idCol: String,
                     embCol: String): Centered = {
    val base = df.select(col(idCol).as("__id"),
      col(embCol).cast("array<double>").as("v"))
    val dRow = base.agg(max(size(col("v"))).as("dims")).collect()(0)
    require(!dRow.isNullAt(0) && dRow.getInt(0) > 0, "pca: empty input")
    val dims = dRow.getInt(0)
    val muCols = (0 until dims).flatMap(d => Seq(
      sum(q9(get(col("v"), lit(d)))).as(s"s$d"),
      sum(when(size(col("v")) > d, 1L)).as(s"n$d")))
    val mrow = base.agg(muCols.head, muCols.tail: _*).collect()(0)
    // the divisor is ONE dim's presence count (d = 0), matching the
    // exploded layout's single-n contract (fixed-width corpora: all
    // dims share it)
    val n = mrow.getLong(1)
    val mu = Array.tabulate(dims) { d =>
      val sq = mrow.getDecimal(2 * d)
      if (sq == null) 0.0 else sq.doubleValue / 1e9 / n.toDouble
    }
    val muL = arrLit(mu)
    val xh = CacheScope.scratch(base.select(col("__id"),
      transform(col("v"), (x, i) => x - get(muL, i)).as("xh")))
    Centered(xh, dims, n, mu)
  }

  /** Per-dim frame (dim, mean, loading, lambda, total_var,
    * explained_ratio) — the last three repeat on every row (the
    * single-component summary alongside the per-dim table). */
  def powerTopComponent(df: DataFrame, idCol: String, embCol: String,
                        iters: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val c = center(df, idCol, embCol)
    val xh = c.xh; val dims = c.dims; val n = c.n; val mu = c.mu
    val v = iterate(xh, dims, iters)
    // final variance pass with the converged v: row-local projection +
    // row-local Σx̂² (x*x, not pow(x,2): Math.pow is only
    // 1-ulp-accurate; the plain product is a single correctly-rounded
    // op both engines share), one global fold — no shuffle
    val proj = xh.select(dotQ(col("xh"), v).as("dq"), sqQ(col("xh")).as("nq"))
    val stats = proj.agg(
      sum(q9((col("dq").cast("double") / lit(1e9)) *
        (col("dq").cast("double") / lit(1e9)))).as("lq"),
      sum(col("nq").cast("decimal(38,0)")).as("tq"))
      .select(
        (col("lq").cast("double") / lit(1e9) / lit(n.toDouble)).as("lambda"),
        (col("tq").cast("double") / lit(1e9) / lit(n.toDouble)).as("tot"))
    val vDf = v.zip(mu).zipWithIndex
      .map { case ((s, m), d) => (d, m, s) }.toSeq
      .toDF("dim", "mu_raw", "v_raw")
    vDf.crossJoin(broadcast(stats))
      .select(col("dim"), round(col("mu_raw"), 6).as("mean"),
        round(col("v_raw"), 6).as("loading"),
        round(col("lambda"), 4).as("lambda"),
        round(col("tot"), 4).as("total_var"),
        round(col("lambda") / col("tot"), 6).as("explained_ratio"))
      .orderBy(col("dim"))
  }

  /** Two-component readout: v₁ by power iteration, then DEFLATION —
    * x̂₂ = x̂ − (x̂·v₁)v₁ with the projection quantized at 1e-9 (the
    * same integer the iteration itself uses) — and v₂ by the identical
    * loop over the deflated relation. Per-dim loadings for both
    * components plus λ₁, λ₂, total variance, both explained ratios and
    * the spectral ratio λ₂/λ₁ — "how one-dimensional is this corpus,
    * and what's the next direction". Cost: exactly two of the
    * single-component passes over the same scratch-cached relation;
    * the deflation itself is a row-local array transform (no join). */
  def powerTwoComponents(df: DataFrame, idCol: String, embCol: String,
                         iters: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val c = center(df, idCol, embCol)
    val v1 = iterate(c.xh, c.dims, iters)
    val v1L = arrLit(v1)
    val xh2 = CacheScope.scratch(
      c.xh.select(col("__id"), dotQ(col("xh"), v1).as("dq"), col("xh"))
        .select(col("__id"),
          transform(col("xh"), (x, i) =>
            x - (col("dq").cast("double") / lit(1e9)) * get(v1L, i))
            .as("xh")))
    val v2 = iterate(xh2, c.dims, iters)
    def lambdaOf(rel: DataFrame, v: Array[Double], name: String) =
      rel.select(dotQ(col("xh"), v).as("dq")).agg(
        (sum(q9((col("dq").cast("double") / lit(1e9)) *
          (col("dq").cast("double") / lit(1e9)))).cast("double") /
          lit(1e9) / lit(c.n.toDouble)).as(name))
    val l1 = lambdaOf(c.xh, v1, "lambda1")
    val l2 = lambdaOf(xh2, v2, "lambda2")
    val tot = c.xh.select(sqQ(col("xh")).as("nq"))
      .agg((sum(col("nq").cast("decimal(38,0)")).cast("double") /
        lit(1e9) / lit(c.n.toDouble)).as("tot"))
    val vDf = v1.zip(v2).zipWithIndex
      .map { case ((s1, s2), d) => (d, s1, s2) }.toSeq
      .toDF("dim", "v1_raw", "v2_raw")
    vDf.crossJoin(broadcast(l1)).crossJoin(broadcast(l2))
      .crossJoin(broadcast(tot))
      .select(col("dim"),
        round(col("v1_raw"), 6).as("loading1"),
        round(col("v2_raw"), 6).as("loading2"),
        round(col("lambda1"), 4).as("lambda1"),
        round(col("lambda2"), 4).as("lambda2"),
        round(col("tot"), 4).as("total_var"),
        round(col("lambda1") / col("tot"), 6).as("explained_1"),
        round(col("lambda2") / col("tot"), 6).as("explained_2"),
        round(col("lambda2") / col("lambda1"), 6).as("spectral_ratio"))
      .orderBy(col("dim"))
  }

  private def roundsSql(pfx: String, xh: String, iters: Int): String =
    (1 to iters).map { k =>
      val p = s"${pfx}v${k - 1}"
      s"""${pfx}dq$k AS MATERIALIZED (
           SELECT $xh.id,
             sum(CAST(floor($xh.xh * p.s * 1e9 + 0.5) AS HUGEINT)) AS dq
           FROM $xh JOIN $p p ON $xh.d = p.d GROUP BY $xh.id),
         ${pfx}w$k AS MATERIALIZED (
           SELECT $xh.d,
             sum(CAST(floor($xh.xh * (CAST(dq.dq AS DOUBLE) / 1e9) * 1e9
               + 0.5) AS HUGEINT)) AS wq
           FROM $xh JOIN ${pfx}dq$k dq ON $xh.id = dq.id GROUP BY $xh.d),
         ${pfx}mq$k AS MATERIALIZED (
           SELECT max(abs(wq)) AS mq FROM ${pfx}w$k),
         ${pfx}sg$k AS MATERIALIZED (
           SELECT CASE WHEN wq < 0 THEN -1.0 ELSE 1.0 END AS sgn
           FROM ${pfx}w$k ORDER BY abs(wq) DESC, d LIMIT 1),
         ${pfx}u$k AS MATERIALIZED (
           SELECT d, CAST(wq AS DOUBLE) / CAST(mq AS DOUBLE) AS u
           FROM ${pfx}w$k, ${pfx}mq$k),
         ${pfx}sq$k AS MATERIALIZED (
           SELECT sum(CAST(floor(u * u * 1e12 + 0.5) AS BIGINT)) AS sq
           FROM ${pfx}u$k),
         ${pfx}v$k AS MATERIALIZED (
           SELECT d, floor(sgn * u / sqrt(CAST(sq AS DOUBLE) / 1e12)
             * 1e12 + 0.5) / 1e12 AS s
           FROM ${pfx}u$k, ${pfx}sq$k, ${pfx}sg$k)"""
    }.mkString(",\n         ")

  /** The unrolled-SQL oracle for [[powerTopComponent]]: identical
    * quantized arithmetic as MATERIALIZED CTE rounds over a
    * caller-supplied `(id, v DOUBLE[])` select. */
  def oracleSql(embSelect: String, iters: Int = 8): String = {
    val rounds = roundsSql("", "xh", iters)
    s"""WITH emb AS MATERIALIZED ($embSelect),
         ex AS MATERIALIZED (
           SELECT id, CAST(i - 1 AS INT) AS d, v[i] AS x
           FROM (SELECT id, v, unnest(generate_series(1, len(v))) AS i
                 FROM emb)),
         nn AS MATERIALIZED (SELECT count(*) AS n FROM ex WHERE d = 0),
         dd AS MATERIALIZED (SELECT max(d) + 1 AS dims FROM ex),
         mu AS MATERIALIZED (
           SELECT d, CAST(sum(CAST(floor(x * 1e9 + 0.5) AS HUGEINT))
             AS DOUBLE) / 1e9 / count(*) AS mu
           FROM ex GROUP BY d),
         xh AS MATERIALIZED (
           SELECT ex.id, ex.d, ex.x - mu.mu AS xh
           FROM ex JOIN mu ON ex.d = mu.d),
         v0 AS MATERIALIZED (
           SELECT d, 1.0 / sqrt(CAST(dims AS DOUBLE)) AS s
           FROM (SELECT DISTINCT d FROM ex), dd),
         $rounds,
         proj AS MATERIALIZED (
           SELECT xh.id,
             sum(CAST(floor(xh.xh * v.s * 1e9 + 0.5) AS HUGEINT)) AS dq,
             sum(CAST(floor(xh.xh * xh.xh * 1e9 + 0.5) AS HUGEINT)) AS nq
           FROM xh JOIN v$iters v ON xh.d = v.d GROUP BY xh.id),
         fin AS MATERIALIZED (
           SELECT CAST(sum(CAST(floor((CAST(dq AS DOUBLE) / 1e9) *
               (CAST(dq AS DOUBLE) / 1e9) * 1e9 + 0.5) AS HUGEINT))
               AS DOUBLE) / 1e9 / min(n) AS lambda,
             CAST(sum(nq) AS DOUBLE) / 1e9 / min(n) AS tot
           FROM proj, nn)
         SELECT v.d AS dim, round(mu.mu, 6) AS mean, round(v.s, 6) AS loading,
           round(lambda, 4) AS lambda, round(tot, 4) AS total_var,
           round(lambda / tot, 6) AS explained_ratio
         FROM v$iters v JOIN mu ON v.d = mu.d, fin
         ORDER BY dim"""
  }

  /** Oracle for [[powerTwoComponents]]: the PC1 chain, the quantized
    * deflation CTE, a second (g-prefixed) chain over xh2, and the
    * λ₁/λ₂/total readouts. */
  def oracle2Sql(embSelect: String, iters: Int = 8): String = {
    val rounds1 = roundsSql("", "xh", iters)
    val rounds2 = roundsSql("g", "xh2", iters)
    s"""WITH emb AS MATERIALIZED ($embSelect),
         ex AS MATERIALIZED (
           SELECT id, CAST(i - 1 AS INT) AS d, v[i] AS x
           FROM (SELECT id, v, unnest(generate_series(1, len(v))) AS i
                 FROM emb)),
         nn AS MATERIALIZED (SELECT count(*) AS n FROM ex WHERE d = 0),
         dd AS MATERIALIZED (SELECT max(d) + 1 AS dims FROM ex),
         mu AS MATERIALIZED (
           SELECT d, CAST(sum(CAST(floor(x * 1e9 + 0.5) AS HUGEINT))
             AS DOUBLE) / 1e9 / count(*) AS mu
           FROM ex GROUP BY d),
         xh AS MATERIALIZED (
           SELECT ex.id, ex.d, ex.x - mu.mu AS xh
           FROM ex JOIN mu ON ex.d = mu.d),
         v0 AS MATERIALIZED (
           SELECT d, 1.0 / sqrt(CAST(dims AS DOUBLE)) AS s
           FROM (SELECT DISTINCT d FROM ex), dd),
         $rounds1,
         p1 AS MATERIALIZED (
           SELECT xh.id,
             sum(CAST(floor(xh.xh * v.s * 1e9 + 0.5) AS HUGEINT)) AS dq
           FROM xh JOIN v$iters v ON xh.d = v.d GROUP BY xh.id),
         xh2 AS MATERIALIZED (
           SELECT xh.id, xh.d,
             xh.xh - (CAST(p1.dq AS DOUBLE) / 1e9) * v.s AS xh
           FROM xh JOIN p1 ON p1.id = xh.id
           JOIN v$iters v ON v.d = xh.d),
         gv0 AS MATERIALIZED (
           SELECT d, 1.0 / sqrt(CAST(dims AS DOUBLE)) AS s
           FROM (SELECT DISTINCT d FROM ex), dd),
         $rounds2,
         p2 AS MATERIALIZED (
           SELECT xh2.id,
             sum(CAST(floor(xh2.xh * v.s * 1e9 + 0.5) AS HUGEINT)) AS dq
           FROM xh2 JOIN gv$iters v ON xh2.d = v.d GROUP BY xh2.id),
         l1 AS MATERIALIZED (
           SELECT CAST(sum(CAST(floor((CAST(dq AS DOUBLE) / 1e9) *
               (CAST(dq AS DOUBLE) / 1e9) * 1e9 + 0.5) AS HUGEINT))
               AS DOUBLE) / 1e9 / min(n) AS lambda1
           FROM p1, nn),
         l2 AS MATERIALIZED (
           SELECT CAST(sum(CAST(floor((CAST(dq AS DOUBLE) / 1e9) *
               (CAST(dq AS DOUBLE) / 1e9) * 1e9 + 0.5) AS HUGEINT))
               AS DOUBLE) / 1e9 / min(n) AS lambda2
           FROM p2, nn),
         tt AS MATERIALIZED (
           SELECT CAST(sum(CAST(floor(xh * xh * 1e9 + 0.5) AS HUGEINT))
               AS DOUBLE) / 1e9 / min(n) AS tot
           FROM xh, nn)
         SELECT a.d AS dim, round(a.s, 6) AS loading1,
           round(b.s, 6) AS loading2,
           round(lambda1, 4) AS lambda1, round(lambda2, 4) AS lambda2,
           round(tot, 4) AS total_var,
           round(lambda1 / tot, 6) AS explained_1,
           round(lambda2 / tot, 6) AS explained_2,
           round(lambda2 / lambda1, 6) AS spectral_ratio
         FROM v$iters a JOIN gv$iters b ON b.d = a.d, l1, l2, tt
         ORDER BY dim"""
  }
}
