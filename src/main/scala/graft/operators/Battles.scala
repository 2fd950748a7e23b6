package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise model-comparison ("battle") analytics for preference /
  * eval data: given rows of (model_a, model_b, a_won) judgments — the
  * raw material of RLHF preference sets, arena-style eval logs, and
  * annotator A/B audits — compute the two readouts those pipelines
  * gate on: per-pair win rates with Wilson score intervals (is this
  * matchup decided, or still noise?) and Bradley–Terry strength
  * scores (one global ranking that respects transitivity instead of
  * raw win %, which is confounded by opponent mix).
  *
  * Scale shape: everything reduces to ONE groupBy over the battle
  * stream into a cells frame of at most |models|² rows; the Wilson
  * formula is map-side arithmetic on that frame, and each
  * Bradley–Terry iteration is a pair of broadcast-sized joins on it.
  * The battle stream itself is never rescanned after the first fold.
  *
  * Determinism: win counts are exact longs; the Zermelo fixed-point
  * quantizes every cross-row sum to longs at 1e-12 before adding
  * (long addition is associative ⇒ partition-invariant), so an
  * external SQL replay of the unrolled iterations reproduces the
  * strengths bit-for-bit.
  */
object Battles {

  /** Canonical unordered battle cells from a judgment stream:
    * (model_a < model_b, n battles, wins_a). One exact-count fold. */
  def cells(battles: DataFrame, modelA: Column, modelB: Column,
            aWon: Column): DataFrame =
    battles
      .select(least(modelA, modelB).as("model_a"),
        greatest(modelA, modelB).as("model_b"),
        when(modelA <= modelB, aWon.cast("boolean"))
          .otherwise(!aWon.cast("boolean")).as("w"))
      .filter(col("model_a") =!= col("model_b"))
      .groupBy(col("model_a"), col("model_b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("w"), 1L).otherwise(0L)).as("wins_a"))

  /** Per-cell win rate with the Wilson score interval at the given z
    * (default 1.96 ≈ 95%). Wilson, not Wald: the interval stays inside
    * [0,1] and behaves at small n / extreme rates — exactly the cells
    * an eval pipeline must NOT declare decided. Map-side arithmetic on
    * the cells frame. */
  def winRateWilson(cells: DataFrame, z: Double = 1.96): DataFrame = {
    val n = col("n").cast("double")
    val p = col("wins_a").cast("double") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = p + z2 / (lit(2.0) * n)
    val margin = lit(z) * sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * n)) / n)
    cells.select(col("model_a"), col("model_b"), col("n"), col("wins_a"),
      round(p, 6).as("winrate_a"),
      round((center - margin) / denom, 6).as("wilson_lo"),
      round((center + margin) / denom, 6).as("wilson_hi"))
  }

  /** Bradley–Terry strengths via `iters` rounds of Zermelo's
    * fixed-point (Zermelo 1929; Hunter 2004 MM form):
    *   s_i ← W_i / Σ_j n_ij / (s_i + s_j),  then normalize to Σ s = 1.
    * Input is the [[cells]] frame; models that never win pin to 0
    * strength (their MLE limit). Every cross-row sum (the denominator
    * fold and the normalizer) is quantized to longs at 1e-12, and each
    * normalized strength rounds to 12 dp per round, so the iteration
    * is partition-invariant and exactly replayable as unrolled SQL.
    *
    * Scale: `cells` is at most |models|² rows BY CONSTRUCTION (one
    * groupBy fold of the battle stream produced it), so the whole
    * fixed-point runs DRIVER-SIDE on one bounded collect — the
    * [[graft.operators.Similarity]] kmeans-loop pattern. The in-engine
    * form spent ~23 s of pure orchestration at bench scale running 20
    * rounds of |models|-row Spark jobs; nothing about those joins was
    * distributed work. Long sums are order-independent, the per-round
    * 12-dp rounding uses the same BigDecimal HALF_UP as Spark's
    * `round`, and the floor quantizations are the same double ops —
    * the unrolled-CTE SQL oracle is unchanged and still matches
    * bit-for-bit. */
  def btStrengths(cells: DataFrame, iters: Int = 20): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    // bounded pull: ≤ |models|² cells (documented contract above) —
    // ENFORCED, not just documented: a caller passing an unfolded
    // battle stream would otherwise OOM the driver instead of failing
    // loud (limit+count probe is cheap; 2M cells ≈ 1414 models, far
    // beyond any leaderboard, and ~100 MB of driver rows — the safe
    // ceiling for this collect)
    val maxCells = 2000000
    val pulled = cells.select(col("model_a").cast("string"),
        col("model_b").cast("string"), col("n").cast("long"),
        col("wins_a").cast("long"))
      .limit(maxCells + 1).collect() // ONE job: the limit IS the guard
    require(pulled.length <= maxCells,
      s"btStrengths: cells frame exceeds $maxCells rows — expected the " +
        "folded |models|^2 battle-cells frame, not a raw battle stream " +
        "(fold it with Battles.cells first)")
    val cellRows = pulled
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // directed edges: (i, j, n, w) = battles vs j, wins of i over j
    val e = cellRows.flatMap { case (a, b, n, wa) =>
      Seq((a, b, n, wa), (b, a, n, n - wa)) }
    val models = e.map(_._1).distinct.sorted
    val wins: Map[String, Long] =
      e.groupBy(_._1).map { case (i, es) => i -> es.map(_._4).sum }
    def round12(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    var s: Map[String, Double] = models.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val dq: Map[String, Long] = e.groupBy(_._1).map { case (i, es) =>
        i -> es.map { case (_, j, n, _) =>
          math.floor(n / (s(i) + s(j)) * 1e12 + 0.5).toLong }.sum }
      val sraw: Seq[(String, Double)] = models.map(m =>
        m -> wins(m).toDouble / (dq(m).toDouble / 1e12))
      val tq = sraw.map { case (_, v) =>
        math.floor(v * 1e12 + 0.5).toLong }.sum
      s = sraw.map { case (m, v) => m -> round12(v / (tq.toDouble / 1e12)) }
        .toMap
    }
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    models.map(m => (m, round6(s(m)))).toSeq.toDF("model", "strength")
  }

  /** The unrolled-SQL oracle for [[btStrengths]]: the same quantized
    * Zermelo rounds as chained CTEs over a caller-supplied battle-cells
    * CTE named `bt_cells(model_a, model_b, n, wins_a)`. Shared here so
    * the Spark loop and the SQL text cannot drift. */
  def btOracleSql(cellsCte: String, iters: Int = 20): String = {
    // AS MATERIALIZED throughout: DuckDB inlines plain CTEs, and each
    // round references its predecessor 3× (si, sj, normalizer) — the
    // same ~4×-per-round tree blowup the Spark loop cuts with a
    // per-round localCheckpoint
    val rounds = (1 to iters).map { k =>
      val p = if (k == 1) "s0" else s"s${k - 1}"
      s"""d$k AS MATERIALIZED (
           SELECT e.i,
             sum(CAST(floor(e.n / (si.s + sj.s) * 1e12 + 0.5) AS BIGINT)) AS dq
           FROM e JOIN $p si ON e.i = si.model JOIN $p sj ON e.j = sj.model
           GROUP BY e.i),
         r$k AS MATERIALIZED (
           SELECT d$k.i, w.wi / (CAST(dq AS DOUBLE) / 1e12) AS sraw
           FROM d$k JOIN w ON d$k.i = w.i),
         t$k AS MATERIALIZED (
           SELECT sum(CAST(floor(sraw * 1e12 + 0.5) AS BIGINT)) AS tq
           FROM r$k),
         s$k AS MATERIALIZED (
           SELECT i AS model, round(sraw / (CAST(tq AS DOUBLE) / 1e12), 12) AS s
           FROM r$k, t$k)"""
    }.mkString(",\n         ")
    s"""WITH bt_cells AS MATERIALIZED ($cellsCte),
         e AS MATERIALIZED (
           SELECT model_a AS i, model_b AS j, n, wins_a AS w FROM bt_cells
           UNION ALL
           SELECT model_b AS i, model_a AS j, n, n - wins_a AS w FROM bt_cells),
         w AS MATERIALIZED (
           SELECT i, CAST(sum(w) AS DOUBLE) AS wi FROM e GROUP BY i),
         s0 AS MATERIALIZED (SELECT i AS model, 1.0 AS s FROM w),
         $rounds
         SELECT model, round(s, 6) AS strength FROM s$iters
         ORDER BY strength DESC, model"""
  }
}
