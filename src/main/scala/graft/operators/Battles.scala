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
    * Scale: `cells` is at most |models|² rows — each round is two
    * broadcast joins and one tiny agg; the strengths frame stays
    * |models| rows. Lineage is cut every 5 rounds. */
  def btStrengths(cells: DataFrame, iters: Int = 20): DataFrame = {
    // directed edges: (i, j, n, w) = battles vs j, wins of i over j
    val e = cells.select(col("model_a").as("i"), col("model_b").as("j"),
        col("n"), col("wins_a").as("w"))
      .unionAll(cells.select(col("model_b").as("i"), col("model_a").as("j"),
        col("n"), (col("n") - col("wins_a")).as("w")))
      // ≤ |models|² rows: single-partition so every one of the 20
      // rounds runs single-task stages instead of 32 empty ones
      .coalesce(1).localCheckpoint()
    val wins = e.groupBy(col("i")).agg(sum(col("w")).as("wi"))
      .coalesce(1).localCheckpoint()
    var s = wins.select(col("i").as("model"), lit(1.0).as("s"))
    for (k <- 1 to iters) {
      // broadcast the |models|-sized frames EXPLICITLY: a checkpointed
      // frame has no size estimate, so each of the 20 rounds was
      // planning shuffle joins + AQE replans over 10-row inputs —
      // ~3 s/round of pure orchestration at bench scale (61 s total)
      val denom = e
        .join(broadcast(s.select(col("model").as("i"), col("s").as("si"))),
          "i")
        .join(broadcast(s.select(col("model").as("j"), col("s").as("sj"))),
          "j")
        .groupBy(col("i"))
        .agg(sum(floor(col("n") / (col("si") + col("sj")) * lit(1e12)
          + lit(0.5)).cast("long")).as("dq"))
      val raw = denom.join(broadcast(wins), "i")
        .select(col("i").as("model"),
          (col("wi").cast("double") / (col("dq").cast("double") / lit(1e12)))
            .as("sraw"))
        // lazy-materialized on 1 partition: the tot job evaluates it
        // once and the next-frame job reuses the cache instead of
        // re-running the round's join+shuffle; coalesce(1) because a
        // |models|-row frame spread over 32 shuffle partitions pays
        // 32 task launches per round for nothing
        .coalesce(1).localCheckpoint(false)
      val tot = raw.agg(sum(floor(col("sraw") * lit(1e12) + lit(0.5))
        .cast("long")).as("tq"))
      val next = raw.crossJoin(broadcast(tot))
        .select(col("model"),
          round(col("sraw") / (col("tq").cast("double") / lit(1e12)), 12)
            .as("s"))
      // checkpoint EVERY round: `s` appears three times in the next
      // round's tree (si, sj, and via raw→tot), so an un-cut lineage
      // multiplies ~4× per round — 20 rounds of |models|-row jobs are
      // trivial; 4²⁰ shared-nothing replays are not
      s = next.localCheckpoint()
    }
    s.select(col("model"), round(col("s"), 6).as("strength"))
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
