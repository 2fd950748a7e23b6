package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ExactISum.exact_isum

/** Alternating-least-squares matrix factorization over observed
  * (user, item, rating) cells — the collaborative-filtering latent
  * model next to [[Basket.itemNeighbors]]'s neighborhood method.
  *
  * Rank 1 keeps every solve a scalar ratio (no k×k inverse), which is
  * exactly what makes the iteration ORACLE-REPLAYABLE: each half-step
  * is `f = Σ r·g / Σ g²` over the observed cells of one side, and both
  * sums quantize to integers at 1e-9 (decimal(38,0) accumulators — a
  * squared factor times 1e9 summed over millions of cells overflows a
  * long) before the one double division, rounded to 12 dp. Rank-1 ALS
  * is the dominant-singular-vector model: item factors order items on
  * the main taste axis, and the RMSE row quantifies how much of the
  * rating mass that single axis explains.
  *
  * Scale shape per half-step: one hash equi-join of the cells against
  * the current factor frame + one key partial agg — the PageRank
  * exchange pattern. Half-steps chain lazily (each feeds exactly one
  * consumer, so the whole iteration is ONE job and every shuffle still
  * executes once); only the final round's two-consumer frames
  * localCheckpoint, lazily.
  */
object Factorize {

  /** Returns item factors joined with a broadcast 1-row fit summary:
    * (item, v, n_cells, rmse). `ratings` must carry integer ratings
    * (cast exact). */
  def alsRank1(ratings: DataFrame, userCol: String, itemCol: String,
               ratingCol: String, iters: Int = 3): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val r = CacheScope.scratch(ratings.select(col(userCol).as("u"),
      col(itemCol).as("i"), col(ratingCol).cast("long").as("r")))
    // NOT pre-partitioned per join key: caching rByI/rByU copies was
    // measured SLOWER at bench scale (7.5 s vs 6.4 s — two extra
    // materializations of the cells frame outweigh the saved
    // half-step shuffles at 3 iterations); with the single cache each
    // half-step re-shuffles the cells, the PageRank exchange pattern.
    // Revisit only if iters grows enough to amortize the extra copies.
    var v = r.select(col("i")).distinct()
      .select(col("i"), lit(1.0).as("v"))
    var uF: DataFrame = null
    for (k <- 1 to iters) {
      val uRaw = r.join(v, "i").groupBy(col("u"))
        .agg(
          exact_isum(floor(col("r") * col("v") * lit(1e9) + lit(0.5)))
            .as("num"),
          exact_isum(floor(col("v") * col("v") * lit(1e9) + lit(0.5)))
            .as("den"))
        .select(col("u"),
          round(col("num").cast("double") / col("den").cast("double"), 12)
            .as("uf"))
      // checkpoint ONLY where a frame has two consumers — the final
      // round's uF (vNext + the rmse pass) and the final v (rmse +
      // output). Earlier rounds chain into exactly ONE consumer: each
      // half-step's shuffle executes once inside the final job either
      // way, so a per-round checkpoint is pure cache I/O + an extra
      // job of orchestration (r11 cadence fix; the r10 bench spent
      // ~40% of als_* wall-time on it)
      uF = if (k == iters) uRaw.localCheckpoint(false) else uRaw
      val vNext = r.join(uF, "u").groupBy(col("i"))
        .agg(
          exact_isum(floor(col("r") * col("uf") * lit(1e9) + lit(0.5)))
            .as("num"),
          exact_isum(floor(col("uf") * col("uf") * lit(1e9) + lit(0.5)))
            .as("den"))
        .select(col("i"),
          round(col("num").cast("double") / col("den").cast("double"), 12)
            .as("v"))
      v = if (k == iters) vNext.localCheckpoint(false) else vNext
    }
    val err = col("r") - col("uf") * col("v")
    val fit = r.join(uF, "u").join(v, "i")
      .agg(count(lit(1)).as("n_cells"),
        exact_isum(floor(err * err * lit(1e6) + lit(0.5))).as("seq"))
      .select(col("n_cells"),
        round(sqrt(col("seq").cast("double") / lit(1e6) / col("n_cells")),
          6).as("rmse"))
    v.crossJoin(broadcast(fit))
  }

  /** Rank-2 regularized ALS: each side solves its 2×2 ridge normal
    * equations in closed form (det/adjugate — still no matrix
    * library, still exactly replayable). Item factors init at
    * (1, ±1 by item-id parity) to break the rank-1 symmetry; numeric
    * item ids required. Same quantization regime as [[alsRank1]]:
    * every moment sum quantizes at 1e-9 into decimal(38,0), factor
    * components round to 12 dp per half-step.
    *
    * Output: (i, v1, v2, n_cells, rmse) — rmse over observed cells
    * under the final factors, the "what does a second taste axis buy"
    * number next to alsRank1's. */
  def alsRank2(ratings: DataFrame, userCol: String, itemCol: String,
               ratingCol: String, iters: Int = 2,
               lambda: Double = 0.1): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def q(c: org.apache.spark.sql.Column) =
      dec(floor(c * lit(1e9) + lit(0.5)))
    val lam = lit(lambda)
    val r = CacheScope.scratch(ratings.select(col(userCol).as("u"),
      col(itemCol).as("i"), col(ratingCol).cast("long").as("r")))
    var v = r.select(col("i")).distinct()
      .select(col("i"), lit(1.0).as("f1"),
        when(pmod(col("i"), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))
          .as("f2"))
    var uF: DataFrame = null
    // one ridge half-step: solve factors for `outKey` given `g` factors
    // joined via `inKey`
    def solve(gFrame: DataFrame, inKey: String, outKey: String,
              o1: String, o2: String): DataFrame = {
      val j = r.join(gFrame, inKey)
      def ql(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e9) + lit(0.5))
      val agg = j.groupBy(col(outKey))
        .agg(exact_isum(ql(col("f1") * col("f1"))).as("s11"),
          exact_isum(ql(col("f1") * col("f2"))).as("s12"),
          exact_isum(ql(col("f2") * col("f2"))).as("s22"),
          exact_isum(ql(col("r") * col("f1"))).as("b1"),
          exact_isum(ql(col("r") * col("f2"))).as("b2"))
      def u(c: org.apache.spark.sql.Column) = c.cast("double") / lit(1e9)
      val (s11, s12, s22) = (u(col("s11")) + lam, u(col("s12")),
        u(col("s22")) + lam)
      val (b1, b2) = (u(col("b1")), u(col("b2")))
      val det = s11 * s22 - s12 * s12
      agg.select(col(outKey),
        round((s22 * b1 - s12 * b2) / det, 12).as(o1),
        round((s11 * b2 - s12 * b1) / det, 12).as(o2))
    }
    for (k <- 1 to iters) {
      val uRaw = solve(v, "i", "u", "g1", "g2")
        .withColumnRenamed("g1", "f1").withColumnRenamed("g2", "f2")
      // same cadence as alsRank1: checkpoint only the two-consumer
      // frames of the final round (uF: vNext + rmse; v: rmse + output)
      uF = if (k == iters) uRaw.localCheckpoint(false) else uRaw
      val vNext = solve(uF, "u", "i", "f1", "f2")
      v = if (k == iters) vNext.localCheckpoint(false) else vNext
    }
    val err = col("r") -
      (col("uf1") * col("f1") + col("uf2") * col("f2"))
    val fit = r
      .join(uF.select(col("u"), col("f1").as("uf1"), col("f2").as("uf2")),
        "u")
      .join(v, "i")
      .agg(count(lit(1)).as("n_cells"),
        exact_isum(floor(err * err * lit(1e6) + lit(0.5))).as("seq"))
      .select(col("n_cells"),
        round(sqrt(col("seq").cast("double") / lit(1e6) / col("n_cells")),
          6).as("rmse"))
    v.select(col("i"), col("f1").as("v1"), col("f2").as("v2"))
      .crossJoin(broadcast(fit))
  }
}
