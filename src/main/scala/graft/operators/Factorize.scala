package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * exchange pattern. Factors localCheckpoint on alternate steps.
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
    var v = r.select(col("i")).distinct()
      .select(col("i"), lit(1.0).as("v")).localCheckpoint()
    var uF: DataFrame = null
    for (k <- 1 to iters) {
      uF = r.join(v, "i").groupBy(col("u"))
        .agg(
          sum(dec(floor(col("r") * col("v") * lit(1e9) + lit(0.5))))
            .as("num"),
          sum(dec(floor(col("v") * col("v") * lit(1e9) + lit(0.5))))
            .as("den"))
        .select(col("u"),
          round(col("num").cast("double") / col("den").cast("double"), 12)
            .as("uf"))
      val vNext = r.join(uF, "u").groupBy(col("i"))
        .agg(
          sum(dec(floor(col("r") * col("uf") * lit(1e9) + lit(0.5))))
            .as("num"),
          sum(dec(floor(col("uf") * col("uf") * lit(1e9) + lit(0.5))))
            .as("den"))
        .select(col("i"),
          round(col("num").cast("double") / col("den").cast("double"), 12)
            .as("v"))
      v = if (k % 2 == 0 || k == iters) vNext.localCheckpoint() else vNext
    }
    val err = col("r") - col("uf") * col("v")
    val fit = r.join(uF, "u").join(v, "i")
      .agg(count(lit(1)).as("n_cells"),
        sum(dec(floor(err * err * lit(1e6) + lit(0.5)))).as("seq"))
      .select(col("n_cells"),
        round(sqrt(col("seq").cast("double") / lit(1e6) / col("n_cells")),
          6).as("rmse"))
    v.crossJoin(broadcast(fit))
  }
}
