package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew management for hot keys at 100 TB.
  *
  * - `saltedAgg`: two-phase aggregation — keys are salted so one hot key
  *   spreads over `salts` reducers in phase 1, then the partials combine
  *   in a second (tiny) shuffle. Works for any algebraic aggregate list
  *   (sum/count/min/max); the caller supplies both phases.
  * - `saltedJoin`: skewed-side rows get a random salt, the small side is
  *   replicated `salts`× — turns one hot reducer into `salts` even ones.
  *   (AQE's skew-join handles sort-merge cases automatically; explicit
  *   salting remains necessary for hash aggregations and for joins whose
  *   skew AQE cannot split, e.g. a single massive key.)
  */
object Skew {

  /** Bounded-memory hot-key report via the SpaceSaving aggregate
    * ([[graft.functions.HeavyHitters]]): the detection step that
    * DECIDES salting, without a full groupBy over the key space. Each
    * reported key's true count lies in [count_lo, count_hi]; any key
    * with true count > N/capacity is guaranteed present. */
  def hotKeys(df: DataFrame, keyCol: String, k: Int,
              capacity: Int = 1024): DataFrame =
    df.agg(graft.functions.HeavyHitters
        .heavy_hitters(col(keyCol).cast("string"), k, capacity).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item").as("key"),
        (col("h.count") - col("h.err")).as("count_lo"),
        col("h.count").as("count_hi"))

  /** Deterministic salt in [0, salts) — derived from a stable row column
    * (NOT rand(): retries/speculative tasks must agree). */
  def salt(stableCol: Column, salts: Int): Column =
    pmod(hash(stableCol), lit(salts))

  /** Two-phase salted aggregation:
    * phase1: groupBy(key, salt) → partialAggs; phase2: groupBy(key) →
    * finalAggs over the partial columns. */
  def saltedAgg(df: DataFrame, key: Column, saltSource: Column, salts: Int,
                partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame =
    df.withColumn("__salt", salt(saltSource, salts))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col("__key"))
      .agg(finalAggs.head, finalAggs.tail: _*)

  /** Salted broadcast-free join: fact side salted, dim side exploded to
    * all salt values. Join key becomes (key, salt). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 saltSource: Column): (DataFrame, DataFrame, Column) = {
    val f = fact.withColumn("__salt", salt(saltSource, salts))
    val d = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    (f, d, f(key) === d(key) && f("__salt") === d("__salt"))
  }
}
