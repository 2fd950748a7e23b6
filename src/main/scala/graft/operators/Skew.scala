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

  /** ADAPTIVE salted join — the form the SpaceSaving aggregate exists
    * to enable: detect the hot keys first ([[hotKeys]] — one bounded
    * agg over the fact scan, never a key-space groupBy), then salt
    * ONLY those. Blanket salting replicates the whole dim `salts`×
    * and re-shuffles every cold key for nothing; adaptive salting
    * leaves the cold path untouched (salt 0, dim row replicated once)
    * and spreads each hot key over `salts` reducers.
    *
    * Hot = reported keys whose count LOWER bound clears the
    * N/capacity survivor floor: count_lo ≤ true count, so every
    * selected key is certainly above the floor, and SpaceSaving
    * guarantees every key with true count > N/capacity is in the
    * report — no hot key can be missed. The hot list is ≤ k entries
    * (driver-bounded by the sketch config, never by the data) and
    * rides the plan as an isin literal, inside codegen.
    *
    * The salts are transparent to RESULTS: the returned join emits
    * exactly the rows of the unsalted equi-join (spec-pinned), so the
    * caller swaps this in purely for the exchange shape. */
  /** The hot-key DECISION collected to the driver: SpaceSaving report
    * filtered to keys whose count LOWER bound clears the N/capacity
    * survivor floor. count_lo ≤ true count, so every selected key is
    * certainly above the floor, and SpaceSaving guarantees every key
    * with true count > N/capacity is reported — no hot key can be
    * missed. ≤ k entries, driver-bounded by the sketch config, never by
    * the data. Shared by [[adaptiveSaltedJoin]] and the near-dup pair
    * mining chain ([[Dedup.minhashLshPairsFromShingles]]). */
  def hotKeyList(df: DataFrame, keyCol: String,
                 k: Int = 64, capacity: Int = 1024): Seq[String] = {
    val det = df.agg(
      graft.functions.HeavyHitters
        .heavy_hitters(col(keyCol).cast("string"), k, capacity).as("hh"),
      count(lit(1)).as("n")).head()
    val floor = det.getLong(1) / capacity
    det.getSeq[org.apache.spark.sql.Row](0)
      .filter(h => h.getLong(1) - h.getLong(2) > floor)
      .map(_.getString(0))
  }

  def adaptiveSaltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                         salts: Int, saltSource: Column,
                         k: Int = 64, capacity: Int = 1024)
      : (DataFrame, DataFrame, Column) = {
    val hot = hotKeyList(fact, key, k, capacity)
    if (hot.isEmpty) {
      // nothing above the floor: the plain equi-join IS the right plan
      (fact, dim, fact(key) === dim(key))
    } else {
      val f = fact.withColumn("__salt",
        when(col(key).cast("string").isin(hot: _*), salt(saltSource, salts))
          .otherwise(lit(0)))
      val d = dim.withColumn("__salt", explode(
        when(col(key).cast("string").isin(hot: _*),
          sequence(lit(0), lit(salts - 1)))
          .otherwise(sequence(lit(0), lit(0)))))
      (f, d, f(key) === d(key) && f("__salt") === d("__salt"))
    }
  }
}
