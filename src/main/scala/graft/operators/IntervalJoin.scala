package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval joins (point-in-interval, interval-overlap) without the
  * theta-join trap.
  *
  * Spark plans a raw range predicate (`p.ts BETWEEN i.lo AND i.hi`) as
  * BroadcastNestedLoopJoin — every point row tested against every
  * interval, quadratic work and a broadcast of whichever side the
  * planner guesses smaller. At 100 TB of points that shape is fatal
  * even when the interval side is modest, and when BOTH sides are big
  * it never finishes.
  *
  * The scale-correct encoding discretizes the join key domain into
  * fixed-width buckets: an interval is exploded to every bucket it
  * overlaps, a point maps to exactly ONE bucket, and the join becomes
  * a hash equi-join on the bucket id with the exact range predicate
  * evaluated inside each bucket. Each (point, interval) pair can meet
  * at most once — the point owns a single bucket — so no dedup pass is
  * needed. For interval×interval overlap a pair can meet in every
  * shared bucket, so only the meeting that happens in the overlap's
  * FIRST bucket is kept (one deterministic representative).
  *
  * Bucket width trades interval replication (a b-bucket interval ships
  * b copies through the shuffle) against bucket fan-in; choose it near
  * the typical interval length. Replication is linear in interval
  * length — never quadratic — and the equi-join shuffles hash-partition
  * both sides, so the plan survives arbitrary scale-up and AQE can
  * split any hot bucket.
  */
object IntervalJoin {

  /** Exact floor-division for the full long domain. `floor(a / w)` in
    * double arithmetic is wrong past 2^53; subtracting the Euclidean
    * remainder first makes the dividend an exact multiple, and decimal
    * division of an exact multiple is exact. */
  private def floorDiv(a: Column, w: Long): Column =
    ((a - pmod(a, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")

  /** Join `points` (long key column `ptCol`) to `intervals` (long
    * bounds `loCol`/`hiCol`, inclusive) on containment. Both inputs
    * keep all their columns; names must not collide. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__ij_bk", floorDiv(col(ptCol), bucketWidth))
    val i = intervals.withColumn("__ij_bk",
        explode(sequence(floorDiv(col(loCol), bucketWidth), floorDiv(col(hiCol), bucketWidth))))
    p.join(i, p("__ij_bk") === i("__ij_bk") &&
        col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__ij_bk")
  }

  /** Overlap-join two interval frames (inclusive bounds). Emits one row
    * per overlapping pair: the meeting is kept only in the first bucket
    * both copies share, `max(floor(lo1/w), floor(lo2/w))`. */
  /** Interval-union coverage per key: merge overlapping [s, e] spans
    * with the classic sweep (a new segment starts where s exceeds the
    * running max of every earlier e) and report covered time vs span —
    * the "how much of the horizon is this user actually active"
    * readout that double-counts nothing, where a naive Σ(e−s) counts
    * overlaps twice. All µs integers; one partitioned ordered window
    * (bounded by intervals per key, never a global sort) + one
    * groupBy. */
  def intervalUnion(iv: DataFrame, keyCol: Column, sCol: Column,
                    eCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = iv.select(keyCol.as("k"), sCol.as("s"), eCol.as("e"))
    val w = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
    val prevMax = max(col("e")).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val seg = base
      .withColumn("ns",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("grp", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    val segs = seg.groupBy(col("k"), col("grp"))
      .agg(count(lit(1)).as("n_iv"), min(col("s")).as("gs"),
        max(col("e")).as("ge"))
    segs.groupBy(col("k"))
      .agg(sum(col("n_iv")).as("n_intervals"),
        count(lit(1)).as("n_segments"),
        sum(col("ge") - col("gs")).as("covered"),
        (max(col("ge")) - min(col("gs"))).as("span"))
      .select(col("k"), col("n_intervals"), col("n_segments"),
        col("covered"), col("span"),
        round(when(col("span") > 0,
          col("covered").cast("double") / col("span")).otherwise(lit(0.0)),
          6).as("coverage_ratio"))
  }

  def intervalOverlap(left: DataFrame, lo1: String, hi1: String,
                      right: DataFrame, lo2: String, hi2: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left.withColumn("__ij_bk",
        explode(sequence(floorDiv(col(lo1), bucketWidth), floorDiv(col(hi1), bucketWidth))))
    val r = right.withColumn("__ij_bk",
        explode(sequence(floorDiv(col(lo2), bucketWidth), floorDiv(col(hi2), bucketWidth))))
    l.join(r, l("__ij_bk") === r("__ij_bk") &&
        col(lo1) <= col(hi2) && col(lo2) <= col(hi1) &&
        l("__ij_bk") === greatest(floorDiv(col(lo1), bucketWidth), floorDiv(col(lo2), bucketWidth)))
      .drop("__ij_bk")
  }
}
