package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exponential smoothing — the continuous twin of
  * [[graft.operators.TimeSeries.expSmoothing]]: per-key volume level
  * maintained AS THE STREAM RUNS, folding each time bucket into the
  * level exactly once, WHEN THE WATERMARK SEALS IT (no bucket is
  * folded while late events could still raise its count). State per
  * key is the level plus the open (unsealed) buckets inside the
  * lateness horizon — O(horizon/bucket) entries, not history.
  *
  * Exactness: buckets seal in event-time order (the watermark is
  * monotone and buckets are folded smallest-first), so the fold
  * sequence equals the batch operator's sorted-array fold — identical
  * doubles for the shared prefix of sealed buckets. An event arriving
  * after its bucket sealed is DROPPED by the watermark upstream, the
  * standard lateness contract ([[Attribution.attributeBounded]]'s).
  * EventTimeTimeout wakes idle keys so trailing buckets seal without
  * new traffic. */
object ForecastStream {

  case class LevelUpdate(key: String, bucket_start_us: Long, cnt: Double,
                         level: Double)

  case class EsState(level: Double, hasLevel: Boolean,
                     open: Map[Long, Double])

  case class HoltUpdate(key: String, bucket_start_us: Long, cnt: Double,
                        level: Double, trend: Double, forecast: Double)

  case class HoltState(s: Double, b: Double, nSealed: Long, x1: Double,
                       open: Map[Long, Double])

  /** Streaming Holt level+trend — the continuous twin of
    * [[graft.operators.TimeSeries.holtSmoothing]], with the same
    * sealed-bucket exactness contract as [[levels]]: buckets fold in
    * event-time order when the watermark seals them, so the (s, b)
    * state equals the batch fold over the sealed prefix (init
    * s = x₂, b = x₂ − x₁; emission starts at the second sealed
    * bucket). State per key: two doubles + the open buckets inside
    * the lateness horizon. */
  def holtLevels(events: DataFrame, alpha: Double = 0.3,
                 beta: Double = 0.2, bucketUs: Long = 3600000000L,
                 latenessDelay: String = "1 hour",
                 keyCol: String = "event_type",
                 tsCol: String = "ts"): Dataset[HoltUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events.withWatermark(tsCol, latenessDelay)
      .select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("tsUs"),
        col(tsCol).as("wm_ts"))
      .as[(String, Long, java.sql.Timestamp)]
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[(String, Long, java.sql.Timestamp)],
         state: GroupState[HoltState]) =>
          val st0 = state.getOption
            .getOrElse(HoltState(0.0, 0.0, 0L, 0.0, Map.empty))
          val open = scala.collection.mutable.Map(st0.open.toSeq: _*)
          if (!state.hasTimedOut)
            for ((_, tsUs, _) <- it) {
              val b = Math.floorDiv(tsUs, bucketUs) * bucketUs
              open(b) = open.getOrElse(b, 0.0) + 1.0
            }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var (s, b, n, x1) = (st0.s, st0.b, st0.nSealed, st0.x1)
          val sealed0 = open.keys.filter(_ + bucketUs <= wmUs).toSeq.sorted
          val out = sealed0.flatMap { bk =>
            val cnt = open.remove(bk).get
            n += 1
            if (n == 1L) { x1 = cnt; None }
            else {
              if (n == 2L) { s = cnt; b = cnt - x1 }
              else {
                val sN = alpha * cnt + (1.0 - alpha) * (s + b)
                b = beta * (sN - s) + (1.0 - beta) * b
                s = sN
              }
              Some(HoltUpdate(key, bk, cnt, r6(s), r6(b), r6(s + b)))
            }
          }
          if (open.isEmpty && n == 0L) state.remove()
          else {
            state.update(HoltState(s, b, n, x1, open.toMap))
            if (open.nonEmpty)
              state.setTimeoutTimestamp(
                ((open.keys.min + bucketUs) / 1000L + 1L)
                  .max(state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  case class EwmaUpdate(key: String, bucket_start_us: Long, cnt: Double,
                        ewma: Double, limit: Double, alarm: Boolean)

  case class EwmaState(z: Double, w: Double, nSealed: Long,
                       open: Map[Long, Double])

  /** Streaming EWMA control chart — the continuous twin of
    * [[graft.operators.TimeSeries.ewmaControl]], run against a
    * PERSISTED per-key reference (μ, σ) exactly like the KS/PSI drift
    * gates: in-control statistics come from a reference corpus, never
    * from the stream judging itself. Buckets seal watermark-ordered,
    * so the (z, w) recursion equals the batch fold over the sealed
    * prefix (z₁ = first sealed count; w tracks (1−λ)^{2t} for the
    * time-varying startup limits). Keys absent from the reference are
    * dropped — a gate can only watch what it has a baseline for. The
    * reference map is bounded by the key domain (the k-means
    * bounded-pull contract) and rides the closure. */
  def ewmaAlarms(events: DataFrame, ref: Map[String, (Double, Double)],
                 lambda: Double = 0.2, l: Double = 3.0,
                 bucketUs: Long = 3600000000L,
                 latenessDelay: String = "1 hour",
                 keyCol: String = "event_type",
                 tsCol: String = "ts"): Dataset[EwmaUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val w2 = (1.0 - lambda) * (1.0 - lambda)
    val f = lambda / (2.0 - lambda)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ds = events.withWatermark(tsCol, latenessDelay)
      .select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("tsUs"),
        col(tsCol).as("wm_ts"))
      .as[(String, Long, java.sql.Timestamp)]
      .filter(r => ref.contains(r._1))
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[(String, Long, java.sql.Timestamp)],
         state: GroupState[EwmaState]) =>
          val (mu, sigma) = ref(key)
          val st0 = state.getOption
            .getOrElse(EwmaState(0.0, 1.0, 0L, Map.empty))
          val open = scala.collection.mutable.Map(st0.open.toSeq: _*)
          if (!state.hasTimedOut)
            for ((_, tsUs, _) <- it) {
              val b = Math.floorDiv(tsUs, bucketUs) * bucketUs
              open(b) = open.getOrElse(b, 0.0) + 1.0
            }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var (z, w, n) = (st0.z, st0.w, st0.nSealed)
          val sealed0 = open.keys.filter(_ + bucketUs <= wmUs).toSeq.sorted
          val out = sealed0.map { bk =>
            val cnt = open.remove(bk).get
            n += 1
            if (n == 1L) { z = cnt; w = w2 }
            else { z = lambda * cnt + (1.0 - lambda) * z; w = w * w2 }
            val limit = l * sigma * math.sqrt(f * (1.0 - w))
            EwmaUpdate(key, bk, cnt, r6(z), r6(limit),
              math.abs(z - mu) > limit)
          }
          if (open.isEmpty && n == 0L) state.remove()
          else {
            state.update(EwmaState(z, w, n, open.toMap))
            if (open.nonEmpty)
              state.setTimeoutTimestamp(
                ((open.keys.min + bucketUs) / 1000L + 1L)
                  .max(state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  case class CusumUpdate(key: String, bucket_start_us: Long, cnt: Double,
                         cusum: Double, alarm: Boolean)

  case class CusumState(sq: Long, nSealed: Long, open: Map[Long, Double])

  /** Streaming CUSUM drift gate (Page 1954) — the continuous twin of
    * [[graft.operators.TimeSeries.cusumDrift]], run against a
    * PERSISTED per-key reference (μ, σ) exactly like [[ewmaAlarms]]
    * and the KS/PSI drift gates: in-control statistics come from a
    * reference corpus, never from the stream judging itself. Per
    * sealed bucket:
    *   S_t = max(0, S_{t−1} + (x_t − μ − kσ)),  alarm when S_t > hσ.
    * The per-bucket deviation quantizes to a long at 1e-6 BEFORE the
    * recursion (the batch operator's exact-prefix-sum discipline), so
    * the carried state is ONE exact long per key plus the open
    * buckets inside the lateness horizon, and a sealed-prefix batch
    * replay agrees bit-for-bit. Keys absent from the reference are
    * dropped. Standard k=0.5, h=4 defaults. */
  def cusumAlarms(events: DataFrame, ref: Map[String, (Double, Double)],
                  k: Double = 0.5, h: Double = 4.0,
                  bucketUs: Long = 3600000000L,
                  latenessDelay: String = "1 hour",
                  keyCol: String = "event_type",
                  tsCol: String = "ts"): Dataset[CusumUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ds = events.withWatermark(tsCol, latenessDelay)
      .select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("tsUs"),
        col(tsCol).as("wm_ts"))
      .as[(String, Long, java.sql.Timestamp)]
      .filter(r => ref.contains(r._1))
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[(String, Long, java.sql.Timestamp)],
         state: GroupState[CusumState]) =>
          val (mu, sigma) = ref(key)
          val st0 = state.getOption.getOrElse(CusumState(0L, 0L, Map.empty))
          val open = scala.collection.mutable.Map(st0.open.toSeq: _*)
          if (!state.hasTimedOut)
            for ((_, tsUs, _) <- it) {
              val b = Math.floorDiv(tsUs, bucketUs) * bucketUs
              open(b) = open.getOrElse(b, 0.0) + 1.0
            }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var (sq, n) = (st0.sq, st0.nSealed)
          val hq = h * sigma * 1e6
          val sealed0 = open.keys.filter(_ + bucketUs <= wmUs).toSeq.sorted
          val out = sealed0.map { bk =>
            val cnt = open.remove(bk).get
            n += 1
            val zq = math.floor((cnt - mu - k * sigma) * 1e6 + 0.5).toLong
            sq = math.max(0L, sq + zq)
            CusumUpdate(key, bk, cnt, r6(sq.toDouble / 1e6),
              sq.toDouble > hq)
          }
          if (open.isEmpty && n == 0L) state.remove()
          else {
            state.update(CusumState(sq, n, open.toMap))
            if (open.nonEmpty)
              state.setTimeoutTimestamp(
                ((open.keys.min + bucketUs) / 1000L + 1L)
                  .max(state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  def levels(events: DataFrame, alpha: Double = 0.3,
             bucketUs: Long = 3600000000L, latenessDelay: String = "1 hour",
             keyCol: String = "event_type",
             tsCol: String = "ts"): Dataset[LevelUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events.withWatermark(tsCol, latenessDelay)
      .select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("tsUs"),
        col(tsCol).as("wm_ts"))
      .as[(String, Long, java.sql.Timestamp)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[(String, Long, java.sql.Timestamp)],
         state: GroupState[EsState]) =>
          val st0 = state.getOption.getOrElse(EsState(0.0, false, Map.empty))
          val open = scala.collection.mutable.Map(st0.open.toSeq: _*)
          if (!state.hasTimedOut)
            for ((_, tsUs, _) <- it) {
              val b = Math.floorDiv(tsUs, bucketUs) * bucketUs
              open(b) = open.getOrElse(b, 0.0) + 1.0
            }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var level = st0.level
          var has = st0.hasLevel
          val sealed0 = open.keys.filter(_ + bucketUs <= wmUs).toSeq.sorted
          val out = sealed0.map { b =>
            val cnt = open.remove(b).get
            level = if (has) alpha * cnt + (1.0 - alpha) * level else cnt
            has = true
            LevelUpdate(key, b, cnt,
              BigDecimal(level).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble)
          }
          if (open.isEmpty && !has) state.remove()
          else {
            state.update(EsState(level, has, open.toMap))
            // wake when the earliest open bucket seals
            if (open.nonEmpty)
              state.setTimeoutTimestamp(
                ((open.keys.min + bucketUs) / 1000L + 1L)
                  .max(state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }
}
