package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming exponential smoothing: buckets fold into the per-key
  * level exactly once, when the watermark seals them, in event-time
  * order — agreeing with the batch fold on the sealed prefix. */
class ForecastStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val H = 3600000000L // 1h in µs

  private def run(batches: Seq[Seq[(String, Long)]]): Seq[ForecastStream.LevelUpdate] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = ForecastStream.levels(df, alpha = 0.3, bucketUs = H,
      latenessDelay = "0 seconds")
    val qname = s"fc_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(qname).as[ForecastStream.LevelUpdate].collect().toSeq
        .sortBy(u => (u.key, u.bucket_start_us))
    } finally q.stop()
  }

  test("buckets seal in order and fold to the batch levels") {
    // hour 1: 2 events, hour 2: 1, hour 3: 4; a hour-4 heartbeat
    // advances the watermark past hour 3's end so all three seal.
    // Batch fold: s1=2, s2=0.3+1.4=1.7, s3=1.2+1.19=2.39.
    val out = run(Seq(
      Seq(("a", 1 * H), ("a", 1 * H + 5), ("a", 2 * H + 1)),
      Seq(("a", 3 * H + 1), ("a", 3 * H + 2), ("a", 3 * H + 3), ("a", 3 * H + 4)),
      Seq(("a", 5 * H)))) // heartbeat: watermark passes 4·H
    val a = out.filter(_.key == "a")
    assert(a.map(_.cnt) == Seq(2.0, 1.0, 4.0))
    assert(a.map(_.level) == Seq(2.0, 1.7, 2.39))
  }

  test("agrees with the batch operator on a multi-key random-ish stream") {
    import spark.implicits._
    val rows = for {
      k <- Seq("x", "y"); h <- 1 to 6
      i <- 0 until ((h * 7 + k.length) % 5 + 1)
    } yield (k, h * H + i * 1000L)
    val out = run(Seq(rows, Seq(("x", 9 * H), ("y", 9 * H)))) // seal 1..6
    val streamLevels = out.groupBy(_.key)
      .view.mapValues(_.maxBy(_.bucket_start_us).level).toMap
    val batch = graft.operators.TimeSeries.expSmoothing(
        (rows ++ Seq(("x", 9 * H), ("y", 9 * H))).toDF("event_type", "us")
          .withColumn("ts", timestamp_micros(col("us"))).drop("us"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // the stream has NOT sealed hour 9 (nothing after it) — compare
    // against the batch fold over hours 1..6 only
    val batch6 = graft.operators.TimeSeries.expSmoothing(
        rows.toDF("event_type", "us")
          .withColumn("ts", timestamp_micros(col("us"))).drop("us"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(streamLevels == batch6)
    assert(batch.keySet == Set("x", "y")) // sanity: full-fold differs
  }

  test("a bucket never folds twice and idle keys seal via timeout") {
    val out = run(Seq(
      Seq(("z", 1 * H)),
      Seq(("z", 4 * H)),  // watermark jumps: hour 1 seals exactly once
      Seq(("z", 7 * H)))) // hour 4 seals
    val z = out.filter(_.key == "z")
    assert(z.map(_.bucket_start_us) == Seq(1 * H, 4 * H))
    assert(z.map(_.cnt) == Seq(1.0, 1.0))
    assert(z.map(_.level) == Seq(1.0, 1.0))
  }

  private def runHolt(batches: Seq[Seq[(String, Long)]]): Seq[ForecastStream.HoltUpdate] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = ForecastStream.holtLevels(df, alpha = 0.3, beta = 0.2,
      bucketUs = H, latenessDelay = "0 seconds")
    val qname = s"holt_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(qname).as[ForecastStream.HoltUpdate].collect().toSeq
        .sortBy(u => (u.key, u.bucket_start_us))
    } finally q.stop()
  }

  test("holtLevels: sealed-prefix fold equals the batch Holt operator") {
    import spark.implicits._
    // hourly counts 10, 12, 11, 15 for one key; heartbeat seals all 4.
    // Batch hand-fold: init s=12 b=2; x=11 -> (13.1, 1.82);
    // x=15 -> (14.944, 1.8248), forecast 16.7688
    val rows = Seq(10, 12, 11, 15).zipWithIndex.flatMap { case (c, h) =>
      (1 to c).map(i => ("h", (h + 1) * H + i * 1000L))
    }
    val out = runHolt(Seq(rows, Seq(("h", 9 * H))))
    val h = out.filter(_.key == "h")
    // emission starts at the SECOND sealed bucket (init consumes two)
    assert(h.map(_.cnt) == Seq(12.0, 11.0, 15.0))
    assert(h.last.level == 14.944 && h.last.trend == 1.8248)
    assert(h.last.forecast == 16.7688)
    val batch = graft.operators.TimeSeries.holtSmoothing(
        rows.toDF("event_type", "us")
          .withColumn("ts", timestamp_micros(col("us"))).drop("us"),
        alpha = 0.3, beta = 0.2)
      .head()
    assert(batch.getDouble(2) == h.last.level &&
      batch.getDouble(3) == h.last.trend)
  }

  test("holtLevels: single sealed bucket emits nothing (init needs two)") {
    val out = runHolt(Seq(Seq(("q", 1 * H)), Seq(("q", 5 * H))))
    // hour 1 sealed -> consumed as x1, no emission yet
    assert(out.filter(_.key == "q").isEmpty)
  }

  private def runEwma(ref: Map[String, (Double, Double)],
                      batches: Seq[Seq[(String, Long)]]): Seq[ForecastStream.EwmaUpdate] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = ForecastStream.ewmaAlarms(df, ref, lambda = 0.2, l = 3.0,
      bucketUs = H, latenessDelay = "0 seconds")
    val qname = s"ewma_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(qname).as[ForecastStream.EwmaUpdate].collect().toSeq
        .sortBy(u => (u.key, u.bucket_start_us))
    } finally q.stop()
  }

  test("ewmaAlarms: sealed buckets replay the batch recursion and alarm vs the reference") {
    // counts 2, 2, 20 vs reference μ=2, σ=1: z = 2, 2, then
    // 0.2·20 + 0.8·2 = 5.6; limits 3·√(0.1111·(1−0.8^{2t})):
    // t3 limit = 3·√(0.1111·(1−0.262144)) = 0.8605·√... compute in
    // the local replay below; |5.6−2| = 3.6 must breach.
    val rows = Seq(2, 2, 20).zipWithIndex.flatMap { case (c, h) =>
      (1 to c).map(i => ("e", (h + 1) * H + i * 1000L))
    }
    val out = runEwma(Map("e" -> (2.0, 1.0)),
      Seq(rows, Seq(("e", 9 * H))))
    val e = out.filter(_.key == "e")
    assert(e.map(_.cnt) == Seq(2.0, 2.0, 20.0))
    // local replay of the identical recursion
    val (lam, w2, f) = (0.2, 0.64, 0.2 / 1.8)
    var (z, w) = (2.0, w2)
    val expect = Seq(2.0, 2.0, 20.0).zipWithIndex.map { case (c, i) =>
      if (i > 0) { z = lam * c + (1 - lam) * z; w = w * w2 }
      val lim = 3.0 * 1.0 * math.sqrt(f * (1 - w))
      (z, lim, math.abs(z - 2.0) > lim)
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(e.map(_.ewma) == expect.map(p => r6(p._1)))
    assert(e.map(_.limit) == expect.map(p => r6(p._2)))
    assert(e.map(_.alarm) == expect.map(_._3))
    assert(e.last.alarm) // the spike day breaches
    assert(!e.head.alarm) // in-control start does not
  }

  test("ewmaAlarms: keys without a reference are dropped") {
    val out = runEwma(Map("known" -> (1.0, 1.0)),
      Seq(Seq(("known", 1 * H), ("unknown", 1 * H)),
        Seq(("known", 5 * H), ("unknown", 5 * H))))
    assert(out.map(_.key).distinct == Seq("known"))
  }

  private def runCusum(ref: Map[String, (Double, Double)],
                       batches: Seq[Seq[(String, Long)]]): Seq[ForecastStream.CusumUpdate] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = ForecastStream.cusumAlarms(df, ref, k = 0.5, h = 4.0,
      bucketUs = H, latenessDelay = "0 seconds")
    val qname = s"cusum_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(qname).as[ForecastStream.CusumUpdate].collect().toSeq
        .sortBy(u => (u.key, u.bucket_start_us))
    } finally q.stop()
  }

  test("cusumAlarms: sealed prefix agrees with the exact batch recursion") {
    // reference μ=2, σ=1, k=0.5, h=4: deviations x−2.5 accumulate
    // positively only; counts 2,2,3,9 → S = 0, 0, 0.5, 7.0 → the
    // final bucket breaches hσ = 4
    val counts = Seq(2, 2, 3, 9)
    val rows = counts.zipWithIndex.flatMap { case (c, hh) =>
      (1 to c).map(i => ("e", (hh + 1) * H + i * 1000L))
    }
    val out = runCusum(Map("e" -> (2.0, 1.0)), Seq(rows, Seq(("e", 9 * H))))
    val e = out.filter(_.key == "e")
    assert(e.map(_.cnt) == counts.map(_.toDouble))
    // exact long replay of the identical quantized recursion — the
    // batch operator's prefix-sum closed form evaluated sequentially
    var sq = 0L
    val expect = counts.map { c =>
      val zq = math.floor((c - 2.0 - 0.5 * 1.0) * 1e6 + 0.5).toLong
      sq = math.max(0L, sq + zq)
      (sq / 1e6, sq.toDouble > 4.0 * 1.0 * 1e6)
    }
    assert(e.map(_.cusum) == expect.map(_._1))
    assert(e.map(_.alarm) == expect.map(_._2))
    assert(e.last.alarm && !e.head.alarm)
    // the statistic resets at zero, never negative
    assert(e.map(_.cusum).forall(_ >= 0.0))
  }

  test("cusumAlarms: split delivery equals one-shot delivery (sealed prefix)") {
    val counts = Seq(1, 5, 2, 8)
    def rowsOf(hs: Seq[Int]) = hs.flatMap(hh =>
      (1 to counts(hh - 1)).map(i => ("e", hh * H + i * 1000L)))
    val oneShot = runCusum(Map("e" -> (2.0, 1.5)),
      Seq(rowsOf(Seq(1, 2, 3, 4)), Seq(("e", 9 * H))))
    val split = runCusum(Map("e" -> (2.0, 1.5)),
      Seq(rowsOf(Seq(1)), rowsOf(Seq(2)), rowsOf(Seq(3)), rowsOf(Seq(4)),
        Seq(("e", 9 * H))))
    assert(oneShot == split)
    // keys without a reference are dropped
    val out = runCusum(Map("known" -> (1.0, 1.0)),
      Seq(Seq(("known", 1 * H), ("unknown", 1 * H)),
        Seq(("known", 5 * H), ("unknown", 5 * H))))
    assert(out.map(_.key).distinct == Seq("known"))
  }
}
