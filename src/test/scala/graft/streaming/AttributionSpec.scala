package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming last-touch attribution: per-user O(1) state (the latest
  * touch) carried across micro-batches; conversions emit attributed
  * rows in append mode. */
class AttributionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def run(batches: Seq[Seq[(Long, Long, Long, String)]],
                  windowMicros: Long): Seq[Attribution.Attributed] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val df = input.toDF().toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = Attribution.attribute(df, Seq("view", "click"), "purchase",
      windowMicros)
    val qname = s"attr_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(qname).as[Attribution.Attributed].collect().toSeq
        .sortBy(_.event_id)
    } finally q.stop()
  }

  test("state carries the last touch across micro-batches") {
    val out = run(Seq(
      Seq((1L, 7L, 1000000L, "view")),            // batch 1: touch only
      Seq((2L, 7L, 5000000L, "purchase")),        // batch 2: converts
      Seq((3L, 7L, 9000000L, "purchase"))),       // batch 3: same touch again
      windowMicros = 60L * 1000000L)
    assert(out.map(_.event_id) == Seq(2L, 3L))
    assert(out.forall(_.touch_event_id.contains(1L)))
    assert(out.head.micros_since_touch.contains(4000000L))
    assert(out(1).micros_since_touch.contains(8000000L))
  }

  test("in-batch ordering: touch before conversion attributes; window bounds") {
    val out = run(Seq(Seq(
      (1L, 1L, 1000000L, "click"),
      (2L, 1L, 2000000L, "purchase"),    // attributes to 1
      (3L, 2L, 0L, "view"),
      (4L, 2L, 100L * 1000000L, "purchase"))), // 100s later, window 60s → null
      windowMicros = 60L * 1000000L)
    assert(out.find(_.event_id == 2L).get.touch_event_id.contains(1L))
    assert(out.find(_.event_id == 2L).get.touch_type.contains("click"))
    assert(out.find(_.event_id == 4L).get.touch_event_id.isEmpty)
  }

  test("a newer touch replaces state; out-of-order in-batch rows sort by event time") {
    val out = run(Seq(
      // arrival order scrambled; event-time order: view@1s, click@3s, purchase@5s
      Seq((3L, 9L, 5000000L, "purchase"),
          (1L, 9L, 1000000L, "view"),
          (2L, 9L, 3000000L, "click"))),
      windowMicros = 60L * 1000000L)
    assert(out.length == 1)
    assert(out.head.touch_event_id.contains(2L)) // the click, not the view
    assert(out.head.micros_since_touch.contains(2000000L))
  }

  test("same-microsecond touch with GREATER id than the conversion still attributes") {
    // Batch twin orders (__ts, __side) with touches first at an equal ts;
    // the in-batch fold must do the same even when the touch's event_id
    // sorts after the conversion's.
    val out = run(Seq(Seq(
      (5L, 3L, 2000000L, "purchase"),   // conversion, smaller id
      (9L, 3L, 2000000L, "click"))),    // same µs, larger id
      windowMicros = 60L * 1000000L)
    assert(out.length == 1)
    assert(out.head.touch_event_id.contains(9L))
    assert(out.head.micros_since_touch.contains(0L))
  }

  private def runBounded(batches: Seq[Seq[(Long, Long, Long, String)]],
                         windowMicros: Long,
                         lateness: String): Seq[Attribution.Attributed] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val df = input.toDF().toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = Attribution.attributeBounded(df, Seq("view", "click"),
      "purchase", windowMicros, lateness)
    val qname = s"attrb_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(qname).as[Attribution.Attributed].collect().toSeq
        .sortBy(_.event_id)
    } finally q.stop()
  }

  test("bounded: a touch arriving one batch AFTER its conversion still attributes") {
    val out = runBounded(Seq(
      // batch 1: the conversion @5s arrives first (its touch is late)
      Seq((10L, 1L, 5000000L, "purchase")),
      // batch 2: the late touch @4s (inside 10s lateness) + an advancing
      // event @30s that pushes the watermark past the conversion
      Seq((2L, 1L, 4000000L, "click"),
          (90L, 9L, 30000000L, "view")),
      // batch 3: another advance so the flush batch runs with wm > 5s
      Seq((91L, 9L, 40000000L, "view"))),
      windowMicros = 60L * 1000000L, lateness = "10 seconds")
    val conv = out.filter(_.event_id == 10L)
    assert(conv.length == 1, s"conversion must flush exactly once: $out")
    assert(conv.head.touch_event_id.contains(2L),
      s"late touch must retro-attribute: ${conv.head}")
    assert(conv.head.micros_since_touch.contains(1000000L))
  }

  test("bounded: emission is watermark-delayed and exact for in-lateness data") {
    val out = runBounded(Seq(
      Seq((1L, 3L, 1000000L, "view"),
          (2L, 3L, 2000000L, "purchase")),       // conv @2s; wm still behind
      Seq((50L, 8L, 60000000L, "view")),         // wm → 50s: seals the conv
      Seq((51L, 8L, 70000000L, "view"))),        // flush batch
      windowMicros = 60L * 1000000L, lateness = "10 seconds")
    val conv = out.filter(_.event_id == 2L)
    assert(conv.length == 1)
    assert(conv.head.touch_event_id.contains(1L))
    // out-of-window conversion flushes unattributed, not dropped
    val out2 = runBounded(Seq(
      Seq((1L, 4L, 0L, "view"),
          (2L, 4L, 100L * 1000000L, "purchase")), // 100s later, window 60s
      Seq((60L, 8L, 200000000L, "view")),
      Seq((61L, 8L, 210000000L, "view"))),
      windowMicros = 60L * 1000000L, lateness = "10 seconds")
    val conv2 = out2.filter(_.event_id == 2L)
    assert(conv2.length == 1 && conv2.head.touch_event_id.isEmpty)
  }

  test("bounded soak: 20 disordered batches converge exactly to the batch operator") {
    import spark.implicits._
    // 2000 events / 40 users, event time advancing ~100ms per event with
    // ±3s jitter (inside the 10s lateness), types seeded-deterministic
    // base offset keeps every event time strictly positive: Spark's
    // stateful operator drops rows with event time <= the watermark,
    // and the initial watermark is 0 — a ts=0 row would silently vanish
    val rnd = new scala.util.Random(42)
    val events = (0 until 2000).map { i =>
      val id = i.toLong + 1
      val user = (rnd.nextInt(40) + 1).toLong
      val ts = i * 100000L + 4000000L + rnd.nextInt(6000000) - 3000000L
      val typ = rnd.nextInt(10) match {
        case 0 | 1 => "purchase"
        case 2 | 3 | 4 => "click"
        case _ => "view"
      }
      (id, user, ts, typ)
    }
    val windowUs = 30L * 1000000L
    // stream in 20 batches + a far-future sentinel that flushes the tail
    val batches = events.grouped(100).toSeq :+
      Seq((99999L, 999L, events.map(_._3).max + 60000000L, "view"))
    val streamed = runBounded(batches, windowUs, "10 seconds")
      .map(a => (a.event_id, a.touch_event_id, a.micros_since_touch)).toSet

    val batchDf = events.toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val expected = graft.operators.Funnel.lastTouchAttribution(batchDf,
        Seq("view", "click"), "purchase", windowUs)
      .collect().map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("touch_event_id")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("micros_since_touch")).map(_.toLong)))
      .toSet
    assert(expected.nonEmpty)
    assert(streamed == expected,
      s"streamed ${streamed.size} vs batch ${expected.size}; " +
        s"diff=${(streamed diff expected).take(3)} / ${(expected diff streamed).take(3)}")
  }

  test("among same-microsecond touches the max event id wins") {
    val out = run(Seq(Seq(
      (4L, 6L, 1000000L, "view"),
      (7L, 6L, 1000000L, "click"),      // same µs, max id → winner
      (8L, 6L, 2000000L, "purchase"))),
      windowMicros = 60L * 1000000L)
    assert(out.length == 1)
    assert(out.head.touch_event_id.contains(7L))
    assert(out.head.touch_type.contains("click"))
  }
}
