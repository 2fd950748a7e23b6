package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stateful event-time streaming: gap sessionization via
  * flatMapGroupsWithState + event-time timeout, and watermarked
  * windowed aggregation (append mode, late-data drop). */
class SessionizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("gap sessionization: sessions close when the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val sessions = Sessionize.sessions(
      input.toDF().toDF("key", "ts"), "key", "ts",
      gapSec = 60, watermarkDelay = "10 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // one session for alice: two events 30s apart
      input.addData(("alice", ts("2024-01-01 10:00:00")),
        ("alice", ts("2024-01-01 10:00:30")))
      q.processAllAvailable()
      // far-future event advances the watermark past alice's gap horizon
      input.addData(("bob", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      // one more batch so the event-time timeout fires
      input.addData(("bob", ts("2024-01-01 11:00:01")))
      q.processAllAvailable()

      val out = spark.table("sess").as[Sessionize.Session].collect()
      val alice = out.filter(_.key == "alice")
      assert(alice.length == 1, out.mkString(", "))
      assert(alice.head.session_start == ts("2024-01-01 10:00:00").getTime * 1000)
      assert(alice.head.session_end == ts("2024-01-01 10:00:30").getTime * 1000)
      assert(alice.head.n_events == 2)
    } finally q.stop()
  }

  test("same-batch gap split emits the earlier session immediately") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val sessions = Sessionize.sessions(
      input.toDF().toDF("key", "ts"), "key", "ts",
      gapSec = 60, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess2")
      .outputMode("append").start()
    try {
      // two sessions inside ONE batch: 3 events, then a 10-min hole, then 1
      input.addData(
        ("u", ts("2024-01-01 09:00:00")), ("u", ts("2024-01-01 09:00:20")),
        ("u", ts("2024-01-01 09:00:40")), ("u", ts("2024-01-01 09:10:40")))
      q.processAllAvailable()
      val out = spark.table("sess2").as[Sessionize.Session].collect()
      assert(out.length == 1) // first session closed by the in-batch gap
      assert(out.head.n_events == 3)
      assert(out.head.session_end == ts("2024-01-01 09:00:40").getTime * 1000)
    } finally q.stop()
  }

  test("watermarked windowed counts finalize windows and drop late data") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val counts = Sessionize.windowedCounts(
      input.toDF().toDF("key", "ts"), "key", "ts",
      windowSpec = "5 minutes", watermarkDelay = "10 seconds")
    val q = counts.writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    try {
      input.addData(("x", ts("2024-01-01 10:00:10")), ("x", ts("2024-01-01 10:01:00")),
        ("y", ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      // advance the watermark far past the 10:00 window
      input.addData(("x", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      input.addData(("x", ts("2024-01-01 11:00:05")))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .select("key", "n").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("x", 2L), ("y", 1L))) // the finalized 10:00 window
      // a LATE event for the finalized window is dropped, not re-emitted
      input.addData(("x", ts("2024-01-01 10:00:30")))
      q.processAllAvailable()
      assert(spark.table("wc").count() == 2)
    } finally q.stop()
  }
}
