package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming ordered funnel: per-user O(1) stage state carried across
  * micro-batches, advances emitted in append mode, semantics equal to
  * the batch earliest-completion chain. */
class FunnelStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val stages = Seq("view", "click", "purchase")

  private def run(batches: Seq[Seq[(Long, Long, Long, String)]]): Seq[(Long, Int, Long)] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val df = input.toDF().toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = FunnelStream.stageAdvances(df, stages)
    val qname = s"fstream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(qname).select("user_id", "stage_idx", "ts_us")
        .as[(Long, Int, Long)].collect().toSeq.sorted
    } finally q.stop()
  }

  test("stage chain advances across micro-batches; out-of-batch-order sorts by ts") {
    val out = run(Seq(
      Seq((1L, 7L, 1000L, "view")),
      // scrambled arrival inside one batch: click@3000 listed before
      // purchase precondition exists; in-batch sort by ts fixes it
      Seq((3L, 7L, 5000L, "purchase"), (2L, 7L, 3000L, "click"))))
    assert(out == Seq((7L, 1, 1000L), (7L, 2, 3000L), (7L, 3, 5000L)))
  }

  test("same-instant stage pair does not advance twice (strict ordering)") {
    val out = run(Seq(Seq(
      (1L, 9L, 1000L, "view"), (2L, 9L, 1000L, "click"),
      (3L, 9L, 2000L, "click"))))
    // click@1000 is NOT strictly after view@1000; click@2000 is
    assert(out == Seq((9L, 1, 1000L), (9L, 2, 2000L)))
  }

  test("windowed stage counts: stateful chain emits once per closed window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val base = 1700000000L * 1000000L
    val df = input.toDF().toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = FunnelStream.windowedStageCounts(df, stages,
      windowDur = "10 seconds", watermark = "5 seconds")
    val q = out.writeStream.format("memory").queryName("wfc")
      .outputMode("append").start()
    try {
      // window [0,10): two users reach stage 1, one reaches stage 2
      input.addData(
        (1L, 1L, base + 1000000L, "view"), (2L, 1L, base + 2000000L, "click"),
        (3L, 2L, base + 3000000L, "view"))
      q.processAllAvailable()
      // advance the watermark past window end
      input.addData((9L, 9L, base + 40000000L, "view"))
      q.processAllAvailable()
      input.addData((10L, 9L, base + 80000000L, "view"))
      q.processAllAvailable()
      val rows = spark.table("wfc")
        .select("stage_idx", "n_advances").as[(Int, Long)]
        .collect().toMap
      assert(rows.get(1).contains(2L) && rows.get(2).contains(1L), s"rows=$rows")
    } finally q.stop()
  }

  test("advance counts equal the batch orderedFunnel stage counts") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, 1000L, "view"), (2L, 1L, 2000L, "click"), (3L, 1L, 3000L, "purchase"),
      (4L, 2L, 1000L, "view"), (5L, 2L, 1500L, "click"),
      (6L, 3L, 4000L, "view"),
      (7L, 4L, 1000L, "click"), // click with no prior view: no stage
      (8L, 5L, 2000L, "view"), (9L, 5L, 2000L, "click")) // same instant
    val streamed = run(Seq(rows))
    val streamCounts = streamed.groupBy(_._2).view.mapValues(_.size).toMap
    val batchDf = rows.toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val batchCounts = graft.operators.Funnel.orderedFunnel(batchDf, stages)
      .select("stage_idx", "n_users")
      .collect().map(r => r.getInt(0) -> r.getLong(1).toInt).toMap
    assert((1 to 3).forall(i =>
      streamCounts.getOrElse(i, 0) == batchCounts.getOrElse(i, 0)),
      s"stream=$streamCounts batch=$batchCounts")
  }
}
