package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The quantile sketch as a TRUE streaming stateful aggregation:
  * per-(window, group) state is the serialized sketch buffer, closed
  * windows emit once under the watermark, and the emitted value is the
  * exact order statistic in the no-compaction regime. */
class StreamingQuantileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)

  test("windowed p50/p90 emit once per closed window, exact in-regime") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = graft.streaming.StreamingPipeline.windowedQuantiles(
      input.toDF().toDF("ts", "grp", "v"),
      "ts", "grp", "v", windowDur = "10 seconds", watermark = "5 seconds",
      qs = Seq(0.5, 0.9), capacity = 128)
    val q = out.writeStream.format("memory").queryName("wq")
      .outputMode("append").start()
    try {
      // window [0,10): values 1..9 for g1; one row for g2
      input.addData((1 to 9).map(i => (ts(i), "g1", i.toDouble)): _*)
      input.addData(Seq((ts(3), "g2", 42.0)): _*)
      q.processAllAvailable()
      // advance the watermark past window end (10 + 5s lateness)
      input.addData(Seq((ts(20), "g1", 100.0)): _*)
      q.processAllAvailable()
      input.addData(Seq((ts(40), "g1", 100.0)): _*)
      q.processAllAvailable()
      val rows = spark.table("wq")
        .select("grp", "q", "value").as[(String, Double, Double)]
        .collect().toSet
      // g1 sorted 1..9: p50 = idx floor(0.5*8)=4 → 5.0; p90 = idx 7 → 8.0
      assert(rows.contains(("g1", 0.5, 5.0)) && rows.contains(("g1", 0.9, 8.0)),
        s"rows=$rows")
      assert(rows.contains(("g2", 0.5, 42.0)) && rows.contains(("g2", 0.9, 42.0)))
    } finally q.stop()
  }

  test("windowed hot keys: top-k per closed window, exact below capacity") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Timestamp, String)]
    val out = graft.streaming.StreamingPipeline.windowedHotKeys(
      input.toDF().toDF("ts", "k"),
      "ts", "k", windowDur = "10 seconds", watermark = "5 seconds",
      k = 2, capacity = 64)
    val q = out.writeStream.format("memory").queryName("whk")
      .outputMode("append").start()
    try {
      val keys = Seq.fill(5)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold")
      input.addData(keys.zipWithIndex.map { case (k, i) => (ts(i), k) }: _*)
      q.processAllAvailable()
      input.addData(Seq((ts(40), "later")): _*)
      q.processAllAvailable()
      val rows = spark.table("whk")
        .select("key", "count_lo", "count_hi")
        .as[(String, Long, Long)].collect().toSet
      assert(rows.contains(("hot", 5L, 5L)) && rows.contains(("warm", 3L, 3L)),
        s"rows=$rows")
      assert(!rows.exists(_._1 == "cold"), "k=2 must cut the tail")
    } finally q.stop()
  }

  test("windowed distinct: HLL registers as window state, exact in the small regime") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Timestamp, String, String)]
    val out = graft.streaming.StreamingPipeline.windowedDistinct(
      input.toDF().toDF("ts", "grp", "k"),
      "ts", "grp", "k", windowDur = "10 seconds", watermark = "5 seconds",
      p = 9)
    val q = out.writeStream.format("memory").queryName("wdx")
      .outputMode("append").start()
    try {
      // window [0,10): g1 sees keys a,b,c (each repeated), g2 sees only z
      input.addData(Seq("a", "b", "c", "a", "b").zipWithIndex.map {
        case (k, i) => (ts(i), "g1", k) }: _*)
      input.addData(Seq((ts(2), "g2", "z"), (ts(4), "g2", "z")): _*)
      q.processAllAvailable()
      input.addData(Seq((ts(40), "g1", "later")): _*)
      q.processAllAvailable()
      val rows = spark.table("wdx")
        .select("grp", "est_distinct", "nonzero")
        .as[(String, Double, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // mirror Spark's round(): BigDecimal.valueOf + HALF_UP at scale 4
      def lin(v: Int) = java.math.BigDecimal
        .valueOf(512.0 * math.log(512.0 / (512 - v)))
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(rows("g1") == ((lin(3), 3)), s"rows=$rows")
      assert(rows("g2") == ((lin(1), 1)))
    } finally q.stop()
  }
}
