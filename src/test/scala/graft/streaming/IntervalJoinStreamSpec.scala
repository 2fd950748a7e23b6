package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.IntervalJoin

/** The bucketized interval join is streaming-composable with ZERO
  * changes: the static interval side explodes to its buckets once, the
  * stream side maps each point to one bucket, and the stream-static
  * inner join stays an EQUI-join per micro-batch — the same property
  * that kills BroadcastNestedLoopJoin at batch scale keeps each
  * micro-batch plan hash-joinable here. */
class IntervalJoinStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("stream-static point-in-interval equals the batch result") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val intervals = Seq(("w1", 0L, 10L), ("w2", 9L, 20L), ("w3", 100L, 110L))
      .toDF("win", "lo", "hi")
    val pts = Seq(1L, 5L, 10L, 15L, 25L, 105L)

    val input = MemoryStream[Long]
    val joined = IntervalJoin.pointInInterval(
      input.toDF().toDF("p"), "p", intervals, "lo", "hi", 4L)
    val q = joined.writeStream.format("memory").queryName("ivjoin")
      .outputMode("append").start()
    try {
      input.addData(pts.take(3): _*)
      q.processAllAvailable()
      input.addData(pts.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("ivjoin").select("p", "win")
        .as[(Long, String)].collect().toSet
      val batch = IntervalJoin.pointInInterval(
          pts.toDF("p"), "p", intervals, "lo", "hi", 4L)
        .select("p", "win").as[(Long, String)].collect().toSet
      assert(streamed == batch)
      assert(batch == Set((1L, "w1"), (5L, "w1"), (10L, "w1"), (10L, "w2"),
        (15L, "w2"), (105L, "w3")))
    } finally q.stop()
  }
}
