package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Local profiling harness (guide §1): per-query wall seconds next to
  * job/stage/task counts and summed task metrics, so overhead-dominated
  * queries (wall >> taskTime/cores) separate from compute-bound ones.
  * Not part of the driver contract — an optimization-round instrument.
  *
  * Usage: SPARK_GRAFT_BENCH_ONLY=a,b,c sbt "runMain graft.ProfileBench"
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val gcMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // one warm pass, untimed, to take JIT/codegen out of the numbers
    for ((name, fn) <- named) {
      try fn(spark, sfDir).count() catch { case _: Throwable => }
      graft.operators.CacheScope.drain()
    }
    println(f"${"query"}%-32s ${"wall_s"}%8s ${"jobs"}%5s ${"stg"}%5s ${"tasks"}%6s ${"taskS"}%8s ${"gcS"}%6s ${"shR_MB"}%8s ${"shW_MB"}%8s")
    for ((name, fn) <- named) {
      var best = Double.MaxValue
      var bj = 0; var bs = 0; var bt = 0; var btm = 0L; var bg = 0L
      var brd = 0L; var bwr = 0L
      for (_ <- 1 to runs) {
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
        shufRead.set(0); shufWrite.set(0); gcMs.set(0)
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case e: Throwable =>
          println(s"$name FAILED: ${e.getMessage.take(120)}") }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.CacheScope.drain()
        Thread.sleep(50) // let the listener bus drain
        if (dt < best) { best = dt; bj = jobs.get; bs = stages.get
          bt = tasks.get; btm = taskMs.get; bg = gcMs.get
          brd = shufRead.get; bwr = shufWrite.get }
      }
      println(f"$name%-32s $best%8.2f $bj%5d $bs%5d $bt%6d ${btm / 1e3}%8.1f ${bg / 1e3}%6.1f ${brd / 1e6}%8.1f ${bwr / 1e6}%8.1f")
    }
    spark.stop()
  }
}
