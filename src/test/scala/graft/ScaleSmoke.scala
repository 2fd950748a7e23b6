package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke: wpgen → text files → full parse pipeline at local[32].
  * Run: sbt "Test/runMain graft.ScaleSmoke [nLines]" */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // ~350 MB of text at 128 MB/split = 3 tasks on 32 cores; size splits
      // so the parse stage actually fans out (the knob that matters when
      // one executor-core should own ~10-30 MB of raw log)
      .config("spark.sql.files.maxPartitionBytes", "12m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wpl =
      """package /scale {
         rule r { (digit:id,ip:src,time:at,sn:dev,chars:name,http/status:st,float:v)\, }
        }"""
    val dir = java.nio.file.Files.createTempDirectory("graft-scale").toString
    val t0 = System.nanoTime()
    graft.gen.WpGen.dataset(spark, wpl, "/scale/r", n)
      .repartition(32).write.mode("overwrite").text(dir)
    val tGen = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val parsed = graft.engine.WplEngine.parse(
      spark.read.text(dir).withColumnRenamed("value", "line"), "line", wpl)
    val counts = parsed.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tParse = (System.nanoTime() - t1) / 1e9
    println(f"SCALE gen: $n lines in $tGen%.1f s (${n / tGen / 1e6}%.2f M lines/s)")
    println(f"SCALE parse: $n lines in $tParse%.1f s (${n / tParse / 1e6}%.2f M lines/s, " +
      f"${n / tParse / 32 / 1000}%.0f k lines/s/core) counts=$counts")
    assert(counts("success") == n)
    // expression path (parse_wpl in a projection, whole-stage codegen)
    val t2 = System.nanoTime()
    val viaExpr = graft.engine.WplEngine.parseWith(
      spark.read.text(dir).withColumnRenamed("value", "line"), "line", wpl, Seq.empty)
    val c2 = viaExpr.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tExpr = (System.nanoTime() - t2) / 1e9
    println(f"SCALE parse-expr: $n lines in $tExpr%.1f s (${n / tExpr / 1e6}%.2f M lines/s, " +
      f"${n / tExpr / 32 / 1000}%.0f k lines/s/core) counts=$c2")
    spark.stop()
  }
}
