package graft

import org.apache.spark.sql.SparkSession

/** Scratch cost-attribution for the near-dup mining chain (not part of
  * the suite; run:
  *   sbt "Test/runMain graft.NearDupProbe /root/testdata/sf0.1"). */
object NearDupProbe {
  def time(name: String)(f: => Long): Unit = {
    var rep = 0
    var best = Double.MaxValue
    var n = 0L
    while (rep < 3) {
      val t0 = System.nanoTime()
      n = f
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec < best) best = sec
      graft.operators.CacheScope.drain()
      rep += 1
    }
    println(f"PROBE $name%-32s ${best}%7.3f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("neardup-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val d = spark.read.parquet(s"$dir/documents.parquet")

    time("keeplist salts=0 (r9 path)") {
      Dedup.dedupKeepListFromPairs(d, "doc_id",
        Dedup.minhashLshJaccardPairs(d, "text", "doc_id", n = 3,
          threshold = 0.5, maxDocFreq = 100, salts = 0)).count()
    }
    time("keeplist salts=8 (r10 path)") {
      Dedup.dedupKeepListFromPairs(d, "doc_id",
        Dedup.minhashLshJaccardPairs(d, "text", "doc_id", n = 3,
          threshold = 0.5, maxDocFreq = 100, salts = 8)).count()
    }
    time("pairs only salts=0") {
      Dedup.minhashLshJaccardPairs(d, "text", "doc_id",
        n = 3, threshold = 0.5, maxDocFreq = 100, salts = 0).count()
    }
    time("pairs only salts=8") {
      Dedup.minhashLshJaccardPairs(d, "text", "doc_id",
        n = 3, threshold = 0.5, maxDocFreq = 100, salts = 8).count()
    }
    // stage attribution
    import org.apache.spark.sql.functions._
    val sh = graft.operators.CacheScope.scratch(
      Dedup.shingleDf(d, "text", "doc_id", 3))
    val banded = graft.operators.CacheScope.scratch(
      Dedup.bandFrame(sh, "mh_id", 64, 32))
    val t0 = System.nanoTime()
    val nb = banded.count()
    println(f"PROBE banded materialize            ${(System.nanoTime()-t0)/1e9}%7.3f s  rows=$nb")
    val t1 = System.nanoTime()
    val hot = graft.operators.Skew.hotKeyList(
      banded.withColumn("__bk", concat_ws("", col("band"), col("band_hash"))),
      "__bk", 64, 1024)
    println(f"PROBE hotKeyList on warm cache      ${(System.nanoTime()-t1)/1e9}%7.3f s  hot=${hot.length}")
    if (hot.nonEmpty) println("PROBE hot sample: " + hot.take(3).mkString(","))
    graft.operators.CacheScope.drain()
    spark.stop()
  }
}
