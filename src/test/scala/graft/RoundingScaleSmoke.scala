package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SplitMix64.splitmix64

/** Rounding-contract regime smoke (r8 verdict ask #7): the 12-dp
  * determinism contract for iterated trainers (LR, PageRank) claims
  * cross-row double sums agree across partitionings well inside the
  * rounding grid. The sf fixtures exercise it at ~10³ rows; this smoke
  * probes the claimed regime at ≥10⁶ rows by training under DIFFERENT
  * physical plans — input partition counts 8 vs 32 AND shuffle
  * partition counts 8 vs 32 (different partial-aggregation trees,
  * different merge orders) — and asserting the trained weights/ranks
  * are IDENTICAL doubles.
  *
  * Why the contract scales: LR's only unbounded-length sum is
  * immediately divided by its length (the gradient is a MEAN), so the
  * reordering error is ~eps·log(n)·mean|x| — nearly independent of row
  * count — while the rounding grid is fixed at 5·10⁻¹³. PageRank's
  * in-mass is INTEGER mass accounting (terms quantized to longs at
  * 10⁻¹⁵, summed exactly): the first run of this smoke caught a double
  * sum straddling a 12-dp boundary at 10⁵ nodes — one node's last
  * digit flipped between the 8- and 32-partition runs — which is
  * exactly the failure mode the quantized form removes.
  *
  * Run: sbt "Test/runMain graft.RoundingScaleSmoke [nDocs]"
  */
object RoundingScaleSmoke {

  private def textOf(d: org.apache.spark.sql.Column) = {
    val len = pmod(splitmix64(d * 2654435761L + 7), lit(9)).cast("int") + 6
    concat_ws(" ", transform(sequence(lit(0), len - 1),
      i => concat(lit("w"), pmod(splitmix64(d * 131071L + i.cast("long")),
        lit(5000)))))
  }

  private def weightsMap(w: DataFrame): Map[Long, Double] =
    w.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.range(n).select(col("id").as("doc_id"),
      textOf(col("id")).as("text"))

    def trainAt(parts: Int, shuffle: Int): Map[Long, Double] = {
      spark.conf.set("spark.sql.shuffle.partitions", shuffle.toString)
      val w = weightsMap(graft.operators.Classifier.trainLogReg(
        docs.repartition(parts), "text", "doc_id",
        col("doc_id") % 7 === 0, nBuckets = 64, iters = 2))
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      w
    }
    val wA = trainAt(8, 8)
    val wB = trainAt(32, 32)
    val diffW = wA.keySet.union(wB.keySet)
      .filter(k => wA.get(k) != wB.get(k))
    println(s"ROUNDING lr n=$n buckets=${wA.size} diffing=${diffW.size}")
    diffW.take(5).foreach(k =>
      println(s"ROUNDING lr DIFF bucket=$k a=${wA.get(k)} b=${wB.get(k)}"))

    // PageRank: ~5-regular graph over n/10 nodes (n/2 edges); in-mass
    // sums are degree-length, each term ~1/n — the mean-scaling regime
    val nNodes = (n / 10).max(1000L)
    val edges = spark.range(nNodes * 5).select(
      pmod(col("id"), lit(nNodes)).as("s"),
      pmod(splitmix64(col("id") * 19L + 7), lit(nNodes)).as("d"),
      lit(1.0).as("w"))
    val nodes = spark.range(nNodes).select(col("id").as("node0"))
    def ranksAt(parts: Int, shuffle: Int): Map[Long, Double] = {
      spark.conf.set("spark.sql.shuffle.partitions", shuffle.toString)
      val r = graft.operators.Graph.pageRank(edges.repartition(parts),
          "s", "d", "w", nodes, "node0", iters = 3)
        .as[(Long, Double)].collect().toMap
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      r
    }
    val rA = ranksAt(8, 8)
    val rB = ranksAt(32, 32)
    val diffR = rA.keySet.union(rB.keySet)
      .filter(k => rA.get(k) != rB.get(k))
    println(s"ROUNDING pagerank nodes=$nNodes diffing=${diffR.size}")
    diffR.take(5).foreach(k =>
      println(s"ROUNDING pr DIFF node=$k a=${rA.get(k)} b=${rB.get(k)}"))

    spark.stop()
    assert(diffW.isEmpty,
      s"LR weights differ across partitionings at n=$n: ${diffW.size} buckets")
    assert(diffR.isEmpty,
      s"PageRank ranks differ across partitionings: ${diffR.size} nodes")
    println(s"ROUNDING OK: 12-dp contract partition-invariant at n=$n")
  }
}
