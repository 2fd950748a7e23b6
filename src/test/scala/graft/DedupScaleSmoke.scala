package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup scaling smoke: replicate the documents corpus Nx with distinct
  * ids (keeping its built-in near-dup structure) and time MinHash-LSH and
  * exact-Jaccard at growing sizes — the check that candidate-pair growth
  * stays near-linear. Run: sbt "Test/runMain graft.DedupScaleSmoke" */
object DedupScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val baseN = base.count()
    for (mult <- Seq(1, 4, 20)) {
      val df = (0 until mult).map(i =>
        base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          // salt the text per replica so replicas aren't global exact dups
          concat(col("text"), lit(" replica" + i)).as("text")))
        .reduce(_ unionByName _)
        .repartition(32).persist()
      val n = df.count()
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.minhashLshPairs(df, "text", "doc_id").count()
      val t1 = (System.nanoTime() - t0) / 1e9
      println(f"DEDUPSCALE n=$n%7d minhash: $t1%6.1f s  pairs=$pairs")
      df.unpersist()
    }
    spark.stop()
  }
}
