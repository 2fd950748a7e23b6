package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Similarity scale smoke: exact all-pairs cosine (block equi-join +
  * VecDot codegen kernel) vs the LSH-bucketed variant at growing n.
  * Exact is O(n²) compare work by definition — the point is the
  * CONSTANT (ns/pair via codegen, distributed over block tasks) and
  * that LSH stays near-linear for the same corpus.
  * Run: sbt "Test/runMain graft.AnnScaleSmoke [n]" */
object AnnScaleSmoke {
  def main(args: Array[String]): Unit = {
    val maxN = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    for (n <- Seq(5000, maxN)) {
      // deterministic synthetic vectors: splitmix-ish hash per (id, d);
      // every ~50th vector is a near-copy of its anchor → real pairs
      val df = spark.range(n).map { idBoxed =>
        val id: Long = idBoxed
        val anchor: Long = if (id % 50 != 0 && id % 7 == 0) id - (id % 50) else id
        val v = Array.tabulate(dim) { d =>
          var z = anchor * 1000003L + d * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          val base = ((z >>> 11).toDouble / (1L << 53).toDouble - 0.5).toFloat
          if (anchor == id) base else base + (id % 10) * 1e-4f
        }
        (id, v)
      }.toDF("vec_id", "embedding").persist()
      df.count()

      val t0 = System.nanoTime()
      val exact = Similarity.exactCosinePairs(df, "embedding", "vec_id", 0.95).count()
      val tExact = (System.nanoTime() - t0) / 1e9
      val nPairs = n.toLong * (n - 1) / 2
      val t1 = System.nanoTime()
      val lsh = Similarity.cosineNearDupPairs(df, "embedding", "vec_id", dim,
        threshold = 0.95, nBits = 8).count()
      val tLsh = (System.nanoTime() - t1) / 1e9
      println(f"ANNSCALE n=$n%6d exact: $tExact%5.1f s (${nPairs / tExact / 1e6}%6.1f M pairs/s, found=$exact) " +
        f"lsh: $tLsh%5.1f s (found=$lsh)")

      // r4 ops at the same n: k-means-cell-blocked semantic pairs (must
      // equal the exact count — blocking exactness is scale-invariant)
      // and the kNN label vote (pruned rank frame, labels synthesized)
      val t2 = System.nanoTime()
      val sem = Similarity.semanticDupPairs(df, "embedding", "vec_id",
        k = 8, iters = 2, threshold = 0.95).count()
      val tSem = (System.nanoTime() - t2) / 1e9
      assert(sem == exact, s"semantic blocking lost pairs: $sem != $exact")
      val labeled = df.withColumn("label", (col("vec_id") % 16).cast("int"))
      val t3 = System.nanoTime()
      val knn = Similarity.knnLabelVote(labeled, "embedding", "vec_id",
        "label", k = 5).count()
      val tKnn = (System.nanoTime() - t3) / 1e9
      assert(knn == n, s"knn vote lost vectors: $knn != $n")
      println(f"ANNSCALE n=$n%6d semantic(kmeans-blocked): $tSem%5.1f s (found=$sem) " +
        f"knn-vote: $tKnn%5.1f s")
      df.unpersist()
    }
    spark.stop()
  }
}
