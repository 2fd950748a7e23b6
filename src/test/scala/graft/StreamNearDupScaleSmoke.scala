package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming near-dup dedup scale smoke: a 100k-doc static corpus index
  * (MinHash bands + shingle sets), then micro-batches of 5k docs —
  * 2,500 planted near-copies of corpus docs, 2,500 novel — driven
  * through a real foreachBatch query. Checks per-batch wall time stays flat
  * across batches (the index is static state; batch cost must not grow)
  * and that planted near-dups drop while novel docs survive.
  * Run: sbt "Test/runMain graft.StreamNearDupScaleSmoke" */
object StreamNearDupScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Dedup

    // 100k-doc corpus: sf0.1 documents replicated 20× with per-replica
    // word salt (replicas are near- but not exact dups of each other;
    // the index treats each as its own doc)
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val corpus = (0 until 20).map(i =>
        base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          concat(col("text"), lit(" corpusrep" + i)).as("text")))
      .reduce(_ unionByName _).repartition(32).persist()
    val nCorpus = corpus.count()
    var t0 = System.nanoTime()
    val built = Dedup.nearDupCorpusIndex(corpus, "text", "doc_id",
      shingleN = 3, nPerm = 64, bands = 16)
    val nBands = built.bands.count(); val nSets = built.sets.count()
    println(f"STREAMNEARDUP corpus=$nCorpus%7d index built in ${(System.nanoTime() - t0) / 1e9}%6.1f s (bands=$nBands sets=$nSets)")
    // operational shape: the index is SAVED once and every batch probes
    // the LOADED (disk-resident, partition-pruned) form — what a
    // continual-training daemon does across restarts
    t0 = System.nanoTime()
    val idxDir = java.nio.file.Files.createTempDirectory("nd_idx_smoke").toString
    built.save(idxDir)
    built.release(); corpus.unpersist()
    val idx = Dedup.NearDupCorpusIndex.load(spark, idxDir)
    println(f"STREAMNEARDUP index saved+loaded in ${(System.nanoTime() - t0) / 1e9}%6.1f s ($idxDir)")

    // stream batches: 5k docs each — half near-copies (one word
    // appended to a corpus doc → Jaccard just under 1), half novel
    // (fully salted per-token text)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val kept = new java.util.concurrent.atomic.AtomicLong(0)
    val dropped = new java.util.concurrent.atomic.AtomicLong(0)
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], bid: Long) =>
        val t = System.nanoTime()
        val out = Dedup.dropNearDupsOfCorpus(batch, "text", "doc_id", idx, 0.5)
        val k = out.count(); val n = batch.count()
        kept.addAndGet(k); dropped.addAndGet(n - k)
        println(f"STREAMNEARDUP batch=$bid n=$n%6d kept=$k%6d in ${(System.nanoTime() - t) / 1e9}%6.1f s")
        ()
      }.start()
    try {
      val half = base.limit(2500)
      for (b <- 0 until 3) {
        val nearCopies = half.select(
            (col("doc_id") + lit(5000000L + b * 100000L)).as("doc_id"),
            concat(col("text"), lit(" corpusrep3 extraword" + b)).as("text"))
          .as[(Long, String)].collect()
        val novel = half.select(
            (col("doc_id") + lit(6000000L + b * 100000L)).as("doc_id"),
            concat(lit(s"novelbatch$b "),
              regexp_replace(col("text"), "\\w+", s"nv$b$$0")).as("text"))
          .as[(Long, String)].collect()
        input.addData(nearCopies.toSeq ++ novel.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    println(f"STREAMNEARDUP total kept=${kept.get} dropped=${dropped.get}")
    // planted near-copies (half of each batch) must drop; novel docs keep
    assert(dropped.get >= 2500 * 3 * 9 / 10, s"dropped ${dropped.get}")
    assert(kept.get >= 2500 * 3 * 9 / 10, s"kept ${kept.get}")
    spark.stop()
  }
}
