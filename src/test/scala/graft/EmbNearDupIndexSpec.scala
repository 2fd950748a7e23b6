package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The embedding twin of NearDupIndexSpec: a static embedding-LSH
  * corpus index, saved/loaded, probed by micro-batches under a real
  * foreachBatch. Planted exact copies of corpus vectors must drop
  * (cos = 1 and identical buckets ⇒ guaranteed candidates); synthetic
  * novel directions must survive (random 64-dim directions don't reach
  * cos ≥ 0.95 with anything). */
class EmbNearDupIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  /** Batch: 30 exact corpus copies (new ids) + 30 novel pseudo-random
    * directions derived deterministically from the id. */
  private def mkBatch(e: org.apache.spark.sql.DataFrame) = {
    val copies = e.limit(30).select(
      (col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val novel = e.limit(30).select(
      (col("vec_id") + 2000000L).as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => sin(col("vec_id").cast("double") * 131.0 + i.cast("double") * 17.0)
          .cast("float")).as("embedding"))
    copies.unionByName(novel)
  }

  test("save/load round-trip: loaded probe equals in-memory probe") {
    val idx = Similarity.embCorpusIndex(emb, "embedding", "vec_id", dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("emb_idx").toString
    idx.save(dir)
    val loaded = Similarity.EmbCorpusIndex.load(spark, dir)
    assert(loaded.dim == 64 && loaded.nBits == idx.nBits &&
      loaded.tables == idx.tables && loaded.diskBuckets > 0)

    val batch = mkBatch(emb)
    val mem = Similarity.dropNearDupsOfEmbCorpus(batch, "embedding", "vec_id", idx)
      .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    val dsk = Similarity.dropNearDupsOfEmbCorpus(batch, "embedding", "vec_id", loaded)
      .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    assert(dsk == mem, "loaded-index probe must equal in-memory probe")
    // all 30 exact copies drop, all 30 novel directions survive
    assert(mem.size == 30, s"expected the 30 novel docs, got ${mem.size}")
    assert(mem.forall(_ >= 2000000L), s"survivors must be the novel docs: $mem")
  }

  test("loaded probe plan: DPP partition filters, no cartesian") {
    val dir = java.nio.file.Files.createTempDirectory("emb_idx2").toString
    Similarity.embCorpusIndex(emb, "embedding", "vec_id", dim = 64).save(dir)
    val loaded = Similarity.EmbCorpusIndex.load(spark, dir)
    val plan = Similarity.dropNearDupsOfEmbCorpus(mkBatch(emb), "embedding", "vec_id", loaded)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the index scans:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("appendTo: vectors indexed after save drop from the next probe") {
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("emb_idx4").toString
    Similarity.embCorpusIndex(even, "embedding", "vec_id", dim = 64).save(dir)
    val half = Similarity.EmbCorpusIndex.load(spark, dir)

    // exact copies of ODD vectors survive the half index (cos=1 only
    // with their originals, which aren't indexed)
    val oddCopies = odd.limit(20).select(
      (col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val before = Similarity.dropNearDupsOfEmbCorpus(oddCopies, "embedding",
      "vec_id", half).count()
    assert(before >= 15, s"half index must miss most odd copies, kept $before")

    half.appendTo(dir, odd, "embedding", "vec_id")
    val full = Similarity.EmbCorpusIndex.load(spark, dir)
    assert(Similarity.dropNearDupsOfEmbCorpus(oddCopies, "embedding",
      "vec_id", full).count() == 0, "odd copies must drop after append")
    // and the appended index matches the full in-memory index on a
    // mixed batch
    val mem = Similarity.embCorpusIndex(emb, "embedding", "vec_id", dim = 64)
    val batch = mkBatch(emb)
    val expect = Similarity.dropNearDupsOfEmbCorpus(batch, "embedding", "vec_id", mem)
      .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    val got = Similarity.dropNearDupsOfEmbCorpus(batch, "embedding", "vec_id", full)
      .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == expect, "appended index must probe like the full in-memory index")
  }

  test("foreachBatch streaming: loaded index dedups each micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("emb_idx3").toString
    Similarity.embCorpusIndex(emb, "embedding", "vec_id", dim = 64).save(dir)
    val loaded = Similarity.EmbCorpusIndex.load(spark, dir)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Seq[Float])]
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        kept ++= Similarity
          .dropNearDupsOfEmbCorpus(batch, "embedding", "vec_id", loaded)
          .select("vec_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      val rows = mkBatch(emb).select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq
      for (half <- rows.grouped(30)) { input.addData(half); q.processAllAvailable() }
    } finally q.stop()
    assert(kept.sorted.toSeq == mkBatch(emb).select("vec_id")
      .filter(col("vec_id") >= 2000000L).orderBy("vec_id")
      .collect().map(_.getLong(0)).toSeq,
      s"streamed survivors must be exactly the novel docs: ${kept.sorted}")
  }
}
