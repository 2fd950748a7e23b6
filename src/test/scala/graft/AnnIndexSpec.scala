package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Persisted IVF-PQ ANN index: build → save → load → probe. The loaded
  * probe must (a) replay the in-memory annIvfPqTopK bit-for-bit —
  * doubles round-trip parquet exactly — and (b) read ONLY the probed
  * cell directories (static IN predicate in the codes scan's
  * PartitionFilters), never re-running Lloyd at query time. */
class AnnIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private val qPred = col("vec_id") % 41 === 0

  private def buildIdx() = Similarity.AnnIndex.build(
    emb, "embedding", "vec_id", dim = 64,
    coarseK = 8, coarseIters = 2, m = 4, k = 16, iters = 2)

  test("loaded probe replays the in-memory IVF-PQ top-k bit-for-bit") {
    val mem = Similarity.annIvfPqTopK(emb, "embedding", "vec_id", dim = 64,
        coarseK = 8, coarseIters = 2, m = 4, k = 16, iters = 2,
        nprobe = 2, topK = 10, queryPred = qPred)
      .orderBy("q_id", "rnk").collect().toSeq

    val dir = java.nio.file.Files.createTempDirectory("ann_idx").toString
    buildIdx().save(dir)
    val loaded = Similarity.AnnIndex.load(spark, dir)
    assert(loaded.fromDisk && loaded.dim == 64 && loaded.m == 4 &&
      loaded.coarse.length == 8 && loaded.codebooks.forall(_.length == 16))

    val dsk = loaded.probe(emb.filter(qPred), "embedding", "vec_id",
        nprobe = 2, topK = 10)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(mem.nonEmpty && dsk == mem,
      s"loaded-index probe must equal the in-memory probe (${mem.size} rows)")
  }

  test("loaded quantizers equal the built ones exactly") {
    val built = buildIdx()
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_q").toString
    built.save(dir)
    val loaded = Similarity.AnnIndex.load(spark, dir)
    assert(loaded.coarse == built.coarse, "coarse centroids must round-trip")
    assert(loaded.codebooks == built.codebooks, "PQ codebooks must round-trip")
  }

  test("probe plan prunes to the probed cell partitions; no Lloyd, no cartesian") {
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_p").toString
    buildIdx().save(dir)
    val loaded = Similarity.AnnIndex.load(spark, dir)
    val probe = loaded.probe(emb.filter(qPred), "embedding", "vec_id",
      nprobe = 2, topK = 10)
    // the probed-cell IN predicate must land as a partition (directory)
    // filter on the codes scan, not a post-scan data filter
    val codeScans = probe.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("codes")) => s
    }
    assert(codeScans.nonEmpty, "expected a codes file scan in the probe plan")
    assert(codeScans.forall(_.partitionFilters.exists(_.toString.contains("cell"))),
      s"expected the cell IN predicate in partitionFilters: " +
        codeScans.map(_.metadata.toString).mkString("\n"))
    // the only nested-loop allowed is the LUT's queries×(m·k) broadcast
    // crossJoin (constant-size build side); no cartesian over data rows
    val plan = probe.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(probe.count() > 0)
  }

  test("appendTo codes new vectors with frozen quantizers — no retraining") {
    // train ONLY on the even half; append the odd half post-save
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 === 1)
    val trained = Similarity.AnnIndex.build(even, "embedding", "vec_id",
      dim = 64, coarseK = 8, coarseIters = 2, m = 4, k = 16, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_a").toString
    trained.save(dir)
    trained.appendTo(dir, odd, "embedding", "vec_id")
    val loaded = Similarity.AnnIndex.load(spark, dir)

    // reference: the same quantizers coding the full corpus in memory
    val full = trained.copy(codes = Similarity.AnnIndex.codesFor(
      emb, "embedding", "vec_id", trained.coarse, trained.codebooks, 64, 4))
    val mem = full.probe(emb.filter(qPred), "embedding", "vec_id",
        nprobe = 2, topK = 10)
      .orderBy("q_id", "rnk").collect().toSeq
    val dsk = loaded.probe(emb.filter(qPred), "embedding", "vec_id",
        nprobe = 2, topK = 10)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(mem.nonEmpty && dsk == mem,
      "appended index must probe identically to union-coded in-memory index")
    // appended rows really landed: loaded codes cover the whole corpus
    assert(loaded.codes.count() == emb.count())
  }

  test("foreachBatch streaming: loaded index serves each micro-batch of queries") {
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_st").toString
    buildIdx().save(dir)
    val loaded = Similarity.AnnIndex.load(spark, dir)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Seq[Float])]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got ++= loaded.probe(batch, "embedding", "vec_id", nprobe = 2, topK = 3)
          .select("q_id", "vec_id", "rnk").as[(Long, Long, Int)].collect()
        ()
      }.start()
    val queries = emb.filter(qPred).limit(6)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    try {
      for (half <- queries.grouped(3)) { input.addData(half); q.processAllAvailable() }
    } finally q.stop()
    // every streamed query got its top-3, identical to a batch probe
    val expected = loaded.probe(
        emb.filter(col("vec_id").isin(queries.map(_._1): _*)),
        "embedding", "vec_id", nprobe = 2, topK = 3)
      .select("q_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(got.toSet == expected && got.size == expected.size)
  }

  test("probing fewer cells than exist reads a strict partition subset") {
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_s").toString
    buildIdx().save(dir)
    val loaded = Similarity.AnnIndex.load(spark, dir)
    // a single query with nprobe=1 can touch at most 1 of the 8 cells
    val one = loaded.probe(emb.filter(col("vec_id") === 0L), "embedding",
      "vec_id", nprobe = 1, topK = 5)
    val scans = one.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("codes")) => s
    }
    assert(scans.nonEmpty, "expected a codes file scan in the probe plan")
    assert(scans.forall(_.selectedPartitions.partitionCount <= 1),
      s"nprobe=1 single query must read ≤1 cell directory, read " +
        s"${scans.map(_.selectedPartitions.partitionCount).mkString(",")}")
  }
}
