package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Lm

/** Persisted bigram-LM index: build → save → load → score parity,
  * append count-merge exactness, OOV floor semantics, and the wpindex
  * CLI loop. */
class LmIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("save → load → score reproduces the in-memory scores bit-for-bit") {
    val corpus = docs((1L, "good morning world"), (2L, "good morning"),
      (3L, "world peace now"))
    val batch = docs((10L, "good morning peace"), (11L, "totally unseen words"))
    val ref = Lm.LmRef.build(corpus, "text")
    val dir = tmp("lmref")
    ref.save(dir)
    val loaded = Lm.LmRef.load(spark, dir)
    assert(loaded.lambda == 0.7 && loaded.residual == 0.3)
    val a = ref.scoreOf(batch, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = loaded.scoreOf(batch, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("appendTo merges counts exactly: load-after-append == build on the union") {
    val a = docs((1L, "alpha beta gamma"), (2L, "beta gamma"))
    val b = docs((3L, "beta gamma delta"), (4L, "alpha beta"))
    val dir = tmp("lmref_app")
    Lm.LmRef.build(a, "text").save(dir)
    Lm.LmRef.load(spark, dir).appendTo(dir, b, "text")
    val merged = Lm.LmRef.load(spark, dir)
    val direct = Lm.LmRef.build(a.unionByName(b), "text")
    def uniSet(r: Lm.LmRef) = r.uni.collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet
    def biSet(r: Lm.LmRef) = r.bi.collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    assert(uniSet(merged) == uniSet(direct))
    assert(biSet(merged) == biSet(direct))
  }

  test("OOV floor: an all-unseen doc scores exactly ln(residual/(N+V))") {
    val corpus = docs((1L, "a b a b"), (2L, "b c"))
    // N = 6 tokens, V = 3 types
    val ref = Lm.LmRef.build(corpus, "text")
    val out = ref.scoreOf(docs((9L, "zz qq")), "text", "doc_id").collect().head
    assert(out.getLong(1) == 1)
    val expected = BigDecimal(math.log(0.3 * 1.0 / (6 + 3)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(2) == expected)
    // and the dominant in-corpus bigram scores strictly higher
    val seen = ref.scoreOf(docs((8L, "a b")), "text", "doc_id").collect().head
    assert(seen.getDouble(2) > out.getDouble(2))
  }

  test("streaming lmGate: loaded reference scores each micro-batch; soup drops") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = docs((1L, "the quick brown fox jumps"),
      (2L, "the quick brown dog runs"), (3L, "quick brown fox runs fast"))
    val dir = tmp("lm_stream")
    Lm.LmRef.build(corpus, "text").save(dir)
    val ref = Lm.LmRef.load(spark, dir) // loaded ONCE, reused per batch
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        kept ++= graft.streaming.StreamingCuration
          .lmGate(b, "text", "doc_id", ref, minAvgLogprob = -3.0)
          .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .collect()
        ()
      }.start()
    try {
      input.addData((10L, "the quick brown fox"), (11L, "zz qq pp ww soup"))
      q.processAllAvailable()
      input.addData((12L, "quick brown dog runs"))
      q.processAllAvailable()
      assert(kept.sorted == Seq(10L, 12L), s"kept=$kept")
    } finally q.stop()
  }

  test("wpindex lm: build, append, probe through Cli.main") {
    spark
    val corpus = docs((1L, "good morning world"), (2L, "good morning"))
    val extra = docs((3L, "good evening world"))
    val batch = docs((10L, "good morning"), (11L, "unseen tokens only"))
    val cDir = tmp("cli_lm_c"); val eDir = tmp("cli_lm_e")
    val bDir = tmp("cli_lm_b"); val idxDir = tmp("cli_lm_idx")
    val outDir = tmp("cli_lm_out")
    corpus.write.mode("overwrite").parquet(cDir)
    extra.write.mode("overwrite").parquet(eDir)
    batch.write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpindex", "build", "lm", cDir, idxDir))
    graft.cli.Cli.main(Array("wpindex", "append", "lm", eDir, idxDir))
    graft.cli.Cli.main(Array("wpindex", "probe", "lm", bDir, idxDir, outDir))
    val out = spark.read.parquet(outDir)
    assert(out.columns.toSet == Set("doc_id", "n_bigrams", "avg_logprob"))
    val byId = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId.size == 2 && byId(10L) > byId(11L))
    // probe equals the library path on the merged counts
    val lib = Lm.LmRef.load(spark, idxDir).scoreOf(batch, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId == lib)
  }
}
