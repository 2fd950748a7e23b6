package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Continual-ingest curation under a real foreachBatch: quality gate →
  * in-batch exact dedup → near-dup probe against the persisted corpus
  * index. Planted per batch: a gibberish doc (gate drops), an exact
  * in-batch duplicate pair (one survives), a near-copy of a corpus doc
  * (index probe drops), and a novel clean doc (survives). */
class StreamingCurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private val clean =
    "the quick brown fox jumps over the lazy dog and then the fox " +
    "rests with the dog while they watch the quiet river flow past " +
    "the old mill near the village where people have lived for years"

  test("foreachBatch: gate, exact dedup, and index probe compose per micro-batch") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("cur_idx").toString
    Dedup.nearDupCorpusIndex(docs, "text", "doc_id").save(dir)
    val idx = Dedup.NearDupCorpusIndex.load(spark, dir)

    val corpusText = docs.orderBy("doc_id").limit(1)
      .select("text").head().getString(0)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        kept ++= StreamingCuration
          .curateBatch(batch, "text", "doc_id", idx)
          .select("doc_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      input.addData(Seq(
        (1L, "zxqj vwpk fhgt"),                  // gate: too few words
        (2L, clean),                             // exact-dup pair...
        (3L, clean),                             // ...only min id survives
        (4L, corpusText + " extraword"),         // near-copy of corpus doc
        (5L, clean + " with a novel twist at the end of the tale")))
      q.processAllAvailable()
      input.addData(Seq(
        (6L, clean + " entirely different continuation for batch two")))
      q.processAllAvailable()
    } finally q.stop()

    assert(kept.toSet == Set(2L, 5L, 6L),
      s"expected gate/exact/near-dup verdicts {2,5,6}, got ${kept.sorted}")
  }
}
