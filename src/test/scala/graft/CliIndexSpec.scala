package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The wpindex CLI surface: build → append → probe for each index kind,
  * driven through Cli.main exactly as spark-submit would (the session
  * is reused in-JVM like the other CLI specs). */
class CliIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("wpindex neardup: build, probe drops corpus near-copies, append catches new docs") {
    spark // force session before Cli.session().getOrCreate reuses it
    val idxDir = tmp("cli_nd_idx")
    graft.cli.Cli.main(Array("wpindex", "build", "neardup",
      s"$sf/documents.parquet", idxDir))

    // batch: 10 near-copies of corpus docs + 10 novel docs
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val batchDir = tmp("cli_nd_batch")
    docs.limit(10).select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text"))
      .unionByName(docs.limit(10).select(
        (col("doc_id") + 2000000L).as("doc_id"),
        regexp_replace(col("text"), "\\w+", "nv$0").as("text")))
      .write.mode("overwrite").parquet(batchDir)
    val outDir = tmp("cli_nd_out")
    graft.cli.Cli.main(Array("wpindex", "probe", "neardup",
      batchDir, idxDir, outDir))
    val kept = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.forall(_ >= 2000000L) && kept.size == 10,
      s"only the 10 novel docs must survive, got $kept")

    // append the novel survivors; a re-probe of the same batch now
    // drops them too (they ARE the corpus now)
    val survDir = tmp("cli_nd_surv")
    spark.read.parquet(outDir).write.mode("overwrite").parquet(survDir)
    graft.cli.Cli.main(Array("wpindex", "append", "neardup", survDir, idxDir))
    val outDir2 = tmp("cli_nd_out2")
    graft.cli.Cli.main(Array("wpindex", "probe", "neardup",
      batchDir, idxDir, outDir2))
    assert(spark.read.parquet(outDir2).count() == 0,
      "after append, every batch doc is a near-dup of the corpus")
  }

  test("wpindex ann: build then probe writes per-query top-k") {
    spark
    val idxDir = tmp("cli_ann_idx")
    graft.cli.Cli.main(Array("wpindex", "build", "ann",
      s"$sf/embeddings.parquet", idxDir, "--dim", "64"))
    val qDir = tmp("cli_ann_q")
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 41 === 0)
      .write.mode("overwrite").parquet(qDir)
    val outDir = tmp("cli_ann_out")
    graft.cli.Cli.main(Array("wpindex", "probe", "ann",
      qDir, idxDir, outDir, "--topk", "5"))
    val out = spark.read.parquet(outDir)
    assert(out.columns.toSet == Set("q_id", "vec_id", "adc_dist2", "rnk"))
    val perQ = out.groupBy("q_id").count().select("count")
      .collect().map(_.getLong(0))
    assert(perQ.nonEmpty && perQ.forall(_ == 5L),
      s"every query gets its top-5, got ${perQ.toSeq}")
  }
}
