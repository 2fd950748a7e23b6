package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Cardinality

/** The persisted cardinality profile (HLL registers per group):
  * build → save → load → novelty probe, appendTo folding, and the
  * wpindex CLI round trip. */
class CardIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("card index: save → load → novelty; appendTo makes the batch old") {
    import spark.implicits._
    val corpus = ((1 to 20).map(i => ("s1", s"doc number $i")) ++
      (1 to 10).map(i => ("s2", s"item $i"))).toDF("source", "text")
    val batch = Seq(
      ("s1", "doc number 1"), ("s1", "doc number 2"), // already known
      ("s1", "fresh alpha"), ("s1", "fresh beta"),    // new to s1
      ("s2", "fresh gamma"),                          // new to s2
      ("s3", "first ever")).toDF("source", "text")    // whole new group
    val dir = tmp("card_idx")
    Cardinality.CardRef.build(corpus, "source", "text").save(dir)
    val ref = Cardinality.CardRef.load(spark, dir)
    val nov = ref.noveltyOf(batch, "source", "text")
      .select("grp", "est_corpus", "novelty").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // small regime is linear counting: novelty tracks the new-key count
    // (loose bounds absorb possible register collisions)
    assert(nov("s1")._2 > 0.9 && nov("s1")._2 < 3.5, s"s1=$nov")
    assert(nov("s2")._2 > 0.4 && nov("s2")._2 < 2.0, s"s2=$nov")
    // a group the corpus never saw: est_corpus exactly 0
    assert(nov("s3")._1 == 0.0 && nov("s3")._2 > 0.4)
    // fold the batch in; the same probe now finds nothing new —
    // registers are identical, so the difference is EXACTLY 0.0
    ref.appendTo(dir, batch, "source", "text")
    val nov2 = Cardinality.CardRef.load(spark, dir)
      .noveltyOf(batch, "source", "text")
      .select("novelty").collect().map(_.getDouble(0))
    assert(nov2.forall(_ == 0.0), nov2.mkString(","))
  }

  test("wpindex card CLI: build → append → probe round trip") {
    import spark.implicits._
    spark
    val cDir = tmp("card_c"); val bDir = tmp("card_b")
    val idx = tmp("card_i"); val out = tmp("card_o")
    (1 to 15).map(i => ("web", s"page $i")).toDF("source", "text")
      .write.mode("overwrite").parquet(cDir)
    Seq(("web", "page 1"), ("web", "page new")).toDF("source", "text")
      .write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpindex", "build", "card", cDir, idx))
    graft.cli.Cli.main(Array("wpindex", "probe", "card", bDir, idx, out))
    val r = spark.read.parquet(out).select("grp", "novelty").head()
    assert(r.getString(0) == "web" && r.getDouble(1) > 0.4 && r.getDouble(1) < 2.0)
    graft.cli.Cli.main(Array("wpindex", "append", "card", bDir, idx))
    graft.cli.Cli.main(Array("wpindex", "probe", "card", bDir, idx, out))
    assert(spark.read.parquet(out).select("novelty").head().getDouble(0) == 0.0)
  }
}
