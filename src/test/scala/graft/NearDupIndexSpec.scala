package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Round-trip of the on-disk near-dup corpus index — the
  * continual-training shape: build the index once, SAVE it, reopen it
  * in a (conceptually different) session, and probe micro-batches
  * against the loaded form. The loaded probe must (a) return exactly
  * the in-memory result and (b) carry dynamic-partition-pruning
  * subqueries on the partitioned bands/sets scans, so at 100 TB a
  * batch reads only its colliding partitions of the index. */
class NearDupIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def mkBatch(docs: org.apache.spark.sql.DataFrame) = {
    // half near-copies of corpus docs (one appended word → Jaccard
    // just under 1), half novel (per-token salted text)
    val near = docs.limit(40).select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" extrabatchword")).as("text"))
    val novel = docs.limit(40).select(
      (col("doc_id") + 2000000L).as("doc_id"),
      regexp_replace(col("text"), "\\w+", "nv$0").as("text"))
    near.unionByName(novel)
  }

  test("save/load round-trip: loaded probe equals in-memory probe") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val idx = Dedup.nearDupCorpusIndex(docs, "text", "doc_id")
    val dir = java.nio.file.Files.createTempDirectory("nd_idx").toString
    idx.save(dir)
    val loaded = Dedup.NearDupCorpusIndex.load(spark, dir)
    assert(loaded.shingleN == idx.shingleN && loaded.nPerm == idx.nPerm &&
      loaded.nBands == idx.nBands, "meta must round-trip")
    assert(loaded.diskBuckets == Dedup.NearDupCorpusIndex.DiskBuckets)

    val batch = mkBatch(docs)
    val mem = Dedup.dropNearDupsOfCorpus(batch, "text", "doc_id", idx, 0.5)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val dsk = Dedup.dropNearDupsOfCorpus(batch, "text", "doc_id", loaded, 0.5)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(mem.nonEmpty, "some batch docs must survive")
    assert(mem.size < 80, "some batch docs must drop as corpus near-dups")
    assert(dsk == mem, "loaded-index probe must equal in-memory probe")
    // every planted near-copy dropped, every novel doc survived
    assert(mem.forall(_ >= 2000000L), "survivors must be the novel docs")
  }

  test("appendTo: survivors indexed after the batch are caught by the next probe") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // index built on the even half only
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("nd_idx3").toString
    Dedup.nearDupCorpusIndex(even, "text", "doc_id").save(dir)
    val loadedHalf = Dedup.NearDupCorpusIndex.load(spark, dir)

    // near-copies of ODD docs survive a half-index probe...
    val oddCopies = odd.limit(20).select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" extrabatchword")).as("text"))
    // (>= 15, not == 20: the real corpus has a few natural odd↔even
    // near-dups the half index legitimately catches)
    val before = Dedup.dropNearDupsOfCorpus(oddCopies, "text", "doc_id",
      loadedHalf, 0.5).count()
    assert(before >= 15, s"half-index must miss most odd-doc copies, kept $before")

    // ...append the odd half (the 'survivors'), reload: now they drop,
    // and the appended index equals a full in-memory index on the batch
    loadedHalf.appendTo(dir, odd, "text", "doc_id")
    val loadedFull = Dedup.NearDupCorpusIndex.load(spark, dir)
    val batch = mkBatch(docs)
    val mem = Dedup.nearDupCorpusIndex(docs, "text", "doc_id")
    val expect = Dedup.dropNearDupsOfCorpus(batch, "text", "doc_id", mem, 0.5)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val got = Dedup.dropNearDupsOfCorpus(batch, "text", "doc_id", loadedFull, 0.5)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == expect, "appended index must probe like the full in-memory index")
    assert(Dedup.dropNearDupsOfCorpus(oddCopies, "text", "doc_id",
      loadedFull, 0.5).count() == 0, "odd-doc copies must now drop")
  }

  test("loaded probe plan: DPP partition filters on bands and sets scans") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("nd_idx2").toString
    Dedup.nearDupCorpusIndex(docs, "text", "doc_id").save(dir)
    val loaded = Dedup.NearDupCorpusIndex.load(spark, dir)
    val plan = Dedup.dropNearDupsOfCorpus(mkBatch(docs), "text", "doc_id", loaded, 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the index scans:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
