package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** LSH-with-exact-verification equals the exact baseline: banding
  * proposes candidates, exact Jaccard verifies them — when banding
  * recall covers every true pair (P[miss] = (1−s^r)^b, < 1e-13 for the
  * near-identical dups this corpus contains), the verified output IS
  * `ngramJaccardPairs` row for row. This is what lets the driver give
  * `dedup_minhash_lsh` the same DuckDB oracle as `dedup_ngram_jaccard`. */
class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("minhashLshJaccardPairs == ngramJaccardPairs on the real corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .orderBy("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lsh = Dedup.minhashLshJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .orderBy("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exact.nonEmpty, "corpus should contain near-dup pairs")
    assert(lsh.toSeq == exact.toSeq)
  }

  test("banding recall: every true pair is an LSH candidate at b=32") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val truePairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = Dedup.minhashLshPairs(docs, "text", "doc_id", shingleN = 3,
        nPerm = 64, bands = 32)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((truePairs -- cands).isEmpty,
      s"banding missed true pairs: ${truePairs -- cands}")
    // and the candidate set stays bounded (not a cross product)
    val n = docs.count()
    assert(cands.size < n * 10, s"candidate blowup: ${cands.size} for $n docs")
  }

  test("verified-pair jaccard values match the exact formula") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),   // identical → j = 1.0
      (3L, "a b c d e f x y"),   // partial overlap
      (4L, "totally different words here now")
    ).toDF("doc_id", "text")
    // bands=64 (r=1): candidate = any shared minhash → recall ≈ 1 even at
    // j = 0.5 exactly (the j=0.5 pair is a banding coin-flip at r≥2;
    // corpus recall at the default r=4 is pinned by the tests above)
    val out = Dedup.minhashLshJaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.5, maxDocFreq = 100, nPerm = 64, bands = 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 2L)) == 1.0)
    // docs 1,3: shingles(8 toks, n=3) = 6 each; shared = "a b c","b c d","c d e" +
    // "d e f" = 4; j = 4/(6+6-4) = 0.5
    assert(out.get((1L, 3L)).contains(0.5))
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }
}
