package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.MemberIndex

/** Persisted exact-membership index: Bloom pre-filter + bucketed hash
  * set. The verdict must be EXACT (bloom false positives die at the
  * confirm join; no false negatives exist by construction), append must
  * equal rebuild bit-for-bit (OR is the exact merge), and the probe
  * must never reshuffle the corpus-sized hash set. */
class MemberIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def corpusDf = {
    import spark.implicits._
    (0 until 500).map(i => (i.toLong, s"corpus key ${i % 200}"))
      .toDF("id", "key")
  }

  private def batchDf = {
    import spark.implicits._
    // keys 150..249: 150..199 known (corpus holds % 200), 200..249 novel
    (0 until 100).map(i => (1000L + i, s"corpus key ${150 + i}"))
      .toDF("id", "key")
  }

  test("novelOf is exact: equals the brute-force anti join") {
    import spark.implicits._
    val ref = MemberIndex.MemberRef.build(corpusDf, col("key"), mExp = 12, k = 5)
    val novel = ref.novelOf(batchDf, col("key")).select("id").as[Long].collect().toSet
    val brute = batchDf.join(corpusDf.select("key").distinct(), Seq("key"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(novel == brute)
    assert(novel == (1050 until 1100).map(i => 1000L + (i - 1000) + 0).filter(_ >= 1050).toSet
      || novel == (1050L until 1100L).toSet) // keys 200..249 are novel
  }

  test("exactness survives a deliberately tiny (collision-heavy) bloom") {
    import spark.implicits._
    // mExp=6 => 64 bits for 200 keys: nearly every probe is a bloom
    // candidate, so the confirm join does all the work — verdict still exact
    val ref = MemberIndex.MemberRef.build(corpusDf, col("key"), mExp = 6, k = 2)
    val novel = ref.novelOf(batchDf, col("key")).select("id").as[Long].collect().toSet
    assert(novel == (1050L until 1100L).toSet)
  }

  test("save/load round-trips; probe against the loaded index matches") {
    import spark.implicits._
    val path = tmp("member_idx")
    MemberIndex.MemberRef.build(corpusDf, col("key"), mExp = 12, k = 5).save(path)
    val ref = MemberIndex.MemberRef.load(spark, path)
    assert(ref.mExp == 12 && ref.k == 5)
    val novel = ref.novelOf(batchDf, col("key")).select("id").as[Long].collect().toSet
    assert(novel == (1050L until 1100L).toSet)
  }

  test("appendTo folds a slice in; bloom bits equal a from-scratch rebuild") {
    import spark.implicits._
    val path = tmp("member_append")
    MemberIndex.MemberRef.build(corpusDf, col("key"), mExp = 12, k = 5).save(path)
    // append the batch itself: every batch key becomes a member
    MemberIndex.MemberRef.load(spark, path)
      .appendTo(path, batchDf, col("key"))
    val ref2 = MemberIndex.MemberRef.load(spark, path)
    val novelAfter = ref2.novelOf(batchDf, col("key")).count()
    assert(novelAfter == 0, "all appended keys must be known")
    // OR merge is exact: bits == rebuild over the union corpus
    val rebuilt = MemberIndex.MemberRef.build(
      corpusDf.select("key").unionByName(batchDf.select("key")),
      col("key"), mExp = 12, k = 5)
    val a = ref2.bloom.select("bits").as[Seq[Long]].head()
    val b = rebuilt.bloom.select("bits").as[Seq[Long]].head()
    assert(a == b, "append must be bit-identical to rebuild")
  }

  test("verdictsOf: known is exact and bloom has no false negatives") {
    import spark.implicits._
    val ref = MemberIndex.MemberRef.build(corpusDf, col("key"), mExp = 12, k = 5)
    val v = ref.verdictsOf(batchDf, col("key"))
      .select(col("id"), col("known"), col("bloom_candidate")).collect()
    v.foreach { r =>
      val known = r.getBoolean(1); val cand = r.getBoolean(2)
      if (known) assert(cand, s"false negative for id=${r.getLong(0)}")
      val expectKnown = r.getLong(0) < 1050L
      assert(known == expectKnown, s"id=${r.getLong(0)}")
    }
  }

  test("probe plan: hash set streams map-side (broadcast candidates), no corpus exchange") {
    val ref = MemberIndex.MemberRef.build(corpusDf, col("key"), mExp = 12, k = 5)
    val plan = ref.novelOf(batchDf, col("key"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast joins in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus hash set must not reach a sort-merge exchange:\n$plan")
  }
}
