package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{Pipeline, WplEngine}
import graft.oml.KnowDb

/** KnowDb spill path: a dim past the driver guardrail must degrade to a
  * Spark join with identical query results, not a failed query. */
class SpillEnrichSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val wpl = "package /c { rule r { (kvarr) } }"
  private val oml =
    """name : enrich
      rule : /c/*
      ---
      ckey : digit = take(option:[ckey]) ;
      n_name = select n_name from nation where n_nationkey = read(nkey) ;
    """

  private def lines = {
    import spark.implicits._
    (0 until 40).map(i => (i.toLong, s"ckey=$i nkey=${i % 5}"))
      .toDF("id", "line")
  }

  private def dim = {
    import spark.implicits._
    (0 until 5).map(i => (i.toLong, s"NATION_$i")).toDF("n_nationkey", "n_name")
  }

  private def results(maxDimBytes: Long): Seq[(Long, String)] = {
    val out = Pipeline.runWithDims(lines, "line", wpl, Seq(oml),
      dims = Map("nation" -> dim), keep = Seq("id"), maxDimBytes = maxDimBytes)
    out.filter(col("status") === "ok")
      .select(col("id"), WplEngine.extractString("n_name").as("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
  }

  test("spilled dim produces identical results to the KnowDb probe route") {
    val viaProbe = results(maxDimBytes = KnowDb.DefaultMaxBytes)
    val viaJoin = results(maxDimBytes = 1) // force the spill
    assert(viaProbe.size == 40)
    assert(viaProbe == viaJoin)
    assert(viaProbe.take(2) == Seq((0L, "NATION_0"), (1L, "NATION_1")))
  }

  test("fromDims routes small dims to tables and big dims to the spill set") {
    val (db, spilledSmall) = KnowDb.fromDims(Map("nation" -> dim))
    assert(db.tables.contains("nation") && spilledSmall.isEmpty)
    val (db2, spilledBig) = KnowDb.fromDims(Map("nation" -> dim), maxBytes = 1)
    assert(db2.tables.isEmpty && db2.isSpilled("nation") &&
      spilledBig.keySet == Set("nation"))
  }

  test("spill route plans a real join; dim misses drop the field, not the record") {
    import spark.implicits._
    val withMiss = (0 until 10).map(i => (i.toLong, s"ckey=$i nkey=${i % 7}"))
      .toDF("id", "line") // nkey 5,6 miss the 5-row dim
    val out = Pipeline.runWithDims(withMiss, "line", wpl, Seq(oml),
      dims = Map("nation" -> dim), keep = Seq("id"), maxDimBytes = 1)
    assert(out.queryExecution.executedPlan.toString.contains("Join"))
    val rows = out.filter(col("status") === "ok")
      .select(col("id"), WplEngine.extractString("n_name").as("n_name"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(rows(0L).contains("NATION_0"))
    // probe-miss parity: record survives (ckey still emitted), field absent
    assert(rows.contains(5L) && rows(5L).forall(_.isEmpty))
  }

  test("NULL dim cells: spill route emits the same empty-sval field as the probe") {
    import spark.implicits._
    // n_name NULL for key 3: the probe stringifies the collected cell to ""
    // and emits an empty chars field — the join route must match, not drop it
    val dimWithNull = (0 until 5)
      .map(i => (i.toLong, if (i == 3) null else s"NATION_$i"))
      .toDF("n_nationkey", "n_name")
    def run(maxDimBytes: Long) =
      Pipeline.runWithDims(lines, "line", wpl, Seq(oml),
        dims = Map("nation" -> dimWithNull), keep = Seq("id"), maxDimBytes = maxDimBytes)
        .filter(col("status") === "ok")
        .select(col("id"), WplEngine.extractString("n_name").as("n_name"))
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
    val viaProbe = run(KnowDb.DefaultMaxBytes)
    val viaJoin = run(1)
    assert(viaProbe == viaJoin)
    // the NULL-cell key is present with an empty value in BOTH routes
    assert(viaProbe.find(_._1 == 3L).exists(_._2.contains("")))
  }

  test("markerName is unambiguous for underscore-bearing table/target names") {
    import graft.oml.SpillEnrich
    // a plain '_' separator would collide these two (table a_b/target c
    // vs table a/target b_c) and cross-wire the join completions
    assert(SpillEnrich.markerName("a_b", "c") != SpillEnrich.markerName("a", "b_c"))
  }

  test("non-deferrable spilled selects are rejected at plan time, not per record") {
    import graft.oml.SpillEnrich
    val nonEq =
      """name : bad1
        rule : /c/*
        ---
        n_name = select n_name from nation where n_nationkey > read(nkey) ;
      """
    val ex1 = intercept[IllegalArgumentException] {
      SpillEnrich.specsOf(Seq(nonEq), spilled = Set("nation"))
    }
    assert(ex1.getMessage.contains("guardrail"))
    // nested inside a match expression: cannot defer — the select feeds
    // a surrounding computation that must run in-eval
    val nested =
      """name : bad2
        rule : /c/*
        ---
        label = match read(nkey) {
          _ => select n_name from nation where n_nationkey = read(nkey) ;
        } ;
      """
    val ex2 = intercept[IllegalArgumentException] {
      SpillEnrich.specsOf(Seq(nested), spilled = Set("nation"))
    }
    assert(ex2.getMessage.contains("nested"))
    // the same sources are fine when the dim did NOT spill
    assert(SpillEnrich.specsOf(Seq(nonEq, nested), spilled = Set.empty).isEmpty)
  }
}
