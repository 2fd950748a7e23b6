package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.stats.Stats

/** Mergeable quantile sketch: exact in the no-compaction regime (the
  * oracle-able contract), bounded rank error beyond capacity, partial
  * summaries — not rows — through the exchange. */
class QuantileSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** splitmix-scrambled values so sorted order ≠ input order. */
  private def df(n: Int, parts: Int) = {
    import spark.implicits._
    (0 until n).map(i => ("g", (i * 2654435761L % 10007).toDouble))
      .toDF("grp", "v").repartition(parts)
  }

  private def exactQ(vals: Seq[Double], q: Double): Double = {
    val s = vals.sorted
    s(math.floor(q * (s.size - 1)).toInt)
  }

  test("exact regime: matches the nearest-rank-lower order statistic, any partitioning") {
    import spark.implicits._
    val vals = (0 until 2000).map(i => (i * 2654435761L % 10007).toDouble)
    for (parts <- Seq(1, 7)) {
      val got = Stats.quantileProfile(df(2000, parts), "grp", "v",
          Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0), capacity = 4096)
        .as[(String, Double, Double)].collect()
        .map(r => r._2 -> r._3).toMap
      for (q <- Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0))
        assert(got(q) == exactQ(vals, q), s"q=$q parts=$parts")
    }
  }

  test("approximate regime: capacity 64 on 20k rows keeps rank error small") {
    import spark.implicits._
    val n = 20000
    val got = Stats.quantileProfile(df(n, 8), "grp", "v",
        Seq(0.5, 0.9), capacity = 64)
      .as[(String, Double, Double)].collect().map(r => r._2 -> r._3).toMap
    val sorted = (0 until n).map(i => (i * 2654435761L % 10007).toDouble).sorted
    for (q <- Seq(0.5, 0.9)) {
      val est = got(q)
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - q) < 0.15,
        s"q=$q est=$est rank=$rank — rank error too large")
    }
  }

  test("groups and nulls: per-group answers; nulls ignored; empty → empty array") {
    import spark.implicits._
    val d = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("b", Some(10.0)), ("b", None)).toDF("grp", "v")
    val got = Stats.quantileProfile(d, "grp", "v", Seq(0.5), capacity = 16)
      .as[(String, Double, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got("a") == 2.0 && got("b") == 10.0)
  }

  test("plan: partial aggregation — summaries, not rows, cross the exchange") {
    val plan = Stats.quantileProfile(df(1000, 4), "grp", "v", Seq(0.5), 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_quantile_sketch") ||
      plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected a two-phase aggregate plan:\n$plan")
  }

  test("SQL registration: quantile_sketch(col, q, capacity) via the registry") {
    import spark.implicits._
    // live-session registration (the literal parsers in the builder
    // run for real here: q and capacity come from the SQL literals)
    GraftExtensions.install(spark)
    Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v").createOrReplaceTempView("qs_t")
    val out = spark.sql(
      "SELECT quantile_sketch(v, CAST(0.5 AS DOUBLE), 16) AS s FROM qs_t")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(out.head.getDouble(1) == 3.0)
  }
}
