package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Metrics, TimeSeries}

/** Nonparametric/robust statistics battery: Mann–Whitney U (tie
  * corrected), Kendall tau-b, Theil–Sen slope — each against
  * hand-computed brute-force values on small fixtures. */
class RobustStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("mannWhitney: tie-corrected U and z match brute force") {
    import spark.implicits._
    // A = {1, 2, 2, 5}, B = {2, 3, 4}: avg ranks 1, 3, 3, 7 / 3, 5, 6
    // → Ra = 14, U = 4, ties3 = 24, z = -0.7338
    val df = (Seq((0, 1.0), (0, 2.0), (0, 2.0), (0, 5.0),
      (1, 2.0), (1, 3.0), (1, 4.0)))
      .map { case (v, x) => ("g1", v, x) }
      .toDF("grp", "v", "x")
    val r = Metrics.mannWhitney(df, col("grp"), col("v"), col("x")).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 4L && row.getLong(2) == 3L)
    assert(row.getDouble(3) == 4.0, s"u=${row.getDouble(3)}")
    assert(row.getDouble(4) == -0.7338, s"z=${row.getDouble(4)}")
  }

  test("mannWhitney: degenerate arms emit NULL z, never a crash") {
    import spark.implicits._
    val oneArm = Seq(("g1", 0, 1.0), ("g1", 0, 2.0)).toDF("grp", "v", "x")
    val r1 = Metrics.mannWhitney(oneArm, col("grp"), col("v"), col("x")).collect().head
    assert(r1.isNullAt(4), "empty B arm must yield NULL z")
    val allTied = Seq(("g1", 0, 3.0), ("g1", 1, 3.0)).toDF("grp", "v", "x")
    val r2 = Metrics.mannWhitney(allTied, col("grp"), col("v"), col("x")).collect().head
    assert(r2.isNullAt(4), "all-tied values (sigma = 0) must yield NULL z")
  }

  test("kendallTau: tau-b with ties matches brute force") {
    import spark.implicits._
    // x = 1..5, y = (2, 1, 4, 4, 5): nc = 8, nd = 1, tx = 0, ty = 1
    // → tau_b = 7 / sqrt(10 * 9) = 0.7379
    val df = Seq((1, 1, 2), (2, 2, 1), (3, 3, 4), (4, 4, 4), (5, 5, 5))
      .toDF("k", "x", "y")
    val r = Metrics.kendallTau(df, col("k"), col("x"), col("y")).collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 8L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 0.7379, s"tau_b=${r.getDouble(3)}")
  }

  test("kendallTau: an all-tied axis yields NULL tau_b") {
    import spark.implicits._
    val df = Seq((1, 1, 7), (2, 2, 7), (3, 3, 7)).toDF("k", "x", "y")
    val r = Metrics.kendallTau(df, col("k"), col("x"), col("y")).collect().head
    assert(r.isNullAt(3))
  }

  test("theilSen: median pairwise slope matches brute force") {
    import spark.implicits._
    // daily counts 1, 2, 4, 4, 10 on days 0..4 → 10 slopes, median 1.75
    val rows = Seq.tabulate(5) { d => (d, Seq(1, 2, 4, 4, 10)(d)) }
      .flatMap { case (d, c) => Seq.fill(c)(("evt", s"1970-01-0${d + 1} 12:00:00")) }
    val df = rows.toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
    val r = TimeSeries.theilSen(df, col("event_type"), col("ts"),
      count(lit(1))).collect().head
    assert(r.getLong(1) == 10L, s"n_pairs=${r.getLong(1)}")
    assert(r.getDouble(2) == 1.75, s"sen_slope=${r.getDouble(2)}")
  }

  test("mannWhitney plan: rank window is partitioned by group (no global sort funnel)") {
    import spark.implicits._
    val df = Seq(("g1", 0, 1.0), ("g2", 1, 2.0)).toDF("grp", "v", "x")
    val plan = Metrics.mannWhitney(df, col("grp"), col("v"), col("x"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(g"),
      s"window must partition by the group column:\n$plan")
  }
}
