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

  test("ksTest: exact sup-gap matches brute force") {
    import spark.implicits._
    // A = {1, 2, 3}, B = {2, 4}: sup gap at x = 3 is |3/3 - 1/2| = 0.5
    val df = Seq((0, 1.0), (0, 2.0), (0, 3.0), (1, 2.0), (1, 4.0))
      .map { case (v, x) => ("g1", v, x) }.toDF("grp", "v", "x")
    val r = Metrics.ksTest(df, col("grp"), col("v"), col("x")).collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.5, s"ks_d=${r.getDouble(3)}")
    // K = 0.5 * sqrt(6/5) = 0.5477
    assert(r.getDouble(4) == 0.5477, s"ks_stat=${r.getDouble(4)}")
  }

  test("ksTest: identical samples give D = 0; one-arm groups give NULL") {
    import spark.implicits._
    val same = Seq((0, 1.0), (0, 2.0), (1, 1.0), (1, 2.0))
      .map { case (v, x) => ("g1", v, x) }.toDF("grp", "v", "x")
    val r1 = Metrics.ksTest(same, col("grp"), col("v"), col("x")).collect().head
    assert(r1.getDouble(3) == 0.0, s"identical arms must give D=0, got ${r1.getDouble(3)}")
    val oneArm = Seq(("g1", 0, 1.0), ("g1", 0, 2.0)).toDF("grp", "v", "x")
    val r2 = Metrics.ksTest(oneArm, col("grp"), col("v"), col("x")).collect().head
    assert(r2.isNullAt(3) && r2.isNullAt(4), "empty arm must yield NULL D")
  }

  test("spearman: monotone ±1, tie-averaged ranks match brute force") {
    import spark.implicits._
    val mono = Seq((1.0, 10L), (2.0, 20L), (3.0, 30L), (4.0, 40L))
      .map { case (x, y) => ("g1", x, y) }.toDF("grp", "x", "y")
    val r1 = Metrics.spearman(mono, col("grp"), col("x"), col("y")).collect().head
    assert(r1.getDouble(2) == 1.0, s"rho=${r1.getDouble(2)}")
    val anti = Seq((1.0, 40L), (2.0, 30L), (3.0, 20L), (4.0, 10L))
      .map { case (x, y) => ("g1", x, y) }.toDF("grp", "x", "y")
    val r2 = Metrics.spearman(anti, col("grp"), col("x"), col("y")).collect().head
    assert(r2.getDouble(2) == -1.0, s"rho=${r2.getDouble(2)}")
    // x = (1, 2, 2, 3), y = (1, 3, 2, 4): avg ranks x = (1, 2.5, 2.5, 4),
    // y = (1, 3, 2, 4) → rho = 18 / sqrt(18 * 20) = 0.948683
    val tied = Seq((1.0, 1L), (2.0, 3L), (2.0, 2L), (3.0, 4L))
      .map { case (x, y) => ("g1", x, y) }.toDF("grp", "x", "y")
    val r3 = Metrics.spearman(tied, col("grp"), col("x"), col("y")).collect().head
    assert(r3.getDouble(2) == 0.948683, s"rho=${r3.getDouble(2)}")
  }

  test("spearman: a constant axis yields NULL rho") {
    import spark.implicits._
    val df = Seq(("g1", 1.0, 7L), ("g1", 2.0, 7L), ("g1", 3.0, 7L))
      .toDF("grp", "x", "y")
    val r = Metrics.spearman(df, col("grp"), col("x"), col("y")).collect().head
    assert(r.isNullAt(2), "constant y must yield NULL rho")
  }

  test("poissonBootstrapCI: weights are Poisson(1)-shaped and the CI brackets the mean") {
    import spark.implicits._
    // 2000 units, values 0..1999 cents: true mean 999.5
    val units = (0 until 2000).map(i => ("g1", i.toLong, i.toLong))
      .toDF("grp", "id", "cents")
    val r = Metrics.poissonBootstrapCI(units, col("grp"), col("id"),
      col("cents")).collect().head
    assert(r.getLong(1) == 2000L)
    val mean = r.getDouble(2)
    assert(mean == 999.5, s"mean_c=$mean")
    assert(r.getLong(3) == 64L, s"n_rep=${r.getLong(3)}")
    val (lo, hi) = (r.getDouble(4), r.getDouble(5))
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] must bracket $mean")
    // bootstrap SE of the mean ~ sd/sqrt(n) = 577/44.7 ~ 12.9; the 95%
    // band should be a small multiple of that, not degenerate or huge
    assert(hi - lo > 10 && hi - lo < 120, s"CI width ${hi - lo}")
  }

  test("poissonBootstrapCI: partition-invariant (identical CI under any layout)") {
    import spark.implicits._
    val units = (0 until 500).map(i => ("g1", i.toLong, (i * 7 % 100).toLong))
      .toDF("grp", "id", "cents")
    val a = Metrics.poissonBootstrapCI(units.repartition(1), col("grp"),
      col("id"), col("cents")).collect().head
    val b = Metrics.poissonBootstrapCI(units.repartition(13), col("grp"),
      col("id"), col("cents")).collect().head
    assert(a.getDouble(4) == b.getDouble(4) && a.getDouble(5) == b.getDouble(5),
      s"CI must be bit-identical under repartition: $a vs $b")
  }

  test("poissonThresholds: integer CDF steps match Poisson(1) masses") {
    val t = Metrics.poissonThresholds
    assert(t.size == 9 && t == t.sorted, "thresholds must be ascending")
    // step k mass = pmf(k) = e^-1/k!: check k=0 and k=1 within 1 ulp-ish
    val m0 = t.head.toDouble / (1L << 53)
    assert(math.abs(m0 - math.exp(-1.0)) < 1e-12, s"P(w=0)=$m0")
    val m1 = (t(1) - t(0)).toDouble / (1L << 53)
    assert(math.abs(m1 - math.exp(-1.0)) < 1e-12, s"P(w=1)=$m1")
  }

  test("changepoint: finds the level shift day; flat series degrade to the earliest tie") {
    import spark.implicits._
    // counts 2,2,2,2,2 then 10,10,10,10,10 → split after day 5
    val rows = (1 to 10).flatMap { day =>
      val c = if (day <= 5) 2 else 10
      Seq.fill(c)(("evt", f"1970-01-$day%02d 12:00:00"))
    }
    val df = rows.toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
    val r = TimeSeries.changepoint(df, col("event_type"), col("ts"),
      count(lit(1))).collect().head
    assert(r.getDate(1).toString == "1970-01-05", s"cp_day=${r.getDate(1)}")
    assert(r.getLong(2) == 10L)
    assert(r.getDouble(4) == 2.0 && r.getDouble(5) == 10.0,
      s"means=${r.getDouble(4)}/${r.getDouble(5)}")
    // flat series: all gains 0 → earliest day wins the tie deterministically
    val flat = (1 to 6).flatMap { day =>
      Seq.fill(3)(("evt", f"1970-01-$day%02d 12:00:00"))
    }.toDF("event_type", "tss").withColumn("ts", to_timestamp(col("tss")))
    val rf = TimeSeries.changepoint(flat, col("event_type"), col("ts"),
      count(lit(1))).collect().head
    assert(rf.getDate(1).toString == "1970-01-01", s"flat cp=${rf.getDate(1)}")
    assert(rf.getDouble(3) == 0.0, s"flat gain=${rf.getDouble(3)}")
  }

  test("periodContribution: exact deltas, shares sum to the move, magnitude rank") {
    import spark.implicits._
    // span 1970-01-01..04, midpoint day 2: p1 = days 1-2, p2 = days 3-4
    val rows = Seq(
      ("a", "1970-01-01", 100L), ("a", "1970-01-02", 0L),
      ("a", "1970-01-03", 200L), ("a", "1970-01-04", 100L), // delta +200
      ("b", "1970-01-01", 50L), ("b", "1970-01-04", -50L))  // delta -100
    val df = rows.toDF("seg", "ds", "cents")
      .withColumn("ts", to_timestamp(col("ds")))
    val r = Metrics.periodContribution(df, col("seg"), col("ts"),
      col("cents")).orderBy("seg_rank").collect()
    assert(r(0).getString(0) == "a" && r(0).getLong(3) == 200L &&
      r(0).getDouble(4) == 2.0 && r(0).getInt(5) == 1, s"got ${r(0)}")
    assert(r(1).getString(0) == "b" && r(1).getLong(3) == -100L &&
      r(1).getDouble(4) == -1.0 && r(1).getInt(5) == 2, s"got ${r(1)}")
  }

  test("ksTest/spearman plans: rank windows are partitioned by group") {
    import spark.implicits._
    val df = Seq(("g1", 0, 1.0), ("g2", 1, 2.0)).toDF("grp", "v", "x")
    val ksPlan = Metrics.ksTest(df, col("grp"), col("v"), col("x"))
      .queryExecution.optimizedPlan.toString
    assert(ksPlan.contains("windowspecdefinition(g"),
      s"KS windows must partition by group:\n$ksPlan")
    val df2 = Seq(("g1", 1.0, 2L), ("g2", 2.0, 3L)).toDF("grp", "x", "y")
    val spPlan = Metrics.spearman(df2, col("grp"), col("x"), col("y"))
      .queryExecution.optimizedPlan.toString
    assert(spPlan.contains("windowspecdefinition(g"),
      s"Spearman windows must partition by group:\n$spPlan")
  }
}
