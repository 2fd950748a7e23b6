package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.operators.{Funnel, Similarity}

/** Ordered-funnel / cohort-retention semantics + the cluster-cards
  * rollup: strictly-after stage ordering, same-instant exclusion,
  * pre-cohort clipping, and the plan shapes that matter at 100 TB
  * (no Window operator anywhere, event-type filter pushed to the
  * scan-side before the first exchange). */
class FunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.map { case (u, et, t) => (u, et, ts(t)) }
      .toDF("user_id", "event_type", "ts")
  }

  test("orderedFunnel requires each stage strictly after the previous") {
    // A converts fully in order; B views before signing up (no stage-2);
    // C purchases before clicking (stages 1-3 only)
    val ev = events(
      (1L, "signup", "2024-01-01 10:00:00"), (1L, "view", "2024-01-01 10:01:00"),
      (1L, "click", "2024-01-01 10:02:00"), (1L, "purchase", "2024-01-01 10:03:00"),
      (2L, "view", "2024-01-02 09:00:00"), (2L, "signup", "2024-01-02 10:00:00"),
      (3L, "signup", "2024-01-03 08:00:00"), (3L, "purchase", "2024-01-03 08:30:00"),
      (3L, "view", "2024-01-03 09:00:00"), (3L, "click", "2024-01-03 10:00:00"))
    val got = Funnel.orderedFunnel(ev, Seq("signup", "view", "click", "purchase"))
      .orderBy("stage_idx")
      .select("stage", "n_users", "conv_rate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("signup", 3L, 1.0), ("view", 2L, 0.666667),
      ("click", 2L, 0.666667), ("purchase", 1L, 0.333333)))
  }

  test("orderedFunnel excludes same-instant stage completion") {
    val ev = events(
      (1L, "signup", "2024-01-01 10:00:00"), (1L, "view", "2024-01-01 10:00:00"))
    val got = Funnel.orderedFunnel(ev, Seq("signup", "view"))
      .orderBy("stage_idx").select("n_users").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 0L))
  }

  test("orderedFunnel later-stage conversion uses the EARLIEST qualifying event") {
    // B's first view precedes signup, second view follows it — the user
    // still converts, at the second view's instant; a click between the
    // two views (before signup) must not count for stage 3.
    val ev = events(
      (2L, "view", "2024-01-02 09:00:00"), (2L, "click", "2024-01-02 09:30:00"),
      (2L, "signup", "2024-01-02 10:00:00"), (2L, "view", "2024-01-02 11:00:00"))
    val got = Funnel.orderedFunnel(ev, Seq("signup", "view", "click"))
      .orderBy("stage_idx").select("n_users").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 1L, 0L))
  }

  test("cohortRetention clips pre-cohort activity and excludes non-cohort users") {
    // u1 signs up in week of Jan 1, active weeks 0 and 2;
    // u2 has activity but never signs up — excluded entirely;
    // u1's pre-signup event in the prior week is clipped.
    val ev = events(
      (1L, "view", "2023-12-28 10:00:00"), // pre-cohort, clipped
      (1L, "signup", "2024-01-03 10:00:00"),
      (1L, "click", "2024-01-16 10:00:00"), // week offset 2
      (2L, "view", "2024-01-03 11:00:00"))
    val got = Funnel.cohortRetention(ev, cohortType = Some("signup"))
      .orderBy("week_offset")
      .select("week_offset", "n_active", "n_cohort", "retention_rate")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0, 1L, 1L, 1.0), (2, 1L, 1L, 1.0)))
  }

  test("funnel + retention plans carry no Window operator") {
    val ev = events((1L, "signup", "2024-01-01 10:00:00"))
    for (df <- Seq(
        Funnel.orderedFunnel(ev, Seq("signup", "view", "click")),
        Funnel.cohortRetention(ev, cohortType = Some("signup")))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), p.take(600))
    }
  }

  test("funnel over parquet pushes the event-type predicate to the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = SparkEntry.queries("q_events_funnel")(spark, "/root/testdata/sf0.001")
    val scans = df.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.exists(_.metadata("PushedFilters").contains("In(event_type")),
      scans.map(_.metadata("PushedFilters")).mkString("; "))
  }

  test("clusterCards: shares sum to 1, members partition the corpus, purity bounded") {
    import spark.implicits._
    val vecs = (0 until 60).map { i =>
      val base = Array.fill(8)(0.0f)
      base(i % 4) = 1.0f + (i % 3) * 0.01f
      (i.toLong, base.toSeq, i % 5)
    }.toDF("vec_id", "embedding", "label")
    val cards = Similarity.clusterCards(vecs, "embedding", "vec_id", "label",
      k = 4, iters = 2)
    val rows = cards.collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == 60L)
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"share sum $shareSum")
    assert(rows.forall { r =>
      val f = r.getAs[Double]("top_label_frac"); f > 0.0 && f <= 1.0
    })
    // deterministic: a second run is byte-identical
    val again = Similarity.clusterCards(vecs, "embedding", "vec_id", "label",
      k = 4, iters = 2).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }
}
