package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Contamination, Dedup, Sampling, TextAnalysis}

/** Round-8 session-2 operators: embedding-space contamination,
  * intra-doc segment dedup, temperature mixture weights, sequence-length
  * histogram, dup-cluster size profile. Hand-checkable inputs here; the
  * DuckDB oracles re-verify each on the real corpus. */
class R8OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("embeddingContamination flags near-identical embeddings, skips far ones") {
    import spark.implicits._
    val evalDf = Seq((100L, Array(1f, 0f, 0f, 0f)), (101L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Array(1f, 0.01f, 0f, 0f)),   // ~eval 100 (cos ≈ 1)
      (2L, Array(0f, 0f, 1f, 1f)),      // orthogonal to both
      (3L, Array(0.7f, 0.7f, 0f, 0f))   // cos ≈ .7 with both — below thr
    ).toDF("vec_id", "embedding")
    val out = Contamination.embeddingContamination(train, evalDf,
        "embedding", "vec_id", dim = 4, threshold = 0.9, nBits = 1, tables = 6)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L && r.getDouble(2) > 0.99)
  }

  test("intraDocSegmentDedup drops within-doc repeats, keeps cross-doc ones") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d a b x y"), // "a b" repeats inside doc 1
      (2L, "a b q r")          // "a b" also in doc 2 — intra-doc keeps it
    ).toDF("doc_id", "text")
    val out = Dedup.intraDocSegmentDedup(d, "text", "doc_id", segTokens = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 4 && out(0).getLong(2) == 1)
    assert(out(0).getString(4) == "a b c d x y")
    assert(out(1).getLong(2) == 0 && out(1).getString(4) == "a b q r")
  }

  test("temperatureWeights: α=1 is the natural mixture; smaller α flattens") {
    import spark.implicits._
    val d = Seq.fill(9)(("big", 10L)) ++ Seq(("small", 10L))
    val out = Sampling.temperatureWeights(d.toDF("domain", "n"), "domain",
        col("n"), Seq(0.5, 1.0))
      .orderBy("domain").collect()
    val big = out(0); val small = out(1)
    assert(big.getDouble(3) == 0.9 && small.getDouble(3) == 0.1)
    // α=1 reproduces the shares exactly
    assert(big.getDouble(5) == 0.9 && small.getDouble(5) == 0.1)
    // α=0.5: q_big = √.9/(√.9+√.1)
    val exp = math.sqrt(0.9) / (math.sqrt(0.9) + math.sqrt(0.1))
    assert(math.abs(big.getDouble(4) - exp) < 1e-6)
    // flattening: small domain gains, big loses
    assert(small.getDouble(4) > 0.1 && big.getDouble(4) < 0.9)
  }

  test("seqLenHistogram: exact power-of-two bucket edges and cumulative share") {
    import spark.implicits._
    val d = Seq("t", "t t", "t t t", "t t t t", "t t t t t t t",
      "t t t t t t t t").map(Tuple1(_)).toDF("text")
    val out = TextAnalysis.seqLenHistogram(d, "text").orderBy("bucket_lo").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 2L, 1L)) // n_docs
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 5L, 11L, 8L)) // n_tokens
    assert(out.last.getDouble(5) == 1.0) // cum share closes at 1
    assert(math.abs(out(1).getDouble(5) - 6.0 / 25.0) < 1e-6)
  }

  test("activeUsers: DAU, rolling 7-day WAU, stickiness") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val ev = Seq(
      (ts(1), 1L), (ts(2), 1L), (ts(1), 2L), // u1 active d1+d2, u2 d1
      (ts(8), 3L), (ts(8), 3L)               // u3 d8 (dup event collapses)
    ).toDF("ts", "user_id")
    val out = graft.operators.Funnel.activeUsers(ev, "ts", "user_id", 7)
      .orderBy("day").collect()
    // d8 window [d2..d8] still sees u1's d2 activity
    assert(out.map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq == Seq(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-02", 1L, 2L, 0.5),
      ("2024-01-08", 1L, 2L, 0.5)))
  }

  test("rollingEventStats: calendar-range MA skips gaps; WoW hits exact -7d") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val ev = Seq(ts(1), ts(1), ts(2), ts(9), ts(9), ts(9))
      .map((_, "a")).toDF("ts", "event_type")
    val out = graft.operators.Funnel.rollingEventStats(ev, "ts", "event_type")
      .orderBy("day").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L, 3L))
    // d9's range window [d3..d9] must NOT see d1/d2 (a rows-frame would)
    assert(out.map(_.getDouble(3)).toSeq == Seq(2.0, 1.5, 3.0))
    // WoW: d9 vs d2 = 3/1; d1/d2 have no -7d history ⇒ null
    assert(out(0).isNullAt(4) && out(1).isNullAt(4) && out(2).getDouble(4) == 3.0)
  }

  test("psi: zero for identical halves, large for a clean shift") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // "stable": same value mix both halves → PSI = 0 exactly (p = q)
    // "shifted": bin 0 first half, bin 1 second half → PSI >> 0.25
    val ev = (
      Seq((ts(1), "stable", 5.0), (ts(1), "stable", 25.0),
          (ts(9), "stable", 5.0), (ts(9), "stable", 25.0)) ++
      Seq((ts(1), "shifted", 5.0), (ts(2), "shifted", 5.0),
          (ts(9), "shifted", 25.0), (ts(10), "shifted", 25.0))
    ).toDF("ts", "event_type", "value")
    val out = graft.operators.Drift.psi(ev, "event_type", "value", "ts", 20.0)
      .orderBy("grp").collect()
    val shifted = out(0); val stable = out(1)
    assert(stable.getString(0) == "stable" && stable.getDouble(2) == 0.0)
    assert(shifted.getLong(1) == 2 && shifted.getDouble(2) > 10.0)
  }

  test("psiVsReference: parquet round-trip reproduces psi exactly") {
    import spark.implicits._
    import java.sql.Timestamp
    import graft.operators.Drift
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // midpoint of [d1 12:00, d9 12:00] is d5 12:00 ⇒ halves split clean
    val first = Seq((ts(1), "a", 5.0), (ts(2), "a", 25.0), (ts(3), "a", 5.0),
      (ts(2), "b", 45.0)).toDF("ts", "event_type", "value")
    val second = Seq((ts(7), "a", 25.0), (ts(8), "a", 25.0), (ts(9), "a", 5.0),
      (ts(8), "b", 45.0)).toDF("ts", "event_type", "value")
    val direct = Drift.psi(first.union(second), "event_type", "value", "ts", 20.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val tmp = java.nio.file.Files.createTempDirectory("drift_ref").toString
    // build from HALF the reference, append the rest — the saved form
    // must equal the all-at-once histogram (bin-keyed exact counts)
    val (refA, refB) = (first.filter($"ts" <= ts(2)), first.filter($"ts" > ts(2)))
    Drift.DriftRef.build(refA, "event_type", "value", 20.0).save(tmp)
    Drift.DriftRef.load(spark, tmp).appendTo(tmp, refB, "event_type", "value")
    val probe = Drift.DriftRef.load(spark, tmp)
      .psiOf(second, "event_type", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(probe == direct && direct.nonEmpty)
    // the stable group stays at 0; the shifted group registers
    assert(direct.exists { case (g, _, v) => g == "b" && v == 0.0 })
    assert(direct.exists { case (g, _, v) => g == "a" && v > 0.0 })
  }

  test("clusterSizeProfile: histogram plus singleton remainder") {
    import spark.implicits._
    // components {1,2,3} and {10,11}; corpus has 10 docs
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Clustering.dupClusters(pairs, "id_a", "id_b")
    val corpus = (1L to 10L).toDF("doc_id")
    val out = Clustering.clusterSizeProfile(labels, corpus, "doc_id")
      .orderBy("cluster_size").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 5L, 5L), (2L, 1L, 2L), (3L, 1L, 3L)))
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.5, 0.2, 0.3))
  }
}
