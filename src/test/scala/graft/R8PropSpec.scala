package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Dsir}

/** Property tests for the round-8 session-5 invariants:
  *
  *  - quantile sketch exactness: in the no-compaction regime the
  *    reported value IS the nearest-rank-lower order statistic, on any
  *    data, any quantile, any partitioning;
  *  - exact-substring spans: spans within a doc never overlap, all
  *    window positions inside a span exist, and a doc with no repeated
  *    window reports nothing — on any corpus, any partitioning;
  *  - DSIR weights are a pure function of the feature multiset: a
  *    partitioning change never moves a single weight; and the
  *    identity target (every doc is target) zeroes every weight
  *    (p_target = p_raw by construction);
  *  - exactSubstrApply conservation: n_removed + tokens(cleaned) =
  *    n_tokens for every doc.
  */
object R8PropSpec extends Properties("r8-invariants") {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val valsGen: Gen[List[Double]] = for {
    n <- Gen.choose(1, 60)
    vs <- Gen.listOfN(n, Gen.choose(-1000, 1000).map(_.toDouble))
  } yield vs

  property("quantile sketch exact regime == order statistic, any partitioning") =
    Prop.forAll(valsGen, Gen.choose(0.0, 1.0)) { (vs, q) =>
      import spark.implicits._
      val df = vs.map(("g", _)).toDF("grp", "v").repartition(5)
      val got = graft.stats.Stats
        .quantileProfile(df, "grp", "v", Seq(q), capacity = 128)
        .collect().head.getDouble(2)
      val sorted = vs.sorted
      got == sorted(math.floor(q * (sorted.size - 1)).toInt)
    }

  // small vocab so repeats actually occur
  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 14)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("substring spans: disjoint per doc, partition-invariant") =
    Prop.forAll(corpusGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      def run(d: org.apache.spark.sql.DataFrame) =
        Dedup.exactSubstrSpans(d, "text", "doc_id", winTokens = 3)
          .as[(Long, Long, Long, Long)].collect().toSet
      val spans = run(df)
      val stable = spans == run(df.repartition(7))
      val disjoint = spans.groupBy(_._1).forall { case (_, ss) =>
        val sorted = ss.toList.sortBy(_._2)
        sorted.zip(sorted.tail).forall { case (a, b) => a._3 < b._2 }
      }
      stable && disjoint
    }

  property("apply conservation: kept + removed == total tokens") =
    Prop.forAll(corpusGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val spans = Dedup.exactSubstrSpans(df, "text", "doc_id", 3)
      Dedup.exactSubstrApply(df, "text", "doc_id", spans)
        .as[(Long, Long, Long, String)].collect().forall {
          case (_, nTok, nRem, cleaned) =>
            val kept =
              if (cleaned.isEmpty) 0 else cleaned.split("\\s+").length
            kept + nRem == nTok
        }
    }

  property("dsir: partition-invariant; identity target zeroes all weights") =
    Prop.forAll(corpusGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      def run(d: org.apache.spark.sql.DataFrame, tgt: org.apache.spark.sql.Column) =
        Dsir.importanceWeights(d, "text", "doc_id", tgt, nBuckets = 16)
          .as[(Long, Long, Double)].collect().toSet
      val tgt = col("doc_id") % 2 === 0
      val stable = run(df, tgt) == run(df.repartition(7), tgt)
      val identity = run(df, lit(true)).forall(_._3 == 0.0)
      stable && identity
    }

  private val domainsGen: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 8)
    sizes <- Gen.listOfN(n, Gen.choose(1L, 5000L))
  } yield sizes.zipWithIndex.map { case (s, i) => (s"d$i", s) }

  property("unimax water-filling: caps honored, budget filled iff fillable, uncapped equal") =
    Prop.forAll(domainsGen, Gen.choose(1L, 40000L), Gen.choose(1, 4)) {
      (doms, budget, cap) =>
        import spark.implicits._
        val df = doms.toDF("domain0", "n")
        val rows = graft.operators.Sampling
          .unimaxAllocation(df, "domain0", col("n"), budget, cap)
          .select("domain", "n_tokens", "capped", "alloc_tokens", "epochs")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
            r.getDouble(3), r.getDouble(4)))
        val eps = 1e-4
        // (a) no domain exceeds its epoch cap
        val capsHeld = rows.forall { case (_, n, _, a, _) => a <= cap * n + eps }
        // (b) capped domains take EXACTLY their cap
        val cappedExact = rows.filter(_._3)
          .forall { case (_, n, _, a, e) =>
            a == (cap * n).toDouble && math.abs(e - cap) < eps }
        // (c) total allocation never exceeds the budget, and equals it
        //     whenever at least one domain is uncapped
        val total = rows.map(_._4).sum
        val budgetHeld = total <= budget + eps * rows.length
        val filled = !rows.exists(!_._3) ||
          math.abs(total - budget) < eps * (rows.length + 1)
        // (d) all uncapped domains draw the same share
        val un = rows.filter(!_._3).map(_._4)
        val unEqual = un.isEmpty || un.forall(a => math.abs(a - un.head) < eps)
        capsHeld && cappedExact && budgetHeld && filled && unEqual
    }

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 25)
    es <- Gen.listOfN(n, for {
      a <- Gen.choose(1L, 30L); b <- Gen.choose(1L, 30L)
    } yield (math.min(a, b), math.max(a, b)))
  } yield es.filter(e => e._1 != e._2)

  property("clusterSafeSplit: no edge straddles the boundary, any graph, any rate") =
    Prop.forAll(edgesGen, Gen.choose(0.05, 0.95)) { (edges, rate) =>
      import spark.implicits._
      val docs = (1L to 30L).toDF("doc_id")
      val clusters =
        if (edges.isEmpty)
          Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
        else graft.operators.Clustering
          .dupClusters(edges.toDF("id_a", "id_b"), "id_a", "id_b")
      val side = graft.operators.Sampling
        .clusterSafeSplit(docs, "doc_id", clusters, "doc_id", "cluster_id", rate)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      side.size == 30 && edges.forall { case (a, b) => side(a) == side(b) }
    }
}
