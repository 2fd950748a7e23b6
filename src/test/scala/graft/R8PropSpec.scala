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
}
