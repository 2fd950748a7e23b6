package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.operators.{Funnel, Similarity, TextAnalysis}
import graft.functions.CharEntropy

/** Property tests for the round-7 invariants:
  *
  *  - funnel monotonicity: stage-i+1 conversions are a subset of
  *    stage-i conversions, so per-stage user counts never increase —
  *    on ANY event set, in ANY partitioning (the cascade must not
  *    depend on row order);
  *  - char entropy is a distribution statistic: invariant under any
  *    permutation of the string's codepoints, bounded by
  *    log₂(#distinct codepoints), and zero iff ≤1 distinct;
  *  - gopher keep is exactly the conjunction of its rule flags (the
  *    flags and the decision can never disagree);
  *  - PQ encode is partition-invariant end to end (deterministic
  *    codebooks + map-only assignment ⇒ byte-identical codes).
  */
object R7PropSpec extends Properties("r7-invariants") {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val stages = Seq("s1", "s2", "s3")

  private val eventsGen: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 6L)
      et <- Gen.oneOf(stages :+ "other")
      sec <- Gen.choose(0L, 50L)
    } yield (u, et, sec))
  } yield evs

  property("funnel stage counts never increase, on any partitioning") =
    Prop.forAll(eventsGen) { evs =>
      import spark.implicits._
      val df = evs.map { case (u, et, sec) =>
        (u, et, new Timestamp(1700000000000L + sec * 1000)) }
        .toDF("user_id", "event_type", "ts")
      val counts = Funnel.orderedFunnel(df, stages)
        .orderBy("stage_idx").select("n_users")
        .collect().map(_.getLong(0)).toSeq
      val shuffled = Funnel.orderedFunnel(df.repartition(7), stages)
        .orderBy("stage_idx").select("n_users")
        .collect().map(_.getLong(0)).toSeq
      counts.zip(counts.tail).forall { case (a, b) => b <= a } &&
        counts == shuffled
    }

  private val textGen: Gen[String] = for {
    len <- Gen.choose(0, 60)
    cs <- Gen.listOfN(len, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '#', '…', 'é', '中')))
  } yield cs.mkString

  property("char entropy: permutation-invariant, bounded, zero iff trivial") =
    Prop.forAll(textGen) { s =>
      val h = CharEntropy.entropy(s)
      val perm = CharEntropy.entropy(new String(
        scala.util.Random.shuffle(s.toList).toArray))
      val distinct = s.codePoints().distinct().count()
      val bound = if (distinct <= 1) 0.0
        else math.log(distinct.toDouble) / math.log(2.0)
      math.abs(h - perm) < 1e-9 &&
        h >= -1e-12 && h <= bound + 1e-9 &&
        ((distinct <= 1) == (h == 0.0))
    }

  private val docGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    ds <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 20)
      ws <- Gen.listOfN(len, Gen.oneOf(
        "the", "of", "and", "data", "x9", "…", "#tag", "word", "121"))
    } yield ws.mkString(" "))
  } yield ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("gopher keep == conjunction of its rule flags") =
    Prop.forAll(docGen) { ds =>
      import spark.implicits._
      val out = TextAnalysis.gopherRules(
        ds.toDF("doc_id", "text"), "text", "doc_id").collect()
      out.forall { r =>
        r.getAs[Boolean]("keep") ==
          (r.getAs[Boolean]("r_word_count") && r.getAs[Boolean]("r_mean_word_len") &&
           r.getAs[Boolean]("r_symbol_ratio") && r.getAs[Boolean]("r_alpha_words") &&
           r.getAs[Boolean]("r_stopwords"))
      }
    }

  private val vecsGen: Gen[List[(Long, List[Float])]] = for {
    n <- Gen.choose(8, 24)
    vs <- Gen.listOfN(n, Gen.listOfN(8,
      Gen.choose(-1000, 1000).map(_ / 250.0f)))
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  property("pq encode is partition-invariant (codes and distortion)") =
    Prop.forAll(vecsGen) { vs =>
      import spark.implicits._
      val df = vs.toDF("vec_id", "embedding")
      def enc(d: org.apache.spark.sql.DataFrame) =
        Similarity.pqEncode(d, "embedding", "vec_id", dim = 8,
            m = 2, k = 4, iters = 2)
          .orderBy("vec_id").collect().map(_.toString).toSeq
      enc(df) == enc(df.repartition(5))
    }
}
