package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Property tests for the round-5 invariants:
  *
  *  - ngramNovelty conservation: every distinct shingle in the corpus
  *    is novel in exactly one doc, so Σ n_novel over docs equals the
  *    corpus-wide distinct-shingle count, and per-doc novelty ∈ [0,1];
  *  - cross-corpus near-dup is idempotent and order-safe: a batch doc
  *    that IS a corpus doc verbatim always drops (Jaccard 1), and
  *    survivors of a pass survive a second pass against the same index
  *    (the candidate set only depends on the index, not prior passes);
  *  - qualityClassify keep ⇔ score ≥ 0.5 on arbitrary text (the flag
  *    and the rounded score must never disagree beyond the rounding
  *    boundary).
  */
object R5PropSpec extends Properties("r5-invariants") {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val wordGen: Gen[String] =
    Gen.choose(0, 11).map(i => s"w$i") // small vocab → real shingle overlap

  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 25)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 12)
      ws <- Gen.listOfN(len, wordGen)
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("ngramNovelty conserves the distinct-shingle count") =
    Prop.forAll(docsGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("doc_id", "text").repartition(4)
      val out = Dedup.ngramNovelty(df, "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val distinctShingles = rows.flatMap { case (_, t) =>
        val toks = t.split("\\s+").filter(_.nonEmpty)
        toks.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      }.toSet.size
      val totalNovel = out.map(_._3).sum
      val rowsOk = out.forall { case (_, nSh, nNov, nov) =>
        nNov <= nSh && nov >= 0.0 && nov <= 1.0 &&
          (nSh == 0L || nov == BigDecimal(nNov.toDouble / nSh)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      Prop(totalNovel == distinctShingles.toLong && rowsOk &&
        out.length == rows.length) :|
        s"novel=$totalNovel distinct=$distinctShingles rows=${out.length}/${rows.length}"
    }

  property("cross-corpus near-dup drops verbatim copies; pass is idempotent") =
    Prop.forAll(docsGen) { rows0 =>
      import spark.implicits._
      // corpus = even ids; batch = odd ids, where batch doc 2k+1 copies
      // corpus doc 2k's text verbatim when k is even (guaranteed dups)
      val corpus = rows0.map { case (i, t) => (i * 2, t) }
      val batch = rows0.map { case (i, t) =>
        (i * 2 + 1, if (i % 2 == 0) t else t + " w99 w98 w97 w96 w95 w94")
      }
      val corpusDf = corpus.toDF("doc_id", "text").repartition(3)
      val batchDf = batch.toDF("doc_id", "text").repartition(2)
      val idx = Dedup.nearDupCorpusIndex(corpusDf, "text", "doc_id")
      val kept1 = Dedup.dropNearDupsOfCorpus(batchDf, "text", "doc_id", idx, 0.5)
      val ids1 = kept1.select("doc_id").collect().map(_.getLong(0)).toSet
      val ids2 = Dedup.dropNearDupsOfCorpus(kept1, "text", "doc_id", idx, 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // verbatim copies with ≥1 shingle must drop
      val mustDrop = rows0.collect {
        case (i, t) if i % 2 == 0 &&
          t.split("\\s+").count(_.nonEmpty) >= 3 => i * 2 + 1
      }.toSet
      Prop(mustDrop.intersect(ids1).isEmpty && ids2 == ids1) :|
        s"kept=$ids1 second=$ids2 mustDrop=$mustDrop"
    }

  private val textGen: Gen[String] = for {
    len <- Gen.choose(0, 15)
    ws <- Gen.listOfN(len, Gen.oneOf(
      Gen.oneOf(TextAnalysisStop.words), wordGen, Gen.const("!!!"), Gen.const("a1.b2")))
  } yield ws.mkString(" ")

  property("qualityClassify: keep agrees with the unrounded score side") =
    Prop.forAll(Gen.listOfN(8, textGen)) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = TextAnalysis.qualityClassify(df, "text", "doc_id")
        .collect().map(r => (r.getDouble(4), r.getBoolean(5)))
      // rounded score and flag may only disagree inside the rounding
      // half-step around 0.5
      Prop(out.forall { case (s, k) =>
        if (k) s >= 0.4999 else s <= 0.5001
      }) :| out.mkString(",")
    }
}

private object TextAnalysisStop {
  val words = Seq("the", "and", "of", "to", "in", "is", "it", "that")
}
