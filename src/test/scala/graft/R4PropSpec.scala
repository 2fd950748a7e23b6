package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.PartitionPrune

/** Property tests for the round-4 invariants:
  *
  *  - PartitionPrune.firstNPerKey must be LOSSLESS for per-key top-N
  *    selection: pruning then exact-ranking equals plain exact-ranking
  *    on arbitrary data (any key skew, ties included — the rank's own
  *    tie-break decides, the prune only bounds frames);
  *  - a KnowDb select answered by SpillEnrich's join completion must
  *    produce exactly the fields the in-eval broadcast probe produces,
  *    for arbitrary dim values (the typing-parity promise of the
  *    spill path).
  */
object R4PropSpec extends Properties("r4-invariants") {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val rowsGen: Gen[List[(String, Long, Long)]] = for {
    nKeys <- Gen.choose(1, 5)
    n <- Gen.choose(1, 120)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0, nKeys - 1).map(i => s"k$i")
      v <- Gen.choose(0L, 20L) // narrow range → plenty of ties
      id <- Gen.choose(0L, 1000L)
    } yield (k, v, id))
  } yield rows

  property("firstNPerKey prune is lossless for per-key top-N") =
    Prop.forAll(rowsGen, Gen.choose(1, 6)) { (rows, n) =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val df = rows.toDF("key", "v", "id").repartition(4)
      val w = Window.partitionBy(col("key")).orderBy(col("v").desc, col("id").asc)
      def rank(d: org.apache.spark.sql.DataFrame) =
        d.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
          .select("key", "v", "id", "rn")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
          .toSet
      val plain = rank(df)
      val pruned = rank(PartitionPrune.firstNPerKey(df, "key",
        Seq(col("v").desc, col("id").asc), n))
      // sets can differ only when the rank's order has DUPLICATE sort
      // keys across partitions (both answers are then valid top-N
      // selections); with (v desc, id asc) over distinct (v,id) pairs
      // per key the selection is total, so require equality there
      val distinctPerKey = rows.groupBy(_._1).values
        .forall(g => g.map(r => (r._2, r._3)).distinct.size == g.size)
      if (distinctPerKey) plain == pruned
      else pruned.map(t => (t._1, t._4)).toSet == plain.map(t => (t._1, t._4)).toSet
    }

  private val cdcGen: Gen[(List[String], Int, String)] = for {
    n <- Gen.choose(1, 60)
    toks <- Gen.listOfN(n, Gen.oneOf((1 to 12).map(i => s"w$i")))
    p <- Gen.choose(0, n)
    ins <- Gen.oneOf((1 to 12).map(i => s"w$i"))
  } yield (toks, p, ins)

  property("CDC chunks re-align around an insertion (at most one chunk disturbed)") =
    Prop.forAll(cdcGen) { case (toks, p, ins) =>
      import graft.operators.Dedup
      val a = Dedup.cdcCut(toks, maskBits = 3)
      val b = Dedup.cdcCut(toks.take(p) ++ (ins :: toks.drop(p)), maskBits = 3)
      // boundaries depend only on token values, so every chunk of the
      // original except the one containing the insertion point survives
      // byte-identically (the inserted token may split its chunk in two)
      val pre = a.zip(b).takeWhile { case (x, y) => x == y }.size
      val suf = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.size
      val sufC = math.min(suf, math.min(a.size, b.size) - pre)
      (a.size - pre - sufC) <= 1
    }

  private val dimGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 9L)
      v <- Gen.oneOf(
        Gen.alphaNumStr.map(_.take(6)),
        Gen.choose(-999L, 999L).map(_.toString),
        Gen.oneOf("true", "false", "", "10.1.2.3", "007"))
    } yield (k, v))
  } yield rows.distinctBy(_._1) // unique keys: both routes then agree exactly

  property("spill-join enrich == in-eval KnowDb probe for arbitrary dim values") =
    Prop.forAll(dimGen) { dimRows =>
      import spark.implicits._
      import graft.engine.{Pipeline, WplEngine}
      val wpl = "package /c { rule r { (kvarr) } }"
      val oml =
        """name : m
          rule : /c/*
          ---
          ck : digit = take(option:[ck]) ;
          out = select v from d where k = read(nk) ;
        """
      val dim = dimRows.toDF("k", "v")
      val lines = (0L to 10L).map(i => (i, s"ck=$i nk=${i % 10}"))
        .toDF("rid", "line")
      def run(maxBytes: Long): Map[Long, String] =
        Pipeline.runWithDims(lines, "line", wpl, Seq(oml),
            dims = Map("d" -> dim), keep = Seq("rid"), maxDimBytes = maxBytes)
          .filter(col("status") === "ok")
          .select(col("rid"), WplEngine.extractString("out"))
          .collect().map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
      run(8L * 1024 * 1024) == run(1L)
    }
}
