package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Funnel, Metrics, Survival}

/** Property tests for the session-7 operator family:
  *
  *  - AUC is within [0, 1], invariant under strictly monotone score
  *    transforms (it only reads ranks), and complements under label
  *    flip (AUC + AUC' = 1);
  *  - transition-matrix rows are probability distributions (each
  *    prev-type's probabilities sum to 1 within rounding) and pair
  *    counts total n − 1 per user;
  *  - Kaplan–Meier survival is non-increasing in time and within
  *    [0, 1], with the at-risk count non-increasing too;
  *  - chi-square is non-negative and exactly 0 on an independent
  *    product table.
  */
object R8ePropSpec extends Properties("r8e-invariants") {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val scoredGen: Gen[List[(Long, Boolean)]] = for {
    n <- Gen.choose(2, 40)
    rows <- Gen.listOfN(n, for {
      sc <- Gen.choose(0L, 12L)
      y <- Gen.oneOf(true, false)
    } yield (sc, y))
    // need at least one positive and one negative for a defined AUC
    if rows.exists(_._2) && rows.exists(!_._2)
  } yield rows

  property("rank-sum AUC: bounded, monotone-invariant, complement under flip") =
    Prop.forAll(scoredGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("s", "y")
      def auc(d: org.apache.spark.sql.DataFrame): Double =
        Metrics.rankSumAuc(d, "s", col("y")).head().getDouble(2)
      val a = auc(df)
      // strictly monotone transform: s -> 7s + 3 preserves all ranks
      val aT = auc(df.select((col("s") * 7 + 3).as("s"), col("y")))
      val aF = auc(df.select(col("s"), (!col("y")).as("y")))
      (a >= 0.0 && a <= 1.0) :| s"bounded: $a" &&
        (a == aT) :| s"monotone-invariant: $a vs $aT" &&
        (math.abs(a + aF - 1.0) < 2e-6) :| s"complement: $a + $aF"
    }

  private val eventsGen: Gen[List[(Long, Long, String, Int)]] = for {
    n <- Gen.choose(2, 60)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 4L)
      ty <- Gen.oneOf("a", "b", "c")
      sec <- Gen.choose(0, 5000)
    } yield (u, ty, sec))
  } yield rows.zipWithIndex.map { case ((u, ty, sec), i) =>
    (i.toLong, u, ty, sec)
  }

  property("transition matrix: rows normalize to 1, counts total Σ(n_u − 1)") =
    Prop.forAll(eventsGen) { rows =>
      import spark.implicits._
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val ev = rows.map { case (id, u, ty, sec) =>
        (id, u, ty, new java.sql.Timestamp(base + sec * 1000L))
      }.toDF("event_id", "user_id", "event_type", "ts")
      val m = Funnel.transitionMatrix(ev).collect()
      val perUser = rows.groupBy(_._2).values.map(_.size - 1).sum
      val totalN = m.map(_.getLong(2)).sum
      val rowSums = m.groupBy(_.getString(0))
        .view.mapValues(_.map(_.getDouble(3)).sum).toMap
      (totalN == perUser) :| s"count total $totalN vs $perUser" &&
        rowSums.forall { case (_, p) => math.abs(p - 1.0) < 5e-4 } :|
          s"row sums: $rowSums"
    }

  property("Kaplan-Meier: survival and at-risk both non-increasing, in [0,1]") =
    Prop.forAll(eventsGen) { rows =>
      import spark.implicits._
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val ev = rows.map { case (id, u, ty, sec) =>
        (id, u, if (ty == "c") "purchase" else ty,
          new java.sql.Timestamp(base + sec * 1000L))
      }.toDF("event_id", "user_id", "event_type", "ts")
      val km = Survival.kaplanMeier(ev, "purchase")
        .orderBy(col("dur_h")).collect()
      val survs = km.map(_.getDouble(3))
      val risks = km.map(_.getLong(1))
      survs.forall(sv => sv >= 0.0 && sv <= 1.0) :| "bounded" &&
        survs.sliding(2).forall {
          case Array(x, y) => y <= x + 1e-9; case _ => true
        } :| s"monotone: ${survs.mkString(",")}" &&
        risks.sliding(2).forall {
          case Array(x, y) => y <= x; case _ => true
        } :| "at-risk monotone"
    }

  private val tableGen: Gen[(List[Int], List[Int])] = for {
    nr <- Gen.choose(2, 4)
    nc <- Gen.choose(2, 3)
    rm <- Gen.listOfN(nr, Gen.choose(1, 5))
    cm <- Gen.listOfN(nc, Gen.choose(1, 5))
  } yield (rm, cm)

  private val namesGen: Gen[List[String]] = for {
    n <- Gen.choose(2, 25)
    names <- Gen.listOfN(n, for {
      adj <- Gen.oneOf("red", "ted", "blue", "blu", "old", "bold", "hot")
      noun <- Gen.oneOf("bolt", "gear", "ring")
    } yield s"$adj $noun")
  } yield names

  property("blockedPairs: canonical order, threshold bound, monotone in maxDist") =
    Prop.forAll(namesGen) { names =>
      import spark.implicits._
      import graft.operators.FuzzyLink
      val df = names.toDF("p_name")
      val blockExpr = regexp_extract(col("name"), "[^ ]+$", 0)
      def pairs(d: Int) = FuzzyLink.blockedPairs(df, "p_name", blockExpr, d)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      val p2 = pairs(2)
      val p3 = pairs(3)
      p2.forall { case (a, b, d) => a < b && d <= 2 } :| "canonical+bound" &&
        p2.map(t => (t._1, t._2)).toSet
          .subsetOf(p3.map(t => (t._1, t._2)).toSet) :| "monotone in maxDist"
    }

  private val textGen: Gen[(Long, String)] = for {
    id <- Gen.choose(0L, 100000L)
    n <- Gen.choose(0, 120)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield (id, cs.mkString)

  property("fimTransform: P+M+S reassembles the doc; pivots respect the contract") =
    Prop.forAll(Gen.listOfN(6, textGen)) { rows0 =>
      import spark.implicits._
      val rows = rows0.zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }
      val out = graft.operators.Packing
        .fimTransform(rows.toDF("doc_id", "text"), "text", "doc_id")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
            if (r.isNullAt(3)) -1L else r.getLong(3), r.getString(4)))
        .toMap
      rows.forall { case (id, text) =>
        val (n, p1, p2, fim) = out(id)
        if (text.length < 20) fim == text && p1 == -1L
        else {
          val pre = fim.stripPrefix("<|fim_prefix|>")
            .split("<\\|fim_suffix\\|>")(0)
          val suf = fim.split("<\\|fim_suffix\\|>")(1)
            .split("<\\|fim_middle\\|>")(0)
          val mid = if (fim.endsWith("<|fim_middle|>")) ""
            else fim.split("<\\|fim_middle\\|>")(1)
          pre + mid + suf == text && p1 >= 1 && p1 <= n / 3 &&
            p2 > p1 && p2 - p1 <= n / 3 + 1 && mid.nonEmpty
        }
      } :| s"rows=$rows"
    }

  private val valuesGen: Gen[List[Double]] = for {
    n <- Gen.choose(2, 30)
    vs <- Gen.listOfN(n, Gen.choose(0, 10000).map(_ / 100.0))
    if vs.sum > 0
  } yield vs

  property("gini: bounded in [0, 1), scale-invariant") =
    Prop.forAll(valuesGen) { vs =>
      import spark.implicits._
      import graft.operators.Metrics
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val g = Metrics.gini(df, "v", "id").head().getDouble(2)
      val g3 = Metrics.gini(df.select(col("id"), (col("v") * 4).as("v")),
        "v", "id").head().getDouble(2)
      (g >= -1e-9 && g < 1.0) :| s"bounded: $g" &&
        (math.abs(g - g3) < 1e-4) :| s"scale-invariant: $g vs $g3"
    }

  property("chi-square: exactly 0 on a product table, never negative") =
    Prop.forAll(tableGen) { case (rm, cm) =>
      import spark.implicits._
      // O(r,c) = rm(r)·cm(c): independent by construction ⇒ χ² = 0
      val rows = for {
        (r, ri) <- rm.zipWithIndex
        (c, ci) <- cm.zipWithIndex
        _ <- 1 to (r * c)
      } yield (s"r$ri", s"c$ci")
      val df = rows.toDF("r", "c")
      val res = Metrics.chiSquare(df, col("r"), col("c")).head()
      (res.getDouble(0) == 0.0) :| s"product table chi2 ${res.getDouble(0)}" &&
        (res.getLong(1) == (rm.size - 1L) * (cm.size - 1L)) :| "dof"
    }
}
