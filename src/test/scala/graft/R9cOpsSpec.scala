package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.JaroWinklerSim
import graft.operators.SftPack

/** Round-9 widening: SFT chat-template packing — render + loss-mask
  * span offsets must be exact character arithmetic (a downstream
  * tokenizer projects them to token masks without re-parsing). */
class R9cOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Three conversations with out-of-order input rows, a tie on the
    * order column, and one conversation with no assistant turn. */
  private lazy val turnsDf: DataFrame = Seq(
    (1L, 2L, 20L, "assistant", "sure, here you go"),
    (1L, 1L, 10L, "user", "hello?"),
    (1L, 3L, 30L, "user", "thanks"),
    (1L, 4L, 40L, "assistant", "np"),
    (2L, 1L, 11L, "user", "solo"),
    (3L, 1L, 5L, "user", "tie-a"),
    (3L, 1L, 6L, "assistant", "tie-b")
  ).toDF("conv_id", "ord_v", "tie_v", "role_v", "content_v")

  private def rendered: DataFrame =
    SftPack.renderTurns(turnsDf, col("conv_id"), col("ord_v"),
      col("tie_v"), col("role_v"), col("content_v"))

  test("sft: every content span indexes its own content in the render") {
    // join each turn's span against the conversation render and check
    // substring(render, start, len) == content — for ALL turns, not
    // just masked ones (the mask is a filter over the same offsets)
    val cards = SftPack.conversationCards(rendered)
      .select(col("conv"), col("render_len"))
    val full = rendered.groupBy(col("conv"))
      .agg(concat_ws("", transform(
        sort_array(collect_list(struct(col("turn_idx"), col("piece")))),
        x => x.getField("piece"))).as("render"))
    val checked = rendered.join(full, "conv")
      .withColumn("cut", expr(
        "substring(render, cast(content_start as int), " +
          "cast(content_end - content_start + 1 as int))"))
    assert(checked.where(col("cut") =!= col("content")).count() == 0)
    // render_len equals the true rendered length
    val lens = cards.join(full, "conv")
      .where(col("render_len") =!= length(col("render")))
    assert(lens.count() == 0)
  }

  test("sft: mask spans cover exactly the assistant turns, in order") {
    val card = SftPack.conversationCards(rendered)
      .where(col("conv") === 1L).head
    assert(card.getAs[Long]("n_turns") == 4L)
    assert(card.getAs[Long]("n_mask_turns") == 2L)
    val spans = card.getAs[String]("mask_spans").split(";")
    assert(spans.length == 2)
    // manual render of conv 1 in (ord, tie) order
    val render = "<|user|>hello?<|end|>" +
      "<|assistant|>sure, here you go<|end|>" +
      "<|user|>thanks<|end|>" + "<|assistant|>np<|end|>"
    spans.foreach { s =>
      val Array(a, b) = s.split("-").map(_.toInt)
      val cut = render.substring(a - 1, b)
      assert(cut == "sure, here you go" || cut == "np")
    }
    assert(card.getAs[Long]("mask_chars") == 17L + 2L)
  }

  test("sft: no-assistant conversation yields empty mask, ratio 0") {
    val card = SftPack.conversationCards(rendered)
      .where(col("conv") === 2L).head
    assert(card.getAs[String]("mask_spans") == "")
    assert(card.getAs[Long]("mask_chars") == 0L)
    assert(card.getAs[Double]("mask_ratio") == 0.0)
  }

  test("sft: tie column breaks order ties deterministically; md5 is partition-invariant") {
    def md5of(parts: Int): String =
      SftPack.conversationCards(
        SftPack.renderTurns(turnsDf.repartition(parts), col("conv_id"),
          col("ord_v"), col("tie_v"), col("role_v"), col("content_v")))
        .where(col("conv") === 3L).head.getAs[String]("render_md5")
    assert(md5of(1) == md5of(7))
    // tie_v 5 < 6 => tie-a renders first
    val c3 = SftPack.conversationCards(rendered)
      .where(col("conv") === 3L).head
    val span = c3.getAs[String]("mask_spans")
    val render = "<|user|>tie-a<|end|>" + "<|assistant|>tie-b<|end|>"
    val Array(a, b) = span.split("-").map(_.toInt)
    assert(render.substring(a - 1, b) == "tie-b")
  }

  // --------------------------------------------------- cleaning signals

  test("cleaning signals: each damage class is counted exactly") {
    import graft.operators.CleaningSignals
    val docs = Seq(
      ("clean prose with no damage at all", "clean"),
      ("pre <div id=\"a\">x</div> see http://ex.com/path and <br> done", "html"),
      ("cafÃ© broke â€™ twice �� end", "moji"),
      ("fn main() {\n    let x = 1;\n\tcall(x);\n}", "code")
    ).toDF("text", "kind")
    val sig = docs.select(col("kind") +: CleaningSignals.signals(col("text")): _*)
      .collect().map(r => r.getAs[String]("kind") -> r).toMap
    assert(sig("clean").getAs[Boolean]("enc_clean"))
    assert(sig("clean").getAs[Long]("n_tags") == 0L)
    assert(sig("html").getAs[Long]("n_tags") == 3L) // div, /div, br
    assert(sig("html").getAs[Long]("n_links") == 1L)
    assert(sig("html").getAs[Long]("link_chars") == "http://ex.com/path".length)
    assert(sig("moji").getAs[Long]("n_mojibake") == 2L)
    assert(sig("moji").getAs[Long]("n_replacement") == 2L)
    assert(!sig("moji").getAs[Boolean]("enc_clean"))
    assert(sig("code").getAs[Long]("n_lines") == 4L)
    assert(sig("code").getAs[Long]("n_indented") == 2L) // 4-space + tab
    assert(sig("code").getAs[Double]("indented_frac") == 0.5)
  }

  // ------------------------------------------------- preference pairs

  test("pref-pairs: per-pair overlap/length signals and micro-averaged bias") {
    import graft.operators.PrefPairs
    val pairs = Seq(
      (1L, "the quick brown fox", "the quick brown fox"), // exact dup
      (2L, "a b c d", "c d e f"),                         // jaccard 2/6
      (3L, "longer answer here ok", "short"),
      (4L, "x", "")                                       // empty side
    ).toDF("id", "ch", "rj")
    val st = PrefPairs.pairStats(pairs, col("id"), col("ch"), col("rj"))
      .orderBy(col("pair_id")).collect()
    assert(st(0).getAs[Boolean]("exact_dup"))
    assert(st(0).getAs[Double]("tok_jaccard") == 1.0)
    assert(st(1).getAs[Long]("n_tok_inter") == 2L)
    assert(st(1).getAs[Long]("n_tok_union") == 6L)
    assert(st(1).getAs[Double]("tok_jaccard") == 0.3333)
    assert(st(2).getAs[Boolean]("chosen_longer"))
    // empty rejected: len_ratio NULL (guarded), union still counts ch
    assert(st(3).isNullAt(st(3).fieldIndex("len_ratio")))
    assert(st(3).getAs[Long]("n_tok_union") == 1L)
    val b = PrefPairs.biasSummary(
      PrefPairs.pairStats(pairs, col("id"), col("ch"), col("rj"))).head
    assert(b.getAs[Long]("n_pairs") == 4L)
    assert(b.getAs[Long]("n_exact_dup") == 1L)
    assert(b.getAs[Double]("pct_chosen_longer") == 0.5)
    // micro jaccard = (4 + 2 + 0 + 0) / (4 + 6 + 5 + 1)
    assert(b.getAs[Double]("micro_jaccard") == math.rint(6.0 / 16 * 1e4) / 1e4)
  }

  // ------------------------------------------------------ k-anonymity

  test("k-anonymity: smallest class, below-k mass, and l-diversity are exact") {
    // classes: (a,1)×5 sens {10,20}, (a,2)×2 sens {10}, (b,1)×3 sens {10,20,30}
    val rows = Seq.fill(3)(("a", 1, 10)) ++ Seq.fill(2)(("a", 1, 20)) ++
      Seq.fill(2)(("a", 2, 10)) ++ Seq(("b", 1, 10), ("b", 1, 20), ("b", 1, 30))
    val r = graft.operators.Pii.kAnonymity(
      rows.toDF("q1", "q2", "sens"), Seq("q1", "q2"), "sens", k = 4).head
    assert(r.getAs[Long]("k_anonymity") == 2L)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("n_rows_below_k") == 5L) // the 2-class + 3-class
    assert(r.getAs[Double]("pct_below_k") == 0.5)
    assert(r.getAs[Long]("l_diversity") == 1L) // (a,2) has one sens value
  }

  // -------------------------------------------------------------- acf

  test("acf: alternating series has r(1) = -1, r(2) = +1; constant is NULL") {
    import java.sql.Timestamp
    // 2 keys × 30 days: 'alt' alternates 1/3 events per day,
    // 'flat' has exactly 2 events per day (zero variance)
    val rows = (0 until 30).flatMap { day =>
      val ts = Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
      val alt = Seq.fill(if (day % 2 == 0) 1 else 3)(("alt", ts))
      val flat = Seq.fill(2)(("flat", ts))
      alt ++ flat
    }
    val acf = graft.operators.TimeSeries.acf(
      rows.toDF("event_type", "ts"), col("event_type"), col("ts"), 3)
    val alt = acf.where(col("k") === "alt")
      .orderBy(col("lag")).collect()
    assert(alt.map(_.getAs[Int]("lag")).toSeq == Seq(1, 2, 3))
    // sample ACF of a perfect alternation: r(1) near -1 (slightly above
    // for finite n with the n-denominator estimator), r(2) positive
    assert(alt(0).getAs[Double]("r") < -0.9)
    assert(alt(1).getAs[Double]("r") > 0.85)
    val flat = acf.where(col("k") === "flat" && col("lag") === 1).head
    assert(flat.isNullAt(flat.fieldIndex("r")),
      "zero-variance series must yield NULL, not NaN/divide-by-zero")
    assert(flat.getAs[Long]("n_pairs") == 29L)
  }

  test("acf: bit-identical under repartitioning") {
    import java.sql.Timestamp
    val rows = (0 until 60).flatMap { day =>
      Seq.fill(1 + (day * 7 % 5))(
        ("k", Timestamp.valueOf(f"2024-0${1 + day / 28}%d-${day % 28 + 1}%02d 01:00:00")))
    }
    def run(parts: Int) = graft.operators.TimeSeries.acf(
        rows.toDF("event_type", "ts").repartition(parts),
        col("event_type"), col("ts"), 5)
      .orderBy(col("lag")).collect().map(r => (r.getAs[Int]("lag"),
        r.getAs[Double]("r"))).toSeq
    assert(run(1) == run(13))
  }

  // ---------------------------------------------------- jaro–winkler

  /** Fixture values measured from DuckDB's jaro_winkler_similarity /
    * jaro_similarity this round — the oracle the expression replays. */
  private val jwFixture = Seq(
    ("MARTHA", "MARHTA", 0.9444444444444445, 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.7666666666666666, 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964, 0.8962962962962964),
    ("DUANE", "DWAYNE", 0.8222222222222223, 0.8400000000000001),
    ("CRATE", "TRACE", 0.7333333333333334, 0.7333333333333334),
    ("ABCQQQQQ", "ABZXWYUV", 0.5, 0.5), // jaro ≤ 0.7 → no boost
    ("AAAAB", "AAAAC", 0.8666666666666667, 0.92), // prefix cap 4
    ("ab", "abcdefghijklmnop", 0.7083333333333334, 0.7666666666666667),
    ("aXbXcX", "aYbYcY", 0.6666666666666666, 0.6666666666666666),
    ("ABCDE", "ABDCE", 0.9333333333333332, 0.9466666666666665),
    ("AB", "BA", 0.0, 0.0), // window 0: no matches
    ("", "ABC", 0.0, 0.0), ("", "", 0.0, 0.0), ("A", "A", 1.0, 1.0))

  test("jaro-winkler: bit-exact against the DuckDB fixture, interpreted + codegen") {
    jwFixture.foreach { case (a, b, jaro, jw) =>
      assert(JaroWinklerSim.jaro(a, b) == jaro, s"jaro($a,$b)")
      assert(JaroWinklerSim.jaroWinkler(a, b) == jw, s"jw($a,$b)")
    }
    // through the expression in a real plan (codegen path)
    val got = jwFixture.map { case (a, b, _, _) => (a, b) }
      .toDF("a", "b")
      .select(JaroWinklerSim.jaro_winkler_sim(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == jwFixture.map(_._4))
  }

  test("damerau-levenshtein: true (unrestricted) variant, DuckDB fixture") {
    import graft.functions.DamerauLevenshtein.distance
    // measured from DuckDB damerau_levenshtein this round; the CA→ABC
    // and BADC→ABCD rows are the unrestricted-vs-OSA witnesses
    val fx = Seq(("CA", "ABC", 2), ("AB", "BA", 1),
      ("kitten", "sitting", 3), ("abcdef", "abcfed", 2), ("", "abc", 3),
      ("", "", 0), ("a", "a", 0), ("ifhs", "fish", 2), ("BADC", "ABCD", 2))
    fx.foreach { case (a, b, d) =>
      assert(distance(a, b) == d, s"dl($a,$b)")
      assert(distance(b, a) == d, s"dl($b,$a) symmetry")
    }
    // dl never exceeds levenshtein; through the codegen path
    val words = Seq("alpha", "alpah", "lapha", "beta", "abte", "gamma",
      "magam", "", "x", "xy", "yx", "transpose", "trasnpose")
    val df = (for (a <- words; b <- words) yield (a, b)).toDF("a", "b")
      .select(col("a"), col("b"),
        graft.functions.DamerauLevenshtein
          .damerau_levenshtein(col("a"), col("b")).as("dl"),
        levenshtein(col("a"), col("b")).as("lev"))
    assert(df.where(col("dl") > col("lev")).count() == 0)
    assert(df.where(col("a") === col("b") && col("dl") =!= 0).count() == 0)
  }

  test("jaro-winkler: symmetric, in [0,1], and 1 iff equal (non-empty)") {
    val words = Seq("alpha", "alpah", "beta", "betta", "gamma", "gamm",
      "delta", "detla", "epsilon", "epsilon ", "x", "xy", "yx")
    for (a <- words; b <- words) {
      val ab = JaroWinklerSim.jaroWinkler(a, b)
      assert(ab == JaroWinklerSim.jaroWinkler(b, a), s"sym($a,$b)")
      assert(ab >= 0.0 && ab <= 1.0)
      if (a == b) assert(ab == 1.0)
    }
  }
}
