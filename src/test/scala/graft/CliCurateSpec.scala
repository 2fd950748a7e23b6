package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The wpcurate CLI front door: gate → exact dedup → near-dup index
  * probe → LM gate → shard write, driven through Cli.main end to end
  * with the on-disk artifacts built by wpindex. */
class CliCurateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("wpcurate batch: every stage drops its target; survivors land sharded") {
    import spark.implicits._
    spark
    val corpusTxt =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = Seq((100L, corpusTxt),
      (101L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val lmCorpus = Seq(
      (200L, "the quick brown fox jumps over the lazy dog again and again"),
      (201L, "a quick brown dog runs under the lazy fox today and tomorrow"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // keep
      (2L, "the quick brown fox jumps over the lazy dog today"), // exact dup
      (3L, corpusTxt.replace("mu", "nu")),                       // near-dup of corpus
      (4L, "zz qq pp ww rr ss tt uu vv xx yy"),                  // LM soup
      (5L, "a quick brown dog runs under the lazy fox and again")) // keep
      .toDF("doc_id", "text")

    val cDir = tmp("cur_corpus"); val lDir = tmp("cur_lmcorp")
    val bDir = tmp("cur_batch"); val ndIdx = tmp("cur_nd_idx")
    val lmIdx = tmp("cur_lm_idx"); val outDir = tmp("cur_out")
    corpus.write.mode("overwrite").parquet(cDir)
    lmCorpus.write.mode("overwrite").parquet(lDir)
    batch.write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpindex", "build", "neardup", cDir, ndIdx))
    graft.cli.Cli.main(Array("wpindex", "build", "lm", lDir, lmIdx))
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, outDir,
      "--index", ndIdx, "--lm", lmIdx,
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--min-logprob", "-4.0", "--shards", "2"))

    val out = spark.read.parquet(outDir)
    assert(out.columns.contains("shard"))
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L), s"kept=$kept")
  }

  test("wpcurate batch --blocklist: docs containing a listed phrase drop") {
    import spark.implicits._
    spark
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),  // keep
      (2L, "buy cheap pills online now from the quick brown fox"), // blocked
      (3L, "visit casino royale tonight for the lazy dog special"), // blocked
      (4L, "an ordinary sentence about foxes and dogs and sheep")) // keep
      .toDF("doc_id", "text")
    val bDir = tmp("bl_batch"); val outDir = tmp("bl_out")
    batch.write.mode("overwrite").parquet(bDir)
    val blFile = java.nio.file.Files.createTempFile("bl", ".txt")
    java.nio.file.Files.writeString(blFile,
      "# demo blocklist\ncheap pills\ncasino royale\n\n")
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, outDir,
      "--blocklist", blFile.toString,
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--shards", "1"))
    val kept = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L), s"kept=$kept")
  }

  test("wpcurate batch --encclean: encoding-damaged docs drop") {
    import spark.implicits._
    spark
    val batch = Seq(
      // doc 1 needs >= 2 Gopher stop words to clear the upstream
      // quality gate — encclean is the gate under test here
      (1L, "the quick clean sentence is about the foxes of today"), // keep
      (2L, "broken cafÃ© mojibake text with damage inside here"), // moji
      (3L, "this one carries a replacement � character in it now"), // fffd
      (4L, "another clean and healthy document body for the gate")) // keep
      .toDF("doc_id", "text")
    val bDir = tmp("enc_batch"); val outDir = tmp("enc_out")
    batch.write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, outDir,
      "--encclean",
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--shards", "1"))
    val kept = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L), s"kept=$kept")
  }

  test("wpcurate daemon --once --encclean: the encoding gate streams") {
    import spark.implicits._
    spark
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"), // keep
      (2L, "damaged controlcharacter document body right here ok")) // ctl
      .toDF("doc_id", "text")
    val inDir = tmp("encdb_in"); val outDir = tmp("encdb_out")
    batch.write.mode("overwrite").parquet(inDir)
    graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
      "--encclean", "--once",
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000"))
    val kept = spark.read.parquet(s"$outDir/accepted")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"kept=$kept")
  }

  test("wpcurate batch --min-stopwords 0: a stop-word-free corpus gates through") {
    import spark.implicits._
    spark
    // zero English stop words anywhere — under the default floor (2)
    // every doc dies at the 'stopwords' gate; with the floor relaxed
    // per corpus the rest of the battery still applies
    val batch = Seq(
      (1L, "casa verde monte lago puerta cielo tierra viento fuego agua"),
      (2L, "luna estrella camino puente plaza torre campo norte mar sol"))
      .toDF("doc_id", "text")
    val bDir = tmp("stopw_batch")
    batch.write.mode("overwrite").parquet(bDir)

    val strictOut = tmp("stopw_strict")
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, strictOut,
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--shards", "1"))
    // everything dropped → the writer emits nothing readable
    val strictKept =
      scala.util.Try(spark.read.parquet(strictOut).count()).getOrElse(0L)
    assert(strictKept == 0L, s"default floor should drop all: $strictKept")

    val outDir = tmp("stopw_out")
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, outDir,
      "--min-stopwords", "0",
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--shards", "1"))
    val kept = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), s"kept=$kept")
  }

  test("wpcurate batch --max-symbol-ratio: a code-symbol corpus gates through") {
    import spark.implicits._
    spark
    // '#'-dense doc: symbol_ratio counts [#…] chars per word — over the
    // 0.1 default, under a raised bound
    val batch = Seq(
      (1L, "the build of section # one # and # two # done # here # now"))
      .toDF("doc_id", "text")
    val bDir = tmp("sym_batch")
    batch.write.mode("overwrite").parquet(bDir)
    val strictOut = tmp("sym_strict")
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, strictOut,
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--min-word-len", "1.0",
      "--shards", "1"))
    assert(scala.util.Try(spark.read.parquet(strictOut).count())
      .getOrElse(0L) == 0L)
    val outDir = tmp("sym_out")
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, outDir,
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--min-word-len", "1.0", "--max-symbol-ratio", "1.0",
      "--min-alpha-frac", "0.5",
      "--shards", "1"))
    assert(spark.read.parquet(outDir).count() == 1)
  }

  test("wpcurate batch --split: near-dup twins land on the same side") {
    import spark.implicits._
    spark
    // every text needs >= 2 stopwords or the upstream quality gate —
    // not the split under test — drops it (see the --dsir fixture note)
    val batch = Seq(
      (1L, "the alpha and beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "the alpha and beta gamma delta epsilon zeta eta theta iota lambda"), // near-dup of 1
      (3L, "the one and two three four five six seven eight nine"),
      (4L, "the red and orange yellow green blue indigo violet pink"),
      (5L, "the north and south east west upward down left right"),
      (6L, "the cat and dog bird fish horse cow sheep goat"))
      .toDF("doc_id", "text")
    val bDir = tmp("split_batch"); val outDir = tmp("split_out")
    batch.write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, outDir,
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--split", "0.5", "--shards", "2"))
    val train = spark.read.parquet(s"$outDir/train")
    val eval_ = spark.read.parquet(s"$outDir/eval")
    val tIds = train.select("doc_id").as[Long].collect().toSet
    val eIds = eval_.select("doc_id").as[Long].collect().toSet
    assert((tIds ++ eIds) == Set(1L, 2L, 3L, 4L, 5L, 6L), s"t=$tIds e=$eIds")
    assert((tIds & eIds).isEmpty)
    assert(tIds.contains(1L) == tIds.contains(2L), "near-dup twins split apart")
    assert(train.columns.contains("shard") && eval_.columns.contains("shard"))
  }

  test("wpcurate batch --dsir: off-target docs drop at the importance gate") {
    import spark.implicits._
    spark
    // reference pool: the English slice is the target distribution,
    // the German slice contributes junk bigrams to the raw pool only
    val refPool = Seq(
      (300L, "good clean prose with structure and care", "en"),
      (301L, "good clean prose with style and structure", "en"),
      (302L, "zz xx qq ww vv kk zz xx", "de"),
      (303L, "zz xx qq ww vv jj zz xx", "de"))
      .toDF("doc_id", "text", "lang")
    val batch = Seq(
      (1L, "good clean prose with care and style"), // target-like: keep
      (2L, "zz xx qq ww vv kk qq ww"))              // raw-junk: drop
      .toDF("doc_id", "text")

    val rDir = tmp("dsir_ref_pool"); val dsirIdx = tmp("dsir_ref_idx")
    val bDir = tmp("dsir_batch"); val outDir = tmp("dsir_out")
    refPool.write.mode("overwrite").parquet(rDir)
    batch.write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpindex", "build", "dsir", rDir, dsirIdx,
      "--buckets", "64"))
    // floor −1.0: the target-like doc lands at ≈ −0.19 (64-bucket
    // collisions smear a little junk mass onto its grams), the junk doc
    // at ≈ −4.1 — the gate must separate them
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, outDir,
      "--dsir", dsirIdx, "--min-logw", "-1.0",
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--shards", "1"))

    val kept = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"kept=$kept")
  }

  test("wpcurate batch --lr: the trained-classifier gate drops off-target docs") {
    import spark.implicits._
    spark
    val pool = ((1 to 10).map(i =>
        (100L + i, "good clean prose with structure and care", "en")) ++
      (11 to 20).map(i =>
        (100L + i, "zz xx qq ww vv kk zz xx", "de")))
      .toDF("doc_id", "text", "lang")
    val batch = Seq(
      (1L, "good clean prose with care and structure"), // target-like: keep
      (2L, "zz xx qq ww vv kk qq ww"))                  // junk: drop
      .toDF("doc_id", "text")
    val poolDir = tmp("lr_gate_pool"); val modelDir = tmp("lr_gate_model")
    val bDir = tmp("lr_gate_batch"); val outDir = tmp("lr_gate_out")
    pool.write.mode("overwrite").parquet(poolDir)
    batch.write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpindex", "build", "lr", poolDir, modelDir,
      "--iters", "3"))
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, outDir,
      "--lr", modelDir,
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--shards", "1"))
    val kept = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"kept=$kept")
  }

  test("wpcurate batch --fim: survivors land sharded in PSM render") {
    import spark.implicits._
    spark
    val bDir = tmp("fim_batch"); val outDir = tmp("fim_out")
    Seq((1L, "the quick brown fox jumps over the lazy dog again today"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, outDir, "--fim",
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--shards", "1"))
    val rows = spark.read.parquet(outDir).collect()
    assert(rows.length == 1)
    val text = rows.head.getAs[String]("text")
    assert(text.startsWith("<|fim_prefix|>") &&
      text.contains("<|fim_suffix|>") && text.contains("<|fim_middle|>"),
      s"sharded text must be the PSM render: $text")
    // --fim + --split must refuse (split mines clusters on original text)
    val err = intercept[IllegalArgumentException] {
      graft.cli.Cli.main(Array("wpcurate", "batch", bDir, tmp("fim_out2"),
        "--fim", "--split", "0.1"))
    }
    assert(err.getMessage.contains("--fim and --split"))
  }

  test("wpcurate compact: compaction, sorted, and z-order layouts through the CLI") {
    import spark.implicits._
    spark
    val inDir = tmp("cmp_in")
    (for { a <- 0 until 32; b <- 0 until 32 } yield (a.toLong, b.toLong))
      .toDF("a", "b").repartition(20)
      .write.mode("overwrite").parquet(inDir)
    // default compaction: fewer files, same rows
    val cDir = tmp("cmp_out")
    graft.cli.Cli.main(Array("wpcurate", "compact", inDir, cDir))
    assert(spark.read.parquet(cDir).count() == 1024L)
    assert(new java.io.File(cDir).listFiles()
      .count(_.getName.endsWith(".parquet")) <
      new java.io.File(inDir).listFiles()
        .count(_.getName.endsWith(".parquet")))
    // z-order: both dims bounded per file
    val zDir = tmp("cmp_z")
    graft.cli.Cli.main(Array("wpcurate", "compact", inDir, zDir,
      "--zorder", "a,b", "--files", "8"))
    val spans = spark.read.parquet(zDir)
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg((max(col("a")) - min(col("a"))).as("sa"),
        (max(col("b")) - min(col("b"))).as("sb"))
      .collect()
    assert(spans.forall(r => r.getLong(1) < 32L && r.getLong(2) < 32L),
      "each z-ordered file must cover a sub-rectangle")
    // sorted layout: leading column spans are disjoint-ish slabs
    val sDir = tmp("cmp_s")
    graft.cli.Cli.main(Array("wpcurate", "compact", inDir, sDir,
      "--sort", "a", "--files", "8"))
    assert(spark.read.parquet(sDir).count() == 1024L)
  }

  test("wpcurate batch --substr: mosaic-of-corpus docs drop at the dup-fraction gate") {
    import spark.implicits._
    spark
    val corpus = Seq(
      (400L, "alpha beta gamma delta epsilon zeta eta theta"),
      (401L, "one two three four five six seven eight")).toDF("doc_id", "text")
    // both docs carry stopwords so the upstream quality gate passes them —
    // the substr gate must be what separates them
    val batch = Seq(
      // 8 of 11 tokens verbatim from doc400 (dup_frac ≈ 0.73) → drop
      (1L, "alpha beta gamma delta epsilon zeta eta theta and the of"),
      // entirely novel → keep
      (2L, "the fresh material with no overlap of corpus at all"))
      .toDF("doc_id", "text")
    val cDir = tmp("ss_corpus"); val ssIdx = tmp("ss_idx")
    val bDir = tmp("ss_batch"); val outDir = tmp("ss_out")
    corpus.write.mode("overwrite").parquet(cDir)
    batch.write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpindex", "build", "substr", cDir, ssIdx,
      "--win", "4"))
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, outDir,
      "--substr", ssIdx, "--max-dupfrac", "0.5",
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--shards", "1"))
    val kept = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"kept=$kept")
  }

  test("wpcurate daemon --once: drains the landing dir through the same stages") {
    import spark.implicits._
    spark
    val corpusTxt =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = Seq((100L, corpusTxt)).toDF("doc_id", "text")
    val lmCorpus = Seq(
      (200L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"), // keep
      (3L, corpusTxt.replace("mu", "nu")),                       // near-dup
      (4L, "zz qq pp ww rr ss tt uu vv xx yy"))                  // LM soup
      .toDF("doc_id", "text")
    val cDir = tmp("curd_corpus"); val lDir = tmp("curd_lmcorp")
    val inDir = tmp("curd_in"); val ndIdx = tmp("curd_nd")
    val lmIdx = tmp("curd_lm"); val outDir = tmp("curd_out")
    corpus.write.mode("overwrite").parquet(cDir)
    lmCorpus.write.mode("overwrite").parquet(lDir)
    batch.write.mode("overwrite").parquet(inDir)
    graft.cli.Cli.main(Array("wpindex", "build", "neardup", cDir, ndIdx))
    graft.cli.Cli.main(Array("wpindex", "build", "lm", lDir, lmIdx))
    graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
      "--index", ndIdx, "--lm", lmIdx, "--once",
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--min-logprob", "-4.0"))
    val kept = spark.read.parquet(s"$outDir/accepted")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"kept=$kept")
  }

  test("wpcurate daemon --once --blocklist: the phrase gate streams") {
    import spark.implicits._
    spark
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"), // keep
      (2L, "click here to buy cheap pills online right now ok")) // blocked
      .toDF("doc_id", "text")
    val inDir = tmp("curdb_in"); val outDir = tmp("curdb_out")
    batch.write.mode("overwrite").parquet(inDir)
    val blFile = java.nio.file.Files.createTempFile("bld", ".txt")
    java.nio.file.Files.writeString(blFile, "cheap pills\n")
    graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
      "--blocklist", blFile.toString, "--once",
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000"))
    val kept = spark.read.parquet(s"$outDir/accepted")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"kept=$kept")
  }

  test("wpcurate batch --freq: rows from over-budget (grp, key) pairs drop") {
    import spark.implicits._
    spark
    // corpus: srcA already has 3 en docs, srcB has 1
    val corpus = (0 until 3).map(i => (100L + i, s"corpus doc number $i words", "en", "srcA")) :+
      ((200L, "one corpus doc here now", "en", "srcB"))
    val batch = Seq(
      (1L, "this is a fresh doc and it is from the flooded source", "en", "srcA"),  // over cap
      (2L, "this is a fresh doc and it is from the quiet source", "en", "srcB")) // under cap
      .toDF("doc_id", "text", "lang", "source")
    val cDir = tmp("fq_corpus"); val bDir = tmp("fq_batch")
    val idx = tmp("fq_idx"); val outDir = tmp("fq_out")
    corpus.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(cDir)
    batch.write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpindex", "build", "freq", cDir, idx,
      "--grp-col", "lang", "--key-col", "source"))
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, outDir,
      "--freq", idx, "--freq-grp", "lang", "--freq-key", "source",
      "--freq-cap", "3",
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--shards", "1"))
    val kept = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"srcA is at its budget of 3, kept=$kept")
  }

  test("wpcurate batch --member: rows whose key the corpus holds verbatim drop") {
    import spark.implicits._
    spark
    val corpus = Seq(
      (100L, "this is a doc of the corpus and it already holds it today"),
      (101L, "this is some other doc of the corpus and it holds it now"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "this is a doc of the corpus and it already holds it today"), // member
      (2L, "this is a brand new doc of the corpus and it is unseen")) // novel
      .toDF("doc_id", "text")
    val cDir = tmp("mb_corpus"); val bDir = tmp("mb_batch")
    val idx = tmp("mb_idx"); val outDir = tmp("mb_out")
    corpus.write.mode("overwrite").parquet(cDir)
    batch.write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpindex", "build", "member", cDir, idx,
      "--key-col", "text", "--m-exp", "12"))
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, outDir,
      "--member", idx,
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--shards", "1"))
    val kept = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"doc 1 is already in the corpus, kept=$kept")
  }

  test("wpcurate daemon --member: the exact membership gate streams per micro-batch") {
    import spark.implicits._
    spark
    val cDir = tmp("dmb_corpus"); val idx = tmp("dmb_idx")
    val inDir = tmp("dmb_in"); val outDir = tmp("dmb_out")
    Seq((100L, "this is a doc of the corpus and it already holds it today"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(cDir)
    graft.cli.Cli.main(Array("wpindex", "build", "member", cDir, idx,
      "--key-col", "text", "--m-exp", "12"))
    Seq(
      (1L, "this is a doc of the corpus and it already holds it today"),
      (2L, "this is a brand new doc of the corpus and it is unseen"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(inDir)
    graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
      "--member", idx, "--once"))
    val kept = spark.read.parquet(s"$outDir/accepted")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"kept=$kept")
  }

  test("wpcurate daemon --freq: the per-key rate limit streams per micro-batch") {
    import spark.implicits._
    spark
    val cDir = tmp("dfq_corpus"); val idx = tmp("dfq_idx")
    val inDir = tmp("dfq_in"); val outDir = tmp("dfq_out")
    ((0 until 5).map(i => (100L + i, s"corpus doc number $i words", "en", "srcA")) :+
      ((200L, "one corpus doc here now", "en", "srcB")))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(cDir)
    graft.cli.Cli.main(Array("wpindex", "build", "freq", cDir, idx,
      "--grp-col", "lang", "--key-col", "source"))
    Seq(
      (1L, "this is a fresh doc and it is from the flooded source", "en", "srcA"),
      (2L, "this is a fresh doc and it is from the quiet source", "en", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(inDir)
    graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
      "--freq", idx, "--freq-grp", "lang", "--freq-key", "source",
      "--freq-cap", "5", "--once"))
    val kept = spark.read.parquet(s"$outDir/accepted")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"srcA is at its budget of 5, kept=$kept")
  }

  test("wpcurate daemon --once with --dsir and --substr: all five gates stream") {
    import spark.implicits._
    spark
    val refPool = Seq(
      (300L, "good clean prose with structure and care", "en"),
      (301L, "good clean prose with style and structure", "en"),
      (302L, "zz xx qq ww vv kk zz xx", "de"))
      .toDF("doc_id", "text", "lang")
    val ssCorpus = Seq(
      (400L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "good clean prose with care and style"),                  // keep
      (2L, "zz xx qq ww vv kk qq ww"),                               // DSIR drop
      (3L, "alpha beta gamma delta epsilon zeta eta theta and the")) // substr drop
      .toDF("doc_id", "text")
    val rDir = tmp("d5_ref"); val sDir = tmp("d5_ss"); val inDir = tmp("d5_in")
    val dsirIdx = tmp("d5_dsir"); val ssIdx = tmp("d5_ssidx")
    val outDir = tmp("d5_out")
    refPool.write.mode("overwrite").parquet(rDir)
    ssCorpus.write.mode("overwrite").parquet(sDir)
    batch.write.mode("overwrite").parquet(inDir)
    graft.cli.Cli.main(Array("wpindex", "build", "dsir", rDir, dsirIdx,
      "--buckets", "64"))
    graft.cli.Cli.main(Array("wpindex", "build", "substr", sDir, ssIdx,
      "--win", "4"))
    graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
      "--dsir", dsirIdx, "--min-logw", "-1.0",
      "--substr", ssIdx, "--max-dupfrac", "0.5", "--once",
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000"))
    val kept = spark.read.parquet(s"$outDir/accepted")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"kept=$kept")
  }

  test("wpcurate daemon --drift: alert prints when the batch distribution shifts") {
    import spark.implicits._
    spark
    val refDir = tmp("drift_ref"); val idxDir = tmp("drift_idx")
    val inDir = tmp("drift_in"); val outDir = tmp("drift_out")
    // reference: en docs with n_chars clustered near 100
    (0 until 50).map(i => (i.toLong, "ref text", "en", 100L + (i % 3) * 5))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(refDir)
    graft.cli.Cli.main(Array("wpindex", "build", "drift", refDir, idxDir,
      "--grp-col", "lang", "--val-col", "n_chars", "--bin-width", "20.0"))
    // incoming batch: same lang, n_chars an order of magnitude away
    (100 until 120).map(i => (i.toLong, "new text", "en", 900L + i))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(inDir)
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
        "--drift", idxDir, "--drift-grp", "lang", "--drift-val", "n_chars",
        "--drift-ks", "0.5",
        "--once"))
    }
    assert(buf.toString.contains("DRIFT en"), s"stdout was: ${buf.toString}")
    // disjoint supports → KS sup-gap 1.0 clears the 0.5 alert floor
    assert(buf.toString.contains("DRIFT-KS en"), s"stdout was: ${buf.toString}")
    // and the rows still flowed through
    assert(spark.read.parquet(s"$outDir/accepted").count() == 20)
  }

  test("wpcurate daemon --drift-cusum: sustained small shift accumulates to an alarm") {
    import spark.implicits._
    spark
    val refDir = tmp("cusum_ref"); val idxDir = tmp("cusum_idx")
    val inDir = tmp("cusum_in"); val outDir = tmp("cusum_out")
    val stage = tmp("cusum_stage")
    // reference: en n_chars in {100,105,110} → binWidth 2 moments
    // μ≈105.56, σ≈4.08 (histogram midpoints); plus an xx group so the
    // all-null-batch guard below exercises a group WITH moments
    ((0 until 50).map(i => (i.toLong, "ref text", "en", 100L + (i % 3) * 5))
      ++ (0 until 10).map(i => (100L + i, "ref text", "xx", 100L)))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(refDir)
    graft.cli.Cli.main(Array("wpindex", "build", "drift", refDir, idxDir,
      "--grp-col", "lang", "--val-col", "n_chars", "--bin-width", "2.0"))
    // six 10-doc batches at n_chars=112: per-batch deviation
    // x̄−μ−0.5σ ≈ 4.4 ≈ 1.1σ — BELOW any single-batch alarm, but the
    // walk crosses hσ=16.3 at batch 4 → alarms on batches 4,5,6 only
    for (b <- 1 to 6) {
      val sd = s"$stage/b$b"
      // batch 1 carries an extra all-null group: the walk must skip a
      // null per-group mean, never NPE the daemon
      val extra = if (b == 1)
        Seq((999L, "null text", "xx", None: Option[Long])) else Seq.empty
      ((0 until 10).map(i =>
          (b * 100L + i, "drift text", "en", Some(112L): Option[Long]))
        ++ extra)
        .toDF("doc_id", "text", "lang", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(sd)
      Option(new java.io.File(sd).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, i) =>
          java.nio.file.Files.copy(f.toPath,
            new java.io.File(inDir, s"b$b-$i.parquet").toPath)
        }
    }
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
        "--drift", idxDir, "--drift-grp", "lang", "--drift-val", "n_chars",
        "--drift-cusum", "4.0", "--max-files", "1", "--once"))
    }
    val alarms = "wpcurate: DRIFT-CUSUM en".r
      .findAllIn(buf.toString).length
    assert(alarms >= 1, s"walk never crossed hσ; stdout: ${buf.toString}")
    // sustained-shift semantics: the FIRST batches must NOT alarm —
    // an every-batch alarm would mean a per-batch threshold in
    // disguise, not an accumulating walk
    assert(alarms <= 4, s"alarmed on $alarms of 6 batches — walk is " +
      s"not accumulating; stdout: ${buf.toString}")
    assert(spark.read.parquet(s"$outDir/accepted").count() == 61)
  }

  test("wpcurate daemon --drift-cusum: sigma=0 reference groups are excluded, not every-batch alarms") {
    import spark.implicits._
    spark
    val refDir = tmp("cusum0_ref"); val idxDir = tmp("cusum0_idx")
    val inDir = tmp("cusum0_in"); val outDir = tmp("cusum0_out")
    // en varies (σ>0); zz is CONSTANT → histogram-midpoint σ=0 — the
    // r12 ADVICE finding: with σ=0 the slack and the alarm limit both
    // collapse to 0 and ANY positive deviation alarms from batch 1,
    // degenerating the walk into a per-batch gate for that group
    ((0 until 30).map(i => (i.toLong, "ref", "en", 100L + (i % 3) * 5))
      ++ (0 until 30).map(i => (100L + i, "ref", "zz", 100L)))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(refDir)
    graft.cli.Cli.main(Array("wpindex", "build", "drift", refDir, idxDir,
      "--grp-col", "lang", "--val-col", "n_chars", "--bin-width", "2.0"))
    // one batch with zz WAY off its constant (200 vs 100): without the
    // exclusion this alarms immediately
    (0 until 10).map(i => (1000L + i, "batch text ok", "zz", 200L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(inDir)
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
        "--drift", idxDir, "--drift-grp", "lang", "--drift-val", "n_chars",
        "--drift-cusum", "4.0", "--max-files", "1", "--once"))
    }
    val out = buf.toString
    assert(out.contains("DRIFT-CUSUM excluding sigma=0 group(s) zz"),
      s"exclusion must be announced once; stdout: $out")
    assert(!out.contains("DRIFT-CUSUM zz"),
      s"a sigma=0 group must not enter the walk; stdout: $out")
  }

  test("wpcurate daemon --monitor-key: per-batch HLL cardinality line prints") {
    import spark.implicits._
    spark
    val inDir = tmp("mon_in"); val outDir = tmp("mon_out")
    // 40 rows over 7 distinct langs — small regime: HLL linear counting
    // is exact on register count, estimate lands within a hair of 7
    (0 until 40).map(i => (i.toLong, "some text", s"lang${i % 7}"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(inDir)
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
        "--monitor-key", "lang", "--once"))
    }
    val line = buf.toString.linesIterator
      .find(_.contains("MONITOR")).getOrElse("")
    assert(line.contains("accepted=40"), s"stdout was: ${buf.toString}")
    val est = line.split("distinct_lang=").last.trim.toDouble
    assert(math.abs(est - 7.0) < 0.1, s"est=$est")
  }

  test("wpcurate batch --mediasig: perceptual re-encodes drop at the media gate") {
    import spark.implicits._
    import TestMedia.randBmp
    spark
    val mDir = tmp("mg_media"); val bDir = tmp("mg_batch")
    val idxDir = tmp("mg_idx"); val outDir = tmp("mg_out")
    // media corpus: two known images
    Seq((900L, randBmp(10L)), (901L, randBmp(50L)))
      .toDF("img_id", "media")
      .write.mode("overwrite").parquet(mDir)
    graft.cli.Cli.main(Array("wpindex", "build", "mediasig", mDir, idxDir,
      "--id-col", "img_id"))
    // batch: doc 1 carries a re-encode of a known image, doc 2 is novel
    Seq(
      (1L, "the quick and brown fox jumps over the lazy dog today",
        randBmp(10L, bump = true)),
      (2L, "the slow and gray wolf walks under the bright moon tonight",
        randBmp(4242L)))
      .toDF("doc_id", "text", "media")
      .write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpcurate", "batch", bDir, outDir,
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000",
      "--mediasig", idxDir, "--shards", "1"))
    val kept = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"kept=$kept")
  }

  test("wpcurate daemon --mediasig: the media gate streams per micro-batch") {
    import spark.implicits._
    import TestMedia.randBmp
    spark
    val mDir = tmp("dmg_media"); val inDir = tmp("dmg_in")
    val idxDir = tmp("dmg_idx"); val outDir = tmp("dmg_out")
    Seq((900L, randBmp(10L))).toDF("img_id", "media")
      .write.mode("overwrite").parquet(mDir)
    graft.cli.Cli.main(Array("wpindex", "build", "mediasig", mDir, idxDir,
      "--id-col", "img_id"))
    Seq((1L, "re-encode text", randBmp(10L, bump = true)),
        (2L, "novel text", randBmp(4242L)))
      .toDF("doc_id", "text", "media")
      .write.mode("overwrite").parquet(inDir)
    graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
      "--mediasig", idxDir, "--once"))
    val kept = spark.read.parquet(s"$outDir/accepted")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"kept=$kept")
  }

  test("wpcurate daemon --lr: the trained-classifier gate streams per micro-batch") {
    import spark.implicits._
    spark
    val poolDir = tmp("dlr_pool"); val modelDir = tmp("dlr_model")
    val inDir = tmp("dlr_in"); val outDir = tmp("dlr_out")
    ((1 to 10).map(i => (100L + i, "good clean prose with structure", "en")) ++
      (11 to 20).map(i => (100L + i, "zz xx qq ww vv kk", "de")))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(poolDir)
    graft.cli.Cli.main(Array("wpindex", "build", "lr", poolDir, modelDir,
      "--iters", "3"))
    Seq((1L, "good clean prose with structure intact"),
        (2L, "zz xx qq ww vv kk vv ww"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(inDir)
    graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
      "--lr", modelDir, "--once"))
    val kept = spark.read.parquet(s"$outDir/accepted")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"kept=$kept")
  }

  test("wpcurate daemon --card: novelty lines print and the profile folds the batch in") {
    import spark.implicits._
    spark
    val refDir = tmp("card_ref"); val idxDir = tmp("card_didx")
    val inDir = tmp("card_in"); val outDir = tmp("card_dout")
    (1 to 20).map(i => (i.toLong, s"known text $i", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(refDir)
    graft.cli.Cli.main(Array("wpindex", "build", "card", refDir, idxDir,
      "--grp-col", "lang", "--key-col", "text"))
    Seq((100L, "known text 1", "en"), (101L, "brand new text", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(inDir)
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
        "--card", idxDir, "--card-grp", "lang", "--once"))
    }
    val line = buf.toString.linesIterator
      .find(_.contains("NOVELTY en")).getOrElse("")
    assert(line.nonEmpty, s"stdout was: ${buf.toString}")
    val newEst = line.split("new=").last.split(" ").head.toDouble
    assert(newEst > 0.4 && newEst < 2.0, s"line=$line")
    // the daemon folded the batch in: a fresh probe of the same batch
    // against the updated profile finds nothing new
    val nov2 = graft.operators.Cardinality.CardRef.load(spark, idxDir)
      .noveltyOf(spark.read.parquet(inDir), "lang", "text")
      .select("novelty").head().getDouble(0)
    assert(nov2 == 0.0)
  }

  test("wpcurate daemon restart: checkpoint replays nothing, drains only new files") {
    import spark.implicits._
    spark
    val inDir = tmp("restart_in"); val outDir = tmp("restart_out")
    // land parquet FILES flat in the dir, like a real file drop
    def land(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val stage = tmp(s"restart_stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(inDir, s"$name.parquet"))
      ()
    }
    land("b1", Seq((1L, "the first doc with plenty of good and clean words"))
      .toDF("doc_id", "text"))
    // run 1: drains b1
    graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir, "--once",
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000"))
    val after1 = spark.read.parquet(s"$outDir/accepted")
      .select("doc_id").as[Long].collect().toList
    assert(after1 == List(1L), s"after1=$after1")
    // land a second file, run 2 with the SAME checkpoint
    land("b2", Seq((2L, "the second doc with plenty of good and clean words"))
      .toDF("doc_id", "text"))
    graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir, "--once",
      "--min-words", "3", "--min-entropy", "2.0", "--min-score", "-1000000"))
    val after2 = spark.read.parquet(s"$outDir/accepted")
      .select("doc_id").as[Long].collect().sorted.toList
    // doc 1 must appear exactly once: the checkpoint saw b1 already
    assert(after2 == List(1L, 2L), s"after2=$after2")
  }

  test("wpcurate stats: dataset card lands as parquet") {
    import spark.implicits._
    spark
    val inDir = tmp("card_in"); val outDir = tmp("card_out")
    Seq((1L, "alpha beta gamma", "en", "s1"), (2L, "alpha beta gamma", "en", "s1"),
        (3L, "uno dos tres", "es", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(inDir)
    graft.cli.Cli.main(Array("wpcurate", "stats", inDir, outDir))
    val card = spark.read.parquet(outDir)
    assert(card.count() == 2)
    assert(card.columns.contains("n_docs"))
  }

  test("wpcurate daemon --monitor-hot: per-batch SpaceSaving hot-key line prints") {
    import spark.implicits._
    spark
    val inDir = tmp("hot_in"); val outDir = tmp("hot_out")
    ((1 to 30).map(i => (i.toLong, s"the doc number $i with words", "spamsrc")) ++
      (31 to 40).map(i => (i.toLong, s"the doc number $i with words", s"src$i")))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(inDir)
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
        "--monitor-hot", "source", "--once"))
    }
    val hot = buf.toString.linesIterator.filter(_.contains("HOT source=")).toSeq
    assert(hot.nonEmpty, s"stdout was: ${buf.toString}")
    assert(hot.head.contains("source=spamsrc") &&
      hot.head.contains("count=[30,30]"), hot.mkString("\n"))
  }

  test("wpcurate daemon multi-batch: --append-index closes the ingest loop and auto-compaction bounds the index dirs") {
    import spark.implicits._
    spark
    def doc(b: Int, i: Int): (Long, String, String) =
      (b * 1000L + i,
        s"the unique alpha$b of beta$i gamma gamma$b delta$i epsilon zeta",
        "en")
    val corpus = (1 to 10).map(i => doc(0, i)).toDF("doc_id", "text", "lang")
    val cDir = tmp("curm_corpus"); val inDir = tmp("curm_in")
    val ndIdx = tmp("curm_nd"); val cardIdx = tmp("curm_card")
    val outDir = tmp("curm_out")
    corpus.write.mode("overwrite").parquet(cDir)
    graft.cli.Cli.main(Array("wpindex", "build", "neardup", cDir, ndIdx))
    graft.cli.Cli.main(Array("wpindex", "build", "card", cDir, cardIdx,
      "--grp-col", "lang", "--key-col", "text"))

    // 5 landing batches: 8 novel docs each, plus 2 exact copies of the
    // PREVIOUS batch's docs — only --append-index can catch those,
    // because they were never in the built corpus index
    val stage = tmp("curm_stage")
    for (b <- 1 to 5) {
      val novel = (1 to 8).map(i => doc(b, i))
      val repeats =
        if (b == 1) Seq.empty else (1 to 2).map(i => (b * 1000L + 100 + i,
          doc(b - 1, i)._2, "en"))
      val sd = s"$stage/b$b"
      (novel ++ repeats).toDF("doc_id", "text", "lang").coalesce(1)
        .write.mode("overwrite").parquet(sd)
      // land the data files under unique names, as an ingest would
      Option(new java.io.File(sd).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, i) =>
          java.nio.file.Files.copy(f.toPath,
            new java.io.File(inDir, s"b$b-$i.parquet").toPath)
        }
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) {
        graft.cli.Cli.main(Array("wpcurate", "daemon", inDir, outDir,
          "--index", ndIdx, "--card", cardIdx, "--once",
          "--append-index", "--compact-max-files", "8",
          // low fold threshold so the delta-log → base fold actually
          // fires mid-test (default 64 would keep all 5 deltas unfolded)
          "--fold-max-files", "8",
          "--min-words", "3", "--min-entropy", "2.0",
          "--min-score", "-1000000", "--threshold", "0.8"))
      }
      // the novelty probe must see the MATERIALIZED accepted batch —
      // not a re-evaluation against the already-appended index, which
      // reads as an empty batch (the localCheckpoint regression guard)
      val nvLine = buf.toString.linesIterator
        .find(_.contains("NOVELTY en")).getOrElse("")
      assert(nvLine.nonEmpty, s"no NOVELTY line in: ${buf.toString}")
      val ofEst = nvLine.split("of=").last.trim.toDouble
      assert(ofEst > 5.0, s"novelty saw an empty batch: $nvLine")
    }

    // loop closure: every cross-batch repeat was dropped by the probe
    // against the APPENDED index — accepted texts are exactly the 40
    // novel ones, none twice
    val accepted = spark.read.parquet(s"$outDir/accepted")
      .select("text").as[String].collect()
    assert(accepted.length == 40, s"accepted=${accepted.length}")
    assert(accepted.distinct.length == accepted.length)

    // bounded accretion: the appended band index stayed within the
    // auto-compaction envelope (halving floor + one batch's delta)
    import graft.operators.Maintenance
    for (sub <- Seq("bands", "sets")) {
      val (files, leafDirs) =
        Maintenance.fileAndLeafDirCount(spark, s"$ndIdx/$sub")
      assert(files <= 2 * leafDirs + 16,
        s"$sub files=$files leafDirs=$leafDirs")
      // the unfolded delta-log tail is bounded by the fold threshold
      // plus at most one append's worth of files
      val (deltaFiles, _) =
        Maintenance.fileAndLeafDirCount(spark, s"$ndIdx/${sub}_delta")
      assert(deltaFiles <= 8 + graft.operators.Dedup.NearDupCorpusIndex.DeltaFiles,
        s"${sub}_delta files=$deltaFiles")
    }
    // the card profile is overwrite-maintained: file count stays at one
    // write's worth regardless of batch count
    assert(Maintenance.parquetFileCount(spark, s"$cardIdx/regs") <= 8)

    // and a fresh probe against the final index still verdicts green
    val probe = Seq((9999L, doc(5, 1)._2), (10000L,
      "totally novel omega psi chi words here now")).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val survivors = graft.operators.Dedup.dropNearDupsOfCorpus(probe,
        "text", "doc_id",
        graft.operators.Dedup.NearDupCorpusIndex.load(spark, ndIdx), 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(10000L), s"survivors=$survivors")
  }

  test("wpcurate stats --quantile-col: length percentiles land beside the card") {
    import spark.implicits._
    spark
    val inDir = tmp("cardq_in"); val outDir = tmp("cardq_out")
    (1L to 20L).map(i => (i, "w " * i.toInt, "en", "s1", i * 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(inDir)
    graft.cli.Cli.main(Array("wpcurate", "stats", inDir, outDir,
      "--quantile-col", "n_chars"))
    // the `_`-prefixed subdir is invisible to the card read…
    assert(spark.read.parquet(outDir).count() == 1)
    // …and holds the per-lang profile (exact regime: 20 ≤ capacity)
    val q = spark.read.parquet(s"$outDir/_quantiles")
      .as[(String, Double, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(q(0.5) == 100.0 && q(0.99) == 190.0, s"q=$q")
  }
}
