package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The wpindex CLI surface: build → append → probe for each index kind,
  * driven through Cli.main exactly as spark-submit would (the session
  * is reused in-JVM like the other CLI specs). */
class CliIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("wpindex neardup: build, probe drops corpus near-copies, append catches new docs") {
    spark // force session before Cli.session().getOrCreate reuses it
    val idxDir = tmp("cli_nd_idx")
    graft.cli.Cli.main(Array("wpindex", "build", "neardup",
      s"$sf/documents.parquet", idxDir))

    // batch: 10 near-copies of corpus docs + 10 novel docs
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val batchDir = tmp("cli_nd_batch")
    docs.limit(10).select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text"))
      .unionByName(docs.limit(10).select(
        (col("doc_id") + 2000000L).as("doc_id"),
        regexp_replace(col("text"), "\\w+", "nv$0").as("text")))
      .write.mode("overwrite").parquet(batchDir)
    val outDir = tmp("cli_nd_out")
    graft.cli.Cli.main(Array("wpindex", "probe", "neardup",
      batchDir, idxDir, outDir))
    val kept = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.forall(_ >= 2000000L) && kept.size == 10,
      s"only the 10 novel docs must survive, got $kept")

    // append the novel survivors; a re-probe of the same batch now
    // drops them too (they ARE the corpus now)
    val survDir = tmp("cli_nd_surv")
    spark.read.parquet(outDir).write.mode("overwrite").parquet(survDir)
    graft.cli.Cli.main(Array("wpindex", "append", "neardup", survDir, idxDir))
    val outDir2 = tmp("cli_nd_out2")
    graft.cli.Cli.main(Array("wpindex", "probe", "neardup",
      batchDir, idxDir, outDir2))
    assert(spark.read.parquet(outDir2).count() == 0,
      "after append, every batch doc is a near-dup of the corpus")
  }

  test("wpindex freq: build, probe estimates one-sided, append == rebuild exactly") {
    spark
    val idxDir = tmp("cli_fq_idx")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val halfA = tmp("cli_fq_a"); val halfB = tmp("cli_fq_b")
    docs.filter(col("doc_id") % 2 === 0).write.mode("overwrite").parquet(halfA)
    docs.filter(col("doc_id") % 2 =!= 0).write.mode("overwrite").parquet(halfB)
    graft.cli.Cli.main(Array("wpindex", "build", "freq", halfA, idxDir,
      "--grp-col", "source", "--key-col", "lang"))
    graft.cli.Cli.main(Array("wpindex", "append", "freq", halfB, idxDir,
      "--grp-col", "source", "--key-col", "lang"))
    // exact-merge property: appended table == built-from-union table
    val full = tmp("cli_fq_full")
    graft.cli.Cli.main(Array("wpindex", "build", "freq", s"$sf/documents.parquet",
      full, "--grp-col", "source", "--key-col", "lang"))
    val appended = spark.read.parquet(s"$idxDir/cms")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val rebuilt = spark.read.parquet(s"$full/cms")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(appended == rebuilt,
      "elementwise-sum append must be bit-identical to a rebuild")

    // probe: batch-vs-corpus estimates, one-sided per (grp, key)
    val outDir = tmp("cli_fq_out")
    graft.cli.Cli.main(Array("wpindex", "probe", "freq", s"$sf/documents.parquet",
      idxDir, outDir, "--grp-col", "source", "--key-col", "lang"))
    val out = spark.read.parquet(outDir)
    assert(out.columns.toSet == Set("grp", "key", "batch_cnt", "corpus_est"))
    val exact = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out.collect().foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(3) >= exact(k),
        s"$k: corpus estimate must never undercount")
    }
  }

  test("wpindex ann: build then probe writes per-query top-k") {
    spark
    val idxDir = tmp("cli_ann_idx")
    graft.cli.Cli.main(Array("wpindex", "build", "ann",
      s"$sf/embeddings.parquet", idxDir, "--dim", "64"))
    val qDir = tmp("cli_ann_q")
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 41 === 0)
      .write.mode("overwrite").parquet(qDir)
    val outDir = tmp("cli_ann_out")
    graft.cli.Cli.main(Array("wpindex", "probe", "ann",
      qDir, idxDir, outDir, "--topk", "5"))
    val out = spark.read.parquet(outDir)
    assert(out.columns.toSet == Set("q_id", "vec_id", "adc_dist2", "rnk"))
    val perQ = out.groupBy("q_id").count().select("count")
      .collect().map(_.getLong(0))
    assert(perQ.nonEmpty && perQ.forall(_ == 5L),
      s"every query gets its top-5, got ${perQ.toSeq}")
  }

  test("wpindex drift: build reference, append, probe reports per-group PSI") {
    spark
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val idxDir = tmp("cli_dr_idx")
    val refDir = tmp("cli_dr_ref"); val ref2Dir = tmp("cli_dr_ref2")
    val batchDir = tmp("cli_dr_batch")
    // reference = two slices appended; probe batch = EXACTLY their
    // union ⇒ identical histograms ⇒ PSI must be 0.0 for every group
    // (a parity-split "same distribution" probe at sf0.001's ~100
    // rows/side reads as drift — sampling noise, not a shift — so the
    // deterministic identity is the right mechanics test here)
    ev.filter(col("event_id") % 4 === 0).write.mode("overwrite").parquet(refDir)
    ev.filter(col("event_id") % 4 === 2).write.mode("overwrite").parquet(ref2Dir)
    ev.filter(col("event_id") % 2 === 0).write.mode("overwrite").parquet(batchDir)
    graft.cli.Cli.main(Array("wpindex", "build", "drift", refDir, idxDir))
    graft.cli.Cli.main(Array("wpindex", "append", "drift", ref2Dir, idxDir))
    val outDir = tmp("cli_dr_out")
    graft.cli.Cli.main(Array("wpindex", "probe", "drift",
      batchDir, idxDir, outDir))
    val out = spark.read.parquet(outDir)
    assert(out.columns.toSet == Set("grp", "n_bins", "psi"))
    val psis = out.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(psis.size == 5 && psis.values.forall(_ == 0.0),
      s"probing the reference's own rows must be PSI 0, got $psis")
  }

  test("wpindex bm25: build, append, probe writes per-query top-k from pruned buckets") {
    import spark.implicits._
    spark
    val idxDir = tmp("cli_bm_idx")
    val half1 = tmp("cli_bm_h1"); val half2 = tmp("cli_bm_h2")
    val qDir = tmp("cli_bm_q"); val outDir = tmp("cli_bm_out")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.filter(col("doc_id") % 2 === 0).write.mode("overwrite").parquet(half1)
    docs.filter(col("doc_id") % 2 === 1).write.mode("overwrite").parquet(half2)
    Seq(("q1", "spark"), ("q1", "table"), ("q2", "customer"))
      .toDF("query_id", "term").write.mode("overwrite").parquet(qDir)
    graft.cli.Cli.main(Array("wpindex", "build", "bm25", half1, idxDir))
    graft.cli.Cli.main(Array("wpindex", "append", "bm25", half2, idxDir))
    // --exact pins the uncapped probe (the CLI defaults to the
    // stop-term cap since r13; this test is about append≡rebuild
    // parity of the EXACT scoring path)
    graft.cli.Cli.main(Array("wpindex", "probe", "bm25", qDir, idxDir, outDir,
      "--topk", "3", "--exact"))
    val out = spark.read.parquet(outDir)
    assert(out.columns.toSet == Set("query_id", "rank", "doc_id", "score"))
    // append must make odd docs retrievable
    val ids = out.select("doc_id").as[Long].collect()
    assert(ids.nonEmpty && ids.exists(_ % 2 == 1), s"ids=${ids.toList}")
    // appended index == full rebuild, through the CLI artifacts
    val fullIdx = tmp("cli_bm_full"); val out2 = tmp("cli_bm_out2")
    val allDir = tmp("cli_bm_all")
    docs.write.mode("overwrite").parquet(allDir)
    graft.cli.Cli.main(Array("wpindex", "build", "bm25", allDir, fullIdx))
    graft.cli.Cli.main(Array("wpindex", "probe", "bm25", qDir, fullIdx, out2,
      "--topk", "3", "--exact"))
    val a = spark.read.parquet(outDir).collect().map(_.toString).sorted.toList
    val b = spark.read.parquet(out2).collect().map(_.toString).sorted.toList
    assert(a == b)
  }

  test("wpindex probe bm25: stop-term cap defaults ON at the CLI; --exact opts out") {
    import spark.implicits._
    spark
    val corp = tmp("cli_bmc_corpus"); val idx = tmp("cli_bmc_idx")
    val qD = tmp("cli_bmc_q")
    val oCap = tmp("cli_bmc_cap"); val oEx = tmp("cli_bmc_ex")
    // every doc contains "the" (df frac 1.0 > the 0.25 default cap);
    // "zebra" is rare (df frac 0.1)
    (0L until 20L).map(i =>
        (i, if (i < 2) "the zebra runs" else "the dog sits"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(corp)
    Seq(("q1", "the"), ("q1", "zebra"), ("q2", "the"))
      .toDF("query_id", "term").write.mode("overwrite").parquet(qD)
    graft.cli.Cli.main(Array("wpindex", "build", "bm25", corp, idx))
    // default (no flag) = capped at 0.25: the front-door command must
    // not pay a corpus-proportional stop-term scan by default
    graft.cli.Cli.main(Array("wpindex", "probe", "bm25", qD, idx, oCap,
      "--topk", "5"))
    val cap = spark.read.parquet(oCap)
    // q2's only term is the stop term → dropped → no rows; q1 ranks
    // via "zebra" alone → exactly the 2 zebra docs
    assert(cap.filter(col("query_id") === "q2").count() == 0)
    assert(cap.filter(col("query_id") === "q1").count() == 2)
    // --exact opts out: q2 scores every doc (top-k-bounded), and the
    // output equals the library's exact probe (maxDfFrac = 1.0)
    graft.cli.Cli.main(Array("wpindex", "probe", "bm25", qD, idx, oEx,
      "--topk", "5", "--exact"))
    val ex = spark.read.parquet(oEx)
    assert(ex.filter(col("query_id") === "q2").count() == 5)
    val lib = graft.operators.Retrieval.Bm25Index.load(spark, idx)
      .topK(spark.read.parquet(qD), 5, maxDfFrac = 1.0)
      .collect().map(_.toString).sorted.toList
    assert(ex.collect().map(_.toString).sorted.toList == lib)
  }

  test("wpindex dsir: build, append, probe scores a batch against frozen counts") {
    spark
    val idxDir = tmp("cli_ds_idx")
    val half1 = tmp("cli_ds_h1"); val half2 = tmp("cli_ds_h2")
    val outDir = tmp("cli_ds_out")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.filter(col("doc_id") % 2 === 0).write.mode("overwrite").parquet(half1)
    docs.filter(col("doc_id") % 2 === 1).write.mode("overwrite").parquet(half2)
    graft.cli.Cli.main(Array("wpindex", "build", "dsir", half1, idxDir))
    graft.cli.Cli.main(Array("wpindex", "append", "dsir", half2, idxDir))
    graft.cli.Cli.main(Array("wpindex", "probe", "dsir",
      half1, idxDir, outDir))
    val out = spark.read.parquet(outDir)
    assert(out.columns.toSet == Set("doc_id", "n_feats", "logw"))
    assert(out.count() == docs.filter(col("doc_id") % 2 === 0).count())
  }

  test("wpindex lr: build, probe scores margins, append refines in place") {
    import spark.implicits._
    spark
    // separable planted vocab labeled by lang
    val pool = ((1 to 10).map(i => (i.toLong, "good clean prose here", "en")) ++
      (11 to 20).map(i => (i.toLong, "zz xx junk noise there", "de")))
      .toDF("doc_id", "text", "lang")
    val poolDir = tmp("cli_lr_pool"); val modelDir = tmp("cli_lr_model")
    pool.write.mode("overwrite").parquet(poolDir)
    graft.cli.Cli.main(Array("wpindex", "build", "lr", poolDir, modelDir,
      "--iters", "3"))

    val outDir = tmp("cli_lr_out")
    graft.cli.Cli.main(Array("wpindex", "probe", "lr", poolDir, modelDir,
      outDir))
    val margins = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((1 to 10).forall(i => margins(i.toLong) > 0) &&
      (11 to 20).forall(i => margins(i.toLong) < 0),
      s"trained margins must separate the planted vocab: $margins")

    // refine on a batch where the junk vocab is now the TARGET —
    // weights move, the model file is overwritten in place
    val batch = (21 to 30).map(i =>
      (i.toLong, "zz xx junk noise there", "en")).toDF("doc_id", "text", "lang")
    val bDir = tmp("cli_lr_batch")
    batch.write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpindex", "append", "lr", bDir, modelDir,
      "--iters", "2"))
    val outDir2 = tmp("cli_lr_out2")
    graft.cli.Cli.main(Array("wpindex", "probe", "lr", poolDir, modelDir,
      outDir2))
    val margins2 = spark.read.parquet(outDir2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((11 to 20).forall(i => margins2(i.toLong) > margins(i.toLong)),
      "refinement toward the junk vocab must raise its margins")
  }

  test("wpindex bpe: build, probe encodes with frozen merges, append reranks") {
    import spark.implicits._
    spark
    // "a b" dominates: top-1 merge is (a, b) ⇒ "a b c" encodes to 2 tokens
    val pool = (1 to 10).map(i => (i.toLong, "a b c")) :+ (11L, "x y")
    val poolDir = tmp("cli_bpe_pool"); val tokDir = tmp("cli_bpe_tok")
    pool.toDF("doc_id", "text").write.mode("overwrite").parquet(poolDir)
    graft.cli.Cli.main(Array("wpindex", "build", "bpe", poolDir, tokDir))

    val outDir = tmp("cli_bpe_out")
    graft.cli.Cli.main(Array("wpindex", "probe", "bpe", poolDir, tokDir,
      outDir, "--topn", "1"))
    val enc = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc(1L) == (3L, 2L), s"'a b c' must merge to 2 tokens: $enc")
    assert(enc(11L) == (2L, 2L), "'x y' is untouched by the (a,b) merge")

    // append a slice where "x y" dominates: top-1 merge flips
    val slice = (21 to 60).map(i => (i.toLong, "x y"))
    val sDir = tmp("cli_bpe_slice")
    slice.toDF("doc_id", "text").write.mode("overwrite").parquet(sDir)
    graft.cli.Cli.main(Array("wpindex", "append", "bpe", sDir, tokDir))
    val outDir2 = tmp("cli_bpe_out2")
    graft.cli.Cli.main(Array("wpindex", "probe", "bpe", poolDir, tokDir,
      outDir2, "--topn", "1"))
    val enc2 = spark.read.parquet(outDir2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc2(11L) == (2L, 1L), s"after append the (x,y) merge wins: $enc2")
    assert(enc2(1L) == (3L, 3L))
  }

  test("wpindex substr: build, append, probe reports corpus-verbatim spans") {
    import spark.implicits._
    spark
    val idxDir = tmp("cli_ss_idx")
    val cDir = tmp("cli_ss_c"); val aDir = tmp("cli_ss_a")
    val bDir = tmp("cli_ss_b"); val outDir = tmp("cli_ss_out")
    Seq((0L, "a b c d e f")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(cDir)
    Seq((1L, "p q r s t u")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(aDir)
    Seq((10L, "x a b c d y"), (11L, "x p q r s y"), (12L, "m n o w v k"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpindex", "build", "substr", cDir, idxDir,
      "--win", "3"))
    graft.cli.Cli.main(Array("wpindex", "append", "substr", aDir, idxDir))
    graft.cli.Cli.main(Array("wpindex", "probe", "substr",
      bDir, idxDir, outDir))
    val got = spark.read.parquet(outDir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 1L, 4L, 2L), (11L, 1L, 4L, 2L)), s"got=$got")
  }

  test("wpindex ls: lists each artifact's kind/version/fingerprint; probe refuses a bumped version") {
    import spark.implicits._
    spark
    val root = tmp("cli_ls_root")
    val cDir = tmp("cli_ls_c")
    (1L to 20L).map(i => (i, s"the corpus doc $i with words in it"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(cDir)
    graft.cli.Cli.main(Array("wpindex", "build", "substr", cDir,
      s"$root/substr", "--win", "3"))
    graft.cli.Cli.main(Array("wpindex", "build", "lm", cDir, s"$root/lm"))
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      graft.cli.Cli.main(Array("wpindex", "ls", root))
    }
    val lines = buf.toString.linesIterator.filter(_.contains("kind=")).toSeq
    assert(lines.size == 2, s"ls printed: ${buf.toString}")
    assert(lines.exists(l => l.contains("kind=substr") &&
      l.contains("version=1") && l.contains("winTokens=3") &&
      l.contains("fingerprint=")), lines.mkString("\n"))

    // a future builder bumps the version: every loader refuses loudly
    val props = graft.operators.ArtifactMeta.read(s"$root/lm").get
    props.setProperty("format_version",
      (graft.operators.ArtifactMeta.FormatVersion + 1).toString)
    val w = new java.io.FileWriter(s"$root/lm/meta.properties")
    try props.store(w, "bumped") finally w.close()
    val e = intercept[IllegalStateException] {
      graft.cli.Cli.main(Array("wpindex", "probe", "lm", cDir,
        s"$root/lm", tmp("cli_ls_out")))
    }
    assert(e.getMessage.contains("format_version"), e.getMessage)
  }
}
