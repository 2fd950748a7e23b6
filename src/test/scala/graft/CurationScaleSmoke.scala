package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Curation-suite scaling smoke, two sections:
  *
  * 1. Per-operator scan-speed checks at 1M+ docs — map-only ops (PII,
  *    sampling, quality) at scan speed, packing a single exchange +
  *    linear scan, connected components converging in few rounds.
  *
  * 2. EVERYTHING-ON daemon rehearsal (r8 verdict ask #2): `wpcurate
  *    daemon` with ALL gates enabled — quality ensemble (gopher rules +
  *    entropy + classifier score), near-dup index probe, LM gate, DSIR
  *    gate, exact-substring gate, media-signature gate, trained-LR
  *    gate, cardinality novelty watch, drift watch — over a generated
  *    skewed corpus (hot template content, skewed langs, occasional
  *    media) of ≥5M landing docs in 5 micro-batch waves, with
  *    `--append-index` + auto-compaction on. Asserts a throughput
  *    floor, bounded per-batch wall time (a state/accretion leak shows
  *    as later waves slowing), bounded index-dir file counts, and that
  *    the gates actually drop the planted duplicates. This is the
  *    "survives 100×" proof for the COMPOSED pipeline, not each stage.
  *
  * Run: sbt "Test/runMain graft.CurationScaleSmoke [landingDocs]" */
object CurationScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Pii, Sampling, Packing, Clustering, TextAnalysis, Dedup}

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val mult = 200 // 5k docs × 200 = 1M
    val df = (0 until mult).map(i =>
      base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
        concat(col("text"), lit(" replica" + i)).as("text"), col("lang")))
      .reduce(_ unionByName _)
      .repartition(32).persist()
    val n = df.count()

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"CURATIONSCALE $name%-12s n=$n%8d  $s%6.1f s  ${n / s / 1e6}%6.2f M docs/s  out=$rows")
    }

    timed("pii_scan") {
      df.select((col("doc_id") +: Pii.scanColumns(col("text")) :+
        Pii.redact(col("text")).as("red")): _*)
        .agg(sum(col("n_emails"))).collect(); n
    }
    timed("quality") {
      df.select((col("doc_id") +: TextAnalysis.qualityColumns(col("text"))): _*)
        .agg(sum(col("q_tokens"))).collect(); n
    }
    timed("sampling") {
      Sampling.stratifiedBernoulli(df, "doc_id", "lang",
        Map("en" -> 0.5), defaultRate = 0.1).count()
    }
    timed("packing") {
      Packing.packGreedy(
        df.select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).as("n")),
        "doc_id", "lang", "n", budget = 2048, shards = 64).count()
    }
    // clusters on the 1x corpus (pair generation is the dedup smoke's
    // job; here we exercise the fixpoint over its ~500-edge graph and
    // assert it converges in few iterations)
    timed("clusters") {
      val pairs = Dedup.ngramJaccardPairs(base, "text", "doc_id", n = 3, threshold = 0.5)
      Clustering.dupClusters(pairs, "id_a", "id_b").count()
    }
    timed("clusters_star") {
      val pairs = Dedup.ngramJaccardPairs(base, "text", "doc_id", n = 3, threshold = 0.5)
      Clustering.dupClustersStar(pairs, "id_a", "id_b").count()
    }
    timed("doc_chunk") {
      TextAnalysis.chunkTokens(df, "text", "doc_id",
        chunkSize = 64, stride = 48).count()
    }
    timed("segment_dedup") {
      Dedup.segmentDedup(df, "text", "doc_id", segTokens = 8).count()
    }
    timed("dedup_incr") {
      Dedup.incremental(df.filter(col("doc_id") % 10 >= 8),
        df.filter(col("doc_id") % 10 < 8), "text", "doc_id").count()
    }
    df.unpersist()

    // ------------------------------------------------------------------
    // Section 2: everything-on wpcurate daemon rehearsal.
    // ------------------------------------------------------------------
    import graft.functions.SplitMix64.splitmix64
    import graft.operators.{Maintenance, Multimodal}
    val landing = if (args.nonEmpty) args(0).toLong else 5000000L
    val waves = 5
    val perWave = landing / waves

    // skewed generated corpus: ~30% of docs instantiate one of 1000 hot
    // templates (near-dup mass the probes must absorb), langs 80/20,
    // 1% carry media bytes drawn from 500 repeating images (perceptual
    // dup mass for the mediasig gate). Stopwords satisfy the gopher
    // gate; all column expressions, no driver loop.
    def docsFor(start: Long, count: Long): org.apache.spark.sql.DataFrame = {
      val d = col("id")
      val hot = pmod(splitmix64(d * 13L + 1), lit(10)) < 3
      val base = when(hot, pmod(splitmix64(d * 17L + 5), lit(1000)))
        .otherwise(d + lit(1000000000L))
      val text = concat(lit("the sample of "),
        concat_ws(" ", transform(sequence(lit(0), lit(11)),
          i => concat(lit("w"),
            pmod(splitmix64(base * 131071L + i.cast("long")), lit(20000))))),
        when(hot, concat(lit(" v"), pmod(d, lit(7)))).otherwise(lit("")))
      val lang = when(pmod(splitmix64(d * 23L + 9), lit(10)) < 8, lit("en"))
        .otherwise(lit("xx"))
      val media = when(pmod(d, lit(100)) === 0,
        Multimodal.synthBmpUdf(pmod(d, lit(500)).cast("long"), lit(12), lit(10)))
        .otherwise(lit(null).cast("binary"))
      spark.range(start, start + count).select(d.as("doc_id"),
        text.as("text"), lang.as("lang"), media.as("media"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }

    def tmp(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString
    val corpusDir = tmp("dsc_corpus")
    val corpus = docsFor(2000000000L, 200000L)
    corpus.repartition(16).write.mode("overwrite").parquet(corpusDir)
    val cdf = spark.read.parquet(corpusDir)

    println("CURATIONSCALE daemon: building the twelve-gate artifact set")
    val ndIdx = tmp("dsc_nd"); val lmIdx = tmp("dsc_lm")
    val dsirIdx = tmp("dsc_dsir"); val ssIdx = tmp("dsc_ss")
    val lrIdx = tmp("dsc_lr"); val msIdx = tmp("dsc_ms")
    val cardIdx = tmp("dsc_card"); val driftIdx = tmp("dsc_drift")
    Dedup.nearDupCorpusIndex(cdf, "text", "doc_id").save(ndIdx)
    graft.operators.Lm.LmRef.build(cdf, "text").save(lmIdx)
    graft.operators.Dsir.DsirRef.build(cdf, "text", "doc_id",
      col("lang") === "en").save(dsirIdx)
    Dedup.SubstrCorpusIndex.build(cdf, "text", "doc_id", 8).save(ssIdx)
    graft.operators.Classifier.LrModel.train(cdf, "text", "doc_id",
      col("lang") === "en", iters = 2).save(lrIdx)
    Multimodal.MediaSigIndex.build(cdf.filter(col("media").isNotNull),
      "doc_id", graft.functions.MediaDHash.media_dhash(col("media")))
      .save(msIdx)
    graft.operators.Cardinality.CardRef.build(cdf, "lang", "text")
      .save(cardIdx)
    graft.operators.Drift.DriftRef.build(cdf, "lang", "n_chars", 20.0)
      .save(driftIdx)

    val inDir = tmp("dsc_in"); val outDir = tmp("dsc_out")
    val stage = tmp("dsc_stage")
    val waveSecs = new scala.collection.mutable.ArrayBuffer[Double]
    for (w <- 0 until waves) {
      // land each wave's files into the ONE watched dir under unique
      // names (the checkpoint pins the source path)
      docsFor(w * perWave, perWave).repartition(8)
        .write.mode("overwrite").parquet(s"$stage/wave$w")
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$stage/wave$w"))
        .filter(p => p.toString.endsWith(".parquet"))
        .forEach(p => java.nio.file.Files.copy(p,
          java.nio.file.Paths.get(inDir, s"w$w-${p.getFileName}")))
      val t0 = System.nanoTime()
      graft.cli.Cli.main(Array("wpcurate", "daemon", inDir,
        outDir,
        "--index", ndIdx, "--lm", lmIdx, "--dsir", dsirIdx,
        "--substr", ssIdx, "--lr", lrIdx, "--mediasig", msIdx,
        "--card", cardIdx, "--drift", driftIdx,
        "--once", "--append-index", "--compact-max-files", "64",
        "--monitor-key", "doc_id",
        "--min-words", "3", "--min-entropy", "2.0",
        "--min-score", "-1000000", "--threshold", "0.5",
        "--min-logprob", "-12.0", "--min-logw", "-100.0",
        "--max-dupfrac", "0.95", "--lr-threshold", "-1000.0"))
      val s = (System.nanoTime() - t0) / 1e9
      waveSecs += s
      println(f"CURATIONSCALE daemon wave=$w%d docs=$perWave%d  $s%6.1f s  ${perWave / s / 1000}%6.1f k docs/s")
    }

    val accepted = spark.read.parquet(s"$outDir/accepted")
    val nAccepted = accepted.count()
    val total = waveSecs.sum
    val tput = landing / total / 1000.0
    println(f"CURATIONSCALE daemon TOTAL docs=$landing accepted=$nAccepted  $total%6.1f s  $tput%6.1f k docs/s")

    var dFailed = false
    // throughput floor: the composed pipeline must clear 2k docs/s on
    // local[32] (a deliberately conservative floor — host-load slack).
    // Only asserted at rehearsal size: the ~20 s/wave fixed overhead
    // (streaming startup, index loads, gate-materialization jobs)
    // dominates debug-sized waves and amortizes at the default 1M-doc
    // waves, so a small-arg run measures overhead, not throughput.
    if (landing >= 1000000 && tput < 2.0) {
      println(f"CURATIONSCALE FAIL: throughput $tput%.1f k docs/s under the 2k floor")
      dFailed = true
    }
    // bounded per-wave wall time: a state/accretion leak shows as the
    // last wave slowing vs the steady-state (wave 1, post-warmup)
    if (waveSecs.last > 3.0 * waveSecs(1)) {
      println(f"CURATIONSCALE FAIL: wave time grew ${waveSecs.last}%.1f s vs steady ${waveSecs(1)}%.1f s")
      dFailed = true
    }
    // the gates actually dropped the planted duplicate mass (30% hot
    // templates + repeated media), and didn't drop everything
    if (nAccepted > (landing * 85) / 100 || nAccepted < (landing * 20) / 100) {
      println(s"CURATIONSCALE FAIL: accepted $nAccepted of $landing — gates not engaging as planted")
      dFailed = true
    }
    // the appended+auto-compacted index dirs stay inside the envelope
    for (sub <- Seq("bands", "sets")) {
      val (files, leafDirs) =
        Maintenance.fileAndLeafDirCount(spark, s"$ndIdx/$sub")
      println(s"CURATIONSCALE daemon index $sub files=$files leafDirs=$leafDirs")
      if (files > 2 * leafDirs + 64) {
        println(s"CURATIONSCALE FAIL: $sub accreted $files files over $leafDirs dirs")
        dFailed = true
      }
    }
    spark.stop()
    assert(!dFailed, "daemon rehearsal assertions failed — see CURATIONSCALE FAIL lines")
    println("CURATIONSCALE OK: everything-on daemon held the floor with bounded state")
  }
}
