package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ArtifactMeta, Dedup, Maintenance}

/** Round-9 operational layer: the shared artifact meta
  * (format_version / kind / builder fingerprint), layout-preserving
  * threshold compaction of appended artifacts, and the layout-aware
  * compactParquet upgrade path. */
class R9OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---------------------------------------------------------------- meta

  test("ArtifactMeta: store/load roundtrip carries header + params") {
    val dir = tmp("am_rt")
    ArtifactMeta.store(dir, "card", Seq("p" -> "9"),
      layout = Seq("regs" -> ""))
    val props = ArtifactMeta.load(dir, "card")
    assert(props.getProperty("p") == "9")
    assert(props.getProperty("kind") == "card")
    assert(props.getProperty("format_version") ==
      ArtifactMeta.FormatVersion.toString)
    assert(props.getProperty("builder_fingerprint") ==
      ArtifactMeta.fingerprintOf(Seq("p" -> "9")))
  }

  test("ArtifactMeta: fingerprint is param-order independent and excludes stats") {
    assert(ArtifactMeta.fingerprintOf(Seq("a" -> "1", "b" -> "2")) ==
      ArtifactMeta.fingerprintOf(Seq("b" -> "2", "a" -> "1")))
    val d1 = tmp("am_fp1"); val d2 = tmp("am_fp2")
    ArtifactMeta.store(d1, "bm25", Seq("k1" -> "1.2"),
      stats = Seq("nDocs" -> "10"))
    ArtifactMeta.store(d2, "bm25", Seq("k1" -> "1.2"),
      stats = Seq("nDocs" -> "99999"))
    assert(ArtifactMeta.load(d1, "bm25").getProperty("builder_fingerprint") ==
      ArtifactMeta.load(d2, "bm25").getProperty("builder_fingerprint"))
  }

  test("ArtifactMeta: load refuses missing meta, bumped version, wrong kind — explicitly") {
    val none = intercept[IllegalStateException] {
      ArtifactMeta.load(tmp("am_none"), "card")
    }
    assert(none.getMessage.contains("no meta.properties"))

    val dir = tmp("am_ver")
    ArtifactMeta.store(dir, "card", Seq("p" -> "9"))
    // bump the version on disk — a future incompatible builder
    val props = ArtifactMeta.read(dir).get
    props.setProperty("format_version",
      (ArtifactMeta.FormatVersion + 1).toString)
    val w = new java.io.FileWriter(s"$dir/meta.properties")
    try props.store(w, "bumped") finally w.close()
    val ver = intercept[IllegalStateException] {
      graft.operators.Cardinality.CardRef.load(spark, dir)
    }
    assert(ver.getMessage.contains("format_version") &&
      ver.getMessage.contains(dir))

    val kdir = tmp("am_kind")
    ArtifactMeta.store(kdir, "lm",
      Seq("lambda" -> "0.7", "residual" -> "0.3"))
    val kind = intercept[IllegalStateException] {
      ArtifactMeta.load(kdir, "card")
    }
    assert(kind.getMessage.contains("'lm'") &&
      kind.getMessage.contains("'card'"))
  }

  test("every persisted artifact kind writes a versioned, kind-tagged meta") {
    import spark.implicits._
    val docs = (1L to 30L).map(i =>
      (i, s"alpha beta gamma doc$i tail one two three four five"))
      .toDF("doc_id", "text")
    val ndDir = tmp("am_all_nd")
    Dedup.nearDupCorpusIndex(docs, "text", "doc_id").save(ndDir)
    val suDir = tmp("am_all_su")
    Dedup.SubstrCorpusIndex.build(docs, "text", "doc_id", 3).save(suDir)
    val lmDir = tmp("am_all_lm")
    graft.operators.Lm.LmRef.build(docs, "text").save(lmDir)
    for ((d, k) <- Seq(ndDir -> "neardup", suDir -> "substr", lmDir -> "lm")) {
      val p = ArtifactMeta.load(d, k)
      assert(p.getProperty("format_version") ==
        ArtifactMeta.FormatVersion.toString, s"$k version")
    }
    // ls lists them all with kind/version/fingerprint
    val root = tmp("am_all_root")
    for ((d, k) <- Seq(ndDir -> "neardup", suDir -> "substr", lmDir -> "lm")) {
      val tgt = new java.io.File(root, k)
      java.nio.file.Files.move(new java.io.File(d).toPath, tgt.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val lines = ArtifactMeta.ls(root)
    assert(lines.size == 3, lines.mkString("\n"))
    assert(lines.exists(l => l.contains("kind=neardup") &&
      l.contains("version=1") && l.contains("shingleN=")))
  }

  // ---------------------------------------------- layout-aware compaction

  test("compactParquet: round-robin on plain dirs, auto-upgrades sorted/zorder-marked dirs") {
    import spark.implicits._
    val df = (1L to 4000L).map(i => (i, i % 97, s"row$i"))
      .toDF("a", "b", "s")

    // plain: round-robin, row-identical
    val plainIn = tmp("mc_plain_in"); val plainOut = tmp("mc_plain_out")
    df.repartition(16).write.mode("overwrite").parquet(plainIn)
    Maintenance.compactParquet(spark, plainIn, plainOut)
    assert(spark.read.parquet(plainOut).count() == 4000)
    assert(Maintenance.parquetFileCount(spark, plainOut) <
      Maintenance.parquetFileCount(spark, plainIn))

    // sorted-marked: the rewrite PRESERVES clustering (files cover
    // disjoint key ranges) instead of round-robining it away
    val sortIn = tmp("mc_sort_in"); val sortOut = tmp("mc_sort_out")
    Maintenance.writeSorted(df, Seq("a"), 4, sortIn)
    // small targetBytes so the rewrite lands in several range files
    Maintenance.compactParquet(spark, sortIn, sortOut, targetBytes = 8L << 10)
    assert(spark.read.parquet(sortOut).count() == 4000)
    val ranges = spark.read.parquet(sortOut)
      .select(input_file_name().as("f"), col("a"))
      .groupBy("f").agg(min("a").as("lo"), max("a").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "sorted compaction kept multiple range files")
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 < lo2, s"file ranges overlap: $hi1 vs $lo2")
    case _ => ()
    }
    // and the output is re-marked, so a SECOND compaction stays sorted
    assert(new java.io.File(s"$sortOut/_layout.properties").exists())

    // zorder-marked: upgrade path runs and re-marks
    val zIn = tmp("mc_z_in"); val zOut = tmp("mc_z_out")
    Maintenance.zOrderWrite(df, "a", "b", 4, zIn, bits = 8)
    Maintenance.compactParquet(spark, zIn, zOut)
    assert(spark.read.parquet(zOut).count() == 4000)
    assert(new java.io.File(s"$zOut/_layout.properties").exists())
  }

  test("compactArtifact: bounded file count across appends, probe results identical") {
    import spark.implicits._
    def slice(lo: Long, hi: Long) = (lo to hi).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta doc$i"))
      .toDF("doc_id", "text")

    val path = tmp("mc_art_nd")
    Dedup.nearDupCorpusIndex(slice(1, 40), "text", "doc_id").save(path)
    // appends with auto-compaction OFF and the delta-log folding on
    // EVERY append (fold conf 1): each append then lands 1 file per
    // touched partition dir in the BASE — the accretion shape this
    // test exists to show compactArtifact bounding (with the default
    // fold threshold the deltas would just pool in bands_delta/
    // sets_delta, bounded by the fold threshold instead)
    spark.conf.set(Maintenance.AutoCompactConf, "0")
    spark.conf.set(Dedup.NearDupCorpusIndex.DeltaFoldConf, "1")
    for (k <- 1 to 6)
      Dedup.NearDupCorpusIndex.load(spark, path)
        .appendTo(path, slice(40L + k * 20, 59L + k * 20), "text", "doc_id")
    // every delta folded — the unfolded tail is empty
    assert(Maintenance.parquetFileCount(spark, s"$path/bands_delta") == 0)
    assert(Maintenance.parquetFileCount(spark, s"$path/sets_delta") == 0)
    val before = Maintenance.parquetFileCount(spark, s"$path/bands")
    val probeB = slice(1, 200)
    val survivorsBefore = Dedup.dropNearDupsOfCorpus(probeB, "text",
      "doc_id", Dedup.NearDupCorpusIndex.load(spark, path), 0.8)
      .select("doc_id").as[Long].collect().toSet

    val compacted = Maintenance.compactArtifact(spark, path, maxFiles = 8)
    assert(compacted.nonEmpty, "something was over threshold")
    val after = Maintenance.parquetFileCount(spark, s"$path/bands")
    assert(after < before, s"bands files $before -> $after")
    // identical probe verdicts from the compacted index
    val survivorsAfter = Dedup.dropNearDupsOfCorpus(probeB, "text",
      "doc_id", Dedup.NearDupCorpusIndex.load(spark, path), 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(survivorsAfter == survivorsBefore)
    spark.conf.unset(Maintenance.AutoCompactConf)
    spark.conf.unset(Dedup.NearDupCorpusIndex.DeltaFoldConf)
  }

  test("compactArtifactBudgeted: bounded per-call work, anti-thrash convergence, crash-safe swap recovery") {
    import spark.implicits._
    def slice(lo: Long, hi: Long) = (lo to hi).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta doc$i"))
      .toDF("doc_id", "text")
    val path = tmp("mc_bud_nd")
    Dedup.nearDupCorpusIndex(slice(1, 40), "text", "doc_id").save(path)
    spark.conf.set(Maintenance.AutoCompactConf, "0")
    spark.conf.set(Dedup.NearDupCorpusIndex.DeltaFoldConf, "1")
    for (k <- 1 to 6)
      Dedup.NearDupCorpusIndex.load(spark, path)
        .appendTo(path, slice(40L + k * 20, 59L + k * 20), "text", "doc_id")
    val probeB = slice(1, 200)
    def survivors() = Dedup.dropNearDupsOfCorpus(probeB, "text",
      "doc_id", Dedup.NearDupCorpusIndex.load(spark, path), 0.8)
      .select("doc_id").as[Long].collect().toSet
    val expect = survivors()

    // budget respected per call, names relative (no scheme, no root)
    val done1 = Maintenance.compactArtifactBudgeted(spark, path,
      maxFilesPerDir = 2, maxDirs = 3)
    assert(done1.nonEmpty && done1.length <= 3, s"done1=$done1")
    assert(done1.forall(d => !d.startsWith("/") && !d.contains(":")),
      s"names must be path-relative: $done1")
    assert(survivors() == expect)

    // repeated calls CONVERGE (anti-thrash: once a dir is at its
    // ~128MB-target file count it is never re-picked) …
    var rounds = 0
    while (Maintenance.compactArtifactBudgeted(spark, path, 2, 8).nonEmpty
           && rounds < 30) rounds += 1
    assert(rounds < 30, "budgeted compaction must converge, not thrash")
    // … and the converged state is a standing no-op
    assert(Maintenance.compactArtifactBudgeted(spark, path, 2, 8).isEmpty)
    assert(survivors() == expect)

    // crash-safe swap recovery: simulate a crash between the two
    // renames (live dir set aside, rewrite never landed) — the next
    // call's census must restore the aside, losing NOTHING
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val bands = new org.apache.hadoop.fs.Path(s"$path/bands")
    val leaf = {
      val it = fs.listFiles(bands, true)
      var p: org.apache.hadoop.fs.Path = null
      while (it.hasNext && p == null) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) p = f.getParent
      }
      p
    }
    val aside = new org.apache.hadoop.fs.Path(leaf.getParent,
      "._compact_aside_" + leaf.getName)
    assert(fs.rename(leaf, aside) && !fs.exists(leaf))
    Maintenance.compactArtifactBudgeted(spark, path, 2, 8)
    assert(fs.exists(leaf) && !fs.exists(aside),
      "mid-swap crash state must be restored by the next call")
    assert(survivors() == expect)

    // root-leaf variant: for an UNPARTITIONED layout sub the swapped
    // dir IS the sub, so its aside lands at the artifact root where a
    // sub-scoped census can never see it — the dedicated recovery
    // must still restore it (review-caught hole)
    val setsDir = new org.apache.hadoop.fs.Path(s"$path/sets")
    val setsAside = new org.apache.hadoop.fs.Path(
      setsDir.getParent, "._compact_aside_sets")
    assert(fs.rename(setsDir, setsAside) && !fs.exists(setsDir))
    Maintenance.compactArtifactBudgeted(spark, path, 2, 8)
    assert(fs.exists(setsDir) && !fs.exists(setsAside),
      "whole-sub aside must be restored from the artifact root")
    assert(survivors() == expect)
    spark.conf.unset(Maintenance.AutoCompactConf)
    spark.conf.unset(Dedup.NearDupCorpusIndex.DeltaFoldConf)
  }

  // ------------------------------------------------ adaptive salted join

  test("adaptiveSaltedJoin: rows identical to the unsalted join; only hot keys replicate the dim") {
    import spark.implicits._
    import graft.operators.Skew
    // one massive key (80%) + 50 cold keys
    // hot key: 8000 rows (>> floor = 10000/64 ≈ 156); cold keys: 40
    // rows each (< floor)
    val fact = spark.range(10000).select(col("id").as("rid"),
      when(col("id") % 5 =!= 0, lit("hotkey"))
        .otherwise(concat(lit("cold"), (col("id") / 5) % 50)).as("k"),
      (col("id") % 97).cast("double").as("v"))
    val dim = fact.select(col("k")).distinct()
      .withColumn("dv", length(col("k")).cast("long"))

    val plain = fact.join(dim, "k")
      .groupBy(col("k")).agg(count(lit(1)).as("n"),
        round(sum(col("v")), 2).as("sv"), first(col("dv")).as("dv"))
      .as[(String, Long, Double, Long)].collect().toSet

    val (f, d, cond) = Skew.adaptiveSaltedJoin(fact, dim, "k",
      salts = 8, saltSource = col("rid"), k = 16, capacity = 64)
    val salted = f.join(d, cond)
      .groupBy(f("k")).agg(count(lit(1)).as("n"),
        round(sum(col("v")), 2).as("sv"), first(col("dv")).as("dv"))
      .as[(String, Long, Double, Long)].collect().toSet
    assert(salted == plain)

    // replication is selective: the hot key's dim row fans to 8 salts,
    // cold keys stay single
    val dCounts = d.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(dCounts("hotkey") == 8L, s"hot dim fan-out: $dCounts")
    assert(dCounts.filter(_._1.startsWith("cold")).values.forall(_ == 1L))

    // and with no skew present, the helper returns the PLAIN join
    val uniform = spark.range(1000).select(col("id").as("rid"),
      concat(lit("u"), col("id") % 500).as("k"), lit(1.0).as("v"))
    val (fu, du, _) = Skew.adaptiveSaltedJoin(uniform,
      uniform.select(col("k")).distinct(), "k", 8, col("rid"),
      k = 16, capacity = 64)
    assert(!fu.columns.contains("__salt") && !du.columns.contains("__salt"))
  }

  test("autoCompact: appendTo self-compacts past the conf threshold") {
    import spark.implicits._
    def slice(lo: Long, hi: Long) = (lo to hi).map(i =>
      (i, s"omega psi chi phi upsilon tau doc$i one two three"))
      .toDF("doc_id", "text")
    val path = tmp("mc_auto_su")
    Dedup.SubstrCorpusIndex.build(slice(1, 40), "text", "doc_id", 3)
      .save(path)
    spark.conf.set(Maintenance.AutoCompactConf, "8")
    for (k <- 1 to 8)
      Dedup.SubstrCorpusIndex.load(spark, path)
        .appendTo(path, slice(40L + k * 20, 59L + k * 20), "text", "doc_id")
    val (files, leafDirs) =
      Maintenance.fileAndLeafDirCount(spark, s"$path/wins")
    // bounded: never more than one uncompacted append over the halving
    // floor — concretely, 2×leafDirs + one batch's delta
    assert(files <= 2 * leafDirs + 8, s"wins files=$files leafDirs=$leafDirs")
    // probes still green after in-place swaps
    val spans = Dedup.SubstrCorpusIndex.load(spark, path)
      .spansOf(slice(50, 60), "text", "doc_id")
    assert(spans.count() > 0)
    spark.conf.unset(Maintenance.AutoCompactConf)
  }
}
