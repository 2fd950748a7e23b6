package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.MediaDHash.media_dhash
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaSigIndex

/** The persisted media-signature index (tenth artifact): build → save →
  * load → probe with partition pruning, dropKnown anti-join, appendTo
  * closure, and the wpindex CLI round trip.
  *
  * Fixtures are RANDOM-pixel BMPs (12×10 ⇒ all 64 dHash bits live),
  * not the oracle corpus's linear-ramp generator — ramp images of equal
  * dims are all brightness shifts of each other, so under a DIFFERENCE
  * hash everything would match everything (the growth smoke measured
  * that family at exactly quadratic pair growth). The "re-encode twin"
  * is a one-pixel perturbation: it can flip at most the couple of
  * difference bits that reference the touched sample point. */
class MediaSigIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  import TestMedia.randBmp

  private def imgDf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("img_id", "media")
  }

  test("save → load → probe finds re-encodes; dropKnown; appendTo closes the loop") {
    import spark.implicits._
    val dir = tmp("mediasig")
    val corpus = imgDf(Seq((1L, randBmp(10L)), (2L, randBmp(50L)),
      (3L, randBmp(90L))))
    MediaSigIndex.build(corpus, "img_id", media_dhash(col("media"))).save(dir)
    val idx = MediaSigIndex.load(spark, dir)
    // batch: a one-pixel re-encode of corpus img 1, one novel image
    val batch = imgDf(Seq((100L, randBmp(10L, bump = true)),
      (101L, randBmp(7777L))))
    val m = idx.matchesOf(batch, "img_id", media_dhash(col("media")))
      .select("id_batch", "id_corpus").as[(Long, Long)].collect().toSet
    assert(m.contains((100L, 1L)), s"matches=$m")
    assert(!m.exists(_._1 == 101L), s"novel image matched: $m")
    val kept = idx.dropKnown(batch, "img_id", media_dhash(col("media")))
      .select("img_id").as[Long].collect().toSet
    assert(kept == Set(101L))
    // fold the novel image in; a re-probe now catches its twin
    idx.appendTo(dir, imgDf(Seq((101L, randBmp(7777L)))), "img_id",
      media_dhash(col("media")))
    val idx2 = MediaSigIndex.load(spark, dir)
    val m2 = idx2.matchesOf(imgDf(Seq((200L, randBmp(7777L, bump = true)))),
        "img_id", media_dhash(col("media")))
      .select("id_corpus").as[Long].collect().toSet
    assert(m2.contains(101L), s"appended image not probed: $m2")
  }

  test("probe plan prunes the index scan to the batch's block partitions") {
    val dir = tmp("mediasig_pp")
    MediaSigIndex.build(imgDf((1L to 40L).map(i => (i, randBmp(i * 97L)))),
      "img_id", media_dhash(col("media"))).save(dir)
    val idx = MediaSigIndex.load(spark, dir)
    val plan = idx.matchesOf(imgDf(Seq((500L, randBmp(97L)))), "img_id",
        media_dhash(col("media")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") ||
      plan.contains("PartitionFilters: [blk") ||
      plan.contains("PartitionFilters: [isnotnull(blk"),
      s"index scan not partition-pruned:\n${plan.take(2000)}")
  }

  test("binaryFile ingestion e2e: real on-disk media files → fingerprints → index probe, no UDF in the plan") {
    import spark.implicits._
    import graft.functions.{MediaAudioFp, MediaVideoFp}
    // REAL files on disk (r8 verdict ask #8): the corpus is .bmp/.wav/
    // .mp4 files written byte-for-byte, ingested through Spark's
    // binaryFile source — the fixture synthesizers run driver-side to
    // CREATE the files and never appear in any plan
    val mediaDir = tmp("bin_media")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(
        new java.io.File(mediaDir, name).toPath, bytes)
    for (i <- 0 until 6) put(f"img$i%02d.bmp", randBmp(i.toLong))
    for (i <- 0 until 3)
      put(f"aud$i%02d.wav", Multimodal.synthWav(100L + i, 1, 400))
    for (i <- 0 until 3)
      put(f"vid$i%02d.mp4", Multimodal.synthMp4(200L + i, 4, 8, 8))

    val files = spark.read.format("binaryFile").load(mediaDir)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("content").as("media"))
    assert(files.count() == 12)

    // images: dHash over the decoded pixels of the REAL file bytes
    val imgs = files.filter(col("name").endsWith(".bmp"))
      .select(abs(hash(col("name"))).cast("long").as("img_id"),
        col("name"), col("media"))
    val idxDir = tmp("bin_media_idx")
    Multimodal.MediaSigIndex.build(imgs, "img_id", media_dhash(col("media")))
      .save(idxDir)
    val idx = Multimodal.MediaSigIndex.load(spark, idxDir)

    // a re-encode twin of img00 lands as a NEW file; the index probe
    // must match it to the ingested original and pass the novel one
    val batchDir = tmp("bin_media_batch")
    java.nio.file.Files.write(
      new java.io.File(batchDir, "re00.bmp").toPath,
      randBmp(0L, bump = true))
    java.nio.file.Files.write(
      new java.io.File(batchDir, "new99.bmp").toPath, randBmp(99L))
    val batch = spark.read.format("binaryFile").load(batchDir)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("content").as("media"))
      .select(abs(hash(col("name"))).cast("long").as("img_id"),
        col("name"), col("media"))
    val kept = idx.dropKnown(batch, "img_id", media_dhash(col("media")), 3)
      .select("name").as[String].collect().toSet
    assert(kept == Set("new99.bmp"), s"kept=$kept")

    // audio + video fingerprints evaluate on the real file bytes too
    val fps = files.filter(col("name").endsWith(".wav"))
      .select(MediaAudioFp.media_audio_fp(col("media")).as("fp"))
      .unionByName(files.filter(col("name").endsWith(".mp4"))
        .select(MediaVideoFp.media_video_fp(col("media")).as("fp")))
      .filter(col("fp").isNotNull).count()
    assert(fps == 6L, s"fingerprinted=$fps")

    // the whole ingest-to-verdict plan is UDF-free: signatures are
    // codegen expressions over the binaryFile scan
    val plan = idx.dropKnown(batch, "img_id", media_dhash(col("media")), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), "fixture UDFs leaked into the plan")
  }

  test("media signature expressions codegen-compile when one appears twice in a projection") {
    // regression: the fingerprint expressions used FIXED local variable
    // names in doGenCode, so two occurrences in one generated function
    // (the daemon's media gate plan) failed janino compilation and
    // silently fell back to the interpreter. GenerateUnsafeProjection
    // THROWS on compile failure, so this pins the fix.
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.BinaryType
    import graft.functions.{MediaAudioFp, MediaDHash, MediaVideoFp}
    val a = BoundReference(0, BinaryType, nullable = true)
    val b = BoundReference(1, BinaryType, nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(
      MediaDHash(a), MediaDHash(b), MediaAudioFp(a), MediaAudioFp(b),
      MediaVideoFp(a), MediaVideoFp(b)))
    val row = org.apache.spark.sql.catalyst.InternalRow(
      randBmp(1L), randBmp(2L))
    val out = proj(row)
    assert(out.getLong(0) == MediaDHash.dhashOf(randBmp(1L)).longValue)
    assert(out.getLong(1) == MediaDHash.dhashOf(randBmp(2L)).longValue)
  }

  test("degenerate-signature gate: hot buckets bounded, two-block AND tier, verdict channel") {
    import spark.implicits._
    // signatures constructed directly (sig is any Column): 4 × 16-bit
    // blocks, sig(v3,v2,v1,v0); blk0 = low 16 bits
    def mkSig(v3: Long, v2: Long, v1: Long, v0: Long): Long =
      (v3 << 48) | (v2 << 32) | (v1 << 16) | v0
    // mass1: 30 rows sharing block3=0xAAAA (hot at budget 8), other
    // blocks distinct (their buckets stay cold); mass2 likewise on
    // block2=0xBBBB — two independent degenerate masses
    val mass1 = (0 until 30).map(i =>
      (1000L + i, mkSig(0xAAAA, 0x1000 + i, 0x2000 + i, 0x3000 + i)))
    val mass2 = (0 until 30).map(i =>
      (2000L + i, mkSig(0x4000 + i, 0xBBBB, 0x5000 + i, 0x6000 + i)))
    // c*: in BOTH hot buckets, but the (block3=AAAA, block2=BBBB) PAIR
    // bucket holds only this row — the cold pair route tier B rides
    val cStar = Seq((777L, mkSig(0xAAAA, 0xBBBB, 0x7777, 0x8888)))
    val cCold = Seq((9L, mkSig(0x0009, 0x0019, 0x0029, 0x0039)))
    val corpus = (mass1 ++ mass2 ++ cStar ++ cCold).toDF("img_id", "sigv")
    val idx = MediaSigIndex.build(corpus, "img_id", col("sigv"))
    val batch = Seq(
      // hamming 2 vs c*, matching blocks {3, 2} BOTH hot singles →
      // only the pair-key AND tier can enumerate this match
      (100L, mkSig(0xAAAA, 0xBBBB, 0x7776, 0x8889)),
      // hamming 1 vs cCold through cold buckets only
      (101L, mkSig(0x0009, 0x0019, 0x0029, 0x0038)),
      // novel, nothing shared
      (102L, mkSig(0x0F0F, 0x0E0E, 0x0D0D, 0x0C0C)),
      // exact dup of mass1[0]: found via its COLD blocks (tier A)
      // even though block3 is hot
      (103L, mkSig(0xAAAA, 0x1000, 0x2000, 0x3000))
    ).toDF("img_id", "sigv")
    val m = idx.matchesOf(batch, "img_id", col("sigv"), maxDist = 3,
        hotBudget = 8)
      .select("id_batch", "id_corpus").as[(Long, Long)].collect().toSet
    assert(m.contains((100L, 777L)), s"two-block AND tier missed c*: $m")
    assert(m.contains((101L, 9L)), s"cold tier missed: $m")
    assert(m.contains((103L, 1000L)), s"hot-row cold-block match missed: $m")
    assert(!m.exists(_._1 == 102L), s"novel matched: $m")
    // 100 must NOT match the mass rows (hamming >> 3) — bounded does
    // not mean sloppy
    assert(!m.exists(p => p._1 == 100L && p._2 != 777L), s"$m")
    // verdict channel: exactly the rows that touched a hot bucket,
    // with the colliding mass visible
    val d = idx.degenerateOf(batch, "img_id", col("sigv"), hotBudget = 8)
      .select("id", "max_bucket_n").as[(Long, Long)].collect().toMap
    assert(d.keySet == Set(100L, 103L), s"degenerate=$d")
    assert(d(100L) == 31L, s"degenerate=$d") // mass1 + c* share (3, AAAA)
    // dropKnown treats degenerate rows as known → only the novel
    // image survives
    val kept = idx.dropKnown(batch, "img_id", col("sigv"), maxDist = 3,
        hotBudget = 8)
      .select("img_id").as[Long].collect().toSet
    assert(kept == Set(102L), s"kept=$kept")
    // hotBudget 0 DISABLES the gate entirely: exact unbounded matching,
    // NOTHING flagged degenerate, dropKnown drops true matches only
    // (the review found the ungated degenerateOf flagged every row
    // sharing any block value — a mass false-drop)
    assert(idx.degenerateOf(batch, "img_id", col("sigv"), hotBudget = 0)
      .count() == 0)
    val keptOff = idx.dropKnown(batch, "img_id", col("sigv"), maxDist = 3,
        hotBudget = 0)
      .select("img_id").as[Long].collect().toSet
    assert(keptOff == Set(102L), s"gate-off kept=$keptOff") // 100/101/103 match for real
    graft.operators.CacheScope.drain()
  }

  test("degenerate gate is a no-op on well-spread signatures") {
    import spark.implicits._
    val corpus = imgDf((1L to 40L).map(i => (i, randBmp(i * 131L))))
    val idx = MediaSigIndex.build(corpus, "img_id", media_dhash(col("media")))
    val batch = imgDf(Seq((500L, randBmp(131L, bump = true)),
      (501L, randBmp(424242L))))
    def probe(budget: Int) =
      idx.matchesOf(batch, "img_id", media_dhash(col("media")),
          maxDist = 3, hotBudget = budget)
        .select("id_batch", "id_corpus", "hamming")
        .as[(Long, Long, Int)].collect().toSet
    // gated result identical to the ungated (budget 0 = disabled) one
    assert(probe(1024) == probe(0))
    assert(idx.degenerateOf(batch, "img_id", media_dhash(col("media")))
      .count() == 0)
    graft.operators.CacheScope.drain()
  }

  test("counts sidecar: loaded-index gate equals the in-memory gate, appends stay exact") {
    import spark.implicits._
    def mkSig(v3: Long, v2: Long, v1: Long, v0: Long): Long =
      (v3 << 48) | (v2 << 32) | (v1 << 16) | v0
    // the degenerate-gate corpus again: one hot mass + cold rows
    val corpus = ((0 until 30).map(i =>
        (1000L + i, mkSig(0xAAAA, 0x1000 + i, 0x2000 + i, 0x3000 + i)))
      ++ Seq((9L, mkSig(0x0009, 0x0019, 0x0029, 0x0039))))
      .toDF("img_id", "sigv")
    val batch = Seq(
      (100L, mkSig(0xAAAA, 0x1000, 0x2000, 0x3001)),  // 1-bit off mass row
      (101L, mkSig(0x0009, 0x0019, 0x0029, 0x0038)),  // cold match
      (102L, mkSig(0x0F0F, 0x0E0E, 0x0D0D, 0x0C0C))   // novel
    ).toDF("img_id", "sigv")
    val mem = MediaSigIndex.build(corpus, "img_id", col("sigv"))
    val dir = tmp("ms_counts_idx")
    mem.save(dir)
    val disk = MediaSigIndex.load(spark, dir)
    assert(disk.counts.isDefined, "post-r13 artifact must carry the sidecar")
    def gate(i: MediaSigIndex) = (
      i.matchesOf(batch, "img_id", col("sigv"), maxDist = 3, hotBudget = 8)
        .select("id_batch", "id_corpus").as[(Long, Long)].collect().toSet,
      i.degenerateOf(batch, "img_id", col("sigv"), hotBudget = 8)
        .select("id", "max_bucket_n").as[(Long, Long)].collect().toMap)
    val (mMem, dMem) = gate(mem)
    val (mDisk, dDisk) = gate(disk)
    assert(mDisk == mMem, s"matches diverged: disk=$mDisk mem=$mMem")
    assert(dDisk == dMem, s"degenerate diverged: disk=$dDisk mem=$dMem")
    // append a slice through the delta log: sidecar counts must track
    // (the appended mass pushes a previously-cold bucket hot)
    val more = (0 until 20).map(i =>
        (3000L + i, mkSig(0x0009, 0x4000 + i, 0x5000 + i, 0x6000 + i)))
      .toDF("img_id", "sigv")
    disk.appendTo(dir, more, "img_id", col("sigv"))
    val d2 = MediaSigIndex.load(spark, dir)
      .degenerateOf(batch, "img_id", col("sigv"), hotBudget = 8)
      .select("id", "max_bucket_n").as[(Long, Long)].collect().toMap
    // (0, 0x0009)-block bucket now holds 21 distinct ids > budget 8 →
    // batch row 101 (whose blk3... block value 0x0009 rides blk index 3)
    // is flagged with the exact summed occupancy
    assert(d2.contains(101L) && d2(101L) == 21L, s"after append: $d2")
    graft.operators.CacheScope.drain()
  }

  test("wpindex mediasig CLI: build → probe → append round trip") {
    import spark.implicits._
    spark
    val cDir = tmp("ms_c"); val bDir = tmp("ms_b")
    val idx = tmp("ms_i"); val out = tmp("ms_o")
    imgDf(Seq((1L, randBmp(10L)), (2L, randBmp(50L))))
      .write.mode("overwrite").parquet(cDir)
    imgDf(Seq((100L, randBmp(10L, bump = true)), (101L, randBmp(9999L))))
      .write.mode("overwrite").parquet(bDir)
    graft.cli.Cli.main(Array("wpindex", "build", "mediasig", cDir, idx,
      "--id-col", "img_id"))
    graft.cli.Cli.main(Array("wpindex", "probe", "mediasig", bDir, idx, out,
      "--id-col", "img_id"))
    val got = spark.read.parquet(out)
      .select("id_batch", "id_corpus").as[(Long, Long)].collect().toSet
    assert(got.contains((100L, 1L)) && !got.exists(_._1 == 101L), s"got=$got")
    graft.cli.Cli.main(Array("wpindex", "append", "mediasig", bDir, idx,
      "--id-col", "img_id"))
    graft.cli.Cli.main(Array("wpindex", "probe", "mediasig", bDir, idx, out,
      "--id-col", "img_id"))
    assert(spark.read.parquet(out).filter(col("id_batch") === 101L).count() > 0)
  }
}
