package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{BmpCodec, MediaCodecs, Multimodal, WavCodec}
import graft.functions.{MediaChannelStats, MediaMeta}

/** Real multimodal decode: BMP pixel rows and WAV PCM frames are pure
  * byte arithmetic — these tests verify the decoders against the
  * closed-form synthesizers (so a header-offset, padding, channel-order
  * or sign bug fails loudly) and that the metadata path runs as a
  * codegen expression with no RDD hop. */
class MediaCodecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def expectedBmpMean(seed: Long, w: Int, h: Int, c: Int): Double = {
    var s = 0.0
    for (y <- 0 until h; x <- 0 until w)
      s += ((seed * 31 + y * 7 + x * 3 + c * 11) % 256 + 256) % 256
    s / (w * h)
  }

  test("BMP synth → decode round-trip: meta + channel means match closed form") {
    for (seed <- Seq(0L, 7L, 123L); (w, h) <- Seq((1, 1), (3, 2), (8, 5), (5, 7))) {
      val bytes = Multimodal.synthBmp(seed, w, h)
      assert(BmpCodec.sniff(bytes))
      val m = BmpCodec.meta(bytes)
      assert(m.width == w && m.height == h)
      val s = BmpCodec.samples(bytes).get
      assert(s.channels.length == 3)
      assert(s.channels(0).length == w * h)
      val st = MediaChannelStats.stats(bytes)
      for (c <- 0 until 3)
        assert(st.means(c) == expectedBmpMean(seed, w, h, c),
          s"seed=$seed w=$w h=$h c=$c")
    }
  }

  test("BMP row padding and bottom-up order are undone correctly") {
    // w=3 → raw row 9 bytes, stride 12: padding bugs shift channels
    val bytes = Multimodal.synthBmp(5L, 3, 4)
    val s = BmpCodec.samples(bytes).get
    // pixel (x=0, y=0) is the TOP-left in scan order; its R value:
    assert(s.channels(0)(0) == ((5L * 31) % 256).toDouble)
    // pixel (x=2, y=3): R = (5*31 + 3*7 + 2*3) % 256
    assert(s.channels(0)(3 * 3 + 2) == ((5L * 31 + 3 * 7 + 2 * 3) % 256).toDouble)
  }

  test("BMP top-down (negative height) decodes to the same scan order") {
    val bu = Multimodal.synthBmp(9L, 4, 3)
    // rewrite as top-down: negate height, reverse row blocks
    val stride = (4 * 3 + 3) & ~3
    val td = bu.clone()
    val hNeg = -3
    td(22) = hNeg.toByte; td(23) = (hNeg >> 8).toByte
    td(24) = (hNeg >> 16).toByte; td(25) = (hNeg >> 24).toByte
    for (y <- 0 until 3; i <- 0 until stride)
      td(54 + y * stride + i) = bu(54 + (3 - 1 - y) * stride + i)
    val a = BmpCodec.samples(bu).get
    val b = BmpCodec.samples(td).get
    for (c <- 0 until 3) assert(a.channels(c).sameElements(b.channels(c)))
  }

  test("BMP rejects non-24bpp / compressed / truncated payloads") {
    val ok = Multimodal.synthBmp(1L, 2, 2)
    val bpp8 = ok.clone(); bpp8(28) = 8
    assert(BmpCodec.samples(bpp8).isEmpty)
    val rle = ok.clone(); rle(30) = 1
    assert(BmpCodec.samples(rle).isEmpty)
    assert(BmpCodec.samples(ok.take(54 + 3)).isEmpty)
    assert(BmpCodec.samples(ok).isDefined)
  }

  test("WAV synth → decode round-trip: meta + per-channel mean/RMS") {
    for (seed <- Seq(0L, 42L); ch <- Seq(1, 2, 3); frames <- Seq(4, 19)) {
      val bytes = Multimodal.synthWav(seed, ch, frames)
      assert(WavCodec.sniff(bytes))
      val m = WavCodec.meta(bytes)
      assert(m.width == 8000 && m.height == ch && m.nFrames == frames)
      val s = WavCodec.samples(bytes).get
      assert(s.channels.length == ch && s.channels(0).length == frames)
      for (c <- 0 until ch; i <- 0 until frames) {
        val exp = ((seed * 131 + i * 17 + c * 29) % 2048 + 2048) % 2048 - 1024
        assert(s.channels(c)(i) == exp.toDouble, s"seed=$seed ch=$c i=$i")
      }
      val st = MediaChannelStats.stats(bytes)
      for (c <- 0 until ch) {
        var sum = 0.0; var sq = 0.0
        for (i <- 0 until frames) {
          val v = (((seed * 131 + i * 17 + c * 29) % 2048 + 2048) % 2048 - 1024).toDouble
          sum += v; sq += v * v
        }
        assert(st.means(c) == sum / frames)
        assert(st.rms(c) == math.sqrt(sq / frames))
      }
    }
  }

  test("WAV decode handles negative samples (sign extension)") {
    // seed 0, i 0, c 0 → sample -1024: encoded 0xFC00 LE
    val bytes = Multimodal.synthWav(0L, 1, 1)
    assert(WavCodec.samples(bytes).get.channels(0)(0) == -1024.0)
  }

  test("WAV rejects non-PCM and non-16-bit") {
    val ok = Multimodal.synthWav(1L, 2, 4)
    val float32 = ok.clone(); float32(20) = 3
    assert(WavCodec.samples(float32).isEmpty)
    val bits8 = ok.clone(); bits8(34) = 8
    assert(WavCodec.samples(bits8).isEmpty)
  }

  test("PNG synth → decode round-trip: lossless pixels match the closed form") {
    import graft.operators.{Multimodal, MediaCodecs, PngCodec}
    val b = Multimodal.synthPng(seed = 7L, w = 5, h = 3)
    assert(MediaCodecs.find(b).contains(PngCodec))
    assert(PngCodec.meta(b).width == 5 && PngCodec.meta(b).height == 3)
    val s = PngCodec.samples(b).get
    // channel order R,G,B; pixel (x,y) = ((7*31 + y*7 + x*3) + off) mod 256
    for (y <- 0 until 3; x <- 0 until 5; (off, c) <- Seq((0, 0), (11, 1), (22, 2))) {
      val expect = (((7L * 31 + y * 7 + x * 3 + off) % 256 + 256) % 256).toDouble
      assert(s.channels(c)(y * 5 + x) == expect, s"($x,$y) ch$c")
    }
  }

  test("JPEG decode through the JDK reader: dims exact, values near-lossless") {
    import graft.operators.{JpegCodec, MediaCodecs}
    // flat mid-gray compresses with minimal error
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val b = bos.toByteArray
    assert(MediaCodecs.find(b).contains(JpegCodec))
    assert(JpegCodec.meta(b).width == 8 && JpegCodec.meta(b).height == 6)
    val s = JpegCodec.samples(b).get
    for (c <- 0 until 3)
      assert(math.abs(s.channels(c).sum / s.channels(c).length - 128.0) < 4.0)
  }

  test("GIF decode through the JDK reader: palette image round-trips exactly") {
    import graft.operators.{GifCodec, MediaCodecs}
    // explicit 2-color palette → no quantization; 8×8 (the JDK GIF
    // writer mis-encodes sub-~8px images — an encoder LZW edge bug,
    // not a decode concern)
    val cm = new java.awt.image.IndexColorModel(1, 2,
      Array(0xFF.toByte, 0.toByte), Array(0.toByte, 0.toByte),
      Array(0.toByte, 0xFF.toByte))
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xFF0000 else 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val b = bos.toByteArray
    assert(MediaCodecs.find(b).contains(GifCodec))
    assert(GifCodec.meta(b).width == 8 && GifCodec.meta(b).height == 8)
    val s = GifCodec.samples(b).get
    for (y <- 0 until 8; x <- 0 until 8) {
      val i = y * 8 + x
      if ((x + y) % 2 == 0) assert(s.channels(0)(i) == 255.0 && s.channels(2)(i) == 0.0)
      else assert(s.channels(0)(i) == 0.0 && s.channels(2)(i) == 255.0)
    }
  }

  test("MP4 tkhd box walk extracts track dimensions") {
    import graft.operators.{Mp4Codec, MediaCodecs}
    def be32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(name: String, content: Array[Byte]): Array[Byte] =
      be32(8 + content.length) ++ name.getBytes("ASCII") ++ content
    // tkhd v0: ver/flags + fixed fields (72 bytes) + 16.16 width/height
    val tkhd = box("tkhd", new Array[Byte](76) ++ be32(640 << 16) ++ be32(360 << 16))
    // audio trak first (0×0 dims) — the walk must skip it
    val audioTkhd = box("tkhd", new Array[Byte](76) ++ be32(0) ++ be32(0))
    val moov = box("moov", box("trak", audioTkhd) ++ box("trak", tkhd))
    val bytes = box("ftyp", "isom".getBytes("ASCII")) ++ moov
    assert(MediaCodecs.find(bytes).contains(Mp4Codec))
    val m = Mp4Codec.meta(bytes)
    assert(m.width == 640 && m.height == 360, m.toString)
    // no stsz, no mvhd → n_frames floors at 1
    assert(m.nFrames == 1, m.toString)
    // truncated moov degrades to zeros, never throws
    assert(Mp4Codec.meta(bytes.take(30)) == graft.operators.MediaCodec.Meta(0, 0, 0))
  }

  test("MP4 n_frames: stsz sample count, mvhd duration fallback") {
    import graft.operators.Mp4Codec
    def be32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(name: String, content: Array[Byte]): Array[Byte] =
      be32(8 + content.length) ++ name.getBytes("ASCII") ++ content
    val tkhdDims = new Array[Byte](76) ++ be32(320 << 16) ++ be32(240 << 16)
    // mvhd v0: ver/flags(4) creation(4) modification(4) timescale(4) duration(4)
    val mvhd = box("mvhd", new Array[Byte](12) ++ be32(600) ++ be32(600 * 7))
    // stsz v0: ver/flags(4) sample_size(4) sample_count(4)
    val stsz = box("stsz", new Array[Byte](4) ++ be32(0) ++ be32(145))
    val stbl = box("stbl", stsz)
    val trakFull = box("trak", box("tkhd", tkhdDims) ++
      box("mdia", box("minf", stbl)))
    val withStsz = box("ftyp", "isom".getBytes("ASCII")) ++
      box("moov", mvhd ++ trakFull)
    val m1 = Mp4Codec.meta(withStsz)
    assert(m1.width == 320 && m1.height == 240 && m1.nFrames == 145, m1.toString)
    // no stsz → whole-second mvhd duration (4200/600 = 7) stands in
    val noStsz = box("ftyp", "isom".getBytes("ASCII")) ++
      box("moov", mvhd ++ box("trak", box("tkhd", tkhdDims)))
    assert(Mp4Codec.meta(noStsz).nFrames == 7, Mp4Codec.meta(noStsz).toString)
    // mvhd v1: 64-bit duration (timescale 1000, duration 12500ms → 12s)
    val mvhdV1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32(1000) ++ be32(0) ++ be32(12500))
    val v1 = box("ftyp", "isom".getBytes("ASCII")) ++
      box("moov", mvhdV1 ++ box("trak", box("tkhd", tkhdDims)))
    assert(Mp4Codec.meta(v1).nFrames == 12, Mp4Codec.meta(v1).toString)
  }

  test("WAV frame sampling slices real PCM frames at header-derived bounds") {
    val seed = 5L
    val channels = 2
    val frames = 20
    val bytes = Multimodal.synthWav(seed, channels, frames)
    // header-derived bounds: 44-byte canonical header, blockAlign = 4
    assert(WavCodec.frameBounds(bytes).contains((44, 2 * channels, frames)))

    val df = spark.createDataFrame(Seq((1L, bytes))).toDF("id", "media")
    val out = Multimodal.sampleFrames(df, "media", everyN = 4)
      .select("frame_idx", "frame_bytes")
      .collect().sortBy(_.getInt(0))
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 4, 8, 12, 16))
    // each sampled frame is one blockAlign slice whose samples match the
    // synth closed form ((seed·131 + i·17 + ch·29) mod 2048 − 1024)
    for (row <- out) {
      val f = row.getInt(0)
      val fb = row.getAs[Array[Byte]]("frame_bytes")
      assert(fb.length == 2 * channels)
      for (c <- 0 until channels) {
        val v = ((fb(2 * c) & 0xFF) | (fb(2 * c + 1) << 8)).toShort.toInt
        val want = ((seed * 131 + f * 17 + c * 29) % 2048 + 2048) % 2048 - 1024
        assert(v == want, s"frame $f ch $c: got $v want $want")
      }
    }
    // unknown bytes keep the deterministic byte-window fallback
    val blob = Array.tabulate[Byte](2500)(i => i.toByte)
    val fb = Multimodal.sampleFrames(
        spark.createDataFrame(Seq((1L, blob))).toDF("id", "media"), "media", everyN = 2)
      .select("frame_idx", "frame_bytes").collect().sortBy(_.getInt(0))
    assert(fb.map(_.getInt(0)).toSeq == Seq(0, 2))
    assert(fb(0).getAs[Array[Byte]]("frame_bytes").length == 1000)
  }

  test("codec SPI: registration order and custom codec extension") {
    assert(MediaCodecs.find(Multimodal.synthBmp(1L, 2, 2)).map(_.format).contains("bmp"))
    assert(MediaCodecs.find(Multimodal.synthWav(1L, 1, 4)).map(_.format).contains("wav"))
    assert(MediaCodecs.find("no container here, just text".getBytes).isEmpty)
    assert(MediaCodecs.find(null).isEmpty)
  }

  test("features: real per-channel mean/RMS for decodable media, histogram fallback") {
    val wav = Multimodal.extractFeatures(Multimodal.synthWav(3L, 2, 8))
    assert(wav(0) == 2.0f) // channel count discriminator
    val st = MediaChannelStats.stats(Multimodal.synthWav(3L, 2, 8))
    assert(wav(1) == st.means(0).toFloat && wav(2) == st.rms(0).toFloat)
    val fallback = Multimodal.extractFeatures("plain text".getBytes)
    assert(math.abs(fallback.sum - 1.0f) < 1e-5) // normalized histogram
  }

  test("media_meta expression: codegen plan, no RDD scan, pruning intact") {
    import spark.implicits._
    val df = (0L until 50L).toDF("id")
      .withColumn("media", Multimodal.synthBmpUdf(col("id"), lit(4), lit(3)))
      .withColumn("pad", lit("unused"))
    val out = Multimodal.decode(df, "media")
      .select(col("id"), col("media_meta.format"), col("media_meta.width"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD"), plan)
    val rows = out.collect()
    assert(rows.length == 50 && rows.forall(r => r.getString(1) == "bmp" && r.getInt(2) == 4))
  }

  test("MP4 synth → sample decode: stsz sizes + two-chunk stsc/stco walk") {
    import graft.operators.Mp4Codec
    val seed = 7L
    val n = 9 // odd → chunks of 5 and 4
    val b = Multimodal.synthMp4(seed, n, 64, 48)
    // meta: dims from tkhd 16.16, n_frames from stsz sample_count
    val m = Mp4Codec.meta(b)
    assert(m.width == 64 && m.height == 48 && m.nFrames == n)
    // samples: exact per-sample byte extents from the real tables
    val s = Mp4Codec.samples(b).get
    assert(s.channels.length == 2 && s.channels(0).length == n)
    for (i <- 0 until n) {
      val sz = (((seed + i * 5) % 24 + 24) % 24).toInt + 8
      val expSum = (0 until sz).map(j => ((seed * 31 + i * 7 + j * 3) % 256 + 256) % 256).sum
      assert(s.channels(1)(i) == sz.toDouble, s"size[$i]")
      assert(s.channels(0)(i) == expSum.toDouble, s"sum[$i]")
    }
    // single-sample container takes the 1-chunk stsc/stco path
    val one = Multimodal.synthMp4(3L, 1, 8, 8)
    assert(Mp4Codec.samples(one).get.channels(0).length == 1)
    // a truncated mdat (table points past the end) → None, not a throw
    val cut = b.take(b.length - 5)
    assert(Mp4Codec.samples(cut).isEmpty)
    // corrupting the stco offset to point past EOF → None
    assert(Mp4Codec.samples(b.take(40)).isEmpty)
  }

  test("media expressions evaluate identically interpreted vs codegen") {
    import spark.implicits._
    import graft.functions.MediaChannelMeans.media_channel_means
    import graft.functions.MediaChannelRms.media_channel_rms
    val df = (0L until 10L).toDF("id")
      .withColumn("media", Multimodal.synthWavUdf(col("id"), lit(2), lit(6)))
      .select(col("id"), MediaMeta.media_meta(col("media")).as("m"),
        media_channel_means(col("media")).as("mu"),
        media_channel_rms(col("media")).as("rm"))
    val rows = df.collect()
    for (r <- rows) {
      val id = r.getLong(0)
      val st = MediaChannelStats.stats(Multimodal.synthWav(id, 2, 6))
      val mu = r.getSeq[Double](2)
      assert(mu == st.means.toSeq)
      val rm = r.getSeq[Double](3)
      assert(rm == st.rms.toSeq)
    }
    // null / non-media inputs
    val n = spark.sql("SELECT CAST(NULL AS BINARY) AS media")
      .select(media_channel_means(col("media")).as("mu"))
    assert(n.collect()(0).isNullAt(0))
    val txt = spark.sql("SELECT CAST('hello' AS BINARY) AS media")
      .select(media_channel_means(col("media")).as("mu"),
        MediaMeta.media_meta(col("media")).as("m"))
    val row = txt.collect()(0)
    assert(row.isNullAt(0)) // no samples for non-containers
    assert(!row.isNullAt(1)) // but metadata falls back deterministically
  }
}
