package graft.operators

/** Pluggable media-codec SPI for multimodal binary columns.
  *
  * A codec sniffs a container by magic bytes, extracts header metadata
  * (pure byte arithmetic), and — where decodable without external
  * dependencies — produces the raw per-channel samples (pixel channel
  * values for images, PCM samples for audio). MP4 stays header-only
  * (track decode genuinely needs codec jars); a deployment registers
  * richer codecs via [[MediaCodecs.register]].
  *
  * Built-ins with FULL sample decode:
  *  - BMP: uncompressed 24-bit BI_RGB (bottom-up or top-down rows,
  *    4-byte row padding) → R/G/B channel values, pure byte arithmetic
  *  - WAV: canonical RIFF/WAVE PCM 16-bit → per-channel samples, pure
  *    byte arithmetic
  *  - PNG / JPEG / GIF: R/G/B channels through the JDK's built-in
  *    ImageIO readers (java.desktop — part of Java SE, no external
  *    library); header metadata stays pure byte arithmetic
  */
trait MediaCodec {
  /** Short format tag, e.g. "bmp". */
  def format: String
  /** Cheap magic-byte check; first sniffing codec in registry order wins. */
  def sniff(b: Array[Byte]): Boolean
  /** Header metadata (width, height, nFrames) — see
    * [[Multimodal.mediaMetaType]] for the meaning per format family. */
  def meta(b: Array[Byte]): MediaCodec.Meta
  /** Full sample decode, or None when only the header is parseable
    * (either by format or because the payload is malformed). */
  def samples(b: Array[Byte]): Option[MediaCodec.Samples]
}

object MediaCodec {
  /** width/height for images; sampleRate/channels for audio. */
  final case class Meta(width: Int, height: Int, nFrames: Int)
  /** One Array[Double] per channel (R,G,B for images, ch0..chN for
    * audio), all the same length. */
  final case class Samples(channels: Array[Array[Double]])

  private[operators] def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private[operators] def le16s(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) | (b(i + 1) << 8)).toShort.toInt
  private[operators] def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
  private[operators] def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private[operators] def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private[operators] def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i >= 0 && i + s.length <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)
}

/** Uncompressed 24-bit BI_RGB BMP: full pixel decode.
  * Layout: 14-byte file header (pixel-data offset at byte 10), 40-byte
  * BITMAPINFOHEADER (width@18, height@22 — negative = top-down,
  * bitCount@28, compression@30), rows padded to 4 bytes, pixels stored
  * B,G,R; bottom row first when height > 0. */
object BmpCodec extends MediaCodec {
  import MediaCodec._
  val format = "bmp"
  def sniff(b: Array[Byte]): Boolean = ascii(b, 0, "BM")
  def meta(b: Array[Byte]): Meta =
    if (b.length < 26) Meta(0, 0, 1)
    else Meta(le32(b, 18), math.abs(le32(b, 22)), 1)

  def samples(b: Array[Byte]): Option[Samples] = {
    if (b.length < 54) return None
    val dataOff = le32(b, 10)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val h = math.abs(hRaw)
    val bitCount = le16(b, 28)
    val compression = le32(b, 30)
    if (bitCount != 24 || compression != 0 || w <= 0 || h == 0) return None
    val stride = (w * 3 + 3) & ~3
    if (dataOff < 54 || dataOff.toLong + stride.toLong * h > b.length) return None
    val n = w * h
    val r = new Array[Double](n)
    val g = new Array[Double](n)
    val bl = new Array[Double](n)
    var y = 0
    while (y < h) {
      // positive height ⇒ rows stored bottom-up; emit top-down scan order
      val srcRow = if (hRaw > 0) h - 1 - y else y
      var x = 0
      var p = dataOff + srcRow * stride
      val base = y * w
      while (x < w) {
        bl(base + x) = (b(p) & 0xFF).toDouble
        g(base + x) = (b(p + 1) & 0xFF).toDouble
        r(base + x) = (b(p + 2) & 0xFF).toDouble
        x += 1
        p += 3
      }
      y += 1
    }
    Some(Samples(Array(r, g, bl)))
  }
}

/** Canonical RIFF/WAVE, PCM 16-bit: full sample decode.
  * fmt chunk at offset 12 (audioFormat@20, channels@22, sampleRate@24,
  * blockAlign@32, bitsPerSample@34); chunk walk finds `data`. */
object WavCodec extends MediaCodec {
  import MediaCodec._
  val format = "wav"
  def sniff(b: Array[Byte]): Boolean =
    ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")

  private def dataChunk(b: Array[Byte]): (Int, Int) = {
    var i = 12
    while (i + 8 <= b.length) {
      val sz = le32(b, i + 4)
      if (ascii(b, i, "data")) return (i + 8, math.min(sz, b.length - i - 8))
      i += 8 + sz + (sz & 1)
    }
    (-1, 0)
  }

  def meta(b: Array[Byte]): Meta = {
    if (b.length < 44 || !ascii(b, 12, "fmt ")) return Meta(0, 0, 0)
    val channels = le16(b, 22)
    val sampleRate = le32(b, 24)
    val blockAlign = math.max(le16(b, 32), 1)
    val (_, sz) = dataChunk(b)
    Meta(sampleRate, channels, sz / blockAlign)
  }

  /** (dataOffset, bytesPerFrame, nFrames) for real PCM frame slicing
    * — a frame is one blockAlign-sized sample group, straight from the
    * header — or None when the container isn't a canonical WAV. */
  def frameBounds(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 44 || !sniff(b) || !ascii(b, 12, "fmt ")) return None
    val blockAlign = le16(b, 32)
    if (blockAlign <= 0) return None
    val (off, sz) = dataChunk(b)
    if (off < 0) return None
    Some((off, blockAlign, sz / blockAlign))
  }

  def samples(b: Array[Byte]): Option[Samples] = {
    if (b.length < 44 || !ascii(b, 12, "fmt ")) return None
    val audioFormat = le16(b, 20)
    val channels = le16(b, 22)
    val bits = le16(b, 34)
    if (audioFormat != 1 || bits != 16 || channels <= 0) return None
    val (off, sz) = dataChunk(b)
    if (off < 0) return None
    val frames = sz / (2 * channels)
    if (frames <= 0) return None
    val chans = Array.fill(channels)(new Array[Double](frames))
    var f = 0
    var p = off
    while (f < frames) {
      var c = 0
      while (c < channels) {
        chans(c)(f) = le16s(b, p).toDouble
        c += 1
        p += 2
      }
      f += 1
    }
    Some(Samples(chans))
  }
}

/** Shared RGB pixel decode through the JDK's built-in ImageIO plugins
  * (java.desktop ships PNG/JPEG/GIF/BMP readers — a JDK facility, not
  * an external dependency). Headless-safe; any decode failure degrades
  * to header-only (None), never throws into the expression. */
private[operators] object ImageIoDecode {
  def rgb(b: Array[Byte]): Option[MediaCodec.Samples] = {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
      val n = w * h
      val r = new Array[Double](n)
      val g = new Array[Double](n)
      val bl = new Array[Double](n)
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var i = 0
      while (i < n) {
        val p = px(i)
        r(i) = (p >> 16) & 0xFF
        g(i) = (p >> 8) & 0xFF
        bl(i) = p & 0xFF
        i += 1
      }
      Some(MediaCodec.Samples(Array(r, g, bl)))
    } catch { case _: Exception => None }
  }
}

/** PNG: full pixel decode (lossless) through the JDK ImageIO PNG
  * reader; header metadata stays pure byte arithmetic — signature +
  * IHDR width/height (big-endian, PNG spec §11.2.2). */
object PngCodec extends MediaCodec {
  import MediaCodec._
  val format = "png"
  def sniff(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xFF) == 0x89 && ascii(b, 1, "PNG")
  def meta(b: Array[Byte]): Meta =
    if (b.length >= 24 && ascii(b, 12, "IHDR")) Meta(be32(b, 16), be32(b, 20), 1)
    else Meta(0, 0, 1)
  def samples(b: Array[Byte]): Option[Samples] = ImageIoDecode.rgb(b)
}

/** JPEG: full pixel decode through graft's own exact-integer baseline
  * decoder ([[JpegBaseline]] — Huffman, dequant, fixed-point IDCT,
  * fixed-point BT.601 color convert), falling back to the JDK ImageIO
  * reader for streams outside baseline scope (progressive SOF2,
  * arithmetic coding, sampling factors > 2). The in-repo path makes
  * decoded values a deterministic pure function of the file bytes —
  * oracle-able — where ImageIO's IDCT/upsampling is reader-dependent.
  * Header metadata is a pure marker scan: SOI then the first SOFn
  * (C0–CF minus C4/C8/CC). */
object JpegCodec extends MediaCodec {
  import MediaCodec._
  val format = "jpeg"
  def sniff(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8
  def meta(b: Array[Byte]): Meta = {
    var i = 2
    while (i + 9 < b.length && (b(i) & 0xFF) == 0xFF) {
      val m = b(i + 1) & 0xFF
      if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC)
        return Meta(be16(b, i + 7), be16(b, i + 5), 1)
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD9)) i += 2 // standalone markers
      else i += 2 + be16(b, i + 2)
    }
    Meta(0, 0, 1) // SOI but truncated before SOF
  }
  def samples(b: Array[Byte]): Option[Samples] =
    (try JpegBaseline.decode(b).rgb.map(Samples)
     catch { case _: JpegBaseline.JpegFormatException => None })
      .orElse(ImageIoDecode.rgb(b))
}

/** GIF: full pixel decode through the JDK ImageIO GIF reader (first
  * frame). Header metadata: logical-screen width/height, LE. */
object GifCodec extends MediaCodec {
  import MediaCodec._
  val format = "gif"
  def sniff(b: Array[Byte]): Boolean =
    ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")
  def meta(b: Array[Byte]): Meta =
    if (b.length >= 10) Meta(le16(b, 6), le16(b, 8), 1) else Meta(0, 0, 1)
  def samples(b: Array[Byte]): Option[Samples] = ImageIoDecode.rgb(b)
}

/** MP4 / ISO-BMFF: header metadata via a pure byte box walk.
  * width/height: moov → trak → tkhd (16.16 fixed-point at content
  * offset 76 for tkhd v0, 88 for v1). n_frames: the video trak's
  * sample count from moov → trak → mdia → minf → stbl → stsz
  * (sample_count at content offset 8); when stsz is absent, the
  * movie duration in whole seconds from mvhd (duration/timescale —
  * v0: BE32 @ 12 / BE32 @ 16, v1: BE32 @ 20 / BE64 @ 24) stands in
  * as a lower bound. Sample decode stays out — video tracks
  * genuinely need codec libraries. */
object Mp4Codec extends MediaCodec {
  import MediaCodec._
  val format = "mp4"
  def sniff(b: Array[Byte]): Boolean = ascii(b, 4, "ftyp")

  /** Find a box by type inside [start, end); returns (contentOff,
    * boxEnd) or null. Box = BE32 size + 4-char type. */
  private def findBox(b: Array[Byte], start: Int, end: Int, name: String): (Int, Int) = {
    var i = start
    while (i + 8 <= end) {
      val sz = be32(b, i)
      if (sz < 8 || i + sz > end || i + sz < i) return null
      if (ascii(b, i + 4, name)) return (i + 8, i + sz)
      i += sz
    }
    null
  }

  /** Nested box lookup: findBox chained through a path of box types. */
  private def findPath(b: Array[Byte], start: Int, end: Int, path: String*): (Int, Int) = {
    var cur = (start, end)
    var i = 0
    while (cur != null && i < path.length) {
      cur = findBox(b, cur._1, cur._2, path(i))
      i += 1
    }
    cur
  }

  /** Movie duration in whole seconds from mvhd, or 0. */
  private def mvhdSeconds(b: Array[Byte], moovC: Int, moovEnd: Int): Long = {
    val mvhd = findBox(b, moovC, moovEnd, "mvhd")
    if (mvhd == null) return 0L
    val c = mvhd._1
    val v = b(c) & 0xFF
    if (v == 1) {
      if (c + 32 > mvhd._2) return 0L
      val ts = be32(b, c + 20).toLong & 0xFFFFFFFFL
      val dur = (be32(b, c + 24).toLong << 32) | (be32(b, c + 28).toLong & 0xFFFFFFFFL)
      if (ts > 0) dur / ts else 0L
    } else {
      if (c + 20 > mvhd._2) return 0L
      val ts = be32(b, c + 12).toLong & 0xFFFFFFFFL
      val dur = be32(b, c + 16).toLong & 0xFFFFFFFFL
      if (ts > 0) dur / ts else 0L
    }
  }

  def meta(b: Array[Byte]): Meta = {
    val moov = findBox(b, 0, b.length, "moov")
    if (moov == null) return Meta(0, 0, 0)
    // first trak with non-zero dims wins (audio tracks carry 0×0)
    var at = moov._1
    while (at < moov._2) {
      val trak = findBox(b, at, moov._2, "trak")
      if (trak == null) return Meta(0, 0, 0)
      val tkhd = findBox(b, trak._1, trak._2, "tkhd")
      if (tkhd != null) {
        val version = b(tkhd._1) & 0xFF
        val dimOff = tkhd._1 + (if (version == 1) 88 else 76)
        if (dimOff + 8 <= tkhd._2) {
          val w = be32(b, dimOff) >>> 16
          val h = be32(b, dimOff + 4) >>> 16
          if (w > 0 && h > 0) {
            // real frame count: this trak's stsz sample_count
            val stsz = findPath(b, trak._1, trak._2, "mdia", "minf", "stbl", "stsz")
            val nFrames =
              if (stsz != null && stsz._1 + 12 <= stsz._2) be32(b, stsz._1 + 8) else 0
            val n =
              if (nFrames > 0) nFrames
              else math.max(mvhdSeconds(b, moov._1, moov._2), 1L).min(Int.MaxValue).toInt
            return Meta(w, h, n)
          }
        }
      }
      at = trak._2
    }
    Meta(0, 0, 0)
  }

  /** REAL sample-byte extraction via the sample tables — the same
    * byte arithmetic BMP/WAV use, applied to ISO-BMFF: stsz gives the
    * per-sample sizes (fixed `sample_size` or the v0 table), stsc maps
    * samples to chunks (first_chunk runs), stco/co64 gives each chunk's
    * absolute file offset, and samples lie contiguously inside their
    * chunk. CODEC work (H.264 entropy decode etc.) is out of scope —
    * what this returns per sample is its exact byte extent and an
    * unsigned byte sum, which is the deterministic, oracle-able part of
    * "decode": channels(0) = per-sample byte sums, channels(1) =
    * per-sample sizes. Any malformed/truncated table → None. */
  def samples(b: Array[Byte]): Option[Samples] = {
    val moov = findBox(b, 0, b.length, "moov")
    if (moov == null) return None
    var at = moov._1
    while (at < moov._2) {
      val trak = findBox(b, at, moov._2, "trak")
      if (trak == null) return None
      val stbl = findPath(b, trak._1, trak._2, "mdia", "minf", "stbl")
      if (stbl != null) {
        val out = sampleSlices(b, stbl._1, stbl._2)
        if (out != null) return Some(out)
      }
      at = trak._2
    }
    None
  }

  private def sampleSlices(b: Array[Byte], stblC: Int, stblEnd: Int): Samples = {
    val stsz = findBox(b, stblC, stblEnd, "stsz")
    val stsc = findBox(b, stblC, stblEnd, "stsc")
    val stco = findBox(b, stblC, stblEnd, "stco")
    val co64 = if (stco == null) findBox(b, stblC, stblEnd, "co64") else null
    if (stsz == null || stsc == null || (stco == null && co64 == null)) return null
    // stsz: version/flags(4) sample_size(4) sample_count(4) [sizes...]
    if (stsz._1 + 12 > stsz._2) return null
    val fixedSize = be32(b, stsz._1 + 4)
    val nSamples = be32(b, stsz._1 + 8)
    if (nSamples <= 0 || nSamples > (1 << 24)) return null
    def sampleSize(i: Int): Int =
      if (fixedSize != 0) fixedSize
      else {
        val off = stsz._1 + 12 + i * 4
        if (off + 4 > stsz._2) -1 else be32(b, off)
      }
    // stco/co64: version/flags(4) entry_count(4) [offsets...]
    val (cBox, wide) = if (stco != null) (stco, false) else (co64, true)
    if (cBox._1 + 8 > cBox._2) return null
    val nChunks = be32(b, cBox._1 + 4)
    if (nChunks <= 0 || nChunks > (1 << 20)) return null
    def chunkOffset(ci: Int): Long = {
      val off = cBox._1 + 8 + ci * (if (wide) 8 else 4)
      if (wide) {
        if (off + 8 > cBox._2) return -1L
        (be32(b, off).toLong << 32) | (be32(b, off + 4).toLong & 0xFFFFFFFFL)
      } else {
        if (off + 4 > cBox._2) return -1L
        be32(b, off).toLong & 0xFFFFFFFFL
      }
    }
    // stsc: version/flags(4) entry_count(4) [(first_chunk, samples_per_chunk, desc)...]
    if (stsc._1 + 8 > stsc._2) return null
    val nRuns = be32(b, stsc._1 + 4)
    if (nRuns <= 0 || stsc._1 + 8 + nRuns * 12 > stsc._2) return null
    def run(i: Int): (Int, Int) = {
      val off = stsc._1 + 8 + i * 12
      (be32(b, off), be32(b, off + 4)) // (first_chunk 1-based, samples_per_chunk)
    }
    val sums = new Array[Double](nSamples)
    val sizes = new Array[Double](nSamples)
    var s = 0
    var ri = 0
    var chunk = 1
    while (s < nSamples && chunk <= nChunks) {
      // advance the stsc run covering this chunk
      while (ri + 1 < nRuns && run(ri + 1)._1 <= chunk) ri += 1
      val perChunk = run(ri)._2
      var cur = chunkOffset(chunk - 1)
      if (cur < 0) return null
      var k = 0
      while (k < perChunk && s < nSamples) {
        val sz = sampleSize(s)
        if (sz < 0 || cur + sz > b.length) return null
        var sum = 0L
        var j = 0
        while (j < sz) { sum += (b((cur + j).toInt) & 0xFF); j += 1 }
        sums(s) = sum.toDouble
        sizes(s) = sz.toDouble
        cur += sz
        s += 1
        k += 1
      }
      chunk += 1
    }
    if (s < nSamples) return null
    Samples(Array(sums, sizes))
  }
}

/** Registry: ordered sniff dispatch; deployments append codecs (e.g. a
  * javax.imageio-backed PNG decoder) before Spark jobs reference the
  * media expressions — the list is captured into codegen references at
  * plan time. */
object MediaCodecs {
  @volatile private var registry: Vector[MediaCodec] =
    Vector(PngCodec, JpegCodec, GifCodec, BmpCodec, WavCodec, Mp4Codec)

  def all: Seq[MediaCodec] = registry
  def register(c: MediaCodec): Unit = synchronized { registry = registry :+ c }

  def find(b: Array[Byte]): Option[MediaCodec] =
    if (b == null || b.length < 12) None else registry.find(_.sniff(b))
}
