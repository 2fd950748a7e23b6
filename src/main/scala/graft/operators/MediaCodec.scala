package graft.operators

/** Pluggable media-codec SPI for multimodal binary columns.
  *
  * A codec sniffs a container by magic bytes, extracts header metadata
  * (pure byte arithmetic), and — where the format is decodable without
  * external libraries — produces the raw per-channel samples (pixel
  * channel values for images, PCM samples for audio). Formats whose
  * payload needs a real codec library (PNG/JPEG/GIF entropy-coded
  * pixels, MP4 tracks) are header-only built-ins; a deployment with
  * codec jars registers richer codecs via [[MediaCodecs.register]].
  *
  * Built-ins with FULL sample decode (no libs needed, byte arithmetic
  * only):
  *  - BMP: uncompressed 24-bit BI_RGB (bottom-up or top-down rows,
  *    4-byte row padding) → R/G/B channel values in top-down scan order
  *  - WAV: canonical RIFF/WAVE PCM 16-bit → per-channel sample values
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

/** PNG: header-only (IDAT pixels are zlib+filter coded — needs a codec
  * lib; register one via the SPI). Signature + IHDR width/height
  * (big-endian, PNG spec §11.2.2). */
object PngCodec extends MediaCodec {
  import MediaCodec._
  val format = "png"
  def sniff(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xFF) == 0x89 && ascii(b, 1, "PNG")
  def meta(b: Array[Byte]): Meta =
    if (b.length >= 24 && ascii(b, 12, "IHDR")) Meta(be32(b, 16), be32(b, 20), 1)
    else Meta(0, 0, 1)
  def samples(b: Array[Byte]): Option[Samples] = None
}

/** JPEG: header-only (entropy-coded payload). SOI then marker scan to
  * the first SOFn (C0–CF minus C4/C8/CC) for height/width. */
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
  def samples(b: Array[Byte]): Option[Samples] = None
}

/** GIF: header-only (LZW payload). Logical-screen width/height, LE. */
object GifCodec extends MediaCodec {
  import MediaCodec._
  val format = "gif"
  def sniff(b: Array[Byte]): Boolean =
    ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")
  def meta(b: Array[Byte]): Meta =
    if (b.length >= 10) Meta(le16(b, 6), le16(b, 8), 1) else Meta(0, 0, 1)
  def samples(b: Array[Byte]): Option[Samples] = None
}

/** MP4 / ISO-BMFF: header-only (track dims need a full box walk +
  * sample decode). */
object Mp4Codec extends MediaCodec {
  import MediaCodec._
  val format = "mp4"
  def sniff(b: Array[Byte]): Boolean = ascii(b, 4, "ftyp")
  def meta(b: Array[Byte]): Meta = Meta(0, 0, 0)
  def samples(b: Array[Byte]): Option[Samples] = None
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
