package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media ride along as opaque `binary` columns with typed
  * metadata structs; decode / feature-extraction / resize / frame-sample
  * run as partition-local batch transforms.
  *
  * Container-HEADER parsing is REAL — magic-byte format sniffing plus
  * PNG IHDR / JPEG SOF / GIF screen descriptor / BMP info header /
  * canonical WAV fmt-chunk dimension extraction, all pure byte
  * arithmetic with no codec libraries. PIXEL decode (and model
  * inference) stays stubbed: this container has no image/audio libs, so
  * `extractFeaturesStub` derives deterministic features and bytes that
  * match no known container fall back to `decodeStub`'s
  * length-derived metadata (reproducible in oracles). */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("ok", BooleanType)))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  /** Real container-header metadata: (format, width, height, n_frames),
    * or null if the bytes match no known container.
    *
    *  - PNG: 8-byte signature, IHDR width/height at offsets 16/20
    *    (big-endian; PNG spec §11.2.2)
    *  - JPEG: FFD8 SOI, then marker scan to the first SOFn (C0-CF minus
    *    C4/C8/CC) for height/width
    *  - GIF: GIF87a/89a logical-screen width/height (little-endian)
    *  - BMP: BITMAPINFOHEADER width/|height| at 18/22
    *  - WAV: canonical RIFF/WAVE with fmt at 12 — width=sample rate,
    *    height=channels, n_frames=data bytes / block align
    *  - MP4/ISO-BMFF: ftyp box at 4 (dims need a full box walk: 0x0) */
  def parseHeader(b: Array[Byte]): (String, Int, Int, Int) = {
    if (b == null || b.length < 12) return null
    // PNG
    if ((b(0) & 0xFF) == 0x89 && ascii(b, 1, "PNG") && b.length >= 24 && ascii(b, 12, "IHDR"))
      return ("png", be32(b, 16), be32(b, 20), 1)
    // JPEG: scan markers for SOFn
    if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      var i = 2
      while (i + 9 < b.length && (b(i) & 0xFF) == 0xFF) {
        val m = b(i + 1) & 0xFF
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC)
          return ("jpeg", be16(b, i + 7), be16(b, i + 5), 1)
        if (m == 0xD8 || (m >= 0xD0 && m <= 0xD9)) i += 2 // standalone markers
        else i += 2 + be16(b, i + 2)
      }
      return ("jpeg", 0, 0, 1) // SOI but truncated before SOF
    }
    // GIF
    if (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a"))
      return ("gif", le16(b, 6), le16(b, 8), 1)
    // BMP
    if (ascii(b, 0, "BM") && b.length >= 26)
      return ("bmp", le32(b, 18), math.abs(le32(b, 22)), 1)
    // WAV (canonical layout: fmt chunk at 12)
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE") && b.length >= 44 && ascii(b, 12, "fmt ")) {
      val channels = le16(b, 22)
      val sampleRate = le32(b, 24)
      val blockAlign = le16(b, 32).max(1)
      // find the data chunk (usually at 36)
      var i = 12
      var frames = 0
      while (i + 8 <= b.length) {
        val sz = le32(b, i + 4)
        if (ascii(b, i, "data")) { frames = sz / blockAlign; i = b.length }
        else i += 8 + sz + (sz & 1)
      }
      return ("wav", sampleRate, channels, frames)
    }
    // MP4 / ISO-BMFF
    if (ascii(b, 4, "ftyp")) return ("mp4", 0, 0, 0)
    null
  }

  /** Deterministic fallback for bytes that match no known container:
    * metadata derived purely from byte length (and thus reproducible in
    * any oracle). */
  def decodeStub(bytes: Array[Byte]): (String, Long, Int, Int, Int, Boolean) = {
    if (bytes == null) return ("unknown", 0L, 0, 0, 0, false)
    val real = parseHeader(bytes)
    if (real != null)
      return (real._1, bytes.length.toLong, real._2, real._3, real._4, true)
    val n = bytes.length.toLong
    val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
    (fmt, n, (n % 640 + 1).toInt, (n % 480 + 1).toInt, (n / 1000 + 1).toInt, n > 0)
  }

  /** Decode a binary column → metadata struct. Batched mapPartitions with
    * a bounded batch size — the Scala analogue of mapInPandas' Arrow
    * batches: codecs amortize setup per batch, memory stays bounded. */
  def decode(df: DataFrame, binCol: String, outCol: String = "media_meta",
             batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+ StructField(outCol, mediaMetaType))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec context would be created here
        batch.iterator.map { row =>
          val bytes = if (row.isNullAt(binIdx)) null else row.getAs[Array[Byte]](binIdx)
          val (fmt, n, w, h, f, ok) = decodeStub(bytes)
          Row.fromSeq(row.toSeq :+ Row(fmt, n, w, h, f, ok))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Deterministic feature-extraction stub: a 16-dim byte-histogram
    * embedding (real impl: model inference per batch). */
  def extractFeaturesStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xFF) / 16) += 1.0f; i += 1 }
      var s = 0.0f
      hist.foreach(s += _)
      if (s > 0) { var j = 0; while (j < 16) { hist(j) /= s; j += 1 } }
    }
    hist
  }

  val extractFeaturesUdf = udf(extractFeaturesStub _)

  /** Frame sampling stub: pick every k-th "frame" offset; real impl seeks
    * keyframes. Emits (frame_idx, frame_bytes) rows via posexplode. */
  def sampleFrames(df: DataFrame, binCol: String, everyN: Int = 10): DataFrame = {
    val frameUdf = udf((bytes: Array[Byte]) => {
      if (bytes == null) Seq.empty[Array[Byte]]
      else {
        val frameLen = 1000
        val nFrames = bytes.length / frameLen + 1
        (0 until nFrames by everyN).map { f =>
          val start = f * frameLen
          java.util.Arrays.copyOfRange(bytes, start.min(bytes.length),
            (start + frameLen).min(bytes.length))
        }
      }
    })
    df.withColumn("frames", frameUdf(col(binCol)))
      .select(col("*"), posexplode_outer(col("frames")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
      .drop("frames")
  }
}
