package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media ride along as opaque `binary` columns with typed
  * metadata structs; decode / feature-extraction / resize / frame-sample
  * run as partition-local batch transforms.
  *
  * The actual codec calls are STUBBED (this container has no image/audio
  * libraries): `DecodeStub` derives deterministic fake metadata from the
  * bytes. Everything Spark-side is real — schemas, batch iteration shape
  * (fixed-size batches, mirroring Arrow-batch UDF execution), partition
  * sizing, and null/corrupt-row channeling — so swapping the stub for a
  * real codec is a one-function change. */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("ok", BooleanType)))

  /** Deterministic decode stub: metadata derived purely from byte length
    * (and thus reproducible in any oracle). A real implementation parses
    * the container header here. */
  def decodeStub(bytes: Array[Byte]): (String, Long, Int, Int, Int, Boolean) = {
    if (bytes == null) return ("unknown", 0L, 0, 0, 0, false)
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
