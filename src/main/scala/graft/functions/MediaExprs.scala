package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{MediaCodec, MediaCodecs, Multimodal}

/** Catalyst expressions over binary media columns. These keep the
  * metadata/feature path inside whole-stage codegen — the previous
  * `df.rdd.mapPartitions` decode hop broke codegen AND column pruning
  * through the decode stage; an expression restores both (the scan
  * below a `media_meta(bin)` projection prunes to just `bin`). */

private[functions] trait MediaExprHelper { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a binary input, got $other")
  }
}

/** `media_meta(bin)` → struct<format,n_bytes,width,height,n_frames,ok>.
  * Sniffs the codec registry; bytes matching no container fall back to
  * deterministic length-derived metadata (ok=false) so unknown blobs
  * stay analyzable and reproducible in oracles. */
case class MediaMeta(child: Expression) extends UnaryExpression with MediaExprHelper {
  override def dataType: DataType = Multimodal.mediaMetaType
  override def prettyName: String = "media_meta"

  override def nullSafeEval(a: Any): Any =
    MediaMeta.metaOf(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MediaMeta.metaOf($a);")

  override protected def withNewChildInternal(newChild: Expression): MediaMeta =
    copy(child = newChild)
}

object MediaMeta {
  def metaOf(b: Array[Byte]): InternalRow = {
    val (fmt, n, w, h, f, ok) = Multimodal.sniffMeta(b)
    InternalRow(UTF8String.fromString(fmt), n, w, h, f, ok)
  }

  def media_meta(bin: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      MediaMeta(org.apache.spark.sql.GraftExprBridge.expression(bin)))
}

/** `media_channel_means(bin)` → array<double> of per-channel sample
  * means (R,G,B pixel means for decodable images, per-channel PCM means
  * for audio); null when no registered codec can decode samples. */
case class MediaChannelMeans(child: Expression) extends UnaryExpression with MediaExprHelper {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "media_channel_means"

  override def nullSafeEval(a: Any): Any =
    MediaChannelMeans.meansOf(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.MediaChannelMeans.meansOf($a);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): MediaChannelMeans =
    copy(child = newChild)
}

object MediaChannelMeans {
  def meansOf(b: Array[Byte]): ArrayData =
    MediaChannelStats.stats(b) match {
      case null => null
      case s => new GenericArrayData(s.means)
    }

  def media_channel_means(bin: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      MediaChannelMeans(org.apache.spark.sql.GraftExprBridge.expression(bin)))
}

/** `media_channel_rms(bin)` → array<double> of per-channel RMS
  * (√(Σx²/n)); null when samples aren't decodable. */
case class MediaChannelRms(child: Expression) extends UnaryExpression with MediaExprHelper {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "media_channel_rms"

  override def nullSafeEval(a: Any): Any =
    MediaChannelRms.rmsOf(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.MediaChannelRms.rmsOf($a);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): MediaChannelRms =
    copy(child = newChild)
}

object MediaChannelRms {
  def rmsOf(b: Array[Byte]): ArrayData =
    MediaChannelStats.stats(b) match {
      case null => null
      case s => new GenericArrayData(s.rms)
    }

  def media_channel_rms(bin: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      MediaChannelRms(org.apache.spark.sql.GraftExprBridge.expression(bin)))
}

object MediaChannelStats {
  final class Stats(val means: Array[Double], val rms: Array[Double])

  /** Shared per-channel Σx / Σx² pass; sums over sub-2^53 integer-valued
    * samples are exact in Double, so mean = Σ/n and rms = √(Σx²/n) are
    * deterministic across engines (the oracle recomputes them in SQL). */
  def stats(b: Array[Byte]): Stats = {
    val samples = MediaCodecs.find(b).flatMap(_.samples(b)).orNull
    if (samples == null) return null
    val nc = samples.channels.length
    val means = new Array[Double](nc)
    val rms = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val xs = samples.channels(c)
      var s = 0.0
      var s2 = 0.0
      var i = 0
      while (i < xs.length) { val x = xs(i); s += x; s2 += x * x; i += 1 }
      val n = math.max(xs.length, 1)
      means(c) = s / n
      rms(c) = math.sqrt(s2 / n)
      c += 1
    }
    new Stats(means, rms)
  }
}

/** `media_dhash(bin)` → the 64-bit DIFFERENCE HASH (dHash, the
  * perceptual near-dup signature: Krawetz, "Kind of Like That", 2013)
  * of a decodable RGB image; null for audio/undecodable media. The
  * image-side counterpart of [[SimHash64]]: constant-luma shifts and
  * re-encodes leave the hash nearly unchanged, so hamming-distance
  * pairs find visually-duplicated images the byte-hash dedup misses.
  *
  * Deterministic by construction — and therefore DuckDB-replayable on
  * the synthetic corpus: integer BT.601 luma ((299R+587G+114B)/1000,
  * pure Long math, no FP), nearest-neighbor 9×8 grid sampling
  * (sx_i = i·w/9, sy_j = j·h/8 — integer division, no interpolation
  * kernel to disagree over), bit (j,i) set iff gray(sx_{i+1}) >
  * gray(sx_i) on row sy_j. Tiny images degrade gracefully (w=1 ⇒ all
  * zero bits): callers that mine pairs should floor the resolution. */
case class MediaDHash(child: Expression) extends UnaryExpression with MediaExprHelper {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "media_dhash"

  override def nullSafeEval(a: Any): Any =
    MediaDHash.dhashOf(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName: a fixed local here redefines itself when the
      // expression appears twice in one codegen function (the daemon's
      // media gate hit exactly that)
      val v = ctx.freshName("dhv")
      s"""
      java.lang.Long $v = graft.functions.MediaDHash.dhashOf($a);
      ${ev.isNull} = $v == null;
      ${ev.value} = ${ev.isNull} ? -1L : $v.longValue();"""
    })

  override protected def withNewChildInternal(newChild: Expression): MediaDHash =
    copy(child = newChild)
}

object MediaDHash {
  def dhashOf(b: Array[Byte]): java.lang.Long = {
    val codec = MediaCodecs.find(b).orNull
    if (codec == null) return null
    val m = codec.meta(b)
    if (m.width <= 0 || m.height <= 0) return null
    val s = codec.samples(b).orNull
    if (s == null || s.channels.length != 3) return null
    val r = s.channels(0); val g = s.channels(1); val bl = s.channels(2)
    val w = m.width; val h = m.height
    if (r.length < w * h) return null
    def gray(x: Int, y: Int): Long = {
      val i = y * w + x
      (299L * r(i).toLong + 587L * g(i).toLong + 114L * bl(i).toLong) / 1000L
    }
    var hash = 0L
    var j = 0
    while (j < 8) {
      val sy = j * h / 8
      var i = 0
      while (i < 8) {
        if (gray((i + 1) * w / 9, sy) > gray(i * w / 9, sy))
          hash |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    java.lang.Long.valueOf(hash)
  }

  def media_dhash(bin: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      MediaDHash(org.apache.spark.sql.GraftExprBridge.expression(bin)))
}

/** `media_audio_fp(bin)` → 64-bit sign-of-derivative audio fingerprint
  * of a decodable PCM stream (the Shazam-family intuition reduced to
  * its deterministic core: the SHAPE of the waveform, not its level):
  * 65 anchor samples at t_k = k·n/65 over channel 0, bit k set iff
  * x(t_{k+1}) > x(t_k). Level-invariant by construction — a DC offset
  * or re-gain that preserves ordering leaves every bit unchanged, so
  * hamming pairs (via [[graft.operators.Dedup.hammingPairsFromSig]])
  * find re-encoded/re-leveled copies the byte hash misses. The audio
  * twin of [[MediaDHash]]; pure integer index math + exact PCM integer
  * comparisons ⇒ DuckDB-replayable on the synthetic WAV formula. */
case class MediaAudioFp(child: Expression) extends UnaryExpression with MediaExprHelper {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "media_audio_fp"

  override def nullSafeEval(a: Any): Any =
    MediaAudioFp.afpOf(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("afpv")
      s"""
      java.lang.Long $v = graft.functions.MediaAudioFp.afpOf($a);
      ${ev.isNull} = $v == null;
      ${ev.value} = ${ev.isNull} ? -1L : $v.longValue();"""
    })

  override protected def withNewChildInternal(newChild: Expression): MediaAudioFp =
    copy(child = newChild)
}

object MediaAudioFp {
  /** Shared 65-anchor sign-of-derivative hash over any sample sequence
    * — bit k set iff x(t_{k+1}) > x(t_k), t_k = k·n/65 (pure integer
    * index math; both fingerprints and their oracles use it). */
  private[functions] def seqDiffHash(x: Array[Double]): Long = {
    val n = x.length
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (x((k + 1) * n / 65) > x(k * n / 65)) hash |= 1L << k
      k += 1
    }
    hash
  }

  def afpOf(b: Array[Byte]): java.lang.Long = {
    val codec = MediaCodecs.find(b).orNull
    if (codec == null || codec.format != "wav") return null
    val s = codec.samples(b).orNull
    if (s == null || s.channels.isEmpty || s.channels(0).length == 0) return null
    java.lang.Long.valueOf(seqDiffHash(s.channels(0)))
  }

  def media_audio_fp(bin: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      MediaAudioFp(org.apache.spark.sql.GraftExprBridge.expression(bin)))
}

/** `media_video_fp(bin)` → 64-bit sign-of-derivative fingerprint over
  * an MP4 track's per-sample BYTE-SUM sequence (the sample-table walk
  * is the deterministic, codec-independent part of video decode — see
  * [[graft.operators.Mp4Codec.samples]]): the shape of the bitstream's
  * per-frame "energy" over time. Re-muxed or offset-shifted copies
  * preserve the sample ordering and hash identically; a re-cut stream
  * does not. Completes the multimodal fingerprint trio (image dHash /
  * audio PCM shape / video sample-sum shape), all three mined for
  * pairs by the same 16-bit-block hamming kernel. */
case class MediaVideoFp(child: Expression) extends UnaryExpression with MediaExprHelper {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "media_video_fp"

  override def nullSafeEval(a: Any): Any =
    MediaVideoFp.vfpOf(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("vfpv")
      s"""
      java.lang.Long $v = graft.functions.MediaVideoFp.vfpOf($a);
      ${ev.isNull} = $v == null;
      ${ev.value} = ${ev.isNull} ? -1L : $v.longValue();"""
    })

  override protected def withNewChildInternal(newChild: Expression): MediaVideoFp =
    copy(child = newChild)
}

object MediaVideoFp {
  def vfpOf(b: Array[Byte]): java.lang.Long = {
    val codec = MediaCodecs.find(b).orNull
    if (codec == null || codec.format != "mp4") return null
    val s = codec.samples(b).orNull
    if (s == null || s.channels.isEmpty || s.channels(0).length == 0) return null
    java.lang.Long.valueOf(MediaAudioFp.seqDiffHash(s.channels(0)))
  }

  def media_video_fp(bin: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      MediaVideoFp(org.apache.spark.sql.GraftExprBridge.expression(bin)))
}
