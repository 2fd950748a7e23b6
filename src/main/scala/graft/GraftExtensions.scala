package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{BpeApply, CharEntropy, DocFingerprint, Fnv1a64Expr,
  Ip4ToInt, LangId, MediaMeta, MinHashSig, ParseWpl, SimHash64, SplitMix64,
  VecDot}

/** SparkSessionExtensions entry point — registers the engine's custom
  * expressions for SQL use:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT ip4_to_int(ip), parse_wpl(line, '<wpl source>') FROM logs
  *
  * (Scala callers can use graft.functions.Ip4ToInt.ip4_to_int /
  * ParseWpl.parse_wpl directly without the extension.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("ip4_to_int"),
      new ExpressionInfo(classOf[Ip4ToInt].getName, "ip4_to_int"),
      (args: Seq[Expression]) => Ip4ToInt(args.head)))
    e.injectFunction((
      FunctionIdentifier("parse_wpl"),
      new ExpressionInfo(classOf[ParseWpl].getName, "parse_wpl"),
      (args: Seq[Expression]) => {
        val src = args(1) match {
          case Literal(s: UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"parse_wpl: second argument must be a string literal, got $other")
        }
        ParseWpl(args.head, src)
      }))
    e.injectFunction((
      FunctionIdentifier("splitmix64"),
      new ExpressionInfo(classOf[SplitMix64].getName, "splitmix64"),
      (args: Seq[Expression]) => SplitMix64(args.head)))
    e.injectFunction((
      FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64Expr].getName, "fnv1a64"),
      (args: Seq[Expression]) => Fnv1a64Expr(args.head)))
    // text quality / identity signals
    e.injectFunction((
      FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      (args: Seq[Expression]) => CharEntropy(args.head)))
    e.injectFunction((
      FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangId].getName, "lang_id"),
      (args: Seq[Expression]) => LangId(args.head)))
    e.injectFunction((
      FunctionIdentifier("doc_fingerprint"),
      new ExpressionInfo(classOf[DocFingerprint].getName, "doc_fingerprint"),
      (args: Seq[Expression]) => DocFingerprint(args.head)))
    // dedup signature kernels
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args.head, args(1) match {
        case Literal(n: Int, _) => n
        case other => throw new IllegalArgumentException(
          s"minhash_sig: second argument must be an int literal, got $other")
      })))
    // embeddings / multimodal
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args.head, args(1))))
    e.injectFunction((
      FunctionIdentifier("media_dhash"),
      new ExpressionInfo(classOf[graft.functions.MediaDHash].getName,
        "media_dhash"),
      (args: Seq[Expression]) => graft.functions.MediaDHash(args.head)))
    e.injectFunction((
      FunctionIdentifier("media_audio_fp"),
      new ExpressionInfo(classOf[graft.functions.MediaAudioFp].getName,
        "media_audio_fp"),
      (args: Seq[Expression]) => graft.functions.MediaAudioFp(args.head)))
    e.injectFunction((
      FunctionIdentifier("media_video_fp"),
      new ExpressionInfo(classOf[graft.functions.MediaVideoFp].getName,
        "media_video_fp"),
      (args: Seq[Expression]) => graft.functions.MediaVideoFp(args.head)))
    e.injectFunction((
      FunctionIdentifier("media_meta"),
      new ExpressionInfo(classOf[MediaMeta].getName, "media_meta"),
      (args: Seq[Expression]) => MediaMeta(args.head)))
    // SpaceSaving heavy hitters: k and capacity as int literals; the
    // analyzer wraps the returned AggregateFunction itself
    e.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[graft.functions.HeavyHitters].getName,
        "heavy_hitters"),
      (args: Seq[Expression]) => {
        def intLit(x: Expression, what: String): Int = x match {
          case Literal(n: Int, _) => n
          case other => throw new IllegalArgumentException(
            s"heavy_hitters: $what must be an int literal, got $other")
        }
        graft.functions.HeavyHitters(args.head,
          intLit(args(1), "k"), intLit(args(2), "capacity"))
      }))
    // quantile sketch: SQL form takes ONE quantile literal (the Column
    // API accepts a Seq); capacity as an int literal
    e.injectFunction((
      FunctionIdentifier("quantile_sketch"),
      new ExpressionInfo(classOf[graft.functions.QuantileSketch].getName,
        "quantile_sketch"),
      (args: Seq[Expression]) => {
        val q = args(1) match {
          case Literal(d: Double, _) => d
          case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
          case other => throw new IllegalArgumentException(
            s"quantile_sketch: q must be a double literal, got $other")
        }
        val cap = args(2) match {
          case Literal(n: Int, _) => n
          case other => throw new IllegalArgumentException(
            s"quantile_sketch: capacity must be an int literal, got $other")
        }
        graft.functions.QuantileSketch(args.head, Seq(q), cap)
      }))
    // Aho–Corasick multi-pattern scan: patterns as one ';'-separated
    // string literal (the blocklist is a plan-time constant)
    e.injectFunction((
      FunctionIdentifier("multi_match"),
      new ExpressionInfo(classOf[graft.functions.MultiPatternStats].getName,
        "multi_match"),
      (args: Seq[Expression]) => {
        val pats = args(1) match {
          case Literal(s: UTF8String, _) =>
            s.toString.split(';').toSeq.filter(_.nonEmpty)
          case other => throw new IllegalArgumentException(
            s"multi_match: patterns must be a string literal, got $other")
        }
        graft.functions.MultiPatternStats(args.head, pats)
      }))
    // Count–Min sketch: d (rows) and wExp (log2 width) as int literals
    e.injectFunction((
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[graft.functions.CmsSketch].getName,
        "cms_sketch"),
      (args: Seq[Expression]) => {
        def intLit(x: Expression, what: String): Int = x match {
          case Literal(n: Int, _) => n
          case other => throw new IllegalArgumentException(
            s"cms_sketch: $what must be an int literal, got $other")
        }
        graft.functions.CmsSketch(args.head,
          intLit(args(1), "d"), intLit(args(2), "wExp"))
      }))
    // HyperLogLog distinct: p (register index bits) as an int literal
    e.injectFunction((
      FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[graft.functions.HllSketch].getName,
        "hll_distinct"),
      (args: Seq[Expression]) => {
        val p = args(1) match {
          case Literal(n: Int, _) => n
          case other => throw new IllegalArgumentException(
            s"hll_distinct: p must be an int literal, got $other")
        }
        graft.functions.HllSketch(args.head, p)
      }))
    // BPE apply: merges as one 'a b;c d;…' string literal (rank order)
    e.injectFunction((
      FunctionIdentifier("bpe_apply"),
      new ExpressionInfo(classOf[BpeApply].getName, "bpe_apply"),
      (args: Seq[Expression]) => {
        val merges = args(1) match {
          case Literal(s: UTF8String, _) =>
            s.toString.split(';').toSeq.filter(_.nonEmpty).map { m =>
              val p = m.trim.split("\\s+")
              require(p.length == 2, s"bpe_apply: bad merge '$m'")
              (p(0), p(1))
            }
          case other => throw new IllegalArgumentException(
            s"bpe_apply: second argument must be a string literal, got $other")
        }
        BpeApply(args.head, merges)
      }))
  }
}
