package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
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
  * ParseWpl.parse_wpl directly without the extension.)
  *
  * The registration list itself lives in the companion so the SAME
  * triples serve two paths: the `spark.sql.extensions` config (applied
  * by Spark when the session is BUILT) and [[GraftExtensions.install]]
  * (applied to an already-live session). The second path exists because
  * `getOrCreate` silently ignores extension config when it returns an
  * existing session — any embedding (tests, notebooks, a shared REPL)
  * that did not control session creation needs a post-hoc register. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(e.injectFunction)
}

object GraftExtensions {
  type Builder = Seq[Expression] => Expression

  /** Register every engine SQL function into a LIVE session's
    * function registry — the order-independent path for sessions not
    * built with `spark.sql.extensions=graft.GraftExtensions`.
    * Idempotent: re-registering replaces the previous entry. */
  def install(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  private def intLit(x: Expression, fn: String, what: String): Int = x match {
    case Literal(n: Int, _) => n
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an int literal, got $other")
  }

  private def strLit(x: Expression, fn: String, what: String): String = x match {
    case Literal(s: UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a string literal, got $other")
  }

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = {
    def reg(name: String, cls: Class[_], builder: Builder) =
      (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder)
    Seq(
      reg("ip4_to_int", classOf[Ip4ToInt], args => Ip4ToInt(args.head)),
      reg("parse_wpl", classOf[ParseWpl], args =>
        ParseWpl(args.head, strLit(args(1), "parse_wpl", "second argument"))),
      reg("splitmix64", classOf[SplitMix64], args => SplitMix64(args.head)),
      reg("fnv1a64", classOf[Fnv1a64Expr], args => Fnv1a64Expr(args.head)),
      // text quality / identity signals
      reg("char_entropy", classOf[CharEntropy], args => CharEntropy(args.head)),
      reg("lang_id", classOf[LangId], args => LangId(args.head)),
      reg("doc_fingerprint", classOf[DocFingerprint],
        args => DocFingerprint(args.head)),
      // dedup signature kernels
      reg("simhash64", classOf[SimHash64], args => SimHash64(args.head)),
      reg("minhash_sig", classOf[MinHashSig], args =>
        MinHashSig(args.head, intLit(args(1), "minhash_sig", "second argument"))),
      // embeddings / multimodal
      reg("vec_dot", classOf[VecDot], args => VecDot(args.head, args(1))),
      reg("media_dhash", classOf[graft.functions.MediaDHash],
        args => graft.functions.MediaDHash(args.head)),
      reg("media_audio_fp", classOf[graft.functions.MediaAudioFp],
        args => graft.functions.MediaAudioFp(args.head)),
      reg("media_video_fp", classOf[graft.functions.MediaVideoFp],
        args => graft.functions.MediaVideoFp(args.head)),
      reg("media_meta", classOf[MediaMeta], args => MediaMeta(args.head)),
      // SpaceSaving heavy hitters: k and capacity as int literals; the
      // analyzer wraps the returned AggregateFunction itself
      reg("heavy_hitters", classOf[graft.functions.HeavyHitters], args =>
        graft.functions.HeavyHitters(args.head,
          intLit(args(1), "heavy_hitters", "k"),
          intLit(args(2), "heavy_hitters", "capacity"))),
      // quantile sketch: SQL form takes ONE quantile literal (the Column
      // API accepts a Seq); capacity as an int literal
      reg("quantile_sketch", classOf[graft.functions.QuantileSketch], args => {
        // accept any FOLDABLE double (0.5, 0.5D, CAST(0.5 AS DOUBLE)):
        // resolution happens before constant folding, so a bare Literal
        // match rejects the cast form users naturally write
        val q = args(1) match {
          case e if e.foldable => e.eval() match {
            case d: Double => d
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case other => throw new IllegalArgumentException(
              s"quantile_sketch: q must be a double constant, got $other")
          }
          case other => throw new IllegalArgumentException(
            s"quantile_sketch: q must be a double constant, got $other")
        }
        graft.functions.QuantileSketch(args.head, Seq(q),
          intLit(args(2), "quantile_sketch", "capacity"))
      }),
      // Aho–Corasick multi-pattern scan: patterns as one ';'-separated
      // string literal (the blocklist is a plan-time constant)
      reg("multi_match", classOf[graft.functions.MultiPatternStats], args =>
        graft.functions.MultiPatternStats(args.head,
          strLit(args(1), "multi_match", "patterns")
            .split(';').toSeq.filter(_.nonEmpty))),
      // Count–Min sketch: d (rows) and wExp (log2 width) as int literals
      reg("cms_sketch", classOf[graft.functions.CmsSketch], args =>
        graft.functions.CmsSketch(args.head,
          intLit(args(1), "cms_sketch", "d"),
          intLit(args(2), "cms_sketch", "wExp"))),
      // HyperLogLog distinct: p (register index bits) as an int literal
      reg("hll_distinct", classOf[graft.functions.HllSketch], args =>
        graft.functions.HllSketch(args.head,
          intLit(args(1), "hll_distinct", "p"))),
      // BPE apply: merges as one 'a b;c d;…' string literal (rank order)
      reg("bpe_apply", classOf[BpeApply], args => {
        val merges = strLit(args(1), "bpe_apply", "second argument")
          .split(';').toSeq.filter(_.nonEmpty).map { m =>
            val p = m.trim.split("\\s+")
            require(p.length == 2, s"bpe_apply: bad merge '$m'")
            (p(0), p(1))
          }
        BpeApply(args.head, merges)
      })
    )
  }
}
