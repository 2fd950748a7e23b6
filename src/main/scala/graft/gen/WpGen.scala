package graft.gen

import java.util.SplittableRandom
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.TaskContext
import graft.wpl._

/** wpgen — WPL rules run in reverse (reference src/runtime/generator +
  * crates/wp-lang precompile.rs:10-36: every field parser implements
  * `generate`). A rule compiles to a line generator whose output the same
  * rule parses back 100% — the reference's de-facto property test
  * (tests/instance/wpl/benchmark/gen_rule.wpl round-trip).
  *
  * Spark-side: `spark.range(n).mapPartitions` with per-partition seeds —
  * fully distributed, deterministic for a fixed (seed, partitioning). */
object WpGen {

  /** Per-field generation config (reference gen_field.toml:1-6 — e.g. ip
    * range beg/end, digit ranges, chars length). Keyed by field name. */
  sealed trait FieldConf
  final case class IpRange(beg: String, end: String) extends FieldConf
  final case class DigitRange(min: Long, max: Long) extends FieldConf
  final case class CharsLen(len: Int) extends FieldConf
  final case class OneOf(values: Seq[String]) extends FieldConf

  def genField(conf: FieldConf, rnd: SplittableRandom): String = conf match {
    case IpRange(beg, end) =>
      val b = graft.functions.Ip4ToInt.parse(beg)
      val e = graft.functions.Ip4ToInt.parse(end)
      val v = b + (if (e > b) rnd.nextLong(e - b + 1) else 0L)
      s"${(v >> 24) & 255}.${(v >> 16) & 255}.${(v >> 8) & 255}.${v & 255}"
    case DigitRange(min, max) => (min + rnd.nextLong(max - min + 1)).toString
    case CharsLen(n) =>
      val a = "abcdefghijklmnopqrstuvwxyz0123456789"
      Iterator.fill(n)(a.charAt(rnd.nextInt(a.length))).mkString
    case OneOf(vs) => vs(rnd.nextInt(vs.size))
  }

  /** Generate one line for a rule, covering every combinator the parser
    * side has (reference precompile.rs:10-36 — every parser implements
    * `generate`; the combinator sampling here widens the round-trip
    * oracle to alt/opt/some_of shapes):
    *  - seq: every member, in order
    *  - alt: ONE member, sampled uniformly (not always the first branch)
    *  - opt: include the body with p=1/2
    *  - some_of: 1..2·|members| rounds, a random member each round
    *  - not: generates nothing (negative lookahead has no surface text)
    */
  def genLine(rule: WplRule, rnd: SplittableRandom,
              conf: Map[String, FieldConf] = Map.empty): String = {
    val sb = new StringBuilder
    for (g <- rule.groups) {
      val gSep = sepText(g.sep.getOrElse(Sep.Default))
      var first = sb.isEmpty
      val fields: Vector[WplField] = g.meta match {
        case "alt" => Vector(g.fields(rnd.nextInt(g.fields.length)))
        case "opt" => if (rnd.nextBoolean()) g.fields else Vector.empty
        case "some_of" =>
          val rounds = 1 + rnd.nextInt(2 * g.fields.length)
          Vector.fill(rounds)(g.fields(rnd.nextInt(g.fields.length)))
        case "not" => Vector.empty
        case _ => g.fields
      }
      for (f <- fields) {
        val fSep = f.sep.map(sepText).getOrElse(gSep)
        val reps = f.repeat match {
          case None => 1
          case Some(0) => 1 + rnd.nextInt(3)
          case Some(n) => n
        }
        for (_ <- 0 until reps) {
          if (!first) sb.append(fSep)
          first = false
          val p = Runtime.parserFor(f.typeName, f.symbolContent)
          val core = f.name.flatMap(conf.get) match {
            case Some(fc) => genField(fc, rnd)
            case None => p.gen(rnd)
          }
          f.fmt match {
            case Some(ScopeFmt(b, e)) => sb.append(b).append(core).append(e)
            case Some(QuoteFmt) => sb.append('"').append(core).append('"')
            case None => sb.append(core)
          }
        }
      }
    }
    sb.toString
  }

  private def sepText(s: Sep): String = s match {
    case Sep.Lit(x) => x
    case _ => " "
  }

  /** Distributed generation: n lines for `ruleKey` from `wplSource`. */
  def dataset(spark: SparkSession, wplSource: String, ruleKey: String,
              n: Long, seed: Long = 42L): Dataset[String] = {
    import spark.implicits._
    spark.range(n).mapPartitions { it =>
      val rule = WplText.parsePackages(wplSource).find(_.key == ruleKey)
        .getOrElse(throw new IllegalArgumentException(s"no rule $ruleKey"))
      val pid = TaskContext.getPartitionId()
      val rnd = new SplittableRandom(seed + pid * 0x9E3779B97F4A7C15L)
      it.map(_ => genLine(rule, rnd))
    }
  }

  /** Speed profiles (reference SpeedProfile, src/runtime/generator/speed/
    * profile.rs: constant / ramp / burst): map a wall-clock second to a
    * target rate; daemon-style generation pairs a profile with the `rate`
    * source (rowsPerSecond is re-settable per trigger via the profile). */
  sealed trait SpeedProfile { def rateAt(sec: Long): Long }
  final case class Constant(rps: Long) extends SpeedProfile {
    def rateAt(sec: Long): Long = rps
  }
  final case class Ramp(startRps: Long, endRps: Long, durationSec: Long) extends SpeedProfile {
    def rateAt(sec: Long): Long =
      if (sec >= durationSec) endRps
      else startRps + (endRps - startRps) * sec / durationSec
  }
  final case class Burst(baseRps: Long, burstRps: Long, periodSec: Long,
                         burstSec: Long) extends SpeedProfile {
    def rateAt(sec: Long): Long =
      if (sec % periodSec < burstSec) burstRps else baseRps
  }

  /** Streaming generator: `rate` source paced at the profile's initial
    * rate, each tick mapped through the rule generator (daemon analogue
    * of `wpgen rule`; exact pacing of later ticks is the trigger's job). */
  def stream(spark: SparkSession, wplSource: String, ruleKey: String,
             profile: SpeedProfile, seed: Long = 42L) = {
    import spark.implicits._
    spark.readStream.format("rate")
      .option("rowsPerSecond", profile.rateAt(0).toString).load()
      .select("value").as[Long]
      .mapPartitions { it =>
        val rule = WplText.parsePackages(wplSource).find(_.key == ruleKey)
          .getOrElse(throw new IllegalArgumentException(s"no rule $ruleKey"))
        it.map { i =>
          val rnd = new SplittableRandom(seed ^ i) // per-row seed: restart-stable
          genLine(rule, rnd)
        }
      }
  }

  /** Sample-based generation: replay/permute existing lines (reference
    * src/runtime/generator/sample.rs). */
  def fromSample(spark: SparkSession, lines: Dataset[String], n: Long,
                 seed: Long = 42L): Dataset[String] = {
    import spark.implicits._
    // broadcast the pool: shipped once per executor, not serialized into
    // every task closure (sample pools are small by convention, but the
    // closure copy multiplies by task count)
    val pool = spark.sparkContext.broadcast(lines.collect())
    spark.range(n).mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val rnd = new SplittableRandom(seed + pid)
      it.map(_ => pool.value(rnd.nextInt(pool.value.length)))
    }
  }
}
