package graft.wpl

import org.scalacheck.{Gen, Prop, Properties}
import graft.gen.WpGen

/** Property-based generator⇄parser round trip (the reference's de-facto
  * property test, tests/instance/wpl/benchmark round-trip) — ScalaCheck
  * drives random rule shapes AND random seeds. */
object RoundTripPropSpec extends Properties("wpl-roundtrip") {

  // a pool of field types whose generated text is unambiguous under a
  // comma separator (chars excluded mid-rule: it would swallow time text)
  private val fieldTypes =
    Seq("digit", "ip", "sn", "time", "float", "http/status", "port", "bool")

  private val ruleGen: Gen[String] = for {
    n <- Gen.choose(2, 8)
    types <- Gen.listOfN(n, Gen.oneOf(fieldTypes))
  } yield {
    val fields = types.zipWithIndex.map { case (t, i) => s"$t:f$i" }.mkString(",")
    s"package /prop { rule r { ($fields)\\, } }"
  }

  property("random rules: generated lines always parse back fully") =
    Prop.forAll(ruleGen, Gen.choose(0L, Long.MaxValue)) { (wpl: String, seed: Long) =>
      val rule = WplText.parsePackages(wpl).head
      val mp = new Runtime.MultiParser(Vector(rule))
      val rnd = new java.util.SplittableRandom(seed)
      (0 until 20).forall { _ =>
        val line = WpGen.genLine(rule, rnd)
        mp.parseLine(line) match {
          case PSuccess(k, fs) => k == "/prop/r" && fs.nonEmpty
          case _ => false
        }
      }
    }

  // alt/opt/some_of combinator round-trip (reference precompile.rs
  // generates through every parser; branch sampling covers every shape)
  private val comboRuleGen: Gen[String] = for {
    n <- Gen.choose(1, 3)
    seqTypes <- Gen.listOfN(n, Gen.oneOf(fieldTypes))
    altTypes <- Gen.pick(2, Seq("ip", "sn", "bool", "time"))
    someTypes <- Gen.pick(2, Seq("ip", "sn"))
  } yield {
    val seqF = seqTypes.zipWithIndex.map { case (t, i) => s"$t:s$i" }.mkString(",")
    val altF = altTypes.zipWithIndex.map { case (t, i) => s"$t:a$i" }.mkString(",")
    val someF = someTypes.zipWithIndex.map { case (t, i) => s"$t:m$i" }.mkString(",")
    s"""package /prop { rule r { ($seqF)\\,,alt($altF)\\,,opt(digit:o0)\\,,some_of($someF)\\, } }"""
  }

  property("alt/opt/some_of rules: sampled branches always parse back") =
    Prop.forAll(comboRuleGen, Gen.choose(0L, Long.MaxValue)) { (wpl: String, seed: Long) =>
      val rule = WplText.parsePackages(wpl).head
      val mp = new Runtime.MultiParser(Vector(rule))
      val rnd = new java.util.SplittableRandom(seed)
      (0 until 20).forall { _ =>
        val line = WpGen.genLine(rule, rnd)
        mp.parseLine(line) match {
          case PSuccess(k, _) => k == "/prop/r"
          case _ => false
        }
      }
    }

  private val kvGen: Gen[Map[String, String]] = Gen.nonEmptyMap(for {
    k <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
    v <- Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty)
  } yield (k, v))

  property("random kv payloads round-trip through kvarr") = {
    val mp = Runtime.compile("package /kv { rule r { (kvarr) } }")
    Prop.forAll(kvGen) { (m: Map[String, String]) =>
      val line = m.map { case (k, v) => s"$k=$v" }.mkString(" ")
      mp.parseLine(line) match {
        case PSuccess(_, fs) =>
          val got = fs.map(f => f.name -> f.value.sval).toMap
          // kvarr values are type-coerced on parse (AutoVal.typed: "007" →
          // WDigit(7)), so compare against the same normalization.
          got.keySet == m.keySet &&
            m.forall { case (k, v) => got(k) == AutoVal.typed(v).sval }
        case _ => false
      }
    }
  }
}
