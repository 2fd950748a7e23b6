package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.wpl._
import graft.sinks.{Formatters, SinkRouter}
import graft.gen.WpGen

/** Generator round-trip (reference's de-facto property test), formatters,
  * condition language — all pure-Scala (no Spark session). */
class EngineSpec extends AnyFunSuite {

  test("wpgen round-trip: generated lines parse back 100%") {
    val wpl =
      """package /gen {
         rule g1 { (digit:id,ip:src,chars:name,time:at,http/status:st)\, }
         rule g2 { (ip:a,digit:b,sn:c) }
        }"""
    val rules = WplText.parsePackages(wpl)
    val rnd = new java.util.SplittableRandom(42)
    for (rule <- rules) {
      val mp = new Runtime.MultiParser(Vector(rule))
      for (i <- 0 until 500) {
        val line = WpGen.genLine(rule, rnd)
        mp.parseLine(line) match {
          case PSuccess(k, fs) =>
            assert(k == rule.key)
            assert(fs.nonEmpty)
          case other => fail(s"round-trip failed for '$line': $other")
        }
      }
    }
  }

  test("wpgen quoted/scope formats round-trip") {
    val wpl = """package /g { rule q { (chars:a",time:b<[,]>,digit:c) } }"""
    val rule = WplText.parsePackages(wpl).head
    val rnd = new java.util.SplittableRandom(7)
    val mp = new Runtime.MultiParser(Vector(rule))
    for (_ <- 0 until 200) {
      val line = WpGen.genLine(rule, rnd)
      assert(mp.parseLine(line).isInstanceOf[PSuccess], s"line: $line")
    }
  }

  test("wpgen field config: ip/digit ranges honored and still parse") {
    import WpGen._
    val wpl = """package /c { rule r { (ip:src,digit:port,chars:tag)\, } }"""
    val rule = WplText.parsePackages(wpl).head
    val conf = Map[String, FieldConf](
      "src" -> IpRange("10.0.0.0", "10.0.0.255"),
      "port" -> DigitRange(8000, 8999),
      "tag" -> OneOf(Seq("web", "db", "cache")))
    val rnd = new java.util.SplittableRandom(3)
    val mp = new Runtime.MultiParser(Vector(rule))
    for (_ <- 0 until 300) {
      val line = genLine(rule, rnd, conf)
      mp.parseLine(line) match {
        case PSuccess(_, fs) =>
          val m = fs.map(f => f.name -> f.value.sval).toMap
          assert(m("src").startsWith("10.0.0."))
          assert(m("port").toInt >= 8000 && m("port").toInt <= 8999)
          assert(Set("web", "db", "cache").contains(m("tag")))
        case o => fail(s"$line -> $o")
      }
    }
  }

  test("formatters: json/kv/csv/raw/proto_text") {
    val fs = Vector(
      WField("host", WChars("a,b")),
      WField("port", WDigit(80)),
      WField("ok", WBool(true)),
      WField("req", WObj(Vector("method" -> WChars("GET")))))
    assert(Formatters.json(fs) ==
      """{"host":"a,b","port":80,"ok":true,"req":{"method":"GET"}}""")
    assert(Formatters.kv(fs) == """host=a,b port=80 ok=true req={"method":"GET"}""")
    assert(Formatters.csv(fs) == "\"a,b\",80,true,\"{\"\"method\"\":\"\"GET\"\"}\"")
    assert(Formatters.raw(Vector(WField("raw_log", WChars("orig line"))) ++ fs) == "orig line")
    assert(Formatters.protoText(fs) ==
      """host: "a,b" port: 80 ok: true req { method: "GET" }""")
  }

  test("condition language parses and models reference ops") {
    import SinkRouter._
    val c = parseCond("""isset($user) and not ($st == digit(404) or $msg =* chars(warn*))""")
    assert(c == And(IsSet("user"),
      Not(Or(Cmp("st", "==", "digit", "404"), Cmp("msg", "=*", "chars", "warn*")))))
    val c2 = parseCond("$v >= float(1.5)")
    assert(c2 == Cmp("v", ">=", "float", "1.5"))
  }

  test("expect-count validation (wproj parity)") {
    import SinkRouter._
    assert(validateExpect(95, 100, Expect(ratio = Some(1.0), tol = 0.05)))
    assert(!validateExpect(90, 100, Expect(ratio = Some(1.0), tol = 0.05)))
    assert(validateExpect(10, 0, Expect(min = Some(5), max = Some(20))))
    assert(!validateExpect(30, 0, Expect(max = Some(20))))
  }

  test("adaptive reordering keeps results identical") {
    val wpl =
      """package /r {
         rule a { (digit:x,chars:y) }
         rule b { (ip:x,chars:y) }
        }"""
    val mp = Runtime.compile(wpl)
    // push > 10000 lines that all hit rule b; results must stay correct
    // across the reorder boundary (order changes, first-full-match doesn't)
    var i = 0
    while (i < 10050) {
      val o = mp.parseLine(s"1.2.3.4 hello$i")
      assert(o == PSuccess("/r/b", Vector(WField("x", WIp("1.2.3.4")),
        WField("y", WChars(s"hello$i")))))
      i += 1
    }
    assert(mp.parseLine("42 world") ==
      PSuccess("/r/a", Vector(WField("x", WDigit(42)), WField("y", WChars("world")))))
  }
}
