package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Framing
import graft.knowdb.RangeLookup
import graft.functions.Ip4ToInt
import graft.operators.Multimodal

class OperatorsSpec extends AnyFunSuite {

  test("ip4_to_int parse") {
    assert(Ip4ToInt.parse("0.0.0.0") == 0L)
    assert(Ip4ToInt.parse("255.255.255.255") == 4294967295L)
    assert(Ip4ToInt.parse("10.0.0.1") == 167772161L)
    assert(Ip4ToInt.parse("1.2.3") == -1L)
    assert(Ip4ToInt.parse("1.2.3.4.5") == -1L)
    assert(Ip4ToInt.parse("1.2.3.999") == -1L)
    assert(Ip4ToInt.parse("a.b.c.d") == -1L)
  }

  test("ipnet range derivation") {
    import graft.functions.IpNetRange
    assert(IpNetRange.range("10.1.0.0/16") == Some((167837696L, 167903231L)))
    assert(IpNetRange.range("192.168.0.0/24") == Some((3232235520L, 3232235775L)))
    assert(IpNetRange.range("0.0.0.0/0") == Some((0L, 4294967295L)))
    assert(IpNetRange.range("1.2.3.4/32") == Some((16909060L, 16909060L)))
    assert(IpNetRange.range("bad/8") == None)
    assert(IpNetRange.range("1.2.3.4/33") == None)
    assert(IpNetRange.contains("10.0.0.0/8", graft.functions.Ip4ToInt.parse("10.200.1.1")))
    assert(!IpNetRange.contains("10.0.0.0/8", graft.functions.Ip4ToInt.parse("11.0.0.1")))
  }

  test("range lookup binary search") {
    val rs = Array(
      RangeLookup.Range(0, 9, "a"),
      RangeLookup.Range(10, 19, "b"),
      RangeLookup.Range(30, 39, "c"))
    assert(RangeLookup.search(rs, 0) == "a")
    assert(RangeLookup.search(rs, 15) == "b")
    assert(RangeLookup.search(rs, 39) == "c")
    assert(RangeLookup.search(rs, 25) == null)
    assert(RangeLookup.search(rs, 100) == null)
  }

  test("syslog RFC5424 normalization") {
    import graft.sources.Syslog
    val h = Syslog.normalize(
      "<165>1 2023-05-15T07:09:12Z web01 app 1234 MSGID [sd@1 k=\"v\"] boom happened")
    assert(h.pri == Some(165))
    assert(h.facility == "local4" && h.severity == "notice")
    assert(h.host == "web01" && h.app == "app")
    assert(h.message == "boom happened")
    // RFC3164 and non-syslog fallthrough
    val b = Syslog.normalize("<34>Oct 11 22:14:15 host su: su root failed")
    assert(b.pri == Some(34) && b.host == "host" && b.app == "su")
    assert(Syslog.normalize("plain line").pri == None)
  }

  test("framing: line mode with CRLF") {
    val (frames, rest) = Framing.split("a\r\nbb\nccc".getBytes, Framing.Line)
    assert(frames == Vector("a", "bb"))
    assert(new String(rest) == "ccc")
  }

  test("framing: RFC6587 octet counting incl. incomplete tail") {
    val buf = "5 hello3 abc12 incomplete".getBytes
    assert(Framing.looksOctetCounted(buf))
    val (frames, rest) = Framing.split(buf, Framing.Len)
    assert(frames == Vector("hello", "abc"))
    assert(new String(rest) == "12 incomplete")
  }

  test("framing: auto detection") {
    val (f1, _) = Framing.split("4 abcd".getBytes, Framing.Auto)
    assert(f1 == Vector("abcd"))
    val (f2, _) = Framing.split("plain line\n".getBytes, Framing.Auto)
    assert(f2 == Vector("plain line"))
  }

  test("multimodal decode stub is deterministic in byte length") {
    val (fmt, n, w, h, f, ok) = Multimodal.decodeStub("x".getBytes)
    assert(n == 1L && fmt == "jpeg" && w == 2 && h == 2 && f == 1)
    assert(ok)
    val (_, n2, _, _, f2, _) = Multimodal.decodeStub(new Array[Byte](2500))
    assert(n2 == 2500 && f2 == 3)
    assert(!Multimodal.decodeStub(null)._6)
  }

  test("multimodal feature stub: normalized 16-bin histogram") {
    val feats = Multimodal.extractFeaturesStub(Array[Byte](0, 0, 16, 127, -1))
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0f) < 1e-5)
    assert(feats(0) == 0.4f) // two bytes in bin 0
  }
}
