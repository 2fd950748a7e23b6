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

  test("multimodal metadata fallback is deterministic in byte length") {
    val (fmt, n, w, h, f, ok) = Multimodal.sniffMeta("x".getBytes)
    assert(n == 1L && fmt == "jpeg" && w == 2 && h == 2 && f == 1)
    assert(ok)
    val (_, n2, _, _, f2, _) = Multimodal.sniffMeta(new Array[Byte](2500))
    assert(n2 == 2500 && f2 == 3)
    assert(!Multimodal.sniffMeta(null)._6)
  }

  test("multimodal header parse: real PNG/JPEG/GIF/BMP/WAV containers") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG: signature + IHDR(len=13) with width=800, height=600
    val png = b(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x03, 0x20, /*800*/ 0, 0, 0x02, 0x58, /*600*/ 8, 6, 0, 0, 0)
    assert(Multimodal.parseHeader(png) == ("png", 800, 600, 1))
    // JPEG: SOI, APP0 (len 16), SOF0 (len 17) with height=120, width=160
    val jpeg = b(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x10) ++ new Array[Byte](14) ++
      b(0xFF, 0xC0, 0x00, 0x11, 8, 0x00, 0x78, /*120*/ 0x00, 0xA0 /*160*/) ++
      new Array[Byte](10)
    assert(Multimodal.parseHeader(jpeg) == ("jpeg", 160, 120, 1))
    // GIF89a 320x200 (little-endian)
    val gif = "GIF89a".getBytes ++ b(0x40, 0x01, 0xC8, 0x00, 0, 0)
    assert(Multimodal.parseHeader(gif) == ("gif", 320, 200, 1))
    // BMP: BITMAPINFOHEADER width=64, height=-32 (top-down → abs)
    val bmp = "BM".getBytes ++ new Array[Byte](16) ++
      b(64, 0, 0, 0) ++ b(0xE0, 0xFF, 0xFF, 0xFF /* -32 */) ++ new Array[Byte](10)
    assert(Multimodal.parseHeader(bmp) == ("bmp", 64, 32, 1))
    // canonical WAV: 2ch 44100Hz 16-bit, data chunk of 8 frames
    val wav = "RIFF".getBytes ++ b(0x24, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ b(16, 0, 0, 0) ++
      b(1, 0, /*PCM*/ 2, 0 /*ch*/) ++ b(0x44, 0xAC, 0, 0 /*44100*/) ++
      b(0x10, 0xB1, 0x02, 0 /*byteRate*/) ++ b(4, 0 /*blockAlign*/) ++ b(16, 0) ++
      "data".getBytes ++ b(32, 0, 0, 0) ++ new Array[Byte](32)
    assert(Multimodal.parseHeader(wav) == ("wav", 44100, 2, 8))
    // sniffMeta routes container bytes through the real parser (ok=true)
    assert(Multimodal.sniffMeta(png) == ("png", png.length.toLong, 800, 600, 1, true))
    // and non-container bytes keep the length-derived fallback
    assert(Multimodal.parseHeader("just some text, not an image".getBytes) == null)
  }

  test("multimodal feature fallback: normalized 16-bin histogram") {
    val feats = Multimodal.extractFeatures(Array[Byte](0, 0, 16, 127, -1))
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0f) < 1e-5)
    assert(feats(0) == 0.4f) // two bytes in bin 0
  }
}
