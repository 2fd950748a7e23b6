package graft.wpl

import java.util.SplittableRandom
import VParser.isAsciiDigit

/** Result of one typed-parser invocation: either a single (optionally
  * renamed) value, or multiple named fields (kv/kvarr/json splat). */
sealed trait Parsed
final case class One(v: WValue) extends Parsed
final case class Named(fs: Vector[(String, WValue)]) extends Parsed

/** Typed value parsers (reference factory:
  * crates/wp-lang/src/eval/value/parser/factory.rs:41-73). Each parser is
  * content-driven: it consumes from the cursor what its own syntax allows,
  * using `sep` only where the type is separator-bounded (chars, kv value).
  * `parseSegment` parses an exact pre-extracted segment (scope/quote
  * formats). `gen` is the wpgen mirror (§2.8): emits a string the parser
  * itself accepts (round-trip property).
  *
  * ABI: `parse`/`parseSegment` return `null` on failure — no Option
  * wrapper. One `Parsed` node per successful field is the only
  * allocation besides the `WValue` itself (which lands in the record).
  */
abstract class VParser(val typeName: String) extends Serializable {
  /** null = no match (cursor restored by the parser or by the caller). */
  def parse(cur: Cursor, sep: Sep): Parsed
  /** Parse an exact pre-extracted segment; null = no match. */
  def parseSegment(seg: String): Parsed = {
    val c = new Cursor(seg)
    val p = parse(c, VParser.EolSep)
    if (p == null) return null
    var i = c.pos
    while (i < seg.length) {
      if (!Character.isWhitespace(seg.charAt(i))) return null
      i += 1
    }
    p
  }
  def gen(rnd: SplittableRandom): String = "x"
}

object VParser {
  /** A separator that never matches — token runs to end of input. */
  object EolSep extends Sep {
    def find(input: String, from: Int): Long = Sep.NotFound
    def consumeAt(input: String, pos: Int): Int = -1
  }

  @inline def isIdent(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '.' || c == '-'

  /** ASCII digit test — Char.isDigit consults the Unicode tables
    * (CharacterDataLatin1 showed up in parse-loop leaf samples) and the
    * reference's winnow digit1 is ASCII-only anyway. */
  @inline def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  def tokenTo(cur: Cursor, sep: Sep): String = {
    val f = sep.find(cur.input, cur.pos)
    if (f != Sep.NotFound) {
      val end = Sep.tokenEnd(f)
      val t = cur.input.substring(cur.pos, end); cur.pos = end; t
    } else {
      val t = cur.rest; cur.pos = cur.len; t
    }
  }

  def digitRun(cur: Cursor): String = {
    val start = cur.pos
    if (!cur.atEnd && (cur.peek == '-' || cur.peek == '+')) cur.pos += 1
    while (!cur.atEnd && isAsciiDigit(cur.peek)) cur.pos += 1
    if (cur.pos > start && isAsciiDigit(cur.input.charAt(cur.pos - 1)))
      cur.input.substring(start, cur.pos)
    else { cur.pos = start; "" }
  }
}

// ---------------------------------------------------------------------------
// Base parsers
// ---------------------------------------------------------------------------

/** chars — separator-bounded token (reference base/chars.rs). */
object CharsP extends VParser("chars") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val t = VParser.tokenTo(cur, sep)
    if (t.isEmpty) null else One(WChars(t))
  }
  override def parseSegment(seg: String): Parsed = One(WChars(seg))
  private val alpha = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
  override def gen(rnd: SplittableRandom): String =
    Iterator.fill(8 + rnd.nextInt(12))(alpha.charAt(rnd.nextInt(alpha.length))).mkString
}

/** `_` ignore — consume one separator-bounded token, discard. */
object IgnoreP extends VParser("_") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    // like tokenTo but without materializing the token string
    val f = sep.find(cur.input, cur.pos)
    val end = if (f != Sep.NotFound) Sep.tokenEnd(f) else cur.len
    if (end == cur.pos) null else { cur.pos = end; IgnoreP.ignored }
  }
  private val ignored: Parsed = One(WIgnore)
  override def gen(rnd: SplittableRandom): String = "-"
}

final class SymbolP(content: String, peek: Boolean) extends VParser(if (peek) "peek_symbol" else "symbol") {
  def parse(cur: Cursor, sep: Sep): Parsed =
    if (cur.input.startsWith(content, cur.pos)) {
      if (!peek) cur.pos += content.length
      One(WChars(content))
    } else null
  override def gen(rnd: SplittableRandom): String = content
}

object BoolP extends VParser("bool") {
  def parse(cur: Cursor, sep: Sep): Parsed =
    if (cur.input.startsWith("true", cur.pos)) { cur.pos += 4; One(WBool(true)) }
    else if (cur.input.startsWith("false", cur.pos)) { cur.pos += 5; One(WBool(false)) }
    else null
  override def gen(rnd: SplittableRandom): String = if (rnd.nextBoolean()) "true" else "false"
}

object DigitP extends VParser("digit") {
  /** Parse a clean integer at the cursor; Long.MinValue = no match.
    * (MinValue itself is unparseable by this grammar: 20 digits max 19.) */
  def parseLong(cur: Cursor): Long = {
    val in = cur.input; val start = cur.pos
    var p = start
    var neg = false
    if (p < in.length && (in.charAt(p) == '-' || in.charAt(p) == '+')) {
      neg = in.charAt(p) == '-'; p += 1
    }
    var v = 0L; var n = 0
    while (p < in.length && { val c = in.charAt(p); c >= '0' && c <= '9' }) {
      v = v * 10 + (in.charAt(p) - '0'); p += 1; n += 1
    }
    if (n == 0 || n > 18) { cur.pos = start; return Long.MinValue }
    if (p < in.length && { val c = in.charAt(p); c == '.' || Character.isLetterOrDigit(c) }) {
      cur.pos = start; return Long.MinValue // not a clean integer boundary
    }
    cur.pos = p
    if (neg) -v else v
  }
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val v = parseLong(cur)
    if (v == Long.MinValue) null else One(WDigit(v))
  }
  override def gen(rnd: SplittableRandom): String = rnd.nextInt(1000000).toString
}

object PortP extends VParser("port") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val m = cur.mark
    val v = DigitP.parseLong(cur)
    if (v >= 0 && v <= 65535) One(WDigit(v)) else { cur.reset(m); null }
  }
  override def gen(rnd: SplittableRandom): String = (1 + rnd.nextInt(65535)).toString
}

object FloatP extends VParser("float") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val start = cur.pos
    if (!cur.atEnd && (cur.peek == '-' || cur.peek == '+')) cur.pos += 1
    var digits = 0
    while (!cur.atEnd && isAsciiDigit(cur.peek)) { cur.pos += 1; digits += 1 }
    var hasDot = false
    if (!cur.atEnd && cur.peek == '.') {
      hasDot = true; cur.pos += 1
      while (!cur.atEnd && isAsciiDigit(cur.peek)) { cur.pos += 1; digits += 1 }
    }
    var hasExp = false
    if (!cur.atEnd && (cur.peek == 'e' || cur.peek == 'E')) {
      val m = cur.pos; cur.pos += 1
      if (!cur.atEnd && (cur.peek == '-' || cur.peek == '+')) cur.pos += 1
      if (!cur.atEnd && isAsciiDigit(cur.peek)) { hasExp = true; while (!cur.atEnd && isAsciiDigit(cur.peek)) cur.pos += 1 }
      else cur.pos = m
    }
    if (digits == 0 || !(hasDot || hasExp) ||
        (!cur.atEnd && Character.isLetterOrDigit(cur.peek))) { cur.pos = start; null }
    else try One(WFloat(cur.input.substring(start, cur.pos).toDouble))
    catch { case _: NumberFormatException => cur.pos = start; null }
  }
  override def gen(rnd: SplittableRandom): String = f"${rnd.nextDouble() * 1000}%.3f"
}

object HexP extends VParser("hex") {
  @inline private def isHex(c: Char) =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val start = cur.pos
    if (cur.input.startsWith("0x", cur.pos) || cur.input.startsWith("0X", cur.pos)) cur.pos += 2
    val hstart = cur.pos
    while (!cur.atEnd && isHex(cur.peek)) cur.pos += 1
    if (cur.pos == hstart) { cur.pos = start; null }
    else {
      // decoded-content retention (reference base/hex.rs hex_uint): the
      // value is the parsed number, tagged with its hex encoding
      val raw = cur.input.substring(start, cur.pos)
      val digits = cur.input.substring(hstart, cur.pos)
      One(WDecoded("hex", raw, BigInt(digits, 16).toString))
    }
  }
  override def gen(rnd: SplittableRandom): String = f"0x${rnd.nextInt(1 << 30)}%08x"
}

object Base64P extends VParser("base64") {
  @inline private def isB64(c: Char) =
    Character.isLetterOrDigit(c) || c == '+' || c == '/' || c == '='
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val start = cur.pos
    while (!cur.atEnd && isB64(cur.peek)) cur.pos += 1
    if (cur.pos == start) return null
    val raw = cur.input.substring(start, cur.pos)
    // decoded-content retention (reference protocol/base64.rs): the value
    // is the DECODED string tagged base64; undecodable text is a parse
    // failure, matching the reference's fail-on-decode-error
    try One(WDecoded("base64", raw,
      new String(java.util.Base64.getDecoder.decode(raw), "UTF-8")))
    catch { case _: IllegalArgumentException => cur.pos = start; null }
  }
  override def gen(rnd: SplittableRandom): String =
    java.util.Base64.getEncoder.encodeToString(CharsP.gen(rnd).getBytes("UTF-8"))
}

/** sn — serial-number token: any run of alnum/dash chars (reference
  * compute/device.rs:33 `take_while(1.., (alpha, digit, '-'))` — NO
  * multi-group requirement; "KMDLDLH3CW2020G2WAFA01" is a valid sn). */
object SnP extends VParser("sn") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val start = cur.pos
    while (!cur.atEnd && (Character.isLetterOrDigit(cur.peek) || cur.peek == '-'))
      cur.pos += 1
    if (cur.pos > start)
      One(WChars(cur.input.substring(start, cur.pos)))
    else { cur.pos = start; null }
  }
  override def gen(rnd: SplittableRandom): String = {
    val a = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    def g(n: Int) = Iterator.fill(n)(a.charAt(rnd.nextInt(a.length))).mkString
    s"${g(4)}-${g(2)}-${g(4)}-${g(4)}"
  }
}

// ---------------------------------------------------------------------------
// Network parsers
// ---------------------------------------------------------------------------

object IpP extends VParser("ip") {
  @inline private def isIpChar(c: Char) =
    isAsciiDigit(c) || c == '.' || c == ':' || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  def validIpv4(s: String): Boolean = {
    // imperative (no regex/split) — this sits on the auto-chain hot path
    var i = 0; var part = 0; var digits = 0; var value = 0; var leadZero = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.') {
        if (digits == 0 || value > 255 || (leadZero && digits > 1) || part >= 3) return false
        part += 1; digits = 0; value = 0; leadZero = false
      } else if (c >= '0' && c <= '9') {
        if (digits == 0) leadZero = c == '0'
        value = value * 10 + (c - '0'); digits += 1
        if (digits > 3) return false
      } else return false
      i += 1
    }
    part == 3 && digits > 0 && value <= 255 && !(leadZero && digits > 1)
  }
  def validIpv6(s: String): Boolean = {
    if (!s.contains(':')) return false
    try { java.net.InetAddress.getByName(s); true } catch { case _: Exception => false }
  }
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val start = cur.pos
    while (!cur.atEnd && isIpChar(cur.peek)) cur.pos += 1
    val s = cur.input.substring(start, cur.pos)
    if (s.nonEmpty && (validIpv4(s) || validIpv6(s))) One(WIp(s))
    else { cur.pos = start; null }
  }
  override def gen(rnd: SplittableRandom): String =
    s"${1 + rnd.nextInt(223)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${1 + rnd.nextInt(254)}"
}

object IpNetP extends VParser("ip_net") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val start = cur.pos
    IpP.parse(cur, sep) match {
      case One(WIp(ip)) if !cur.atEnd && cur.peek == '/' =>
        cur.pos += 1
        val d = VParser.digitRun(cur)
        if (d.nonEmpty && d.toInt <= 128) One(WIpNet(s"$ip/$d"))
        else { cur.pos = start; null }
      case _ => cur.pos = start; null
    }
  }
  override def gen(rnd: SplittableRandom): String =
    s"10.${rnd.nextInt(256)}.${rnd.nextInt(256)}.0/${8 + rnd.nextInt(25)}"
}

object DomainP extends VParser("domain") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val start = cur.pos
    while (!cur.atEnd && (Character.isLetterOrDigit(cur.peek) || cur.peek == '.' || cur.peek == '-')) cur.pos += 1
    val s = cur.input.substring(start, cur.pos)
    val labels = s.split("\\.", -1)
    if (labels.length >= 2 && labels.forall(l => l.nonEmpty && !l.startsWith("-") && !l.endsWith("-")) &&
        labels.last.forall(_.isLetter) && labels.last.length >= 2)
      One(WChars(s))
    else { cur.pos = start; null }
  }
  override def gen(rnd: SplittableRandom): String = s"host${rnd.nextInt(1000)}.example.com"
}

object EmailP extends VParser("email") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val start = cur.pos
    while (!cur.atEnd && (VParser.isIdent(cur.peek) || cur.peek == '+')) cur.pos += 1
    if (cur.atEnd || cur.peek != '@' || cur.pos == start) { cur.pos = start; return null }
    val local = cur.input.substring(start, cur.pos)
    cur.pos += 1
    DomainP.parse(cur, sep) match {
      case One(WChars(d)) => One(WChars(s"$local@$d"))
      case _ => cur.pos = start; null
    }
  }
  override def gen(rnd: SplittableRandom): String = s"user${rnd.nextInt(1000)}@example.com"
}

object UrlP extends VParser("url") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val start = cur.pos
    val schemes = Seq("http://", "https://", "ftp://")
    val sc = schemes.find(s => cur.input.startsWith(s, cur.pos))
    if (sc.isEmpty) return null
    cur.pos += sc.get.length
    while (!cur.atEnd && !cur.peek.isWhitespace && cur.peek != '"') cur.pos += 1
    One(WChars(cur.input.substring(start, cur.pos)))
  }
  override def gen(rnd: SplittableRandom): String = s"http://example.com/p/${rnd.nextInt(1000)}"
}

// ---------------------------------------------------------------------------
// HTTP parsers (reference network/http.rs)
// ---------------------------------------------------------------------------

object HttpP {
  val methods = Set("GET", "POST", "PUT", "DELETE", "HEAD", "OPTIONS", "PATCH", "TRACE", "CONNECT")

  /** Length of the HTTP method at `p`, or -1 — switch on the first char,
    * no substring/Set allocation (hot in http/request). */
  def methodLen(in: String, p: Int): Int = {
    if (p >= in.length) return -1
    val n = in.charAt(p) match {
      case 'G' => if (in.startsWith("GET", p)) 3 else -1
      case 'P' =>
        if (in.startsWith("POST", p)) 4
        else if (in.startsWith("PUT", p)) 3
        else if (in.startsWith("PATCH", p)) 5
        else -1
      case 'D' => if (in.startsWith("DELETE", p)) 6 else -1
      case 'H' => if (in.startsWith("HEAD", p)) 4 else -1
      case 'O' => if (in.startsWith("OPTIONS", p)) 7 else -1
      case 'T' => if (in.startsWith("TRACE", p)) 5 else -1
      case 'C' => if (in.startsWith("CONNECT", p)) 7 else -1
      case _ => -1
    }
    // the method token must end here ("GETX" is not a method)
    if (n > 0 && p + n < in.length && in.charAt(p + n).isLetter) -1 else n
  }
}

object HttpMethodP extends VParser("http/method") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val n = HttpP.methodLen(cur.input, cur.pos)
    if (n < 0) null
    else {
      val s = cur.input.substring(cur.pos, cur.pos + n)
      cur.pos += n
      One(WChars(s))
    }
  }
  override def gen(rnd: SplittableRandom): String =
    HttpP.methods.toSeq.sorted.apply(rnd.nextInt(HttpP.methods.size))
}

object HttpStatusP extends VParser("http/status") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val m = cur.mark
    val v = DigitP.parseLong(cur)
    if (v >= 100 && v <= 599) One(WDigit(v)) else { cur.reset(m); null }
  }
  override def gen(rnd: SplittableRandom): String =
    Seq(200, 201, 204, 301, 302, 304, 400, 403, 404, 500, 502)(rnd.nextInt(11)).toString
}

/** `GET /path HTTP/1.1` → obj{method, uri, version}. Tolerates repeated
  * internal spaces (benchmark fixture has them). */
object HttpRequestP extends VParser("http/request") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val in = cur.input
    val m = cur.mark
    val mlen = HttpP.methodLen(in, cur.pos)
    if (mlen < 0) return null
    val method = in.substring(cur.pos, cur.pos + mlen)
    var p = cur.pos + mlen
    while (p < cur.len && in.charAt(p) == ' ') p += 1
    val uriStart = p
    while (p < cur.len && in.charAt(p) != ' ') p += 1
    val uri = in.substring(uriStart, p)
    while (p < cur.len && in.charAt(p) == ' ') p += 1
    if (uri.isEmpty || !in.startsWith("HTTP/", p)) { cur.reset(m); return null }
    val vStart = p
    p += 5
    while (p < cur.len && (isAsciiDigit(in.charAt(p)) || in.charAt(p) == '.')) p += 1
    val version = in.substring(vStart, p)
    cur.pos = p
    One(WObj(Vector("method" -> WChars(method), "uri" -> WChars(uri),
      "version" -> WChars(version))))
  }
  override def parseSegment(seg: String): Parsed = {
    // trim without allocating: parse from the first non-space, require
    // only whitespace after the match
    var s = 0
    while (s < seg.length && seg.charAt(s) == ' ') s += 1
    val c = new Cursor(seg, s)
    val p = parse(c, VParser.EolSep)
    if (p == null) return null
    var i = c.pos
    while (i < seg.length) {
      if (!Character.isWhitespace(seg.charAt(i))) return null
      i += 1
    }
    p
  }
  override def gen(rnd: SplittableRandom): String =
    s"${HttpMethodP.gen(rnd)} /p/${rnd.nextInt(100)} HTTP/1.1"
}

/** http/agent — a user-agent string; normally quote-formatted so the whole
  * segment is the value; bare form reads to separator. */
object HttpAgentP extends VParser("http/agent") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val t = VParser.tokenTo(cur, sep)
    if (t.isEmpty) null else One(WChars(t))
  }
  override def parseSegment(seg: String): Parsed = One(WChars(seg))
  override def gen(rnd: SplittableRandom): String = s"Mozilla/5.0 (Test ${rnd.nextInt(100)})"
}

// ---------------------------------------------------------------------------
// Time parsers (reference physical/time/*.rs)
// ---------------------------------------------------------------------------

object TimeFormats {

  val months = Map("Jan" -> 1, "Feb" -> 2, "Mar" -> 3, "Apr" -> 4, "May" -> 5,
    "Jun" -> 6, "Jul" -> 7, "Aug" -> 8, "Sep" -> 9, "Oct" -> 10, "Nov" -> 11, "Dec" -> 12)
  val monthNames = Array("", "Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
    "Aug", "Sep", "Oct", "Nov", "Dec")

  /** Month number for the 3-char abbreviation at `p`, or 0 — switch on
    * chars, no substring/Map lookup (hot in clf/mdy/bsd/rfc2822). */
  @inline def monthAt(in: String, p: Int): Int = {
    if (p + 3 > in.length) return 0
    val c0 = in.charAt(p); val c1 = in.charAt(p + 1); val c2 = in.charAt(p + 2)
    c0 match {
      case 'J' => if (c1 == 'a' && c2 == 'n') 1 else if (c1 == 'u' && c2 == 'n') 6 else if (c1 == 'u' && c2 == 'l') 7 else 0
      case 'F' => if (c1 == 'e' && c2 == 'b') 2 else 0
      case 'M' => if (c1 == 'a' && c2 == 'r') 3 else if (c1 == 'a' && c2 == 'y') 5 else 0
      case 'A' => if (c1 == 'p' && c2 == 'r') 4 else if (c1 == 'u' && c2 == 'g') 8 else 0
      case 'S' => if (c1 == 'e' && c2 == 'p') 9 else 0
      case 'O' => if (c1 == 'c' && c2 == 't') 10 else 0
      case 'N' => if (c1 == 'o' && c2 == 'v') 11 else 0
      case 'D' => if (c1 == 'e' && c2 == 'c') 12 else 0
      case _ => 0
    }
  }

  /** Mutable scratch for one time-parse attempt (one allocation per
    * TimeP.parse call instead of an Option/tuple per component). */
  final class MTM {
    var y = 0; var mo = 0; var d = 0; var h = 0; var mi = 0; var s = 0
    var nanos = 0
    var offsetSec: Int = NoOffset
    def clear(): Unit = { y = 0; mo = 0; d = 0; h = 0; mi = 0; s = 0; nanos = 0; offsetSec = NoOffset }
  }
  final val NoOffset = Int.MinValue

  /** Kept for tests/compat: immutable TM mirror of the old API. */
  final case class TM(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int,
                      nanos: Int = 0, offsetSec: Option[Int] = None)

  def toMicros(t: TM): Option[Long] = {
    val m = new MTM
    m.y = t.y; m.mo = t.mo; m.d = t.d; m.h = t.h; m.mi = t.mi; m.s = t.s
    m.nanos = t.nanos; m.offsetSec = t.offsetSec.getOrElse(NoOffset)
    val us = toMicrosFast(m)
    if (us == Invalid) None else Some(us)
  }

  final val Invalid = Long.MinValue

  private val daysInMonth = Array(0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
  @inline private def isLeap(y: Int): Boolean =
    (y % 4 == 0 && y % 100 != 0) || y % 400 == 0

  /** days since 1970-01-01 (civil-from-days, the standard public-domain
    * calendar algorithm). */
  @inline private def epochDays(y0: Int, m: Int, d: Int): Long = {
    val y = if (m <= 2) y0 - 1 else y0
    val era = (if (y >= 0) y else y - 399) / 400
    val yoe = y - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365L + yoe / 4 - yoe / 100 + doy
    era * 146097L + doe - 719468L
  }

  /** Epoch micros (UTC) for the scratch, or Invalid — allocation-free,
    * validates like LocalDateTime.of (strict day-of-month incl. leap). */
  def toMicrosFast(t: MTM): Long = {
    if (t.mo < 1 || t.mo > 12) return Invalid
    val dim = if (t.mo == 2 && isLeap(t.y)) 29 else daysInMonth(t.mo)
    if (t.d < 1 || t.d > dim) return Invalid
    if (t.h < 0 || t.h > 23 || t.mi < 0 || t.mi > 59 || t.s < 0 || t.s > 59) return Invalid
    val off = if (t.offsetSec == NoOffset) 0 else t.offsetSec
    val sec = epochDays(t.y, t.mo, t.d) * 86400L + t.h * 3600L + t.mi * 60L + t.s - off
    sec * 1000000L + t.nanos / 1000L
  }

  /** One time format: parse at `p` into `tm`, return end position or -1.
    * `precheck` is a cheap candidate test so non-candidates cost a few ns. */
  abstract class Fmt extends Serializable {
    def precheck(in: String, p: Int): Boolean
    def parseInto(in: String, p: Int, tm: MTM): Int
  }

  @inline private def isDig(c: Char) = c >= '0' && c <= '9'

  /** Parse up to `max` digits (at least `min`); packed (value<<32)|pos
    * or -1. Values here are bounded (≤4 digits) so the pack is safe. */
  @inline private def num(in: String, p0: Int, min: Int, max: Int): Long = {
    var p = p0; var v = 0; var n = 0
    while (p < in.length && isDig(in.charAt(p)) && n < max) {
      v = v * 10 + (in.charAt(p) - '0'); p += 1; n += 1
    }
    if (n >= min) (v.toLong << 32) | (p.toLong & 0xffffffffL) else -1L
  }
  @inline private def numV(packed: Long): Int = (packed >>> 32).toInt
  @inline private def numP(packed: Long): Int = packed.toInt

  /** Offset `+0800 | +08:00 | Z` at p0; packed (seconds<<20 shifted by
    * +86400 to stay non-negative)<<32|pos, or -1. */
  @inline private def offset(in: String, p0: Int): Long = {
    if (p0 < in.length && in.charAt(p0) == 'Z') return (86400L << 32) | (p0 + 1).toLong
    if (p0 >= in.length || (in.charAt(p0) != '+' && in.charAt(p0) != '-')) return -1L
    val sign = if (in.charAt(p0) == '+') 1 else -1
    val hh = num(in, p0 + 1, 2, 2)
    if (hh < 0) return -1L
    var p1 = numP(hh)
    if (p1 < in.length && in.charAt(p1) == ':') p1 += 1
    val mm = num(in, p1, 2, 2)
    if (mm < 0) return -1L
    val secs = sign * (numV(hh) * 3600 + numV(mm) * 60)
    ((secs + 86400).toLong << 32) | (numP(mm).toLong & 0xffffffffL)
  }
  @inline private def offV(packed: Long): Int = (packed >>> 32).toInt - 86400
  @inline private def offP(packed: Long): Int = packed.toInt

  /** `yyyy-M-d H:m:s` with `-`/`/` dates, optional `T`, optional frac+offset. */
  object isoLike extends Fmt {
    def precheck(in: String, p: Int): Boolean =
      p + 4 < in.length && isDig(in.charAt(p)) && isDig(in.charAt(p + 1)) &&
        isDig(in.charAt(p + 2)) && isDig(in.charAt(p + 3)) &&
        (in.charAt(p + 4) == '-' || in.charAt(p + 4) == '/')
    def parseInto(in: String, p0: Int, tm: MTM): Int = {
      val ny = num(in, p0, 4, 4); if (ny < 0) return -1
      var p = numP(ny)
      if (p >= in.length) return -1
      val dsep = in.charAt(p)
      if (dsep != '-' && dsep != '/') return -1
      val nmo = num(in, p + 1, 1, 2); if (nmo < 0) return -1
      p = numP(nmo)
      if (p >= in.length || in.charAt(p) != dsep) return -1
      val nd = num(in, p + 1, 1, 2); if (nd < 0) return -1
      p = numP(nd)
      if (p >= in.length || (in.charAt(p) != ' ' && in.charAt(p) != 'T')) return -1
      val nh = num(in, p + 1, 1, 2); if (nh < 0) return -1
      p = numP(nh)
      if (p >= in.length || in.charAt(p) != ':') return -1
      val nmi = num(in, p + 1, 1, 2); if (nmi < 0) return -1
      p = numP(nmi)
      if (p >= in.length || in.charAt(p) != ':') return -1
      val ns = num(in, p + 1, 1, 2); if (ns < 0) return -1
      p = numP(ns)
      tm.y = numV(ny); tm.mo = numV(nmo); tm.d = numV(nd)
      tm.h = numV(nh); tm.mi = numV(nmi); tm.s = numV(ns)
      tm.nanos = 0; tm.offsetSec = NoOffset
      if (p < in.length && in.charAt(p) == '.') {
        var q = p + 1; var frac = 0L; var digits = 0
        while (q < in.length && isDig(in.charAt(q))) {
          if (digits < 9) { frac = frac * 10 + (in.charAt(q) - '0'); digits += 1 }
          q += 1
        }
        if (digits > 0) {
          var f = frac; var dd = digits
          while (dd < 9) { f *= 10; dd += 1 }
          tm.nanos = f.toInt; p = q
        }
      }
      val off = offset(in, p)
      if (off >= 0) { tm.offsetSec = offV(off); offP(off) } else p
    }
  }

  /** `May 15 2023 07:09:12` */
  object mdyTime extends Fmt {
    def precheck(in: String, p: Int): Boolean =
      p < in.length && { val c = in.charAt(p); c >= 'A' && c <= 'Z' }
    def parseInto(in: String, p0: Int, tm: MTM): Int = {
      val mo = monthAt(in, p0); if (mo == 0) return -1
      var p = p0 + 3
      if (p >= in.length || in.charAt(p) != ' ') return -1
      val nd = num(in, p + 1, 1, 2); if (nd < 0) return -1
      p = numP(nd)
      if (p >= in.length || in.charAt(p) != ' ') return -1
      val ny = num(in, p + 1, 4, 4); if (ny < 0) return -1
      p = numP(ny)
      if (p >= in.length || in.charAt(p) != ' ') return -1
      val nh = num(in, p + 1, 1, 2); if (nh < 0) return -1
      p = numP(nh)
      if (p >= in.length || in.charAt(p) != ':') return -1
      val nmi = num(in, p + 1, 1, 2); if (nmi < 0) return -1
      p = numP(nmi)
      if (p >= in.length || in.charAt(p) != ':') return -1
      val ns = num(in, p + 1, 1, 2); if (ns < 0) return -1
      tm.y = numV(ny); tm.mo = mo; tm.d = numV(nd)
      tm.h = numV(nh); tm.mi = numV(nmi); tm.s = numV(ns)
      tm.nanos = 0; tm.offsetSec = NoOffset
      numP(ns)
    }
  }

  /** syslog BSD: `May 15 07:09:12` (no year — reference keeps current year;
    * we pin a default for determinism unless configured). */
  final class BsdTime(defaultYear: Int) extends Fmt {
    def precheck(in: String, p: Int): Boolean =
      p < in.length && { val c = in.charAt(p); c >= 'A' && c <= 'Z' }
    def parseInto(in: String, p0: Int, tm: MTM): Int = {
      val mo = monthAt(in, p0); if (mo == 0) return -1
      var p = p0 + 3
      if (p >= in.length || in.charAt(p) != ' ') return -1
      p += 1
      if (p < in.length && in.charAt(p) == ' ') p += 1 // "Oct  5"
      val nd = num(in, p, 1, 2); if (nd < 0) return -1
      p = numP(nd)
      if (p >= in.length || in.charAt(p) != ' ') return -1
      val nh = num(in, p + 1, 2, 2); if (nh < 0) return -1
      p = numP(nh)
      if (p >= in.length || in.charAt(p) != ':') return -1
      val nmi = num(in, p + 1, 2, 2); if (nmi < 0) return -1
      p = numP(nmi)
      if (p >= in.length || in.charAt(p) != ':') return -1
      val ns = num(in, p + 1, 2, 2); if (ns < 0) return -1
      tm.y = defaultYear; tm.mo = mo; tm.d = numV(nd)
      tm.h = numV(nh); tm.mi = numV(nmi); tm.s = numV(ns)
      tm.nanos = 0; tm.offsetSec = NoOffset
      numP(ns)
    }
  }
  def bsdTime(defaultYear: Int): Fmt = new BsdTime(defaultYear)

  /** CLF: `06/Aug/2019:12:12:19 +0800` — the hottest log format. */
  object clf extends Fmt {
    def precheck(in: String, p: Int): Boolean =
      p + 2 < in.length && isDig(in.charAt(p)) &&
        (in.charAt(p + 1) == '/' || (isDig(in.charAt(p + 1)) && in.charAt(p + 2) == '/'))
    def parseInto(in: String, p0: Int, tm: MTM): Int = {
      @inline def dig(p: Int) = p < in.length && isDig(in.charAt(p))
      var p = p0
      var d = 0; var n = 0
      while (dig(p) && n < 2) { d = d * 10 + (in.charAt(p) - '0'); p += 1; n += 1 }
      if (n == 0 || p >= in.length || in.charAt(p) != '/') return -1
      p += 1
      val mo = monthAt(in, p)
      if (mo == 0 || p + 3 >= in.length || in.charAt(p + 3) != '/') return -1
      p += 4
      var y = 0; n = 0
      while (dig(p) && n < 4) { y = y * 10 + (in.charAt(p) - '0'); p += 1; n += 1 }
      if (n != 4) return -1
      var h = 0; var mi = 0; var s = 0
      var i = 0
      while (i < 3) {
        if (p >= in.length || in.charAt(p) != ':') return -1
        p += 1
        var v = 0; n = 0
        while (dig(p) && n < 2) { v = v * 10 + (in.charAt(p) - '0'); p += 1; n += 1 }
        if (n == 0) return -1
        if (i == 0) h = v else if (i == 1) mi = v else s = v
        i += 1
      }
      tm.y = y; tm.mo = mo; tm.d = d; tm.h = h; tm.mi = mi; tm.s = s
      tm.nanos = 0; tm.offsetSec = NoOffset
      val pSp = if (p < in.length && in.charAt(p) == ' ') p + 1 else p
      val off = offset(in, pSp)
      if (off >= 0) { tm.offsetSec = offV(off); offP(off) } else p
    }
  }

  /** RFC2822: `Tue, 15 May 2023 07:09:12 +0800` (day-name optional). */
  object rfc2822 extends Fmt {
    def precheck(in: String, p: Int): Boolean =
      p < in.length && { val c = in.charAt(p); (c >= 'A' && c <= 'Z') || isDig(c) }
    @inline private def dayNameAt(in: String, p: Int): Boolean = {
      if (p + 3 > in.length) return false
      val c0 = in.charAt(p); val c1 = in.charAt(p + 1); val c2 = in.charAt(p + 2)
      c0 match {
        case 'M' => c1 == 'o' && c2 == 'n'
        case 'T' => (c1 == 'u' && c2 == 'e') || (c1 == 'h' && c2 == 'u')
        case 'W' => c1 == 'e' && c2 == 'd'
        case 'F' => c1 == 'r' && c2 == 'i'
        case 'S' => (c1 == 'a' && c2 == 't') || (c1 == 'u' && c2 == 'n')
        case _ => false
      }
    }
    def parseInto(in: String, p0: Int, tm: MTM): Int = {
      var p = p0
      if (p + 5 <= in.length && dayNameAt(in, p) &&
          in.charAt(p + 3) == ',' && in.charAt(p + 4) == ' ') p += 5
      val nd = num(in, p, 1, 2); if (nd < 0) return -1
      p = numP(nd)
      if (p >= in.length || in.charAt(p) != ' ') return -1
      val mo = monthAt(in, p + 1); if (mo == 0) return -1
      p += 4
      if (p >= in.length || in.charAt(p) != ' ') return -1
      val ny = num(in, p + 1, 4, 4); if (ny < 0) return -1
      p = numP(ny)
      if (p >= in.length || in.charAt(p) != ' ') return -1
      val nh = num(in, p + 1, 2, 2); if (nh < 0) return -1
      p = numP(nh)
      if (p >= in.length || in.charAt(p) != ':') return -1
      val nmi = num(in, p + 1, 2, 2); if (nmi < 0) return -1
      p = numP(nmi)
      if (p >= in.length || in.charAt(p) != ':') return -1
      val ns = num(in, p + 1, 2, 2); if (ns < 0) return -1
      p = numP(ns)
      tm.y = numV(ny); tm.mo = mo; tm.d = numV(nd)
      tm.h = numV(nh); tm.mi = numV(nmi); tm.s = numV(ns)
      tm.nanos = 0; tm.offsetSec = NoOffset
      val pSp = if (p < in.length && in.charAt(p) == ' ') p + 1 else p
      val off = offset(in, pSp)
      if (off >= 0) { tm.offsetSec = offV(off); offP(off) } else p
    }
  }
}

/** Multi-format time autodetect (reference physical/time/rfc.rs TimeP).
  * Formats carry a cheap char-level precheck so non-candidates cost a few
  * ns; the first matching format wins (formats are mutually exclusive). */
class TimeP(formats: Seq[TimeFormats.Fmt], override val typeName: String = "time")
    extends VParser(typeName) {
  private val fmtArr: Array[TimeFormats.Fmt] = formats.toArray
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val in = cur.input; val p = cur.pos
    val tm = new TimeFormats.MTM
    var i = 0
    while (i < fmtArr.length) {
      val f = fmtArr(i)
      if (f.precheck(in, p)) {
        val end = f.parseInto(in, p, tm)
        if (end >= 0) {
          val us = TimeFormats.toMicrosFast(tm)
          if (us != TimeFormats.Invalid) {
            val raw = in.substring(p, end)
            cur.pos = end
            return One(WTime(us, raw))
          }
        }
      }
      i += 1
    }
    null
  }
  override def gen(rnd: SplittableRandom): String = {
    val y = 2020 + rnd.nextInt(5); val mo = 1 + rnd.nextInt(12); val d = 1 + rnd.nextInt(28)
    val h = rnd.nextInt(24); val mi = rnd.nextInt(60); val s = rnd.nextInt(60)
    s"$y-$mo-$d $h:$mi:$s"
  }
}

object TimeP {
  import TimeFormats._
  // bsd (no-year syslog "May 17 08:28:12") comes AFTER mdyTime: on
  // "May 15 2023 07:09:12" bsd sees "2023 07" where it needs "hh:" and
  // fails, so mdy-with-year keeps winning; reference rfc.rs:114-119
  // (parse_date_4) defaults the year to the current local year
  val auto = new TimeP(Seq(isoLike, mdyTime, clf, rfc2822,
    bsdTime(java.time.Year.now.getValue)))
  val iso = new TimeP(Seq(isoLike), "time_iso")
  val rfc3339 = new TimeP(Seq(isoLike), "time_3339")
  val rfc2822P = new TimeP(Seq(rfc2822), "time_2822")
  val clfP = new TimeP(Seq(clf), "time/clf") {
    override def gen(rnd: SplittableRandom): String = {
      val y = 2019 + rnd.nextInt(5); val mo = 1 + rnd.nextInt(12); val d = 1 + rnd.nextInt(28)
      f"$d%02d/${monthNames(mo)}/$y:${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d +0000"
    }
  }
}

object TimeTimestampP extends VParser("time_timestamp") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val m = cur.mark
    val s = VParser.digitRun(cur)
    if (s.isEmpty || (!cur.atEnd && (cur.peek == '.' || Character.isLetterOrDigit(cur.peek)))) {
      cur.reset(m); return null
    }
    val v = try s.toLong catch { case _: NumberFormatException => cur.reset(m); return null }
    // 10 digits = seconds, 13 = millis, 16 = micros
    val us = s.length match {
      case 10 => v * 1000000L
      case 13 => v * 1000L
      case 16 => v
      case _  => cur.reset(m); return null
    }
    One(WTime(us, s))
  }
  override def gen(rnd: SplittableRandom): String =
    (1500000000L + rnd.nextInt(300000000)).toString
}
