package graft.wpl

import java.util.SplittableRandom

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
  */
abstract class VParser(val typeName: String) extends Serializable {
  def parse(cur: Cursor, sep: Sep): Option[Parsed]
  def parseSegment(seg: String): Option[Parsed] = {
    val c = new Cursor(seg)
    parse(c, VParser.EolSep) match {
      case Some(p) if c.atEnd || seg.substring(c.pos).forall(_.isWhitespace) => Some(p)
      case _ => None
    }
  }
  def gen(rnd: SplittableRandom): String = "x"
}

object VParser {
  /** A separator that never matches — token runs to end of input. */
  object EolSep extends Sep {
    def find(input: String, from: Int): Option[(Int, Int)] = None
    def consumeAt(input: String, pos: Int): Option[Int] = None
  }

  @inline def isIdent(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '.' || c == '-'

  def tokenTo(cur: Cursor, sep: Sep): String = {
    sep.find(cur.input, cur.pos) match {
      case Some((end, _)) => val t = cur.input.substring(cur.pos, end); cur.pos = end; t
      case None => val t = cur.rest; cur.pos = cur.len; t
    }
  }

  def digitRun(cur: Cursor): String = {
    val start = cur.pos
    if (!cur.atEnd && (cur.peek == '-' || cur.peek == '+')) cur.pos += 1
    while (!cur.atEnd && cur.peek.isDigit) cur.pos += 1
    if (cur.pos > start && cur.input.charAt(cur.pos - 1).isDigit)
      cur.input.substring(start, cur.pos)
    else { cur.pos = start; "" }
  }
}

// ---------------------------------------------------------------------------
// Base parsers
// ---------------------------------------------------------------------------

/** chars — separator-bounded token (reference base/chars.rs). */
object CharsP extends VParser("chars") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val t = VParser.tokenTo(cur, sep)
    if (t.isEmpty) None else Some(One(WChars(t)))
  }
  override def parseSegment(seg: String): Option[Parsed] = Some(One(WChars(seg)))
  private val alpha = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
  override def gen(rnd: SplittableRandom): String =
    Iterator.fill(8 + rnd.nextInt(12))(alpha.charAt(rnd.nextInt(alpha.length))).mkString
}

/** `_` ignore — consume one separator-bounded token, discard. */
object IgnoreP extends VParser("_") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val t = VParser.tokenTo(cur, sep)
    if (t.isEmpty) None else Some(One(WIgnore))
  }
  override def gen(rnd: SplittableRandom): String = "-"
}

final class SymbolP(content: String, peek: Boolean) extends VParser(if (peek) "peek_symbol" else "symbol") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] =
    if (cur.input.startsWith(content, cur.pos)) {
      if (!peek) cur.pos += content.length
      Some(One(WChars(content)))
    } else None
  override def gen(rnd: SplittableRandom): String = content
}

object BoolP extends VParser("bool") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] =
    if (cur.input.startsWith("true", cur.pos)) { cur.pos += 4; Some(One(WBool(true))) }
    else if (cur.input.startsWith("false", cur.pos)) { cur.pos += 5; Some(One(WBool(false))) }
    else None
  override def gen(rnd: SplittableRandom): String = if (rnd.nextBoolean()) "true" else "false"
}

object DigitP extends VParser("digit") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val s = VParser.digitRun(cur)
    if (s.isEmpty) None
    else if (!cur.atEnd && (cur.peek == '.' || Character.isLetterOrDigit(cur.peek))) {
      cur.pos -= s.length; None // not a clean integer boundary
    } else try Some(One(WDigit(s.toLong))) catch { case _: NumberFormatException => None }
  }
  override def gen(rnd: SplittableRandom): String = rnd.nextInt(1000000).toString
}

object PortP extends VParser("port") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] =
    DigitP.parse(cur, sep).collect { case One(WDigit(v)) if v >= 0 && v <= 65535 => One(WDigit(v)) }
  override def gen(rnd: SplittableRandom): String = (1 + rnd.nextInt(65535)).toString
}

object FloatP extends VParser("float") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val start = cur.pos
    if (!cur.atEnd && (cur.peek == '-' || cur.peek == '+')) cur.pos += 1
    var digits = 0
    while (!cur.atEnd && cur.peek.isDigit) { cur.pos += 1; digits += 1 }
    var hasDot = false
    if (!cur.atEnd && cur.peek == '.') {
      hasDot = true; cur.pos += 1
      while (!cur.atEnd && cur.peek.isDigit) { cur.pos += 1; digits += 1 }
    }
    var hasExp = false
    if (!cur.atEnd && (cur.peek == 'e' || cur.peek == 'E')) {
      val m = cur.pos; cur.pos += 1
      if (!cur.atEnd && (cur.peek == '-' || cur.peek == '+')) cur.pos += 1
      if (!cur.atEnd && cur.peek.isDigit) { hasExp = true; while (!cur.atEnd && cur.peek.isDigit) cur.pos += 1 }
      else cur.pos = m
    }
    if (digits == 0 || !(hasDot || hasExp) ||
        (!cur.atEnd && Character.isLetterOrDigit(cur.peek))) { cur.pos = start; None }
    else try Some(One(WFloat(cur.input.substring(start, cur.pos).toDouble)))
    catch { case _: NumberFormatException => cur.pos = start; None }
  }
  override def gen(rnd: SplittableRandom): String = f"${rnd.nextDouble() * 1000}%.3f"
}

object HexP extends VParser("hex") {
  @inline private def isHex(c: Char) =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val start = cur.pos
    if (cur.input.startsWith("0x", cur.pos) || cur.input.startsWith("0X", cur.pos)) cur.pos += 2
    val hstart = cur.pos
    while (!cur.atEnd && isHex(cur.peek)) cur.pos += 1
    if (cur.pos == hstart) { cur.pos = start; None }
    else Some(One(WChars(cur.input.substring(start, cur.pos))))
  }
  override def gen(rnd: SplittableRandom): String = f"0x${rnd.nextInt(1 << 30)}%08x"
}

object Base64P extends VParser("base64") {
  @inline private def isB64(c: Char) =
    Character.isLetterOrDigit(c) || c == '+' || c == '/' || c == '='
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val start = cur.pos
    while (!cur.atEnd && isB64(cur.peek)) cur.pos += 1
    if (cur.pos == start) None else Some(One(WChars(cur.input.substring(start, cur.pos))))
  }
}

/** sn — serial-number token: dash-joined alnum groups (reference
  * compute/device.rs:20). */
object SnP extends VParser("sn") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val start = cur.pos
    var groups = 1
    while (!cur.atEnd && Character.isLetterOrDigit(cur.peek)) {
      while (!cur.atEnd && Character.isLetterOrDigit(cur.peek)) cur.pos += 1
      if (!cur.atEnd && cur.peek == '-' && cur.pos + 1 < cur.len &&
          Character.isLetterOrDigit(cur.input.charAt(cur.pos + 1))) {
        cur.pos += 1; groups += 1
      }
    }
    if (cur.pos > start && groups >= 2)
      Some(One(WChars(cur.input.substring(start, cur.pos))))
    else { cur.pos = start; None }
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
    c.isDigit || c == '.' || c == ':' || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
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
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val start = cur.pos
    while (!cur.atEnd && isIpChar(cur.peek)) cur.pos += 1
    val s = cur.input.substring(start, cur.pos)
    if (s.nonEmpty && (validIpv4(s) || validIpv6(s))) Some(One(WIp(s)))
    else { cur.pos = start; None }
  }
  override def gen(rnd: SplittableRandom): String =
    s"${1 + rnd.nextInt(223)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${1 + rnd.nextInt(254)}"
}

object IpNetP extends VParser("ip_net") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val start = cur.pos
    IpP.parse(cur, sep) match {
      case Some(One(WIp(ip))) if !cur.atEnd && cur.peek == '/' =>
        cur.pos += 1
        val d = VParser.digitRun(cur)
        if (d.nonEmpty && d.toInt <= 128) Some(One(WIpNet(s"$ip/$d")))
        else { cur.pos = start; None }
      case _ => cur.pos = start; None
    }
  }
  override def gen(rnd: SplittableRandom): String =
    s"10.${rnd.nextInt(256)}.${rnd.nextInt(256)}.0/${8 + rnd.nextInt(25)}"
}

object DomainP extends VParser("domain") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val start = cur.pos
    while (!cur.atEnd && (Character.isLetterOrDigit(cur.peek) || cur.peek == '.' || cur.peek == '-')) cur.pos += 1
    val s = cur.input.substring(start, cur.pos)
    val labels = s.split("\\.", -1)
    if (labels.length >= 2 && labels.forall(l => l.nonEmpty && !l.startsWith("-") && !l.endsWith("-")) &&
        labels.last.forall(_.isLetter) && labels.last.length >= 2)
      Some(One(WChars(s)))
    else { cur.pos = start; None }
  }
  override def gen(rnd: SplittableRandom): String = s"host${rnd.nextInt(1000)}.example.com"
}

object EmailP extends VParser("email") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val start = cur.pos
    while (!cur.atEnd && (VParser.isIdent(cur.peek) || cur.peek == '+')) cur.pos += 1
    if (cur.atEnd || cur.peek != '@' || cur.pos == start) { cur.pos = start; return None }
    val local = cur.input.substring(start, cur.pos)
    cur.pos += 1
    DomainP.parse(cur, sep) match {
      case Some(One(WChars(d))) => Some(One(WChars(s"$local@$d")))
      case _ => cur.pos = start; None
    }
  }
  override def gen(rnd: SplittableRandom): String = s"user${rnd.nextInt(1000)}@example.com"
}

object UrlP extends VParser("url") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val start = cur.pos
    val schemes = Seq("http://", "https://", "ftp://")
    val sc = schemes.find(s => cur.input.startsWith(s, cur.pos))
    if (sc.isEmpty) return None
    cur.pos += sc.get.length
    while (!cur.atEnd && !cur.peek.isWhitespace && cur.peek != '"') cur.pos += 1
    Some(One(WChars(cur.input.substring(start, cur.pos))))
  }
  override def gen(rnd: SplittableRandom): String = s"http://example.com/p/${rnd.nextInt(1000)}"
}

// ---------------------------------------------------------------------------
// HTTP parsers (reference network/http.rs)
// ---------------------------------------------------------------------------

object HttpP {
  val methods = Set("GET", "POST", "PUT", "DELETE", "HEAD", "OPTIONS", "PATCH", "TRACE", "CONNECT")
}

object HttpMethodP extends VParser("http/method") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val start = cur.pos
    while (!cur.atEnd && cur.peek.isLetter) cur.pos += 1
    val s = cur.input.substring(start, cur.pos)
    if (HttpP.methods.contains(s)) Some(One(WChars(s))) else { cur.pos = start; None }
  }
  override def gen(rnd: SplittableRandom): String =
    HttpP.methods.toSeq.sorted.apply(rnd.nextInt(HttpP.methods.size))
}

object HttpStatusP extends VParser("http/status") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val m = cur.mark
    DigitP.parse(cur, sep) match {
      case Some(One(WDigit(v))) if v >= 100 && v <= 599 => Some(One(WDigit(v)))
      case _ => cur.reset(m); None
    }
  }
  override def gen(rnd: SplittableRandom): String =
    Seq(200, 201, 204, 301, 302, 304, 400, 403, 404, 500, 502)(rnd.nextInt(11)).toString
}

/** `GET /path HTTP/1.1` → obj{method, uri, version}. Tolerates repeated
  * internal spaces (benchmark fixture has them). */
object HttpRequestP extends VParser("http/request") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val m = cur.mark
    HttpMethodP.parse(cur, sep) match {
      case Some(One(WChars(method))) =>
        var p = cur.pos
        while (p < cur.len && cur.input.charAt(p) == ' ') p += 1
        val uriStart = p
        while (p < cur.len && cur.input.charAt(p) != ' ') p += 1
        val uri = cur.input.substring(uriStart, p)
        while (p < cur.len && cur.input.charAt(p) == ' ') p += 1
        if (uri.isEmpty || !cur.input.startsWith("HTTP/", p)) { cur.reset(m); return None }
        val vStart = p
        p += 5
        while (p < cur.len && (cur.input.charAt(p).isDigit || cur.input.charAt(p) == '.')) p += 1
        val version = cur.input.substring(vStart, p)
        cur.pos = p
        Some(One(WObj(Vector("method" -> WChars(method), "uri" -> WChars(uri),
          "version" -> WChars(version)))))
      case _ => cur.reset(m); None
    }
  }
  override def parseSegment(seg: String): Option[Parsed] = {
    val c = new Cursor(seg.trim)
    parse(c, VParser.EolSep).filter(_ => c.rest.forall(_.isWhitespace))
  }
  override def gen(rnd: SplittableRandom): String =
    s"${HttpMethodP.gen(rnd)} /p/${rnd.nextInt(100)} HTTP/1.1"
}

/** http/agent — a user-agent string; normally quote-formatted so the whole
  * segment is the value; bare form reads to separator. */
object HttpAgentP extends VParser("http/agent") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val t = VParser.tokenTo(cur, sep)
    if (t.isEmpty) None else Some(One(WChars(t)))
  }
  override def parseSegment(seg: String): Option[Parsed] = Some(One(WChars(seg)))
  override def gen(rnd: SplittableRandom): String = s"Mozilla/5.0 (Test ${rnd.nextInt(100)})"
}

// ---------------------------------------------------------------------------
// Time parsers (reference physical/time/*.rs)
// ---------------------------------------------------------------------------

object TimeFormats {
  import java.time._

  val months = Map("Jan" -> 1, "Feb" -> 2, "Mar" -> 3, "Apr" -> 4, "May" -> 5,
    "Jun" -> 6, "Jul" -> 7, "Aug" -> 8, "Sep" -> 9, "Oct" -> 10, "Nov" -> 11, "Dec" -> 12)
  val monthNames = Array("", "Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
    "Aug", "Sep", "Oct", "Nov", "Dec")

  final case class TM(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int,
                      nanos: Int = 0, offsetSec: Option[Int] = None)

  def toMicros(t: TM): Option[Long] =
    try {
      val ldt = LocalDateTime.of(t.y, t.mo, t.d, t.h, t.mi, t.s, t.nanos)
      val inst = t.offsetSec match {
        case Some(off) => ldt.toInstant(ZoneOffset.ofTotalSeconds(off))
        case None => ldt.toInstant(ZoneOffset.UTC)
      }
      Some(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
    } catch { case _: Exception => None }

  /** Scanner helpers over (input, pos). Each fmt returns (TM, endPos). */
  type Fmt = (String, Int) => Option[(TM, Int)]

  @inline private def isDig(c: Char) = c >= '0' && c <= '9'

  /** Cheap candidate test per format — avoids the Option-chain cost for
    * formats that can't possibly match at this position. */
  def precheck(f: Fmt, in: String, p: Int): Boolean = {
    if (p >= in.length) return false
    val c0 = in.charAt(p)
    if (f eq isoLike) {
      // yyyy[-/]...
      p + 4 < in.length && isDig(c0) && isDig(in.charAt(p + 1)) &&
        isDig(in.charAt(p + 2)) && isDig(in.charAt(p + 3)) &&
        (in.charAt(p + 4) == '-' || in.charAt(p + 4) == '/')
    } else if (f eq clf) {
      // d[d]/Mmm...
      isDig(c0) && p + 2 < in.length &&
        (in.charAt(p + 1) == '/' || (isDig(in.charAt(p + 1)) && in.charAt(p + 2) == '/'))
    } else if (f eq mdyTime) {
      c0 >= 'A' && c0 <= 'Z'
    } else if (f eq rfc2822) {
      (c0 >= 'A' && c0 <= 'Z') || isDig(c0)
    } else true
  }

  private def num(in: String, p0: Int, min: Int, max: Int): Option[(Int, Int)] = {
    var p = p0; var v = 0; var n = 0
    while (p < in.length && in.charAt(p).isDigit && n < max) {
      v = v * 10 + (in.charAt(p) - '0'); p += 1; n += 1
    }
    if (n >= min) Some((v, p)) else None
  }
  private def ch(in: String, p: Int, c: Char): Option[Int] =
    if (p < in.length && in.charAt(p) == c) Some(p + 1) else None
  private def anyCh(in: String, p: Int, cs: String): Option[Int] =
    if (p < in.length && cs.indexOf(in.charAt(p)) >= 0) Some(p + 1) else None

  private def offset(in: String, p0: Int): Option[(Int, Int)] = {
    // +0800 | +08:00 | Z
    if (p0 < in.length && in.charAt(p0) == 'Z') return Some((0, p0 + 1))
    if (p0 >= in.length || (in.charAt(p0) != '+' && in.charAt(p0) != '-')) return None
    val sign = if (in.charAt(p0) == '+') 1 else -1
    num(in, p0 + 1, 2, 2).flatMap { case (hh, p1) =>
      val p2 = if (p1 < in.length && in.charAt(p1) == ':') p1 + 1 else p1
      num(in, p2, 2, 2).map { case (mm, p3) => (sign * (hh * 3600 + mm * 60), p3) }
    }
  }

  /** `yyyy-M-d H:m:s` with `-`/`/` dates, optional `T`, optional frac+offset. */
  val isoLike: Fmt = (in, p0) => {
    for {
      (y, p1) <- num(in, p0, 4, 4)
      p2 <- anyCh(in, p1, "-/")
      dsep = in.charAt(p1)
      (mo, p3) <- num(in, p2, 1, 2)
      p4 <- ch(in, p3, dsep)
      (d, p5) <- num(in, p4, 1, 2)
      p6 <- anyCh(in, p5, " T")
      (h, p7) <- num(in, p6, 1, 2)
      p8 <- ch(in, p7, ':')
      (mi, p9) <- num(in, p8, 1, 2)
      p10 <- ch(in, p9, ':')
      (s, p11) <- num(in, p10, 1, 2)
    } yield {
      var p = p11; var nanos = 0
      if (p < in.length && in.charAt(p) == '.') {
        var q = p + 1; var frac = 0L; var digits = 0
        while (q < in.length && in.charAt(q).isDigit) { if (digits < 9) { frac = frac * 10 + (in.charAt(q) - '0'); digits += 1 }; q += 1 }
        if (digits > 0) { var f = frac; var dd = digits; while (dd < 9) { f *= 10; dd += 1 }; nanos = f.toInt; p = q }
      }
      val off = offset(in, p)
      off match {
        case Some((o, pEnd)) => (TM(y, mo, d, h, mi, s, nanos, Some(o)), pEnd)
        case None => (TM(y, mo, d, h, mi, s, nanos, None), p)
      }
    }
  }

  /** `May 15 2023 07:09:12` */
  val mdyTime: Fmt = (in, p0) => {
    if (p0 + 3 > in.length) None
    else months.get(in.substring(p0, p0 + 3)).flatMap { mo =>
      for {
        p1 <- ch(in, p0 + 3, ' ')
        (d, p2) <- num(in, p1, 1, 2)
        p3 <- ch(in, p2, ' ')
        (y, p4) <- num(in, p3, 4, 4)
        p5 <- ch(in, p4, ' ')
        (h, p6) <- num(in, p5, 1, 2)
        p7 <- ch(in, p6, ':')
        (mi, p8) <- num(in, p7, 1, 2)
        p9 <- ch(in, p8, ':')
        (s, p10) <- num(in, p9, 1, 2)
      } yield (TM(y, mo, d, h, mi, s), p10)
    }
  }

  /** syslog BSD: `May 15 07:09:12` (no year — reference keeps current year;
    * we pin 2000 for determinism unless configured). */
  def bsdTime(defaultYear: Int): Fmt = (in, p0) => {
    if (p0 + 3 > in.length) None
    else months.get(in.substring(p0, p0 + 3)).flatMap { mo =>
      for {
        p1 <- ch(in, p0 + 3, ' ')
        pd = if (p1 < in.length && in.charAt(p1) == ' ') p1 + 1 else p1 // "Oct  5"
        (d, p2) <- num(in, pd, 1, 2)
        p3 <- ch(in, p2, ' ')
        (h, p4) <- num(in, p3, 2, 2)
        p5 <- ch(in, p4, ':')
        (mi, p6) <- num(in, p5, 2, 2)
        p7 <- ch(in, p6, ':')
        (s, p8) <- num(in, p7, 2, 2)
      } yield (TM(defaultYear, mo, d, h, mi, s), p8)
    }
  }

  /** CLF: `06/Aug/2019:12:12:19 +0800` — imperative (hottest log format). */
  val clf: Fmt = (in, p0) => {
    @inline def dig(p: Int) = p < in.length && in.charAt(p) >= '0' && in.charAt(p) <= '9'
    var p = p0
    // day 1-2 digits
    var d = 0; var n = 0
    while (dig(p) && n < 2) { d = d * 10 + (in.charAt(p) - '0'); p += 1; n += 1 }
    if (n == 0 || p >= in.length || in.charAt(p) != '/') None
    else {
      p += 1
      val mo = if (p + 3 <= in.length) months.getOrElse(in.substring(p, p + 3), 0) else 0
      if (mo == 0 || p + 3 >= in.length || in.charAt(p + 3) != '/') None
      else {
        p += 4
        var y = 0; n = 0
        while (dig(p) && n < 4) { y = y * 10 + (in.charAt(p) - '0'); p += 1; n += 1 }
        var ok = n == 4
        val hms = new Array[Int](3)
        var i = 0
        while (ok && i < 3) {
          if (p < in.length && in.charAt(p) == ':') p += 1 else ok = false
          if (ok) {
            var v = 0; n = 0
            while (dig(p) && n < 2) { v = v * 10 + (in.charAt(p) - '0'); p += 1; n += 1 }
            if (n == 0) ok = false else hms(i) = v
          }
          i += 1
        }
        if (!ok) None
        else {
          val pSp = if (p < in.length && in.charAt(p) == ' ') p + 1 else p
          offset(in, pSp) match {
            case Some((o, pEnd)) => Some((TM(y, mo, d, hms(0), hms(1), hms(2), 0, Some(o)), pEnd))
            case None => Some((TM(y, mo, d, hms(0), hms(1), hms(2)), p))
          }
        }
      }
    }
  }

  /** RFC2822: `Tue, 15 May 2023 07:09:12 +0800` (day-name optional). */
  val rfc2822: Fmt = (in, p0) => {
    var p = p0
    val days = Set("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
    if (p + 5 <= in.length && days.contains(in.substring(p, p + 3)) &&
        in.charAt(p + 3) == ',' && in.charAt(p + 4) == ' ') p += 5
    for {
      (d, p1) <- num(in, p, 1, 2)
      p2 <- ch(in, p1, ' ')
      mo <- if (p2 + 3 <= in.length) months.get(in.substring(p2, p2 + 3)) else None
      p3 <- ch(in, p2 + 3, ' ')
      (y, p4) <- num(in, p3, 4, 4)
      p5 <- ch(in, p4, ' ')
      (h, p6) <- num(in, p5, 2, 2)
      p7 <- ch(in, p6, ':')
      (mi, p8) <- num(in, p7, 2, 2)
      p9 <- ch(in, p8, ':')
      (s, p10) <- num(in, p9, 2, 2)
    } yield {
      val pSp = if (p10 < in.length && in.charAt(p10) == ' ') p10 + 1 else p10
      offset(in, pSp) match {
        case Some((o, pEnd)) => (TM(y, mo, d, h, mi, s, 0, Some(o)), pEnd)
        case None => (TM(y, mo, d, h, mi, s), p10)
      }
    }
  }
}

/** Multi-format time autodetect (reference physical/time/rfc.rs TimeP).
  * Formats carry a cheap char-level precheck so non-candidates cost a few
  * ns; the first matching format wins (formats are mutually exclusive). */
class TimeP(formats: Seq[TimeFormats.Fmt], override val typeName: String = "time")
    extends VParser(typeName) {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val in = cur.input; val p = cur.pos
    var i = 0
    while (i < formats.length) {
      val f = formats(i)
      if (TimeFormats.precheck(f, in, p)) {
        f(in, p) match {
          case Some((tm, end)) =>
            TimeFormats.toMicros(tm) match {
              case Some(us) =>
                val raw = in.substring(p, end)
                cur.pos = end
                return Some(One(WTime(us, raw)))
              case None =>
            }
          case None =>
        }
      }
      i += 1
    }
    None
  }
  override def gen(rnd: SplittableRandom): String = {
    val y = 2020 + rnd.nextInt(5); val mo = 1 + rnd.nextInt(12); val d = 1 + rnd.nextInt(28)
    val h = rnd.nextInt(24); val mi = rnd.nextInt(60); val s = rnd.nextInt(60)
    s"$y-$mo-$d $h:$mi:$s"
  }
}

object TimeP {
  import TimeFormats._
  val auto = new TimeP(Seq(isoLike, mdyTime, clf, rfc2822))
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
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val m = cur.mark
    val s = VParser.digitRun(cur)
    if (s.isEmpty || (!cur.atEnd && (cur.peek == '.' || Character.isLetterOrDigit(cur.peek)))) {
      cur.reset(m); return None
    }
    val v = try s.toLong catch { case _: NumberFormatException => cur.reset(m); return None }
    // 10 digits = seconds, 13 = millis, 16 = micros
    val us = s.length match {
      case 10 => v * 1000000L
      case 13 => v * 1000L
      case 16 => v
      case _  => cur.reset(m); return None
    }
    Some(One(WTime(us, s)))
  }
  override def gen(rnd: SplittableRandom): String =
    (1500000000L + rnd.nextInt(300000000)).toString
}
