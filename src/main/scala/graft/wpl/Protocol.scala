package graft.wpl

import java.util.SplittableRandom

/** Protocol parsers: kv / kvarr / json / exact_json / array / proto_text /
  * id_card / mobile_phone / auto (reference crates/wp-lang/src/eval/value/
  * parser/protocol (kvarr.rs etc.), factory.rs:28-73). */

/** Single `key=value` (or `key:value`); value may be double-quoted.
  * Produces a field NAMED by the key (reference protocol/keyval.rs). */
object KvP extends VParser("kv") {
  def keyAt(cur: Cursor): Option[String] = {
    val start = cur.pos
    while (!cur.atEnd && (VParser.isIdent(cur.peek))) cur.pos += 1
    if (cur.pos == start) { cur.pos = start; None }
    else Some(cur.input.substring(start, cur.pos))
  }
  def quoted(cur: Cursor): Option[String] = {
    if (cur.atEnd || cur.peek != '"') return None
    val end = cur.input.indexOf('"', cur.pos + 1)
    if (end < 0) None
    else { val s = cur.input.substring(cur.pos + 1, end); cur.pos = end + 1; Some(s) }
  }
  /** `[..]`/`{..}`/`(..)` values span their balanced bracket range (kv
    * values holding nested-group payloads — order.rs test_pipeline3). */
  def bracketed(cur: Cursor): Option[String] = {
    if (cur.atEnd) return None
    val open = cur.peek
    val close = open match {
      case '[' => ']'; case '{' => '}'; case '(' => ')'; case _ => return None
    }
    var depth = 0; var p = cur.pos
    while (p < cur.len) {
      val c = cur.input.charAt(p)
      if (c == open) depth += 1
      else if (c == close) {
        depth -= 1
        if (depth == 0) {
          val s = cur.input.substring(cur.pos, p + 1)
          cur.pos = p + 1
          return Some(s)
        }
      }
      p += 1
    }
    None
  }
  @inline private def skipSp(cur: Cursor): Unit =
    while (!cur.atEnd && (cur.peek == ' ' || cur.peek == '\t')) cur.pos += 1
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val m = cur.mark
    keyAt(cur) match {
      case Some(k) =>
        skipSp(cur) // spaces allowed around the kv separator ("data : [..]")
        if (!cur.atEnd && (cur.peek == '=' || cur.peek == ':')) {
          cur.pos += 1
          skipSp(cur)
          val v = quoted(cur).orElse(bracketed(cur)).getOrElse(VParser.tokenTo(cur, sep))
          Some(Named(Vector(k -> AutoVal.typed(v))))
        } else { cur.reset(m); None }
      case _ => cur.reset(m); None
    }
  }
  override def gen(rnd: SplittableRandom): String =
    s"k${rnd.nextInt(100)}=${CharsP.gen(rnd)}"
}

/** Typed coercion of a raw kv/json scalar string (digits → WDigit, etc.). */
object AutoVal {
  def typed(s: String): WValue = {
    if (s.isEmpty) return WChars(s)
    if (s.forall(_.isDigit) || (s.length > 1 && s.charAt(0) == '-' && s.drop(1).forall(_.isDigit))) {
      try return WDigit(s.toLong) catch { case _: NumberFormatException => }
    }
    if (s == "true") return WBool(true)
    if (s == "false") return WBool(false)
    if (s.count(_ == '.') == 3 && IpP.validIpv4(s)) return WIp(s)
    WChars(s)
  }
}

/** Repeated KV pairs: `a=1, b="x y" c=2` (reference protocol/kvarr.rs).
  * Pair separators: the effective sep plus `,`/`;` runs. Subfield
  * projection (`kvarr(chars@host, digit@port)`) is applied by the field
  * unit, not here — this parser splats all pairs. */
object KvArrP extends VParser("kvarr") {
  private def skipPairSep(cur: Cursor, sep: Sep): Boolean = {
    var moved = false
    var cont = true
    while (cont) {
      cont = false
      if (!cur.atEnd && (cur.peek == ',' || cur.peek == ';')) { cur.pos += 1; moved = true; cont = true }
      else if (!cur.atEnd && (cur.peek == ' ' || cur.peek == '\t')) { cur.pos += 1; moved = true; cont = true }
      else sep.consumeAt(cur.input, cur.pos) match {
        case Some(np) if np > cur.pos => cur.pos = np; moved = true; cont = true
        case _ =>
      }
    }
    moved
  }
  /** value ends at sep, `,`, `;`, or whitespace; quoted and bracketed
    * values span. */
  private def value(cur: Cursor, sep: Sep): String = {
    KvP.quoted(cur).orElse(KvP.bracketed(cur)) match {
      case Some(q) => q
      case None =>
        val start = cur.pos
        while (!cur.atEnd && cur.peek != ',' && cur.peek != ';' &&
               cur.peek != ' ' && cur.peek != '\t' &&
               sep.consumeAt(cur.input, cur.pos).isEmpty) cur.pos += 1
        cur.input.substring(start, cur.pos)
    }
  }
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val out = Vector.newBuilder[(String, WValue)]
    var n = 0
    var done = false
    while (!done) {
      val m = cur.mark
      KvP.keyAt(cur) match {
        case Some(k) if !cur.atEnd && (cur.peek == '=' || cur.peek == ':') =>
          cur.pos += 1
          out += (k -> AutoVal.typed(value(cur, sep)))
          n += 1
          val m2 = cur.mark
          if (!skipPairSep(cur, sep)) done = true
          // lookahead: next must be key=; else back off the sep skip
          else {
            val m3 = cur.mark
            KvP.keyAt(cur) match {
              case Some(_) if !cur.atEnd && (cur.peek == '=' || cur.peek == ':') => cur.reset(m3)
              case _ => cur.reset(m2); done = true
            }
          }
        case _ => cur.reset(m); done = true
      }
    }
    val fs = out.result()
    if (fs.isEmpty) None else Some(Named(fs))
  }
  override def parseSegment(seg: String): Option[Parsed] = {
    val c = new Cursor(seg)
    parse(c, VParser.EolSep).filter(_ => c.rest.forall(_.isWhitespace))
  }
  override def gen(rnd: SplittableRandom): String =
    (0 until 3).map(i => s"k$i=${CharsP.gen(rnd)}").mkString(", ")
}

/** Hand-rolled lenient JSON parser (reference protocol/json.rs, 891 LoC).
  * Top-level object → fields named by keys; nested values stay WObj/WArr. */
object JsonP extends VParser("json") {
  def parseValue(cur: Cursor): Option[WValue] = {
    skipWs(cur)
    if (cur.atEnd) return None
    cur.peek match {
      case '{' => parseObj(cur)
      case '[' => parseArr(cur)
      case '"' => KvP.quoted(cur).map(WChars(_))
      case 't' => if (cur.input.startsWith("true", cur.pos)) { cur.pos += 4; Some(WBool(true)) } else None
      case 'f' => if (cur.input.startsWith("false", cur.pos)) { cur.pos += 5; Some(WBool(false)) } else None
      case 'n' => if (cur.input.startsWith("null", cur.pos)) { cur.pos += 4; Some(WNull) } else None
      case c if c.isDigit || c == '-' =>
        val m = cur.mark
        FloatP.parse(cur, VParser.EolSep) match {
          case Some(One(f)) => Some(f)
          case _ =>
            cur.reset(m)
            val d = VParser.digitRun(cur)
            if (d.nonEmpty) try Some(WDigit(d.toLong)) catch { case _: NumberFormatException => None }
            else None
        }
      case _ => None
    }
  }
  private def skipWs(cur: Cursor): Unit =
    while (!cur.atEnd && cur.peek.isWhitespace) cur.pos += 1
  def parseObj(cur: Cursor): Option[WObj] = {
    if (cur.atEnd || cur.peek != '{') return None
    cur.pos += 1
    val fs = Vector.newBuilder[(String, WValue)]
    skipWs(cur)
    if (!cur.atEnd && cur.peek == '}') { cur.pos += 1; return Some(WObj(Vector.empty)) }
    var ok = true
    var done = false
    while (!done && ok) {
      skipWs(cur)
      KvP.quoted(cur) match {
        case Some(k) =>
          skipWs(cur)
          if (!cur.atEnd && cur.peek == ':') {
            cur.pos += 1
            parseValue(cur) match {
              case Some(v) =>
                fs += (k -> v)
                skipWs(cur)
                if (!cur.atEnd && cur.peek == ',') cur.pos += 1
                else if (!cur.atEnd && cur.peek == '}') { cur.pos += 1; done = true }
                else ok = false
              case None => ok = false
            }
          } else ok = false
        case None => ok = false
      }
    }
    if (ok) Some(WObj(fs.result())) else None
  }
  def parseArr(cur: Cursor): Option[WArr] = {
    if (cur.atEnd || cur.peek != '[') return None
    cur.pos += 1
    val xs = Vector.newBuilder[WValue]
    skipWs(cur)
    if (!cur.atEnd && cur.peek == ']') { cur.pos += 1; return Some(WArr(Vector.empty)) }
    var ok = true; var done = false
    while (!done && ok) {
      parseValue(cur) match {
        case Some(v) =>
          xs += v
          skipWs(cur)
          if (!cur.atEnd && cur.peek == ',') cur.pos += 1
          else if (!cur.atEnd && cur.peek == ']') { cur.pos += 1; done = true }
          else ok = false
        case None => ok = false
      }
    }
    if (ok) Some(WArr(xs.result())) else None
  }
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val m = cur.mark
    skipWs(cur)
    parseObj(cur) match {
      case Some(WObj(fs)) => Some(Named(fs))
      case None => cur.reset(m); None
    }
  }
  override def gen(rnd: SplittableRandom): String =
    s"""{"k${rnd.nextInt(10)}": ${rnd.nextInt(1000)}, "s": "${CharsP.gen(rnd)}"}"""
}

object ExactJsonP extends VParser("exact_json") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = JsonP.parse(cur, sep)
}

/** `[a,b,c]` with optional element-type recursion (`array/ip`,
  * `array/array/digit`; reference protocol/array.rs + field.rs:45-66). */
final class ArrayP(sub: Option[VParser]) extends VParser("array") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val m = cur.mark
    if (cur.atEnd || cur.peek != '[') return None
    cur.pos += 1
    val xs = Vector.newBuilder[WValue]
    var ok = true; var done = false
    if (!cur.atEnd && cur.peek == ']') { cur.pos += 1; return Some(One(WArr(Vector.empty))) }
    // element tokens end at ',' OR the closing ']' (position lands on the
    // delimiter; the loop below consumes it)
    val inner: Sep = new Sep {
      def find(input: String, from: Int): Option[(Int, Int)] = {
        var i = from
        while (i < input.length && input.charAt(i) != ',' && input.charAt(i) != ']') i += 1
        if (i < input.length) Some((i, i)) else None
      }
      def consumeAt(input: String, pos: Int): Option[Int] = None
    }
    while (!done && ok) {
      while (!cur.atEnd && cur.peek == ' ') cur.pos += 1
      val elemEnd = {
        // element text runs to ',' or matching ']' (nested arrays recurse)
        sub match {
          case Some(p) =>
            p.parse(cur, inner) match {
              case Some(One(v)) => xs += v; true
              case Some(Named(fs)) => xs += WObj(fs); true
              case None => false
            }
          case None =>
            val start = cur.pos
            var depth = 0
            while (!cur.atEnd && !(depth == 0 && (cur.peek == ',' || cur.peek == ']'))) {
              if (cur.peek == '[') depth += 1
              if (cur.peek == ']') depth -= 1
              cur.pos += 1
            }
            xs += AutoVal.typed(cur.input.substring(start, cur.pos).trim)
            true
        }
      }
      if (!elemEnd) ok = false
      else {
        while (!cur.atEnd && cur.peek == ' ') cur.pos += 1
        if (!cur.atEnd && cur.peek == ',') cur.pos += 1
        else if (!cur.atEnd && cur.peek == ']') { cur.pos += 1; done = true }
        else ok = false
      }
    }
    if (ok) Some(One(WArr(xs.result()))) else { cur.reset(m); None }
  }
  override def gen(rnd: SplittableRandom): String =
    (0 until 3).map(_ => sub.map(_.gen(rnd)).getOrElse(rnd.nextInt(100).toString))
      .mkString("[", ",", "]")
}

/** protobuf-text-ish block: `name { k: v ... }` — balanced-brace segment
  * (reference protocol/proto_text.rs). */
object ProtoTextP extends VParser("proto_text") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val m = cur.mark
    val i = cur.input.indexOf('{', cur.pos)
    if (i < 0) return None
    var depth = 0; var p = i
    while (p < cur.len) {
      val c = cur.input.charAt(p)
      if (c == '{') depth += 1
      else if (c == '}') { depth -= 1; if (depth == 0) { val s = cur.input.substring(cur.pos, p + 1); cur.pos = p + 1; return Some(One(WChars(s))) } }
      p += 1
    }
    cur.reset(m); None
  }
}

/** CN 18-digit ID card: 17 digits + digit/X (reference physical/id_card.rs). */
object IdCardP extends VParser("id_card") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val start = cur.pos
    var n = 0
    while (!cur.atEnd && cur.peek.isDigit && n < 17) { cur.pos += 1; n += 1 }
    if (n == 17 && !cur.atEnd && (cur.peek.isDigit || cur.peek == 'X' || cur.peek == 'x')) {
      cur.pos += 1
      if (cur.atEnd || !Character.isLetterOrDigit(cur.peek))
        Some(One(WChars(cur.input.substring(start, cur.pos))))
      else { cur.pos = start; None }
    } else { cur.pos = start; None }
  }
  override def gen(rnd: SplittableRandom): String =
    "4301" + (0 until 13).map(_ => rnd.nextInt(10)).mkString + "X"
}

/** CN 11-digit mobile: 1[3-9]xxxxxxxxx (reference physical/mobile_phone.rs). */
object MobilePhoneP extends VParser("mobile_phone") {
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    val start = cur.pos
    if (cur.remaining < 11 || cur.peek != '1') return None
    val c2 = cur.input.charAt(cur.pos + 1)
    if (c2 < '3' || c2 > '9') return None
    var i = 0
    while (i < 11 && cur.pos + i < cur.len && cur.input.charAt(cur.pos + i).isDigit) i += 1
    if (i == 11 && (cur.pos + 11 >= cur.len || !Character.isLetterOrDigit(cur.input.charAt(cur.pos + 11)))) {
      val s = cur.input.substring(cur.pos, cur.pos + 11)
      cur.pos += 11
      Some(One(WChars(s)))
    } else { cur.pos = start; None }
  }
  override def gen(rnd: SplittableRandom): String =
    "1" + (3 + rnd.nextInt(7)) + (0 until 9).map(_ => rnd.nextInt(10)).mkString
}

/** auto — try-chain Json → Time → IP → KV → Float → Digit → Hex → Chars
  * (reference factory.rs:28-39). */
object AutoP extends VParser("auto") {
  private def chain: Seq[VParser] =
    Seq(JsonP, TimeP.auto, IpP, KvP, FloatP, DigitP, HexP, CharsP)
  def parse(cur: Cursor, sep: Sep): Option[Parsed] = {
    for (p <- chain) {
      val m = cur.mark
      p.parse(cur, sep) match {
        case Some(r) => return Some(r)
        case None => cur.reset(m)
      }
    }
    None
  }
}
