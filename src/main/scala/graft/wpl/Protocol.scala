package graft.wpl

import java.util.SplittableRandom

/** Protocol parsers: kv / kvarr / json / exact_json / array / proto_text /
  * id_card / mobile_phone / auto (reference crates/wp-lang/src/eval/value/
  * parser/protocol (kvarr.rs etc.), factory.rs:28-73). */

/** Single `key=value` (or `key:value`); value may be double-quoted.
  * Produces a field NAMED by the key (reference protocol/keyval.rs). */
object KvP extends VParser("kv") {
  /** Identifier key at the cursor, or null. */
  def keyAt(cur: Cursor): String = {
    val start = cur.pos
    while (!cur.atEnd && (VParser.isIdent(cur.peek))) cur.pos += 1
    if (cur.pos == start) { cur.pos = start; null }
    else cur.input.substring(start, cur.pos)
  }
  /** Double-quoted value at the cursor, or null. */
  def quoted(cur: Cursor): String = {
    if (cur.atEnd || cur.peek != '"') return null
    val end = cur.input.indexOf('"', cur.pos + 1)
    if (end < 0) null
    else { val s = cur.input.substring(cur.pos + 1, end); cur.pos = end + 1; s }
  }
  /** `[..]`/`{..}`/`(..)` values span their balanced bracket range (kv
    * values holding nested-group payloads — order.rs test_pipeline3). */
  def bracketed(cur: Cursor): String = {
    if (cur.atEnd) return null
    val open = cur.peek
    val close = open match {
      case '[' => ']'; case '{' => '}'; case '(' => ')'; case _ => return null
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
          return s
        }
      }
      p += 1
    }
    null
  }
  @inline private def skipSp(cur: Cursor): Unit =
    while (!cur.atEnd && (cur.peek == ' ' || cur.peek == '\t')) cur.pos += 1
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val m = cur.mark
    val k = keyAt(cur)
    if (k != null) {
      skipSp(cur) // spaces allowed around the kv separator ("data : [..]")
      if (!cur.atEnd && (cur.peek == '=' || cur.peek == ':')) {
        cur.pos += 1
        // spaces after the kv separator are skipped ONLY en route to a
        // quoted/bracketed value ("data : [..]", order.rs test_pipeline3);
        // for a plain value the space IS the field separator, so
        // "args= flag_field=1" gives args an EMPTY value (h3c_waf
        // fixture), not the next token
        val p0 = cur.pos
        skipSp(cur)
        var v = quoted(cur)
        if (v == null) v = bracketed(cur)
        if (v == null) { cur.pos = p0; v = VParser.tokenTo(cur, sep) }
        Named(Vector(k -> AutoVal.typed(v)))
      } else { cur.reset(m); null }
    } else { cur.reset(m); null }
  }
  override def gen(rnd: SplittableRandom): String =
    s"k${rnd.nextInt(100)}=${CharsP.gen(rnd)}"
}

/** Typed coercion of a raw kv/json scalar string (digits → WDigit, etc.). */
object AutoVal {
  def typed(s: String): WValue = {
    if (s.isEmpty) return WChars(s)
    if (s.forall(VParser.isAsciiDigit) || (s.length > 1 && s.charAt(0) == '-' && s.drop(1).forall(VParser.isAsciiDigit))) {
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
      else {
        val np = sep.consumeAt(cur.input, cur.pos)
        if (np > cur.pos) { cur.pos = np; moved = true; cont = true }
      }
    }
    moved
  }
  /** value ends at sep, `,`, `;`, or whitespace; quoted and bracketed
    * values span. */
  private def value(cur: Cursor, sep: Sep): String = {
    var q = KvP.quoted(cur)
    if (q == null) q = KvP.bracketed(cur)
    if (q != null) q
    else {
      val start = cur.pos
      while (!cur.atEnd && cur.peek != ',' && cur.peek != ';' &&
             cur.peek != ' ' && cur.peek != '\t' &&
             sep.consumeAt(cur.input, cur.pos) < 0) cur.pos += 1
      cur.input.substring(start, cur.pos)
    }
  }
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val out = Vector.newBuilder[(String, WValue)]
    var n = 0
    var done = false
    while (!done) {
      val m = cur.mark
      val k = KvP.keyAt(cur)
      if (k != null && !cur.atEnd && (cur.peek == '=' || cur.peek == ':')) {
        cur.pos += 1
        out += (k -> AutoVal.typed(value(cur, sep)))
        n += 1
        val m2 = cur.mark
        if (!skipPairSep(cur, sep)) done = true
        // lookahead: next must be key=; else back off the sep skip
        else {
          val m3 = cur.mark
          val k2 = KvP.keyAt(cur)
          if (k2 != null && !cur.atEnd && (cur.peek == '=' || cur.peek == ':')) cur.reset(m3)
          else { cur.reset(m2); done = true }
        }
      } else { cur.reset(m); done = true }
    }
    val fs = out.result()
    if (fs.isEmpty) null else Named(fs)
  }
  override def gen(rnd: SplittableRandom): String =
    (0 until 3).map(i => s"k$i=${CharsP.gen(rnd)}").mkString(", ")
}

/** Hand-rolled lenient JSON parser (reference protocol/json.rs, 891 LoC).
  * Top-level object → fields named by keys; nested values stay WObj/WArr. */
object JsonP extends VParser("json") {
  /** null = no value. */
  def parseValue(cur: Cursor): WValue = {
    skipWs(cur)
    if (cur.atEnd) return null
    cur.peek match {
      case '{' => parseObj(cur)
      case '[' => parseArr(cur)
      case '"' => val s = KvP.quoted(cur); if (s == null) null else WChars(s)
      case 't' => if (cur.input.startsWith("true", cur.pos)) { cur.pos += 4; WBool(true) } else null
      case 'f' => if (cur.input.startsWith("false", cur.pos)) { cur.pos += 5; WBool(false) } else null
      case 'n' => if (cur.input.startsWith("null", cur.pos)) { cur.pos += 4; WNull } else null
      case c if VParser.isAsciiDigit(c) || c == '-' =>
        val m = cur.mark
        FloatP.parse(cur, VParser.EolSep) match {
          case One(f) => f
          case _ =>
            cur.reset(m)
            val d = VParser.digitRun(cur)
            if (d.nonEmpty) try WDigit(d.toLong) catch { case _: NumberFormatException => null }
            else null
        }
      case _ => null
    }
  }
  private def skipWs(cur: Cursor): Unit =
    while (!cur.atEnd && cur.peek.isWhitespace) cur.pos += 1
  /** null = no object here. */
  def parseObj(cur: Cursor): WObj = {
    if (cur.atEnd || cur.peek != '{') return null
    cur.pos += 1
    val fs = Vector.newBuilder[(String, WValue)]
    skipWs(cur)
    if (!cur.atEnd && cur.peek == '}') { cur.pos += 1; return WObj(Vector.empty) }
    var ok = true
    var done = false
    while (!done && ok) {
      skipWs(cur)
      val k = KvP.quoted(cur)
      if (k != null) {
        skipWs(cur)
        if (!cur.atEnd && cur.peek == ':') {
          cur.pos += 1
          val v = parseValue(cur)
          if (v != null) {
            fs += (k -> v)
            skipWs(cur)
            if (!cur.atEnd && cur.peek == ',') cur.pos += 1
            else if (!cur.atEnd && cur.peek == '}') { cur.pos += 1; done = true }
            else ok = false
          } else ok = false
        } else ok = false
      } else ok = false
    }
    if (ok) WObj(fs.result()) else null
  }
  /** null = no array here. */
  def parseArr(cur: Cursor): WArr = {
    if (cur.atEnd || cur.peek != '[') return null
    cur.pos += 1
    val xs = Vector.newBuilder[WValue]
    skipWs(cur)
    if (!cur.atEnd && cur.peek == ']') { cur.pos += 1; return WArr(Vector.empty) }
    var ok = true; var done = false
    while (!done && ok) {
      val v = parseValue(cur)
      if (v != null) {
        xs += v
        skipWs(cur)
        if (!cur.atEnd && cur.peek == ',') cur.pos += 1
        else if (!cur.atEnd && cur.peek == ']') { cur.pos += 1; done = true }
        else ok = false
      } else ok = false
    }
    if (ok) WArr(xs.result()) else null
  }
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val m = cur.mark
    skipWs(cur)
    val o = parseObj(cur)
    if (o != null) Named(o.fields) else { cur.reset(m); null }
  }
  override def gen(rnd: SplittableRandom): String =
    s"""{"k${rnd.nextInt(10)}": ${rnd.nextInt(1000)}, "s": "${CharsP.gen(rnd)}"}"""
}

object ExactJsonP extends VParser("exact_json") {
  def parse(cur: Cursor, sep: Sep): Parsed = JsonP.parse(cur, sep)
}

/** `[a,b,c]` with optional element-type recursion (`array/ip`,
  * `array/array/digit`; reference protocol/array.rs + field.rs:45-66). */
final class ArrayP(sub: Option[VParser]) extends VParser("array") {
  // element tokens end at ',' OR the closing ']' (position lands on the
  // delimiter; the loop below consumes it)
  private object InnerSep extends Sep {
    def find(input: String, from: Int): Long = {
      var i = from
      while (i < input.length && input.charAt(i) != ',' && input.charAt(i) != ']') i += 1
      if (i < input.length) Sep.pack(i, i) else Sep.NotFound
    }
    def consumeAt(input: String, pos: Int): Int = -1
  }
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val m = cur.mark
    if (cur.atEnd || cur.peek != '[') return null
    cur.pos += 1
    val xs = Vector.newBuilder[WValue]
    var ok = true; var done = false
    if (!cur.atEnd && cur.peek == ']') { cur.pos += 1; return One(WArr(Vector.empty)) }
    while (!done && ok) {
      while (!cur.atEnd && cur.peek == ' ') cur.pos += 1
      val elemEnd = {
        // element text runs to ',' or matching ']' (nested arrays recurse)
        sub match {
          case Some(p) =>
            p.parse(cur, InnerSep) match {
              case One(v) => xs += v; true
              case Named(fs) => xs += WObj(fs); true
              case null => false
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
    if (ok) One(WArr(xs.result())) else { cur.reset(m); null }
  }
  override def gen(rnd: SplittableRandom): String =
    (0 until 3).map(_ => sub.map(_.gen(rnd)).getOrElse(rnd.nextInt(100).toString))
      .mkString("[", ",", "]")
}

/** protobuf-text-ish block: `name { k: v ... }` — balanced-brace segment
  * (reference protocol/proto_text.rs). */
object ProtoTextP extends VParser("proto_text") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val m = cur.mark
    val i = cur.input.indexOf('{', cur.pos)
    if (i < 0) return null
    var depth = 0; var p = i
    while (p < cur.len) {
      val c = cur.input.charAt(p)
      if (c == '{') depth += 1
      else if (c == '}') { depth -= 1; if (depth == 0) { val s = cur.input.substring(cur.pos, p + 1); cur.pos = p + 1; return One(WChars(s)) } }
      p += 1
    }
    cur.reset(m); null
  }
}

/** CN 18-digit ID card: 17 digits + digit/X (reference physical/id_card.rs). */
object IdCardP extends VParser("id_card") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val start = cur.pos
    var n = 0
    while (!cur.atEnd && VParser.isAsciiDigit(cur.peek) && n < 17) { cur.pos += 1; n += 1 }
    if (n == 17 && !cur.atEnd && (VParser.isAsciiDigit(cur.peek) || cur.peek == 'X' || cur.peek == 'x')) {
      cur.pos += 1
      if (cur.atEnd || !Character.isLetterOrDigit(cur.peek))
        One(WChars(cur.input.substring(start, cur.pos)))
      else { cur.pos = start; null }
    } else { cur.pos = start; null }
  }
  override def gen(rnd: SplittableRandom): String =
    "4301" + (0 until 13).map(_ => rnd.nextInt(10)).mkString + "X"
}

/** CN 11-digit mobile: 1[3-9]xxxxxxxxx (reference physical/mobile_phone.rs). */
object MobilePhoneP extends VParser("mobile_phone") {
  def parse(cur: Cursor, sep: Sep): Parsed = {
    val start = cur.pos
    if (cur.remaining < 11 || cur.peek != '1') return null
    val c2 = cur.input.charAt(cur.pos + 1)
    if (c2 < '3' || c2 > '9') return null
    var i = 0
    while (i < 11 && cur.pos + i < cur.len && VParser.isAsciiDigit(cur.input.charAt(cur.pos + i))) i += 1
    if (i == 11 && (cur.pos + 11 >= cur.len || !Character.isLetterOrDigit(cur.input.charAt(cur.pos + 11)))) {
      val s = cur.input.substring(cur.pos, cur.pos + 11)
      cur.pos += 11
      One(WChars(s))
    } else { cur.pos = start; null }
  }
  override def gen(rnd: SplittableRandom): String =
    "1" + (3 + rnd.nextInt(7)) + (0 until 9).map(_ => rnd.nextInt(10)).mkString
}

/** auto — try-chain Json → Time → IP → KV → Float → Digit → Hex → Chars
  * (reference factory.rs:28-39). */
object AutoP extends VParser("auto") {
  private val chain: Array[VParser] =
    Array(JsonP, TimeP.auto, IpP, KvP, FloatP, DigitP, HexP, CharsP)
  def parse(cur: Cursor, sep: Sep): Parsed = {
    var i = 0
    while (i < chain.length) {
      val m = cur.mark
      val r = chain(i).parse(cur, sep)
      if (r != null) return r
      cur.reset(m)
      i += 1
    }
    null
  }
}
