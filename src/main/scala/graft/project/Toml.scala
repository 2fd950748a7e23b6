package graft.project

import scala.collection.mutable

/** Minimal TOML reader covering the subset the reference project files
  * use (conf/wparse.toml, topology/sources/wpsrc.toml, sink route files,
  * connectors/sink.d — see /root/reference/tests/instance): basic and
  * literal strings, integers/floats/booleans, (multi-line) arrays,
  * inline tables, `[table.path]` headers, `[[array.of.tables]]`
  * headers, and `#` comments. Standard TOML path semantics: descending
  * through an array-of-tables segment means its LAST element (so
  * `[connectors.params]` after `[[connectors]]` attaches to the most
  * recent connector).
  *
  * Deliberately NOT a full TOML 1.0 parser — dates, dotted keys in
  * key/value position, and multi-line strings are absent from the
  * reference corpus and unsupported here (they raise).
  */
object Toml {

  sealed trait TVal {
    def str: String = this match {
      case TStr(v) => v
      case TLong(v) => v.toString
      case TDbl(v) => v.toString
      case TBool(v) => v.toString
      case other => throw new IllegalArgumentException(s"not a string: $other")
    }
    def long: Long = this match {
      case TLong(v) => v
      case TStr(v) => v.toLong
      case other => throw new IllegalArgumentException(s"not an int: $other")
    }
    def bool: Boolean = this match {
      case TBool(v) => v
      case other => throw new IllegalArgumentException(s"not a bool: $other")
    }
    def arr: Vector[TVal] = this match {
      case TArr(v) => v
      case single => Vector(single) // flat notation: `oml = "x"` ≡ `oml = ["x"]`
    }
    def tab: TTab = this match {
      case t: TTab => t
      case other => throw new IllegalArgumentException(s"not a table: $other")
    }
  }
  final case class TStr(v: String) extends TVal
  final case class TLong(v: Long) extends TVal
  final case class TDbl(v: Double) extends TVal
  final case class TBool(v: Boolean) extends TVal
  final case class TArr(v: Vector[TVal]) extends TVal
  final class TTab extends TVal {
    val m: mutable.LinkedHashMap[String, TVal] = mutable.LinkedHashMap.empty
    def get(path: String*): Option[TVal] = {
      var cur: TVal = this
      for (seg <- path) cur match {
        case t: TTab => t.m.get(seg) match {
          case Some(v) => cur = v
          case None => return None
        }
        case _ => return None
      }
      Some(cur)
    }
    def str(path: String*): Option[String] = get(path: _*).map(_.str)
    def long(path: String*): Option[Long] = get(path: _*).map(_.long)
    def bool(path: String*): Option[Boolean] = get(path: _*).map(_.bool)
    /** Array-of-tables at path (empty if absent). */
    def tables(path: String*): Vector[TTab] = get(path: _*) match {
      case Some(TArr(vs)) => vs.collect { case t: TTab => t }
      case Some(t: TTab) => Vector(t)
      case _ => Vector.empty
    }
    /** String-array value; accepts flat single-string notation. */
    def strings(path: String*): Vector[String] =
      get(path: _*).map(_.arr.map(_.str)).getOrElse(Vector.empty)
    override def toString: String = m.toString
  }

  /** `${NAME}` env interpolation over every string value of a parsed
    * table, recursively (reference orion_variate `EnvEvalable.env_eval`
    * applied to route files / connectors / sources after load).
    * Unset variables leave the reference text as-is (the reference
    * keeps unresolved placeholders too). */
  def envEval(t: TTab, lookup: String => Option[String]): TTab = {
    val re = "\\$\\{([A-Za-z_][A-Za-z0-9_]*)\\}".r
    def evalStr(s: String): String =
      re.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        lookup(m.group(1)).getOrElse(m.matched)))
    def walk(v: TVal): TVal = v match {
      case TStr(s) => TStr(evalStr(s))
      case TArr(vs) => TArr(vs.map(walk))
      case tab: TTab =>
        val out = new TTab
        tab.m.foreach { case (k, vv) => out.m(k) = walk(vv) }
        out
      case other => other
    }
    walk(t).asInstanceOf[TTab]
  }

  def parse(src: String): TTab = {
    val root = new TTab
    var cur: TTab = root
    val lines = src.linesIterator.toArray
    var i = 0
    while (i < lines.length) {
      var line = stripComment(lines(i)).trim
      if (line.nonEmpty) {
        if (line.startsWith("[[") && line.endsWith("]]")) {
          val path = splitPath(line.substring(2, line.length - 2))
          val parent = navigate(root, path.init)
          val arr = parent.m.get(path.last) match {
            case Some(TArr(vs)) => vs
            case None => Vector.empty
            case Some(other) => throw new IllegalArgumentException(
              s"[[${path.mkString(".")}]] conflicts with $other")
          }
          val t = new TTab
          parent.m(path.last) = TArr(arr :+ t)
          cur = t
        } else if (line.startsWith("[") && line.endsWith("]")) {
          val path = splitPath(line.substring(1, line.length - 1))
          cur = navigate(root, path)
        } else {
          val eq = indexOfUnquoted(line, '=')
          if (eq < 0) throw new IllegalArgumentException(s"bad toml line: $line")
          // dotted keys nest (TOML `a.b = v` ≡ `[a] b = v`)
          val keyPath = splitPath(line.substring(0, eq).trim)
          var rhs = line.substring(eq + 1).trim
          // multi-line arrays: gather until brackets balance outside strings
          while (!balanced(rhs) && i + 1 < lines.length) {
            i += 1
            rhs = rhs + "\n" + stripComment(lines(i)).trim
          }
          val owner = if (keyPath.size == 1) cur else navigate(cur, keyPath.init)
          owner.m(keyPath.last) = parseValue(rhs.trim)
        }
      }
      i += 1
    }
    root
  }

  private def splitPath(s: String): Vector[String] =
    s.split('.').iterator.map(seg => unkey(seg.trim)).toVector

  private def unkey(s: String): String =
    if (s.length >= 2 && (s.head == '"' || s.head == '\'') && s.last == s.head)
      s.substring(1, s.length - 1)
    else s

  /** Walk/create tables along `path`; an array-of-tables segment resolves
    * to its last element. */
  private def navigate(root: TTab, path: Seq[String]): TTab = {
    var cur = root
    for (seg <- path) {
      cur = cur.m.get(seg) match {
        case Some(t: TTab) => t
        case Some(TArr(vs)) if vs.nonEmpty && vs.last.isInstanceOf[TTab] =>
          vs.last.asInstanceOf[TTab]
        case None =>
          val t = new TTab
          cur.m(seg) = t
          t
        case Some(other) =>
          throw new IllegalArgumentException(s"path segment $seg is $other")
      }
    }
    cur
  }

  private def stripComment(line: String): String = {
    var inStr = false; var strCh = ' '
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inStr) {
        if (c == '\\' && strCh == '"') i += 1
        else if (c == strCh) inStr = false
      } else if (c == '"' || c == '\'') { inStr = true; strCh = c }
      else if (c == '#') return line.substring(0, i)
      i += 1
    }
    line
  }

  private def indexOfUnquoted(s: String, target: Char): Int = {
    var inStr = false; var strCh = ' '
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\' && strCh == '"') i += 1
        else if (c == strCh) inStr = false
      } else if (c == '"' || c == '\'') { inStr = true; strCh = c }
      else if (c == target) return i
      i += 1
    }
    -1
  }

  private def balanced(s: String): Boolean = {
    var depth = 0; var inStr = false; var strCh = ' '
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\' && strCh == '"') i += 1
        else if (c == strCh) inStr = false
      } else c match {
        case '"' | '\'' => inStr = true; strCh = c
        case '[' | '{' => depth += 1
        case ']' | '}' => depth -= 1
        case _ =>
      }
      i += 1
    }
    depth <= 0
  }

  // ---- value parsing -------------------------------------------------

  private final class Cur(val s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def atEnd: Boolean = i >= s.length
    def peek: Char = s.charAt(i)
  }

  private def parseValue(s: String): TVal = {
    val c = new Cur(s)
    val v = value(c)
    c.ws()
    require(c.atEnd, s"trailing toml value text: '${s.substring(c.i)}'")
    v
  }

  private def value(c: Cur): TVal = {
    c.ws()
    require(!c.atEnd, "empty toml value")
    c.peek match {
      case '"' => TStr(basicString(c))
      case '\'' => TStr(literalString(c))
      case '[' =>
        c.i += 1
        val items = Vector.newBuilder[TVal]
        c.ws()
        while (!c.atEnd && c.peek != ']') {
          items += value(c)
          c.ws()
          if (!c.atEnd && c.peek == ',') { c.i += 1; c.ws() }
        }
        require(!c.atEnd && c.peek == ']', "unterminated toml array")
        c.i += 1
        TArr(items.result())
      case '{' =>
        c.i += 1
        val t = new TTab
        c.ws()
        while (!c.atEnd && c.peek != '}') {
          val ks = new StringBuilder
          while (!c.atEnd && c.peek != '=') { ks.append(c.peek); c.i += 1 }
          require(!c.atEnd, "unterminated inline table")
          c.i += 1 // '='
          t.m(unkey(ks.toString.trim)) = value(c)
          c.ws()
          if (!c.atEnd && c.peek == ',') { c.i += 1; c.ws() }
        }
        require(!c.atEnd && c.peek == '}', "unterminated inline table")
        c.i += 1
        t
      case _ =>
        val sb = new StringBuilder
        while (!c.atEnd && c.peek != ',' && c.peek != ']' && c.peek != '}' &&
               !c.peek.isWhitespace) { sb.append(c.peek); c.i += 1 }
        val raw = sb.toString
        raw match {
          case "true" => TBool(true)
          case "false" => TBool(false)
          case r if r.matches("[+-]?\\d+") => TLong(r.toLong)
          case r if r.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?") => TDbl(r.toDouble)
          case other => throw new IllegalArgumentException(s"bad toml scalar: '$other'")
        }
    }
  }

  private def basicString(c: Cur): String = {
    c.i += 1
    val sb = new StringBuilder
    while (!c.atEnd && c.peek != '"') {
      if (c.peek == '\\') {
        c.i += 1
        require(!c.atEnd, "dangling escape")
        c.peek match {
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case 'r' => sb.append('\r')
          case '\\' => sb.append('\\')
          case '"' => sb.append('"')
          case 'u' =>
            require(c.i + 4 < c.s.length, "bad \\u escape")
            sb.append(Integer.parseInt(c.s.substring(c.i + 1, c.i + 5), 16).toChar)
            c.i += 4
          case other => sb.append(other)
        }
      } else sb.append(c.peek)
      c.i += 1
    }
    require(!c.atEnd, "unterminated string")
    c.i += 1
    sb.toString
  }

  private def literalString(c: Cur): String = {
    c.i += 1
    val sb = new StringBuilder
    while (!c.atEnd && c.peek != '\'') { sb.append(c.peek); c.i += 1 }
    require(!c.atEnd, "unterminated literal string")
    c.i += 1
    sb.toString
  }
}
