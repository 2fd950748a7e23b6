package graft.wpl

/** WPL AST (grammar: reference docs/usage/en/03-wpl/06-grammar-reference.md
  * :30-278). Case classes only — compiled to runtime evaluators by
  * `RuleEval`. */

sealed trait FieldFmt
final case class ScopeFmt(beg: String, end: String) extends FieldFmt // <[,]>
case object QuoteFmt extends FieldFmt                                // "

sealed trait PipeAst
final case class FunPipe(name: String, args: Vector[String]) extends PipeAst
final case class GroupPipe(group: WplGroup) extends PipeAst

final case class SubField(
    opt: Boolean,
    typeName: Option[String],
    symbolContent: Option[String],
    refPath: Option[String],
    name: Option[String],
    fmt: Option[FieldFmt],
    sep: Option[Sep],
    pipes: Vector[PipeAst],
    /** `+geo(city_name)` parse-time enrichment: (kind, outField) —
      * reference fixture tests/json_test/rule.wpl:1. */
    enrich: Option[(String, String)] = None)

final case class WplField(
    repeat: Option[Int], // Some(0) = unbounded `*`, Some(n) = `n*`
    typeName: String,
    symbolContent: Option[String],
    subfields: Vector[SubField],
    name: Option[String],
    lenCap: Option[Int],
    fmt: Option[FieldFmt],
    sep: Option[Sep],
    pipes: Vector[PipeAst])

final case class WplGroup(
    meta: String, // seq | alt | opt | some_of | not
    fields: Vector[WplField],
    len: Option[Int],
    sep: Option[Sep])

final case class WplRule(
    pkg: String,
    name: String,
    preprocs: Vector[String],
    groups: Vector[WplGroup],
    tags: Vector[(String, String)],
    copyRaw: Option[String]) {
  def key: String = s"$pkg/$name"
}

/** Recursive-descent parser for WPL source text (one or more packages). */
object WplText {

  final class PErr(msg: String, pos: Int) extends Exception(s"$msg at $pos")

  def parsePackages(src: String): Vector[WplRule] = {
    val s = new TextCursor(src)
    val rules = Vector.newBuilder[WplRule]
    s.ws()
    while (!s.atEnd) {
      val anno = parseAnnotation(s)
      s.expect("package")
      s.ws()
      val pkg = s.takeWhile(c => VParser.isIdent(c) || c == '/')
      s.ws(); s.expectCh('{')
      s.ws()
      while (!s.atEnd && s.peek != '}') {
        val ranno = parseAnnotation(s)
        s.expect("rule")
        s.ws()
        val name = s.takeWhile(c => VParser.isIdent(c) || c == '/')
        s.ws(); s.expectCh('{'); s.ws()
        val (preprocs, groups) = parseExpress(s)
        s.ws(); s.expectCh('}'); s.ws()
        val tags = anno._1 ++ ranno._1 // rule-level wins on conflict (later)
        rules += WplRule(pkg, name, preprocs, groups,
          dedupeTags(tags), ranno._2.orElse(anno._2))
      }
      s.expectCh('}'); s.ws()
    }
    rules.result()
  }

  private def dedupeTags(ts: Vector[(String, String)]): Vector[(String, String)] =
    ts.reverse.distinctBy(_._1).reverse

  /** Bare rule-conf format (reference tests/json_test/gen.conf +
    * rule.wpl, rule_op.conf): one `name : (expr)sep` per line, optional
    * `#...` end-of-line comments, no package wrapper. Keys become
    * `<pkg>/<name>` with the given package prefix. */
  def parseRuleConf(src: String, pkg: String = ""): Vector[WplRule] = {
    // strip # comments (the conf format has no #[annotations])
    val stripped = src.linesIterator.map { l =>
      val h = l.indexOf('#')
      if (h >= 0) l.substring(0, h) else l
    }.mkString("\n")
    val s = new TextCursor(stripped)
    val rules = Vector.newBuilder[WplRule]
    s.ws()
    while (!s.atEnd) {
      val name = s.takeWhile(c => VParser.isIdent(c) || c == '/')
      if (name.isEmpty) throw new PErr("rule name expected", s.pos)
      s.ws(); s.expectCh(':')
      val (preprocs, groups) = parseExpress(s)
      rules += WplRule(pkg, name, preprocs, groups, Vector.empty, None)
      s.ws()
    }
    rules.result()
  }

  /** `#[tag(k:"v", ...), copy_raw(name:"raw")]` */
  private def parseAnnotation(s: TextCursor): (Vector[(String, String)], Option[String]) = {
    s.ws()
    if (!s.startsWith("#[")) return (Vector.empty, None)
    s.pos += 2
    val tags = Vector.newBuilder[(String, String)]
    var copyRaw: Option[String] = None
    s.ws()
    while (!s.atEnd && s.peek != ']') {
      val item = s.takeWhile(c => c.isLetter || c == '_')
      s.ws(); s.expectCh('('); s.ws()
      item match {
        case "tag" =>
          var more = true
          while (more) {
            s.ws()
            val k = s.takeWhile(c => VParser.isIdent(c))
            s.ws(); s.expectCh(':'); s.ws()
            tags += (k -> parseStringLit(s))
            s.ws()
            if (!s.atEnd && s.peek == ',') { s.pos += 1 } else more = false
          }
        case "copy_raw" =>
          s.expect("name"); s.ws(); s.expectCh(':'); s.ws()
          copyRaw = Some(parseStringLit(s))
          s.ws()
        case other => throw new PErr(s"unknown annotation $other", s.pos)
      }
      s.expectCh(')'); s.ws()
      if (!s.atEnd && s.peek == ',') { s.pos += 1; s.ws() }
    }
    s.expectCh(']')
    s.ws()
    (tags.result(), copyRaw)
  }

  private def parseStringLit(s: TextCursor): String = {
    if (s.startsWith("r#\"")) {
      s.pos += 3
      val end = s.src.indexOf("\"#", s.pos)
      if (end < 0) throw new PErr("unterminated raw string", s.pos)
      val v = s.src.substring(s.pos, end); s.pos = end + 2; v
    } else {
      s.expectCh('"')
      val sb = new StringBuilder
      while (!s.atEnd && s.peek != '"') {
        if (s.peek == '\\' && s.pos + 1 < s.src.length) {
          s.src.charAt(s.pos + 1) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case c => sb.append(c)
          }
          s.pos += 2
        } else { sb.append(s.peek); s.pos += 1 }
      }
      s.expectCh('"')
      sb.toString
    }
  }

  /** express = [preproc] group {, group} */
  def parseExpress(s: TextCursor): (Vector[String], Vector[WplGroup]) = {
    s.ws()
    val preprocs = Vector.newBuilder[String]
    // preproc block: |step|step| — distinguishable from nothing by leading |
    if (!s.atEnd && s.peek == '|') {
      s.pos += 1
      var more = true
      while (more) {
        s.ws()
        var step = s.takeWhile(c => VParser.isIdent(c) || c == '/')
        // `plg_pipe(name)` is the parenthesized alias of `plg_pipe/name`
        // (reference wpl_rule.rs take_plg_pipe_step)
        if (step == "plg_pipe" && !s.atEnd && s.peek == '(') {
          s.pos += 1; s.ws()
          val key = s.takeWhile(c => VParser.isIdent(c) || c == '/')
          s.ws(); s.expectCh(')')
          step = s"plg_pipe/$key"
        }
        preprocs += step
        s.ws()
        s.expectCh('|')
        val m = s.pos
        s.ws()
        // another step or end of preproc? peek for ident followed by '|'
        if (!s.atEnd && (s.peek.isLetter || s.peek == '_')) {
          val m2 = s.pos
          val t = s.takeWhile(c => VParser.isIdent(c) || c == '/')
          s.ws()
          // another step: `tok |`, or a parenthesized `plg_pipe(name) |`
          if (!s.atEnd && (s.peek == '|' || (t == "plg_pipe" && s.peek == '('))) {
            s.pos = m2
          } else { s.pos = m; more = false }
        } else { s.pos = m; more = false }
      }
    }
    s.ws()
    val groups = Vector.newBuilder[WplGroup]
    groups += parseGroup(s)
    s.ws()
    while (!s.atEnd && s.peek == ',') {
      s.pos += 1; s.ws()
      groups += parseGroup(s)
      s.ws()
    }
    (preprocs.result(), groups.result())
  }

  def parseGroup(s: TextCursor): WplGroup = {
    s.ws()
    val meta =
      if (s.startsWithKw("alt")) { s.pos += 3; "alt" }
      else if (s.startsWithKw("opt")) { s.pos += 3; "opt" }
      else if (s.startsWithKw("some_of")) { s.pos += 7; "some_of" }
      else if (s.startsWithKw("seq")) { s.pos += 3; "seq" }
      else if (s.startsWithKw("not")) { s.pos += 3; "not" }
      else "seq"
    s.ws(); s.expectCh('('); s.ws()
    val fields = Vector.newBuilder[WplField]
    while (!s.atEnd && s.peek != ')') {
      fields += parseField(s)
      s.ws()
      if (!s.atEnd && s.peek == ',') { s.pos += 1; s.ws() }
    }
    s.expectCh(')')
    // group_len [n], group sep
    var len: Option[Int] = None
    if (!s.atEnd && s.peek == '[') {
      s.pos += 1
      len = Some(s.takeWhile(_.isDigit).toInt)
      s.expectCh(']')
    }
    val sep = parseSepOpt(s)
    WplGroup(meta, fields.result(), len, sep)
  }

  def parseField(s: TextCursor): WplField = {
    s.ws()
    // repeat: [N]*
    var repeat: Option[Int] = None
    val m0 = s.pos
    val digits = s.takeWhile(_.isDigit)
    if (!s.atEnd && s.peek == '*') {
      s.pos += 1
      repeat = Some(if (digits.isEmpty) 0 else digits.toInt)
    } else s.pos = m0
    // data_type: path ident or _
    val tn =
      if (!s.atEnd && s.peek == '_') { s.pos += 1; "_" }
      else s.takeWhile(c => c.isLetterOrDigit || c == '_' || c == '/')
    if (tn.isEmpty) throw new PErr("expected data type", s.pos)
    var symbolContent: Option[String] = None
    var subfields = Vector.empty[SubField]
    if (!s.atEnd && s.peek == '(') {
      if (tn == "symbol" || tn == "peek_symbol") {
        s.pos += 1
        val sb = new StringBuilder
        while (!s.atEnd && s.peek != ')') {
          if (s.peek == '\\' && s.pos + 1 < s.src.length && s.src.charAt(s.pos + 1) == ')') {
            sb.append(')'); s.pos += 2
          } else { sb.append(s.peek); s.pos += 1 }
        }
        s.expectCh(')')
        symbolContent = Some(sb.toString)
      } else subfields = parseSubfields(s)
    }
    var name: Option[String] = None
    if (!s.atEnd && s.peek == ':') {
      s.pos += 1; s.ws()
      name = Some(s.takeWhile(c => VParser.isIdent(c)))
    }
    var lenCap: Option[Int] = None
    if (!s.atEnd && s.peek == '[') {
      s.pos += 1
      lenCap = Some(s.takeWhile(_.isDigit).toInt)
      s.expectCh(']')
    }
    val fmt = parseFmtOpt(s)
    val sep = parseSepOpt(s)
    val pipes = parsePipes(s)
    WplField(repeat, tn, symbolContent, subfields, name, lenCap, fmt, sep, pipes)
  }

  private def parseSubfields(s: TextCursor): Vector[SubField] = {
    s.expectCh('(')
    val out = Vector.newBuilder[SubField]
    s.ws()
    while (!s.atEnd && s.peek != ')') {
      out += parseSubField(s)
      s.ws()
      if (!s.atEnd && s.peek == ',') { s.pos += 1; s.ws() }
    }
    s.expectCh(')')
    out.result()
  }

  private def parseSubField(s: TextCursor): SubField = {
    s.ws()
    var opt = false
    if (s.startsWithKw("opt") && { val m = s.pos + 3; m < s.src.length && s.src.charAt(m) == '(' }) {
      opt = true
      s.pos += 4 // opt(
      s.ws()
    }
    var tn: Option[String] = None
    val m = s.pos
    val t = if (!s.atEnd && s.peek == '_') { s.pos += 1; "_" }
            else s.takeWhile(c => c.isLetterOrDigit || c == '_' || c == '/')
    if (t.nonEmpty) tn = Some(t) else s.pos = m
    if (opt) { s.ws(); s.expectCh(')') }
    var symbolContent: Option[String] = None
    if (tn.exists(x => x == "symbol" || x == "peek_symbol") && !s.atEnd && s.peek == '(') {
      s.pos += 1
      val sb = new StringBuilder
      while (!s.atEnd && s.peek != ')') { sb.append(s.peek); s.pos += 1 }
      s.expectCh(')')
      symbolContent = Some(sb.toString)
    }
    var refPath: Option[String] = None
    if (!s.atEnd && s.peek == '@') {
      s.pos += 1
      if (!s.atEnd && s.peek == '\'') {
        // single-quoted raw field ref for names outside the bare charset
        // (reference utils.rs take_ref_path_or_quoted: only \' escapes;
        // e.g. @'@client-ip', @'field with spaces')
        s.pos += 1
        val sb = new StringBuilder
        while (!s.atEnd && s.peek != '\'') {
          if (s.peek == '\\' && s.pos + 1 < s.src.length && s.src.charAt(s.pos + 1) == '\'') {
            sb.append('\''); s.pos += 2
          } else { sb.append(s.peek); s.pos += 1 }
        }
        s.expectCh('\'')
        refPath = Some(sb.toString)
      } else {
        refPath = Some(s.takeWhile(c => VParser.isIdent(c) || c == '/' || c == '[' || c == ']' || c == '*'))
      }
    }
    var name: Option[String] = None
    if (!s.atEnd && s.peek == ':') {
      s.pos += 1; s.ws()
      name = Some(s.takeWhile(c => VParser.isIdent(c)))
    }
    // `+geo(city_name)` / `+zone(z)` / `+device(d)` parse-time enrichment
    // (whitespace before `+` optional: `@dev-name+device(device_val)`)
    var enrich: Option[(String, String)] = None
    val mEnrich = s.pos
    s.ws()
    if (!s.atEnd && s.peek == '+') {
      s.pos += 1; s.ws()
      val kind = s.takeWhile(c => c.isLetterOrDigit || c == '_')
      s.ws(); s.expectCh('('); s.ws()
      val out = s.takeWhile(c => VParser.isIdent(c))
      s.ws(); s.expectCh(')')
      if (kind.isEmpty || out.isEmpty) throw new PErr("bad +enrich()", s.pos)
      enrich = Some((kind, out))
    } else s.pos = mEnrich
    val fmt = parseFmtOpt(s)
    val sep = parseSepOpt(s)
    val pipes = parsePipes(s)
    SubField(opt, tn, symbolContent, refPath, name, fmt, sep, pipes, enrich)
  }

  private def parseFmtOpt(s: TextCursor): Option[FieldFmt] = {
    if (!s.atEnd && s.peek == '<') {
      s.pos += 1
      val beg = new StringBuilder
      while (!s.atEnd && s.peek != ',') { beg.append(s.peek); s.pos += 1 }
      s.expectCh(',')
      val end = new StringBuilder
      // `<<,>>` means beg="<", end=">": a '>' belongs to the end text when
      // another '>' still follows (the last one closes the format)
      while (!s.atEnd && (s.peek != '>' ||
          (s.pos + 1 < s.src.length && s.src.charAt(s.pos + 1) == '>'))) {
        end.append(s.peek); s.pos += 1
      }
      s.expectCh('>')
      Some(ScopeFmt(beg.toString, end.toString))
    } else if (!s.atEnd && s.peek == '"') {
      s.pos += 1
      Some(QuoteFmt)
    } else None
  }

  private def parseSepOpt(s: TextCursor): Option[Sep] = {
    if (!s.atEnd && s.peek == '\\') {
      val sb = new StringBuilder
      while (!s.atEnd && s.peek == '\\' && s.pos + 1 < s.src.length) {
        sb.append(s.src.charAt(s.pos + 1))
        s.pos += 2
      }
      Some(Sep.Lit(sb.toString))
    } else if (!s.atEnd && s.peek == '{') {
      s.pos += 1
      val sb = new StringBuilder
      var depth = 0
      while (!s.atEnd && !(s.peek == '}' && depth == 0)) {
        if (s.peek == '{') depth += 1
        if (s.peek == '}') depth -= 1
        sb.append(s.peek); s.pos += 1
      }
      s.expectCh('}')
      Some(Sep.compilePattern(sb.toString))
    } else None
  }

  private def parsePipes(s: TextCursor): Vector[PipeAst] = {
    val out = Vector.newBuilder[PipeAst]
    var more = true
    while (more) {
      val m = s.pos
      s.ws()
      if (!s.atEnd && s.peek == '|') {
        s.pos += 1; s.ws()
        if (!s.atEnd && (s.peek == '(' || s.startsWithKw("alt") || s.startsWithKw("opt") ||
            s.startsWithKw("seq") || s.startsWithKw("some_of") || s.startsWithKw("not"))) {
          // `not` is both a group meta and a pipe fun — fun form has `not(`
          // followed by a fun name; group form has `not(` + field list.
          // Heuristic per EBNF: pipe accepts either; prefer fun when the
          // name is exactly a known fun call.
          val m2 = s.pos
          if (s.startsWithKw("not")) {
            out += parseFunPipe(s)
          } else {
            out += GroupPipe(parseGroup(s))
          }
        } else out += parseFunPipe(s)
      } else { s.pos = m; more = false }
    }
    out.result()
  }

  private def parseFunPipe(s: TextCursor): FunPipe = {
    val name = s.takeWhile(c => c.isLetterOrDigit || c == '_')
    s.ws(); s.expectCh('(')
    val args = Vector.newBuilder[String]
    var depth = 0
    val sb = new StringBuilder
    var done = false
    while (!s.atEnd && !done) {
      s.peek match {
        case ')' if depth == 0 =>
          if (sb.nonEmpty || args.result().nonEmpty) args += sb.toString.trim
          s.pos += 1; done = true
        case ',' if depth == 0 => args += sb.toString.trim; sb.clear(); s.pos += 1
        case '"' =>
          sb.append('"'); s.pos += 1
          while (!s.atEnd && s.peek != '"') { sb.append(s.peek); s.pos += 1 }
          sb.append('"'); if (!s.atEnd) s.pos += 1
        case c =>
          if (c == '(' || c == '[') depth += 1
          if (c == ')' || c == ']') depth -= 1
          sb.append(c); s.pos += 1
      }
    }
    FunPipe(name, args.result().filter(_.nonEmpty))
  }

  /** Raw text cursor for the DSL parser. */
  final class TextCursor(val src: String) {
    var pos = 0
    def atEnd: Boolean = pos >= src.length
    def peek: Char = src.charAt(pos)
    def ws(): Unit = {
      var go = true
      while (go) {
        while (!atEnd && peek.isWhitespace) pos += 1
        if (!atEnd && peek == '#' && !startsWith("#[")) { // comment to EOL
          while (!atEnd && peek != '\n') pos += 1
        } else go = false
      }
    }
    def startsWith(s: String): Boolean = src.startsWith(s, pos)
    def startsWithKw(s: String): Boolean =
      src.startsWith(s, pos) &&
        (pos + s.length >= src.length || !VParser.isIdent(src.charAt(pos + s.length)))
    def takeWhile(p: Char => Boolean): String = {
      val start = pos
      while (!atEnd && p(peek)) pos += 1
      src.substring(start, pos)
    }
    def expect(s: String): Unit = {
      ws()
      if (!startsWith(s)) throw new PErr(s"expected '$s'", pos)
      pos += s.length
    }
    def expectCh(c: Char): Unit = {
      if (atEnd || peek != c) throw new PErr(s"expected '$c'", pos)
      pos += 1
    }
  }
}
