package graft.wpl

/** WPL runtime: compiles a `WplRule` AST into an evaluator and routes
  * lines across rules (reference: crates/wp-lang/src/eval/runtime and
  * src/core/parser/wpl_engine/parser.rs).
  *
  * Observable semantics replicated (SURVEY.md §7.4):
  *  - first FULL match wins; residue/payload > 0.2 ⇒ fail-with-depth,
  *    residue ≤ 20% ⇒ Partial (parser.rs:57);
  *  - all-fail ⇒ Miss keeping the DEEPEST failure (parser.rs:81-113);
  *  - whitespace-only lines silently dropped (processor.rs:51-54);
  *  - `not` keeps partial consumption of the failed inner attempt
  *    (not.rs:58-70);
  *  - alt keeps the error of the attempt that consumed most input
  *    (alt.rs:40-52);
  *  - adaptive rule reordering every 10,000 records by hit count, stable
  *    (parser.rs:119-134, OPTIMIZE_TIMES vm_unit.rs:25).
  */
/** Plugin whole-line pipe registry (reference registry.rs:41-78). */
object PipeRegistry {
  private val fns = new java.util.concurrent.ConcurrentHashMap[String, String => String]()
  def register(name: String, fn: String => String): Unit = fns.put(name, fn)
  def get(name: String): Option[String => String] = Option(fns.get(name))
}

object Runtime {

  val ResidueRatio = 0.2
  val OptimizeEvery = 10000

  def parserFor(typeName: String, symbolContent: Option[String],
                subTypeFor: String => VParser = defaultSub): VParser =
    typeName match {
      case "chars" => CharsP
      case "_" => IgnoreP
      case "symbol" => new SymbolP(symbolContent.getOrElse(""), peek = false)
      case "peek_symbol" => new SymbolP(symbolContent.getOrElse(""), peek = true)
      case "bool" => BoolP
      case "digit" => DigitP
      case "float" => FloatP
      case "port" => PortP
      case "hex" => HexP
      case "base64" => Base64P
      case "sn" => SnP
      case "ip" => IpP
      case "ip_net" => IpNetP
      case "domain" => DomainP
      case "email" => EmailP
      case "url" => UrlP
      case "auto" => AutoP
      case "kv" => KvP
      case "kvarr" => KvArrP
      case "json" => JsonP
      case "obj" => JsonP // obj ≡ lenient JSON object (builtin_type list)
      case "exact_json" => ExactJsonP
      case "proto_text" | "proto/text" => ProtoTextP
      case "id_card" => IdCardP
      case "mobile_phone" => MobilePhoneP
      case "time" => TimeP.auto
      case "time_iso" | "time/iso" => TimeP.iso
      case "time_3339" | "time/rfc3339" => TimeP.rfc3339
      case "time_2822" | "time/rfc2822" => TimeP.rfc2822P
      case "time/clf" | "time/apache" | "time/httpd" | "time/nginx" => TimeP.clfP
      case "time_timestamp" | "time/timestamp" | "time/epoch" => TimeTimestampP
      case "http/request" => HttpRequestP
      case "http/status" => HttpStatusP
      case "http/method" => HttpMethodP
      case "http/agent" | "http/user_agent" => HttpAgentP
      case t if t.startsWith("array") =>
        val sub = t.stripPrefix("array").stripPrefix("/")
        new ArrayP(if (sub.isEmpty) None else Some(subTypeFor(sub)))
      case other => throw new IllegalArgumentException(s"unknown WPL type: $other")
    }

  private def defaultSub(t: String): VParser = parserFor(t, None)

  // -------------------------------------------------------------------
  // Field evaluation
  // -------------------------------------------------------------------

  final class FieldEval(f: WplField, enricher: Enricher = Enricher.empty) extends Serializable {
    val parser: VParser = parserFor(f.typeName, f.symbolContent)
    val autoName: String = f.name.getOrElse(f.typeName)

    /** Evaluate this field once at the cursor. Returns false on failure
      * (cursor reset by caller for groups that need it). */
    def evalOnce(cur: Cursor, rec: RecBuilder, effSep: Sep): Boolean = {
      // tolerate space padding after a non-whitespace separator (", kv=v")
      // for self-delimited values; sep-bounded chars keep raw semantics
      if (skipsLeadingWs) {
        while (!cur.atEnd && (cur.peek == ' ' || cur.peek == '\t')) cur.pos += 1
      }
      val parsed: Parsed = f.fmt match {
        case Some(ScopeFmt(beg, end)) =>
          if (!cur.input.startsWith(beg, cur.pos)) null
          else {
            val cStart = cur.pos + beg.length
            val endIdx = cur.input.indexOf(end, cStart)
            if (endIdx < 0) null
            else {
              val seg = cur.input.substring(cStart, endIdx)
              val p = parser.parseSegment(capLen(seg))
              if (p != null) cur.pos = endIdx + end.length
              p
            }
          }
        case Some(QuoteFmt) =>
          if (cur.atEnd || cur.peek != '"') null
          else {
            val endIdx = cur.input.indexOf('"', cur.pos + 1)
            if (endIdx < 0) null
            else {
              val seg = cur.input.substring(cur.pos + 1, endIdx)
              val p = parser.parseSegment(capLen(seg))
              if (p != null) cur.pos = endIdx + 1
              p
            }
          }
        case None =>
          val m = cur.mark
          val p = parser.parse(cur, effSep)
          if (p != null && cur.pos - m > lenCapOrMax) { cur.reset(m); null }
          else p
      }
      if (parsed == null) false
      else {
        // consume trailing separator: required for self-delimited values
        // unless at end (clean-boundary rule)
        val np = effSep.consumeAt(cur.input, cur.pos)
        if (np >= 0) cur.pos = np
        else {
          // self-delimited values tolerate space padding before a
          // non-whitespace separator ("192.168.1.2 , time" —
          // reference order.rs test_pipeline2)
          var retried = false
          if (skipsLeadingWs && !cur.atEnd &&
              (cur.peek == ' ' || cur.peek == '\t')) {
            var p = cur.pos
            while (p < cur.len && (cur.input.charAt(p) == ' ' || cur.input.charAt(p) == '\t')) p += 1
            val np2 = effSep.consumeAt(cur.input, p)
            if (np2 >= 0) { cur.pos = np2; retried = true }
          }
          if (!retried && f.fmt.isEmpty && !cur.atEnd && requiresBoundary &&
              !nextIsStructural(cur))
            return false
        }
        emit(parsed, cur, rec, effSep)
      }
    }

    private def capLen(seg: String): String =
      f.lenCap match { case Some(n) if seg.length > n => seg.substring(0, n); case _ => seg }

    /** Separator-bounded parsers stop at the separator by construction;
      * self-delimited ones must land exactly on a separator or EOL.
      * Hoisted to vals — evalOnce runs per field per line. */
    private val skipsLeadingWs: Boolean = parser match {
      case CharsP | IgnoreP | HttpAgentP => false
      case _: SymbolP => false
      case _ => true
    }

    private val requiresBoundary: Boolean = parser match {
      case CharsP | IgnoreP | HttpAgentP | KvP | KvArrP => false
      case _: SymbolP => false
      case _ => true
    }

    // precomputed pipe views + len cap (no Option/collect on the hot path)
    private val transformPipesArr: Array[FunPipe] = f.pipes.collect {
      case fp @ FunPipe("base64_decode" | "json_unescape" | "chars_replace", _) => fp
    }.toArray
    private val hasPipes: Boolean = f.pipes.nonEmpty
    private val lenCapOrMax: Int = f.lenCap.getOrElse(Int.MaxValue)
    private def nextIsStructural(cur: Cursor): Boolean = {
      val c = cur.peek
      c == '"' || c == '[' || c == '{' || c == '(' || c == '<'
    }

    private def emit(p: Parsed, cur: Cursor, rec: RecBuilder, effSep: Sep): Boolean = p match {
      case One(v) =>
        if (!hasPipes) { rec.add(autoName, v); true }
        else {
          val v2 = applyTransformPipes(v)
          rec.add(autoName, v2)
          runPipes(cur, rec, effSep)
        }
      case Named(fs) =>
        if (f.subfields.isEmpty) {
          fs.foreach { case (k, v) => rec.add(k, v) }
          if (!hasPipes) true else runPipes(cur, rec, effSep)
        } else {
          // subfield projection (kvarr/json): match by @path or wildcard
          val used = scala.collection.mutable.Set[Int]()
          var ok = true
          for (sf <- f.subfields if ok) {
            val target: Option[(String, WValue)] = sf.refPath match {
              case Some(path) if path != "*" => lookupPath(fs, path)
              case _ =>
                val want = sf.typeName.getOrElse("chars")
                val idx = fs.indices.find(i => !used.contains(i) && typeMatches(fs(i)._2, want))
                idx.foreach(used += _)
                idx.map(fs(_))
            }
            target match {
              case Some((k, v)) if sf.typeName.exists(t => t == "symbol" || t == "peek_symbol") =>
                // symbol subfield = match-time guard on the value
                // (reference some_of.rs json(symbol(..)@name) pattern)
                if (!sf.symbolContent.contains(v.sval)) ok = false
              case Some((k, v)) =>
                val outName = sf.name.orElse(sf.refPath.map(p => p.split('/').last)).getOrElse(k)
                coerce(v, sf.typeName) match {
                  case Some(cv) =>
                    // nested-group pipe on a subfield re-parses chars value
                    sf.pipes.collectFirst { case GroupPipe(g) => g } match {
                      case Some(g) =>
                        val inner = sf.fmt match {
                          case Some(ScopeFmt(b, e)) =>
                            val s0 = cv.sval
                            if (s0.startsWith(b) && s0.endsWith(e))
                              s0.substring(b.length, s0.length - e.length)
                            else s0
                          case _ => cv.sval
                        }
                        val sub = new Cursor(inner)
                        if (!new GroupEval(g, enricher).eval(sub, rec, Sep.Default)) ok = false
                      case None =>
                        rec.add(outName, cv)
                        // +geo()/+zone()/+device(): parse-time KnowDB
                        // lookup emits an extra field; a lookup miss is
                        // not a parse failure (tests/json_test/rule.wpl)
                        sf.enrich.foreach { case (kind, out) =>
                          val ev = enricher.lookup(kind, cv.sval)
                          if (ev != null) rec.add(out, WChars(ev))
                        }
                    }
                  case None => if (!sf.opt) ok = false
                }
              case None => if (!sf.opt) ok = false
            }
          }
          ok && runPipes(cur, rec, effSep)
        }
    }

    private def lookupPath(fs: Vector[(String, WValue)], path: String): Option[(String, WValue)] = {
      val segs = path.split('/').filter(_.nonEmpty)
      if (segs.isEmpty) return None
      var cur: Option[WValue] = fs.find(_._1 == segs.head).map(_._2)
      for (seg <- segs.drop(1)) {
        cur = cur.flatMap {
          case WObj(ofs) => ofs.find(_._1 == seg).map(_._2)
          case WArr(xs) if seg.startsWith("[") && seg.endsWith("]") =>
            val i = seg.drop(1).dropRight(1).toInt
            if (i < xs.length) Some(xs(i)) else None
          case _ => None
        }
      }
      cur.map(v => (segs.last, v))
    }

    private def typeMatches(v: WValue, want: String): Boolean = want match {
      case "chars" => v.isInstanceOf[WChars]
      case "digit" => v.isInstanceOf[WDigit]
      case "float" => v.isInstanceOf[WFloat] || v.isInstanceOf[WDigit]
      case "ip" => v.isInstanceOf[WIp] || (v.isInstanceOf[WChars] && IpP.validIpv4(v.sval))
      case "time" => v.isInstanceOf[WTime]
      case "bool" => v.isInstanceOf[WBool]
      case "obj" => v.isInstanceOf[WObj]
      case "array" => v.isInstanceOf[WArr]
      case _ => true
    }

    private def coerce(v: WValue, want: Option[String]): Option[WValue] = want match {
      case None | Some("auto") => Some(v)
      case Some("chars") => Some(WChars(v.sval))
      case Some("digit") => v match {
        case d: WDigit => Some(d)
        case WChars(s) => try Some(WDigit(s.toLong)) catch { case _: NumberFormatException => None }
        case WFloat(f) => Some(WDigit(f.toLong))
        case _ => None
      }
      case Some("float") => v match {
        case f: WFloat => Some(f)
        case WDigit(d) => Some(WFloat(d.toDouble))
        case WChars(s) => try Some(WFloat(s.toDouble)) catch { case _: NumberFormatException => None }
        case _ => None
      }
      case Some("ip") => v match {
        case i: WIp => Some(i)
        case WChars(s) if IpP.validIpv4(s) || IpP.validIpv6(s) => Some(WIp(s))
        case _ => None
      }
      case Some("time") => v match {
        case t: WTime => Some(t)
        case WChars(s) => TimeP.auto.parseSegment(s) match {
          case One(t: WTime) => Some(t)
          case _ => None
        }
        case _ => None
      }
      case Some("bool") => v match {
        case b: WBool => Some(b)
        case WChars("true") => Some(WBool(true))
        case WChars("false") => Some(WBool(false))
        case _ => None
      }
      case Some(_) => Some(v)
    }

    /** transform pipes applied to the value before it is recorded. */
    private def applyTransformPipes(v: WValue): WValue = {
      var out = v
      for (FunPipe(name, args) <- transformPipesArr) {
        name match {
          case "base64_decode" =>
            try out = WChars(new String(java.util.Base64.getDecoder.decode(out.sval), "UTF-8"))
            catch { case _: Exception => }
          case "json_unescape" =>
            out = WChars(out.sval.replace("\\\"", "\"").replace("\\\\", "\\")
              .replace("\\n", "\n").replace("\\t", "\t").replace("\\r", "\r"))
          case "chars_replace" if args.length == 2 =>
            out = WChars(out.sval.replace(unq(args(0)), unq(args(1))))
          case _ =>
        }
      }
      out
    }

    /** predicate / selector / nested-group pipes (after value recorded).
      * A failing predicate fails the rule match for this line
      * (match-time guards — pipe_exec.rs). */
    private def runPipes(cur: Cursor, rec: RecBuilder, effSep: Sep): Boolean = {
      for (p <- f.pipes) {
        p match {
          case GroupPipe(g) =>
            // re-parse the active field's chars value with the nested
            // group, splicing results (pipe_exec.rs:69-97)
            if (rec.active < 0) return false
            val src = rec.fields(rec.active).value.sval
            val stripped = f.fmt match {
              case Some(ScopeFmt(b, e)) if src.startsWith(b) && src.endsWith(e) =>
                src.substring(b.length, src.length - e.length)
              case _ => src
            }
            rec.fields.remove(rec.active)
            rec.active = rec.fields.length - 1
            val sub = new Cursor(stripped)
            if (!new GroupEval(g, enricher).eval(sub, rec, Sep.Default)) return false
          case FunPipe(name, args) =>
            if (!evalFun(name, args, rec)) return false
        }
      }
      true
    }

    private def unq(s: String): String =
      if (s.length >= 2 && s.startsWith("\"") && s.endsWith("\"")) s.substring(1, s.length - 1) else s

    private def evalFun(name: String, args: Vector[String], rec: RecBuilder): Boolean = {
      def active: Option[WValue] =
        if (rec.active >= 0) Some(rec.fields(rec.active).value) else None
      def fieldVal(k: String): Option[WValue] = rec.find(k).map(_.value)
      name match {
        case "take" => val i = rec.findIdx(unq(args.head)); if (i >= 0) { rec.active = i; true } else false
        case "last" => rec.active = rec.fields.length - 1; true
        case "has" => active.isDefined
        case "f_has" => fieldVal(unq(args.head)).isDefined
        case "chars_has" => active.exists(_.sval == unq(args.head))
        case "chars_not_has" => active.exists(_.sval != unq(args.head))
        case "chars_in" => active.exists(v => parseArr(args).contains(v.sval))
        case "f_chars_has" => fieldVal(unq(args(0))).exists(_.sval == unq(args(1)))
        case "f_chars_not_has" => fieldVal(unq(args(0))).exists(_.sval != unq(args(1)))
        case "f_chars_in" => fieldVal(unq(args(0))).exists(v => parseArr(args.drop(1)).contains(v.sval))
        case "digit_has" => active.exists { case WDigit(d) => d == args.head.toLong; case _ => false }
        case "digit_in" => active.exists { case WDigit(d) => parseArr(args).map(_.toLong).contains(d); case _ => false }
        case "digit_range" => active.exists { case WDigit(d) => d >= args(0).toLong && d <= args(1).toLong; case _ => false }
        case "f_digit_has" => fieldVal(unq(args(0))).exists { case WDigit(d) => d == args(1).toLong; case _ => false }
        case "f_digit_in" => fieldVal(unq(args(0))).exists { case WDigit(d) => parseArr(args.drop(1)).map(_.toLong).contains(d); case _ => false }
        case "ip_in" => active.exists(v => parseArr(args).contains(v.sval))
        case "f_ip_in" => fieldVal(unq(args(0))).exists(v => parseArr(args.drop(1)).contains(v.sval))
        case "starts_with" => active.exists(_.sval.startsWith(unq(args.head)))
        case "regex_match" => active.exists(v => unq(args.head).r.findFirstIn(v.sval).isDefined)
        case "not" =>
          // not(fun(...)) — args holds the raw inner call text
          val inner = args.head
          val op = inner.indexOf('(')
          if (op < 0) false
          else {
            val iname = inner.substring(0, op).trim
            val iargsRaw = inner.substring(op + 1, inner.lastIndexOf(')'))
            val iargs = splitArgs(iargsRaw)
            !evalFun(iname, iargs, rec)
          }
        case "base64_decode" | "json_unescape" | "chars_replace" => true // applied pre-record
        case _ => true
      }
    }

    private def splitArgs(s: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var depth = 0; val sb = new StringBuilder
      for (c <- s) c match {
        case ',' if depth == 0 => out += sb.toString.trim; sb.clear()
        case c2 =>
          if (c2 == '(' || c2 == '[') depth += 1
          if (c2 == ')' || c2 == ']') depth -= 1
          sb.append(c2)
      }
      if (sb.nonEmpty) out += sb.toString.trim
      out.result().filter(_.nonEmpty)
    }

    private def parseArr(args: Vector[String]): Vector[String] =
      args.map(a => unq(a.stripPrefix("[").stripSuffix("]").trim)).flatMap(a =>
        if (a.contains(",")) a.split(',').map(x => unq(x.trim)).toVector else Vector(unq(a)))
  }

  // -------------------------------------------------------------------
  // Group evaluation (order.rs / alt.rs / opt.rs / some_of.rs / not.rs)
  // -------------------------------------------------------------------

  final class GroupEval(g: WplGroup, enricher: Enricher = Enricher.empty) extends Serializable {
    // group-level [n] acts as the default length cap for member fields
    // (grammar: "length applies to all fields within the group")
    val fieldEvals: Vector[(WplField, FieldEval)] =
      g.fields.map(f => (f, new FieldEval(f.copy(lenCap = f.lenCap.orElse(g.len)), enricher)))

    // hot-loop views: parallel arrays, field sep pre-resolved (null =
    // inherit the group's effective sep), repeat as a primitive int
    // (-1 = single, 0 = unbounded, n = exactly n)
    private val evalsArr: Array[FieldEval] = fieldEvals.map(_._2).toArray
    private val sepsArr: Array[Sep] = fieldEvals.map(_._1.sep.orNull).toArray
    private val repeatArr: Array[Int] = fieldEvals.map(_._1.repeat.getOrElse(-1)).toArray
    private val namesArr: Array[String] = fieldEvals.map(_._1.name.orNull).toArray

    def eval(cur: Cursor, rec: RecBuilder, inherited: Sep): Boolean = {
      val effSep = g.sep.getOrElse(inherited)
      g.meta match {
        case "seq" => evalSeq(cur, rec, effSep)
        case "alt" =>
          // first success wins; on total failure keep the deepest attempt
          val m = cur.mark
          val nf = rec.fields.length
          var bestDepth = m
          var i = 0
          while (i < evalsArr.length) {
            val sep = if (sepsArr(i) ne null) sepsArr(i) else effSep
            if (evalsArr(i).evalOnce(cur, rec, sep)) return true
            if (cur.pos > bestDepth) bestDepth = cur.pos
            cur.reset(m)
            rec.fields.dropRightInPlace(rec.fields.length - nf)
            i += 1
          }
          cur.pos = bestDepth // expose deepest failure for diagnostics
          false
        case "opt" =>
          val m = cur.mark
          val nf = rec.fields.length
          if (!evalSeq(cur, rec, effSep)) {
            cur.reset(m)
            rec.fields.dropRightInPlace(rec.fields.length - nf)
          }
          true
        case "some_of" =>
          // repeatedly try all members (first-success each round) until no
          // member matches or input empty; never fails
          var matched = true
          while (matched && !cur.atEnd) {
            matched = false
            val m = cur.mark
            var i = 0
            while (!matched && i < evalsArr.length) {
              val nf = rec.fields.length
              val sep = if (sepsArr(i) ne null) sepsArr(i) else effSep
              if (evalsArr(i).evalOnce(cur, rec, sep)) matched = true
              else {
                cur.reset(m)
                rec.fields.dropRightInPlace(rec.fields.length - nf)
              }
              i += 1
            }
          }
          true
        case "not" =>
          // negative lookahead on exactly one field; success when inner
          // FAILS — keeping the failed attempt's partial consumption (!)
          val m = cur.mark
          val nf = rec.fields.length
          val sep = if (sepsArr(0) ne null) sepsArr(0) else effSep
          if (evalsArr(0).evalOnce(cur, rec, sep)) {
            cur.reset(m)
            rec.fields.dropRightInPlace(rec.fields.length - nf)
            false
          } else {
            // keep consumption (not.rs:58-70); emit the named Ignore
            // marker (reference: DataField::from_ignore(name))
            rec.fields.dropRightInPlace(rec.fields.length - nf)
            if (namesArr(0) ne null) rec.fields += WField(namesArr(0), WIgnore)
            true
          }
        case other => throw new IllegalArgumentException(s"unknown group meta $other")
      }
    }

    private def evalSeq(cur: Cursor, rec: RecBuilder, effSep: Sep): Boolean = {
      var i = 0
      while (i < evalsArr.length) {
        val fe = evalsArr(i)
        val sep = if (sepsArr(i) ne null) sepsArr(i) else effSep
        repeatArr(i) match {
          case -1 =>
            if (!fe.evalOnce(cur, rec, sep)) return false
          case 0 => // unbounded: greedy until fail
            var going = true
            while (going && !cur.atEnd) {
              val m = cur.mark
              val nf = rec.fields.length
              if (!fe.evalOnce(cur, rec, sep)) {
                cur.reset(m)
                rec.fields.dropRightInPlace(rec.fields.length - nf)
                going = false
              }
            }
          case n =>
            var j = 0
            while (j < n) {
              if (!fe.evalOnce(cur, rec, sep)) return false
              j += 1
            }
        }
        i += 1
      }
      true
    }
  }

  // -------------------------------------------------------------------
  // Rule + multi-rule routing
  // -------------------------------------------------------------------

  final class RuleEval(val rule: WplRule, enricher: Enricher = Enricher.empty) extends Serializable {
    private val groupEvals = rule.groups.map(new GroupEval(_, enricher))

    /** Whole-line preprocessing pipes (builtins/mod.rs:51-57). Names
      * are case-insensitive (registry.rs:18 uppercases), and the bare
      * legacy aliases `base64`/`hex` from the grammar doc comments
      * (parser/wpl_rule.rs:14-17) and the shipped h3c_waf fixture map
      * to the decode stages. */
    private def preprocess(line: String): String = {
      var s = line
      for (p0 <- rule.preprocs) {
        val p = p0.toLowerCase match {
          case "base64" => "decode/base64"
          case "hex" => "decode/hex"
          case other => other
        }
        p match {
          case "decode/base64" =>
            try s = new String(java.util.Base64.getDecoder.decode(s.trim), "UTF-8")
            catch { case _: Exception => }
          case "decode/hex" =>
            try {
              val t = s.trim
              val bytes = new Array[Byte](t.length / 2)
              var i = 0
              while (i < bytes.length) {
                bytes(i) = Integer.parseInt(t.substring(2 * i, 2 * i + 2), 16).toByte
                i += 1
              }
              s = new String(bytes, "UTF-8")
            } catch { case _: Exception => }
          case "unquote/unescape" =>
            // strip surrounding quotes + backslash unescape (reference
            // tests/parser_functionality.rs should_parse_json_with_
            // escaped_quotes), then URL-decode when % escapes appear
            var t = s.trim
            if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
              t = t.substring(1, t.length - 1)
            t = t.replace("\\\"", "\"").replace("\\\\", "\\")
            if (t.contains('%'))
              try t = java.net.URLDecoder.decode(t, "UTF-8") catch { case _: Exception => }
            s = t
          case "strip/bom" =>
            if (s.startsWith("﻿")) s = s.substring(1)
          case p2 if p2.startsWith("plg_pipe/") =>
            // user-registered PipeProcessor plugins (reference
            // builtins/registry.rs register_wpl_pipe!)
            PipeRegistry.get(p2.stripPrefix("plg_pipe/")).foreach(fn => s = fn(s))
          case _ =>
        }
      }
      s
    }

    /** Returns (fields, endPos, processedLine) on match, or Left(depth). */
    def eval(line: String): Either[Int, (Vector[WField], Int, String)] = {
      val processed = preprocess(line)
      val cur = new Cursor(processed)
      val rec = new RecBuilder
      var i = 0
      while (i < groupEvals.length) {
        // inter-group: groups are comma-listed segments of one express;
        // each group starts where the previous ended
        if (!groupEvals(i).eval(cur, rec, Sep.Default)) return Left(cur.pos)
        i += 1
      }
      // annotations
      for ((k, v) <- rule.tags if rec.findIdx(k) < 0) rec.add(k, WChars(v))
      rule.copyRaw.foreach(n => rec.add(n, WChars(line)))
      Right((rec.result, cur.pos, processed))
    }
  }

  /** Multi-rule router with first-full-match semantics and adaptive
    * reordering (parser.rs:26-134). One instance per partition/thread. */
  final class MultiParser(rules: Vector[WplRule], enricher: Enricher = Enricher.empty) extends Serializable {
    private val evals: Array[RuleEval] = rules.map(new RuleEval(_, enricher)).toArray
    private val order: Array[Int] = Array.tabulate(evals.length)(identity)
    private val hits: Array[Long] = new Array[Long](evals.length)
    private var sinceOptimize = 0

    def parseLine(line: String): ParseOutcome = {
      if (line == null || line.forall(_.isWhitespace)) return PBlank
      maybeReorder()
      sinceOptimize += 1
      var bestDepth = -1
      var bestRule = ""
      var oi = 0
      while (oi < order.length) {
        val ri = order(oi)
        val re = evals(ri)
        re.eval(line) match {
          case Right((fields, endPos, processed)) =>
            // Reference parser.rs:51-78: raw (untrimmed) residue; ratio over
            // the ORIGINAL payload length (pre-preprocess); hit_cnt counted
            // on any Ok, including the "not complete" fallthrough; the
            // not-complete depth is payload.len - un_parsed.len.
            val residue = processed.substring(endPos)
            hits(ri) += 1
            if (residue.isEmpty) {
              return PSuccess(re.rule.key, fields)
            } else if (residue.length.toDouble / line.length <= ResidueRatio) {
              return PPartial(re.rule.key, fields, residue)
            } else {
              val parsedLen = line.length - residue.length
              if (parsedLen > bestDepth) { bestDepth = parsedLen; bestRule = re.rule.key }
            }
          case Left(depth) =>
            if (depth > bestDepth) { bestDepth = depth; bestRule = re.rule.key }
        }
        oi += 1
      }
      PMiss(bestRule, bestDepth max 0)
    }

    private def maybeReorder(): Unit = {
      if (sinceOptimize >= OptimizeEvery) {
        sinceOptimize = 0
        // stable sort by hit count desc (original index breaks ties)
        val sorted = order.sortBy(i => (-hits(i), i))
        Array.copy(sorted, 0, order, 0, order.length)
        java.util.Arrays.fill(hits, 0L)
      }
    }
  }

  def compile(src: String, enricher: Enricher = Enricher.empty): MultiParser =
    new MultiParser(parseAny(src), enricher)

  /** Accept both package-wrapped WPL and the bare rule-conf format
    * (gen.conf / rule.wpl fixtures start with `name :`). */
  def parseAny(src: String): Vector[WplRule] = {
    val t = src.dropWhile(_.isWhitespace)
    if (t.startsWith("package") || t.startsWith("#[")) WplText.parsePackages(src)
    else WplText.parseRuleConf(src)
  }
}
