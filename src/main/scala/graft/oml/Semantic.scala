package graft.oml

import graft.wpl._

/** Semantic dictionary + CJK-aware keyword extraction for the OML pipes
  * `extract_main_word` / `extract_subject_object` (reference
  * crates/wp-oml/src/core/evaluator/transform/pipe/extract_word.rs +
  * semantic_dict_loader.rs).
  *
  * The reference wraps jieba POS tagging; this implementation replaces it
  * with a dependency-free forward-maximum-match segmenter over the
  * semantic dictionary's Chinese entries (unknown CJK runs coalesce into
  * one entity-like token, mirroring jieba's noun-default on OOV words).
  * Word-role classification mirrors classify_eng/classify_cn
  * (extract_word.rs:107-162): status > action > entity-noun whitelist >
  * English affix rules (-ing/-ed/-tion/-sion) > entity default.
  *
  * External dictionary: `SEMANTIC_DICT_CONFIG` env var points at a TOML
  * file with version/mode + stop_words/domain_words/status_words/
  * action_verbs/entity_nouns sections, merged in `add` (extend) or
  * `replace` mode (semantic_dict_loader.rs:92-128, 339-446). */
object SemanticDict {

  final case class Dict(
      stopWords: Set[String],
      domainWords: Set[String],
      statusWords: Set[String],
      actionVerbs: Set[String],
      entityNouns: Set[String],
      wordFreq: Map[String, Int] = Map.empty) {
    /** Chinese entries across all sets (incl. freq-only words),
      * longest-first, for the segmenters. */
    lazy val cjkWords: Array[String] =
      (stopWords ++ domainWords ++ statusWords ++ actionVerbs ++ entityNouns ++
        wordFreq.keySet)
        .filter(_.exists(isCjk)).toArray.sortBy(-_.length)
    lazy val cjkMaxLen: Int = if (cjkWords.isEmpty) 0 else cjkWords.head.length
    lazy val cjkSet: Set[String] = cjkWords.toSet
    /** Total corpus frequency over the CJK dictionary (words without a
      * `[word_freq]` entry count DefaultWordFreq), jieba's `total`.
      * Normalizing per-word scores by this keeps log-probabilities
      * negative so a path's score does not grow with its word count. */
    lazy val cjkTotalFreq: Double = {
      val s = cjkWords.iterator
        .map(w => wordFreq.getOrElse(w, DefaultWordFreq).toDouble).sum
      math.max(s, 1.0)
    }
  }

  @inline def isCjk(c: Char): Boolean =
    (c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF)

  /** Builtin dictionary — verbatim from semantic_dict_loader.rs
    * SemanticDict::builtin() (the word lists are reference data, kept
    * byte-identical for behavior parity). */
  val builtin: Dict = Dict(
    stopWords = Set(
      "的", "了", "在", "是", "我", "有", "和", "就", "不", "人", "都", "一", "一个",
      "上", "也", "很", "到", "说", "要", "去", "你", "会", "着", "没有", "看", "好",
      "自己", "这",
      "the", "a", "an", "is", "are", "was", "were", "be", "been", "being", "of", "at",
      "in", "to", "for", "and", "or", "but"),
    domainWords = Set(
      "error", "warn", "info", "debug", "fatal", "trace",
      "exception", "failure", "timeout", "connection", "database", "server",
      "client", "request", "response", "login", "logout", "auth",
      "authentication", "permission", "access",
      "http", "https", "tcp", "udp", "ip", "port", "socket",
      "attack", "virus", "malware", "threat", "alert", "blocked", "denied"),
    statusWords = Set(
      "failed", "failure", "success", "succeeded", "timeout", "exception",
      "crashed", "disconnected", "stopped", "completed", "pending", "refused",
      "dropped", "rejected", "expired", "closed",
      "失败", "成功", "超时", "异常", "错误", "崩溃", "断开", "拒绝", "丢失"),
    actionVerbs = Set(
      "connect", "login", "logout", "respond", "start", "stop", "fail", "run",
      "process", "send", "receive", "read", "write", "open", "close", "bind",
      "listen", "authenticate", "authorize", "create", "delete", "update",
      "upload", "download", "retry", "handle", "load", "fetch", "parse",
      "resolve", "block", "deny",
      "连接", "登录", "登出", "请求", "响应", "启动", "停止", "处理", "发送",
      "接收", "读取", "写入", "认证", "访问", "创建", "删除", "更新", "下载",
      "上传", "重试"),
    entityNouns = Set(
      "connection", "transaction", "session", "application", "configuration",
      "permission", "operation", "exception",
      "连接", "会话", "事务", "应用", "配置", "权限"))

  @volatile private var current: Dict = loadFromEnv()
  def dict: Dict = current
  /** Test hook / programmatic override. */
  def setDict(d: Dict): Unit = current = d
  def reset(): Unit = current = loadFromEnv()

  private def loadFromEnv(): Dict =
    sys.env.get("SEMANTIC_DICT_CONFIG") match {
      case Some(path) =>
        try merge(builtin, parseToml(
          new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")))
        catch {
          case e: Exception =>
            System.err.println(s"Warning: Failed to load external semantic dict config: ${e.getMessage}.")
            builtin
        }
      case None => builtin
    }

  // ---------------------------------------------------------------
  // TOML subset loader (semantic_dict_loader.rs SemanticDictConf)
  // ---------------------------------------------------------------

  final case class TomlConf(
      version: Int,
      mode: String, // add | replace
      sections: Map[String, Map[String, Vector[String]]])

  /** Minimal TOML reader for the semantic-dict schema: top-level
    * `version`/`mode`, `[section]` headers, `key = ["a", "b", ...]`
    * string arrays (multi-line allowed), `#` comments. */
  def parseToml(src: String): TomlConf = {
    var version = 0
    var mode = "add"
    val sections = scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, Vector[String]]]()
    var section: String = null
    val it = src.linesIterator.buffered
    val sb = new StringBuilder
    while (it.hasNext) {
      var line = it.next().trim
      val hash = line.indexOf('#')
      if (hash >= 0 && !line.substring(0, hash).count(_ == '"').%(2).equals(1)) line = line.substring(0, hash).trim
      if (line.nonEmpty) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
          sections.getOrElseUpdate(section, scala.collection.mutable.Map())
        } else {
          val eq = line.indexOf('=')
          if (eq < 0) throw new IllegalArgumentException(s"bad toml line: $line")
          val key = line.substring(0, eq).trim
          sb.clear(); sb.append(line.substring(eq + 1).trim)
          if (sb.startsWith("[")) {
            // gather until the closing bracket (arrays may span lines)
            while (!balanced(sb) && it.hasNext) sb.append('\n').append(it.next())
          }
          val raw = sb.toString.trim
          if (section == null) {
            key match {
              case "version" => version = raw.toInt
              case "mode" => mode = unquote(raw)
              case _ => // ignore unknown top-level keys
            }
          } else {
            sections(section) = sections.getOrElse(section,
              scala.collection.mutable.Map()) += (key -> parseArray(raw))
          }
        }
      }
    }
    if (version != 1)
      throw new IllegalArgumentException(s"Unsupported semantic_dict version: $version. Expected: 1")
    TomlConf(version, mode, sections.view.mapValues(_.toMap).toMap)
  }

  private def balanced(sb: StringBuilder): Boolean = {
    var depth = 0; var inStr = false; var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == '"' && (i == 0 || sb.charAt(i - 1) != '\\')) inStr = !inStr
      else if (!inStr) {
        if (c == '[') depth += 1
        else if (c == ']') depth -= 1
      }
      i += 1
    }
    depth == 0 && !inStr
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\"")) t.substring(1, t.length - 1) else t
  }

  private def parseArray(raw: String): Vector[String] = {
    val t = raw.trim
    if (!t.startsWith("[") || !t.endsWith("]"))
      throw new IllegalArgumentException(s"expected array: $raw")
    val out = Vector.newBuilder[String]
    var i = 1; val end = t.length - 1
    while (i < end) {
      t.charAt(i) match {
        case '"' =>
          val sb = new StringBuilder
          i += 1
          while (i < end && t.charAt(i) != '"') {
            if (t.charAt(i) == '\\' && i + 1 < end) { sb.append(t.charAt(i + 1)); i += 2 }
            else { sb.append(t.charAt(i)); i += 1 }
          }
          i += 1
          out += sb.toString
        case _ => i += 1
      }
    }
    out.result()
  }

  /** add/replace merge per section (semantic_dict_loader.rs merge()).
    * `[word_freq]` entries are `"word"` or `"word:freq"` strings — a
    * corpus-frequency table for the DP segmenter's probability model
    * (the analogue of jieba's dict.txt rows, supplied by the user since
    * no trained dictionary ships offline). */
  def merge(base: Dict, conf: TomlConf): Dict = {
    val replace = conf.mode == "replace"
    def sec(name: String): Option[Set[String]] =
      conf.sections.get(name).map(_.values.flatten.toSet)
    def m(cur: Set[String], upd: Option[Set[String]]): Set[String] = upd match {
      case None => cur
      case Some(ws) => if (replace) ws else cur ++ ws
    }
    val freqs = sec("word_freq").map(_.iterator.map { e =>
      e.lastIndexOf(':') match {
        case -1 => e -> DefaultWordFreq
        case i => e.substring(0, i) ->
          (try e.substring(i + 1).trim.toInt catch {
            case _: NumberFormatException => DefaultWordFreq
          })
      }
    }.toMap)
    Dict(
      stopWords = m(base.stopWords, sec("stop_words")),
      domainWords = m(base.domainWords, sec("domain_words")),
      statusWords = m(base.statusWords, sec("status_words")),
      actionVerbs = m(base.actionVerbs, sec("action_verbs")),
      entityNouns = m(base.entityNouns, sec("entity_nouns")),
      wordFreq = freqs match {
        case None => base.wordFreq
        case Some(f) => if (replace) f else base.wordFreq ++ f
      })
  }

  /** Frequency assumed for dictionary words without an explicit
    * `[word_freq]` entry; OOV single chars weigh 1, so any dictionary
    * word beats a path through loose characters. */
  val DefaultWordFreq: Int = 10
}

/** `extract_main_word` / `extract_subject_object` pipes with the
  * reference's classification rules (extract_word.rs). */
object ExtractWords {
  import SemanticDict.{Dict, dict, isCjk, DefaultWordFreq}

  /** Segmenter selection: "dp" (default) = jieba-style DAG
    * max-probability path over the dictionary; "fmm" = the original
    * greedy forward-maximum-match (kept as the fallback — identical
    * output whenever the text has no overlap ambiguity). Env
    * SEMANTIC_SEGMENTER or the setter below switches. */
  @volatile private var segmenterMode: String =
    sys.env.getOrElse("SEMANTIC_SEGMENTER", "dp")
  def setSegmenter(mode: String): Unit = segmenterMode = mode

  /** Mixed CJK/ASCII tokenizer: ASCII alnum runs are words; CJK runs go
    * through the configured segmenter, with OOV chars coalesced into
    * entity-like tokens (jieba's noun-default on OOV words).
    * Punctuation/whitespace separate tokens. */
  def tokenize(s: String, d: Dict = dict): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isLetterOrDigit(c) && !isCjk(c)) {
        val st = i
        while (i < n && Character.isLetterOrDigit(s.charAt(i)) && !isCjk(s.charAt(i))) i += 1
        out += s.substring(st, i)
      } else if (isCjk(c)) {
        val runStart = i
        var runEnd = i
        while (runEnd < n && isCjk(s.charAt(runEnd))) runEnd += 1
        val run = s.substring(runStart, runEnd)
        if (segmenterMode == "fmm") segmentFmm(run, d, out)
        else out ++= segmentDp(run, d)
        i = runEnd
      } else i += 1
    }
    out.result()
  }

  /** Greedy forward-maximum-match (the original segmenter, kept as
    * fallback): longest dictionary hit at each position, OOV chars
    * coalesced. */
  private def segmentFmm(run: String, d: Dict,
                         out: scala.collection.mutable.Builder[String, Vector[String]]): Unit = {
    var p = 0
    var oovStart = -1
    val m = run.length
    while (p < m) {
      var matched: String = null
      var len = math.min(d.cjkMaxLen, m - p)
      while (matched == null && len >= 1) {
        val cand = run.substring(p, p + len)
        if (d.cjkSet.contains(cand)) matched = cand
        len -= 1
      }
      if (matched != null) {
        if (oovStart >= 0) { out += run.substring(oovStart, p); oovStart = -1 }
        out += matched
        p += matched.length
      } else {
        if (oovStart < 0) oovStart = p
        p += 1
      }
    }
    if (oovStart >= 0) out += run.substring(oovStart, m)
  }

  /** jieba-style segmentation of one CJK run: build the word DAG over
    * the dictionary (plus single-char fallback arcs) and take the
    * max-log-probability path, right-to-left DP exactly like jieba's
    * `calc` routine. Word log-probability = log(freq) − log(totalFreq)
    * (freq from the dict's `[word_freq]` table, DefaultWordFreq when
    * absent; totalFreq = sum over the CJK dictionary) — NEGATIVE per
    * word, exactly jieba's normalization, so a compound word in the
    * dict outscores the same span split into shorter dictionary words
    * (北京大学 beats 北京|大学 at equal freqs) and path score does not
    * grow with word count. An OOV char scores below any single
    * dictionary word, so dictionary paths beat loose characters and
    * frequencies resolve overlap ambiguity (研究生|命 loses to
    * 研究|生命 when 生命 is in the dict). Ties break toward the longer
    * first word (FMM-compatible). Adjacent OOV chars then coalesce into
    * one entity-like token, preserving the noun-default behavior. */
  private def segmentDp(run: String, d: Dict): Vector[String] = {
    val m = run.length
    if (m == 0) return Vector.empty
    val logp = new Array[Double](m + 1)
    val nxt = new Array[Int](m + 1)
    val logTotal = math.log(d.cjkTotalFreq)
    // Below log(1) − logTotal, the lowest possible dictionary-word score.
    val oovChar = math.log(1.0) - math.log(4.0) - logTotal
    var i = m - 1
    while (i >= 0) {
      var bestLp = Double.NegativeInfinity
      var bestLen = 1
      var len = math.min(d.cjkMaxLen max 1, m - i)
      while (len >= 1) {
        val cand = run.substring(i, i + len)
        val lpWord =
          if (d.cjkSet.contains(cand))
            math.log(d.wordFreq.getOrElse(cand, DefaultWordFreq).toDouble) - logTotal
          else if (len == 1) oovChar
          else Double.NegativeInfinity
        if (lpWord != Double.NegativeInfinity) {
          val lp = lpWord + logp(i + len)
          // strict > with len descending ⇒ ties prefer the longer word
          if (lp > bestLp) { bestLp = lp; bestLen = len }
        }
        len -= 1
      }
      logp(i) = bestLp
      nxt(i) = i + bestLen
      i -= 1
    }
    // walk the route, coalescing adjacent OOV tokens
    val out = Vector.newBuilder[String]
    var p = 0
    var oovStart = -1
    while (p < m) {
      val q = nxt(p)
      val w = run.substring(p, q)
      if (d.cjkSet.contains(w)) {
        if (oovStart >= 0) { out += run.substring(oovStart, p); oovStart = -1 }
        out += w
      } else if (oovStart < 0) oovStart = p
      p = q
    }
    if (oovStart >= 0) out += run.substring(oovStart, m)
    out.result()
  }

  private object Role extends Enumeration { val Entity, Action, Status, Skip = Value }

  /** classify_eng (extract_word.rs:107-140). */
  private def classifyEng(lower: String, d: Dict): Role.Value = {
    if (d.statusWords.contains(lower)) return Role.Status
    if (d.actionVerbs.contains(lower)) return Role.Action
    if (d.entityNouns.contains(lower)) return Role.Entity
    if (lower.endsWith("ing") && lower.length > 4) return Role.Action
    if (lower.endsWith("ed") && lower.length > 3) return Role.Action
    if ((lower.endsWith("tion") || lower.endsWith("sion")) && lower.length > 5) return Role.Action
    Role.Entity
  }

  /** classify_cn analogue: dict membership replaces the jieba POS tags;
    * OOV CJK tokens default to Entity (jieba tags most OOV runs as
    * nouns). */
  private def classifyCjk(word: String, d: Dict): Role.Value = {
    val lower = word.toLowerCase
    if (d.statusWords.contains(lower)) Role.Status
    else if (d.actionVerbs.contains(lower)) Role.Action
    else Role.Entity
  }

  /** First domain word, else first core (non-stop) token, else ""
    * (extract_word.rs ExtractMainWord). */
  def mainWord(s: String): String = {
    val d = dict
    val ts = tokenize(s.trim, d)
    var i = 0
    while (i < ts.length) {
      val w = ts(i)
      val lower = w.toLowerCase
      if (d.domainWords.contains(lower)) return w
      if (!d.stopWords.contains(lower)) return w
      i += 1
    }
    ""
  }

  /** Subject/action/object/status assignment
    * (extract_word.rs analyze_subject_object_with_debug). */
  def subjectObject(s: String): WObj = {
    val d = dict
    val ts = tokenize(s.trim, d)
    var subject = ""; var action = ""; var obj = ""; var status = ""
    var actionSeen = false
    var i = 0
    while (i < ts.length) {
      val w = ts(i)
      val lower = w.toLowerCase
      if (!d.stopWords.contains(lower)) {
        val role =
          if (w.exists(isCjk)) classifyCjk(w, d)
          else classifyEng(lower, d)
        role match {
          case Role.Status => if (status.isEmpty) status = w
          case Role.Action => if (action.isEmpty) { action = w; actionSeen = true }
          case Role.Entity =>
            if (subject.isEmpty) subject = w
            else if (actionSeen && obj.isEmpty) obj = w
          case _ =>
        }
      }
      i += 1
    }
    WObj(Vector("subject" -> WChars(subject), "action" -> WChars(action),
      "object" -> WChars(obj), "status" -> WChars(status)))
  }
}
