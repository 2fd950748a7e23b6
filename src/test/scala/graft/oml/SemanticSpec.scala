package graft.oml

import org.scalatest.funsuite.AnyFunSuite
import graft.wpl._

/** Golden tests for extract_main_word / extract_subject_object with CJK
  * segmentation + the semantic dictionary — sentences and expectations
  * from the reference's inline tests
  * (crates/wp-oml/.../pipe/extract_word.rs test_extract_main_word,
  * test_extract_main_word_english, test_extract_subject_object) and the
  * TOML loader contract (semantic_dict_loader.rs:92-128, 339-446). */
class SemanticSpec extends AnyFunSuite {

  private def so(s: String): Map[String, String] =
    ExtractWords.subjectObject(s).fields.toMap.view.mapValues(_.sval).toMap

  test("extract_main_word: reference english expectations") {
    assert(ExtractWords.mainWord("hello world test") == "hello") // X1
    assert(ExtractWords.mainWord("  single  ") == "single")      // X2
    assert(ExtractWords.mainWord("") == "")                      // X3
    assert(ExtractWords.mainWord("The server is running") == "server") // R2 exact
    // Z1/Z2: must be one of the domain words on the line
    assert(Set("error", "connection", "timeout")(
      ExtractWords.mainWord("error: connection timeout")))
    assert(Set("database", "connection", "failed")(
      ExtractWords.mainWord("database connection failed")))
    // only stopwords → empty
    assert(ExtractWords.mainWord("the a an is") == "")           // E9
  }

  test("extract_main_word: chinese sentences segment and extract") {
    // reference asserts non-empty for the CJK cases
    assert(ExtractWords.mainWord("我们中出了一个叛徒").nonEmpty)   // B1
    assert(ExtractWords.mainWord("中文分词测试").nonEmpty)         // B2
    assert(ExtractWords.mainWord("今天天气很好").nonEmpty)         // B3
    assert(ExtractWords.mainWord("用户登录失败异常").nonEmpty)     // C3
    assert(ExtractWords.mainWord("HTTP请求超时").nonEmpty)        // D1
    // 全停用词 (D2): every token is a stopword once segmented…
    // our FMM coalesces 的是在了不 into dict stopword hits
    assert(ExtractWords.mainWord("的是在了不") == "")
  }

  test("extract_subject_object: reference english expectations (exact)") {
    // M1
    val m1 = so("database connection failed")
    assert(m1("subject") == "database" && m1("status") == "failed")
    // M2
    val m2 = so("User authentication failed")
    assert(m2("subject") == "User" && m2("status") == "failed")
    // M3
    val m3 = so("Failed to connect database")
    assert(m3("subject") == "database" && m3("action") == "connect" && m3("status") == "Failed")
    // M4
    val m4 = so("Server failed to connect database")
    assert(m4("subject") == "Server" && m4("action") == "connect" &&
      m4("object") == "database" && m4("status") == "failed")
    // M5
    val m5 = so("Request processing timeout")
    assert(m5("subject") == "Request" && m5("action") == "processing" && m5("status") == "timeout")
  }

  test("extract_subject_object: chinese sentences (reference M6-M9)") {
    // M6 数据库连接失败 → FMM: 数据库(OOV entity) 连接(action) 失败(status)
    val m6 = so("数据库连接失败")
    assert(m6("subject") == "数据库" && m6("action") == "连接" && m6("status") == "失败")
    // M7 用户登录失败
    val m7 = so("用户登录失败")
    assert(m7("subject") == "用户" && m7("action") == "登录" && m7("status") == "失败")
    // M8 服务器连接数据库超时 → object after action
    val m8 = so("服务器连接数据库超时")
    assert(m8("subject") == "服务器" && m8("action") == "连接" &&
      m8("object") == "数据库" && m8("status") == "超时")
    // M9 HTTP请求超时 (mixed)
    val m9 = so("HTTP请求超时")
    assert(m9("subject") == "HTTP" && m9("action") == "请求" && m9("status") == "超时")
  }

  test("DP segmenter: overlap ambiguity resolves by word probability, FMM stays greedy") {
    // classic overlap case: greedy FMM takes the longest first word
    // (研究生) and strands 命 as a loose char; the DAG max-probability
    // path prefers the all-dictionary route 研究|生命|科学
    val d = SemanticDict.builtin.copy(entityNouns =
      SemanticDict.builtin.entityNouns ++ Set("研究生", "研究", "生命", "科学"))
    assert(ExtractWords.tokenize("研究生命科学", d) == Vector("研究", "生命", "科学"))
    ExtractWords.setSegmenter("fmm")
    try assert(ExtractWords.tokenize("研究生命科学", d) == Vector("研究生", "命", "科学"))
    finally ExtractWords.setSegmenter("dp")
    // word_freq can overrule: a dominant 研究生 wins even against two
    // dictionary words (jieba dict.txt analogue)
    val d2 = d.copy(wordFreq = Map("研究生" -> 100000, "科学" -> 10))
    assert(ExtractWords.tokenize("研究生命科学", d2).head == "研究生")
  }

  test("DP segmenter: normalized scores keep compounds whole (jieba calc parity)") {
    // 北京, 大学, 北京大学 all in the dict at the DEFAULT freq: with
    // jieba's log(freq)−log(total) normalization each word costs ~−log N,
    // so the 1-word path 北京大学 outscores the 2-word split 北京|大学.
    // (Unnormalized log(freq) is positive and would make MORE words win.)
    val d = SemanticDict.builtin.copy(entityNouns =
      SemanticDict.builtin.entityNouns ++ Set("北京", "大学", "北京大学"))
    assert(ExtractWords.tokenize("北京大学", d) == Vector("北京大学"))
    assert(ExtractWords.tokenize("去北京大学读书", d).contains("北京大学"))
    // same via [word_freq]-only entries (the ADVICE trigger path)
    val d2 = SemanticDict.builtin.copy(
      wordFreq = Map("北京" -> 10, "大学" -> 10, "北京大学" -> 10))
    assert(ExtractWords.tokenize("北京大学", d2) == Vector("北京大学"))
    // a genuinely dominant split still wins on frequency, as in jieba
    val d3 = d.copy(wordFreq = Map("北京" -> 2000000, "大学" -> 2000000, "北京大学" -> 1))
    assert(ExtractWords.tokenize("北京大学", d3) == Vector("北京", "大学"))
  }

  test("OOV CJK goldens: unknown runs coalesce to entities, dict words still cut") {
    val d = SemanticDict.builtin
    // 数据库/防火墙 are OOV → one entity token each, dict words segmented out
    assert(ExtractWords.tokenize("数据库连接失败", d) == Vector("数据库", "连接", "失败"))
    assert(ExtractWords.tokenize("防火墙启动成功", d) == Vector("防火墙", "启动", "成功"))
    // fully-OOV run stays one token (noun default), mixed ASCII unaffected
    assert(ExtractWords.tokenize("计算机网络", d) == Vector("计算机网络"))
    assert(ExtractWords.tokenize("HTTP请求超时", d) == Vector("HTTP", "请求", "超时"))
    // subject/object assignment over an OOV subject and object
    val m = so("防火墙拒绝访问数据包")
    assert(m("subject") == "防火墙" && m("status") == "拒绝")
    // [word_freq] section parses word:freq rows into the dict
    val conf = SemanticDict.parseToml(
      """version = 1
        |mode = "add"
        |[word_freq]
        |words = ["生命:500", "研究"]
        |""".stripMargin)
    val merged = SemanticDict.merge(SemanticDict.builtin, conf)
    assert(merged.wordFreq("生命") == 500)
    assert(merged.wordFreq("研究") == SemanticDict.DefaultWordFreq)
    assert(merged.cjkSet.contains("生命"))
  }

  test("semantic dict TOML: add mode extends, replace mode replaces") {
    val addConf = SemanticDict.parseToml(
      """version = 1
        |mode = "add"
        |[status_words]
        |english = ["borked"]
        |chinese = ["完蛋"]
        |[domain_words]
        |storage = ["ceph", "s3bucket"]
        |""".stripMargin)
    val added = SemanticDict.merge(SemanticDict.builtin, addConf)
    assert(added.statusWords.contains("borked") && added.statusWords.contains("failed"))
    assert(added.domainWords.contains("ceph") && added.domainWords.contains("error"))

    val repConf = SemanticDict.parseToml(
      """version = 1
        |mode = "replace"
        |[status_words]
        |english = ["borked"]
        |""".stripMargin)
    val replaced = SemanticDict.merge(SemanticDict.builtin, repConf)
    assert(replaced.statusWords == Set("borked"))
    assert(replaced.domainWords.contains("error")) // untouched section kept
  }

  test("semantic dict TOML: version gate and env-loaded dict drive the pipes") {
    intercept[IllegalArgumentException] {
      SemanticDict.parseToml("version = 2\n")
    }
    // programmatic dict swap changes classification (the env path uses
    // the same merge; SEMANTIC_DICT_CONFIG is read at class init)
    val d = SemanticDict.merge(SemanticDict.builtin, SemanticDict.parseToml(
      """version = 1
        |mode = "add"
        |[status_words]
        |english = ["kaput"]
        |""".stripMargin))
    SemanticDict.setDict(d)
    try {
      val m = so("server went kaput")
      assert(m("status") == "kaput")
    } finally SemanticDict.reset()
  }

  test("extract pipes work end-to-end through an OML model") {
    val oml =
      """name : kw
        ---
        main = read(msg) | extract_main_word ;
        sao = read(msg) | extract_subject_object ;
      """
    val model = OmlText.parse(oml)
    val out = new OmlEval(model).transform(Vector(
      WField("msg", WChars("服务器连接数据库超时")))).get
    val m = out.map(f => f.name -> f.value).toMap
    assert(m("main").sval == "服务器")
    val sao = m("sao").asInstanceOf[WObj].fields.toMap
    assert(sao("subject") == WChars("服务器") && sao("object") == WChars("数据库"))
  }

  test("semantic switch off: extract pipes return empty (reference default)") {
    // reference extract_word.rs:311-312,370-371 — with the engine-level
    // [semantic].enabled switch off, main word is "" and the s/a/o obj
    // is empty, rather than skipping the pipe
    val oml =
      """name : kw
        ---
        main = read(msg) | extract_main_word ;
        sao = read(msg) | extract_subject_object ;
      """
    val model = OmlText.parse(oml)
    val out = new OmlEval(model, semanticEnabled = false).transform(Vector(
      WField("msg", WChars("服务器连接数据库超时")))).get
    val m = out.map(f => f.name -> f.value).toMap
    assert(m("main") == WChars(""))
    assert(m("sao") == WObj(Vector.empty))
  }
}
