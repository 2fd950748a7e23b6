package graft.oml

import org.scalatest.funsuite.AnyFunSuite
import graft.wpl._

/** OML evaluator tests, anchored on the reference's benchmark.oml
  * (tests/instance/oml/benchmark.oml) applied to a record parsed by the
  * reference's benchmark WPL rule — the same pairing the reference uses. */
class OmlSpec extends AnyFunSuite {

  private def parseBench: Vector[WField] = {
    val wpl =
      """package /benchmark {
        rule benchmark_1 {
          (digit:id,digit:len,time,sn,chars:dev_name,time,kv,sn,chars:dev_name,time,time,ip,kv,chars,kv,kv,chars,kv,kv,chars,chars,ip,chars,http/request<[,]>,http/agent")\,
        }
      }"""
    val line =
      """1407,509,2021-4-20 18:10:19,WCY7-ZT-QEAK-N6PD,ByHJpEtscumFff6FNLLjoFwMsOjVRWHMxxFT56NxfmktY1ASgo,2022-4-4 21:0:13,Tv7=9WxLPktFSMRBH4WRUCiBkmh2swZLod,DQGB-NL-RY2X-0SFD,cqIZXVT8FtAYrrlKI7q2CKL0D69Cg5jgbtnzzaJnUcUusZBIF5,2020-11-8 10:58:21,2022-4-13 14:27:12,111.237.105.120,TeG=ro1WpYpimAoG0n182NqwpkRvX2Xfod,q9gZeTkIxlCoGrAEUNqHhG17CT4OKebKXC0Ze5iXiyi2JYYnwc,hnB=FEdOhmFkM6SxBwiy3ATZePyBJBK5TT,YUC=X9JVE4p4WCNRwNjIdJ8mwnjLzs9fTY,Cmvp92V96paAHM8L60NzWl93AUHSR3WdxriwHmUDDxVohd8NcI,gtd=5srrDgB8YZMipedJ60jpl99HQg2SZR,8Ju=I1C1RzlgmX3IlS9Vp2hLsQWiudvZqz,uVAx1yArjlE1suY3887oCA44dWbm2MNZykeAqCwiq2KJbZlais,3ERd33ADEIKXISZLYWJx8juR455t753fybdcypXE2akn4KqITx,83.213.168.46,tzZ6oyqEA9ffm1e1Pi96344C6HVlw9zti4LWhBd0z9gStkFDuw,[GET /index  HTTP/1.1 ],"Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/70.0.3538.77 Safari/537.36""""
    Runtime.compile(wpl).parseLine(line) match {
      case PSuccess(_, fs) => fs
      case o => fail(s"parse failed: $o")
    }
  }

  // reference tests/instance/oml/benchmark.oml (verbatim feature set)
  private val benchOml =
    """name : benchmark
      rule : /benchmark/*
      ---
      occur_time : time = take(option:[time]) ;
      sn : chars = take();
      dev_name : chars = take(option: [dev-name]);
      sip        : ip  = take(option: [ip]) ;
      from_zone  : chars = chars(work_zone) ;
      from_ip    :  ip =  ip(127.0.0.1) ;
      requ_uri   : chars = take(option: [chars]) ;
      requ_status : digit = take()  { _ : digit(404) } ;
      resp_len    : digit   =  take() { _ : digit(2048) } ;
      src_city    : chars   =  take() { _ : chars(changsha) } ;
      *  = take() ;
    """

  test("benchmark.oml: take/option/defaults/splat semantics") {
    val model = OmlText.parse(benchOml)
    assert(model.name == "benchmark")
    assert(model.matchesRule("/benchmark/benchmark_1"))
    assert(!model.matchesRule("/other/x"))
    val out = new OmlEval(model).transform(parseBench).get
    // first-occurrence lookup (splat may re-introduce duplicate names)
    val m = out.foldLeft(Map.empty[String, graft.wpl.WValue]) {
      case (acc, f) => if (acc.contains(f.name)) acc else acc + (f.name -> f.value)
    }
    // occur_time = first `time` field (consumed)
    assert(m("occur_time").isInstanceOf[WTime])
    assert(m("sn") == WChars("WCY7-ZT-QEAK-N6PD"))
    assert(m("dev_name").sval.startsWith("ByHJ"))
    assert(m("sip") == WIp("111.237.105.120"))
    assert(m("from_zone") == WChars("work_zone"))
    assert(m("from_ip") == WIp("127.0.0.1"))
    // requ_status: no unconsumed digit left (id/len consumed? no — they
    // are named id/len, not "requ_status") → default 404
    assert(m("requ_status") == WDigit(404))
    assert(m("resp_len") == WDigit(2048))
    assert(m("src_city") == WChars("changsha"))
    // splat: remaining fields (kv pairs etc.) present
    assert(out.exists(_.name == "Tv7"))
    assert(out.exists(_.name == "id")) // unconsumed digit:id splatted
    // only the first sn was consumed; the second survives into the splat
    assert(out.count(_.name == "sn") == 2)
    assert(out.find(_.name == "sn").get.value == WChars("WCY7-ZT-QEAK-N6PD"))
  }

  test("match single-source with ranges and OR") {
    val oml =
      """name : m
        ---
        level = match read(status) {
          in (digit(200), digit(299)) => chars(success) ;
          digit(301) | digit(302) => chars(redirect) ;
          !digit(404) => chars(other) ;
          _ => chars(notfound) ;
        } ;
      """
    val model = OmlText.parse(oml)
    def run(status: Long) =
      new OmlEval(model).transform(Vector(WField("status", WDigit(status)))).get.head.value
    assert(run(204) == WChars("success"))
    assert(run(302) == WChars("redirect"))
    assert(run(500) == WChars("other"))
    assert(run(404) == WChars("notfound"))
  }

  test("match functions: regex/is_empty/iequals/gt/lt/eq/in_range (match_functions.md)") {
    val oml =
      """name : mf
        ---
        lvl = match read(log) {
          starts_with('[ERROR]') => chars(error) ;
          regex_match('warn|WARN') => chars(warning) ;
          is_empty() => chars(blank) ;
          iequals('Shutdown Complete') => chars(bye) ;
          _ => chars(other) ;
        } ;
        band = match read(code) {
          in_range(200, 299) => chars(ok) ;
          eq(404) => chars(notfound) ;
          gt(499) => chars(server) ;
          lt(200) => chars(info) ;
          _ => chars(redirect) ;
        } ;
      """
    val model = OmlText.parse(oml)
    def run(log: String, code: Long): Map[String, String] =
      new OmlEval(model).transform(Vector(
        WField("log", WChars(log)), WField("code", WDigit(code)))).get
        .map(f => f.name -> f.value.sval).toMap
    assert(run("[ERROR] kaput", 204)("lvl") == "error")
    assert(run("level=WARN disk", 204)("lvl") == "warning")
    assert(run("", 204)("lvl") == "blank")
    assert(run("shutdown complete", 204)("lvl") == "bye")
    assert(run("fine", 204)("lvl") == "other")
    assert(run("x", 204)("band") == "ok")
    assert(run("x", 404)("band") == "notfound")
    assert(run("x", 503)("band") == "server")
    assert(run("x", 101)("band") == "info")
    assert(run("x", 302)("band") == "redirect")
    // string functions match ONLY chars values (reference: non-string → false)
    val m2 = OmlText.parse(
      """name : t
        ---
        r = match read(n) { starts_with('1') => chars(yes) ; _ => chars(no) ; } ;
      """)
    val r = new OmlEval(m2).transform(Vector(WField("n", WDigit(123L)))).get.head
    assert(r.value.sval == "no")
  }

  test("temp fields: __ dst fields feed later reads but drop from output") {
    val oml =
      """name : tmp
        ---
        __raw = take(option:[host]) ;
        site = read(__raw) | starts_with('web') ;
        also = fmt("{}!", @__raw) ;
      """
    val model = OmlText.parse(oml)
    val out = new OmlEval(model)
      .transform(Vector(WField("host", WChars("web01")))).get
    assert(out.map(_.name) == Vector("site", "also"))
    assert(out.find(_.name == "also").get.value.sval == "web01!")
  }

  test("match multi-source tuples") {
    val oml =
      """name : mm
        ---
        zone = match (read(a), read(b)) {
          (chars(x), chars(y)) => chars(both) ;
          (chars(x), !chars(y)) => chars(first) ;
          _ => chars(none) ;
        } ;
      """
    val model = OmlText.parse(oml)
    def run(a: String, b: String) =
      new OmlEval(model).transform(Vector(WField("a", WChars(a)), WField("b", WChars(b)))).get.head.value
    assert(run("x", "y") == WChars("both"))
    assert(run("x", "z") == WChars("first"))
    assert(run("q", "y") == WChars("none"))
  }

  test("base64_decode encodings: Imap escape + charset table (reference pipe test)") {
    // verbatim input/expected from the reference's own pipe test
    // (crates/wp-oml/.../pipe/base64.rs test_pipe_base64, field B2/Y)
    val b2 = "UE9TVCAvYWNjb3VudCBIVFRQLzEuMQ0KSG9zdDogZnRwLXh0by5lbmVyZ3ltb3N0LmNvbTo2MTIyMg0KVXNlci1BZ2VudDogTW96aWxsYS81LjAgKE1hY2ludG9zaDsgSW50ZWwgTWFjIE9TIFggMTBfMTVfNykgQXBwbGVXZWJLaXQvNTM3LjM2IChLSFRNTCwgbGlrZSBHZWNrbykgQ2hyb21lLzEwMS4wLjAuMCBTYWZhcmkvNTM3LjM2DQpDb250ZW50LUxlbmd0aDogMTE0DQpDb25uZWN0aW9uOiBjbG9zZQ0KQ29udGVudC1UeXBlOiBhcHBsaWNhdGlvbi94LXd3dy1mb3JtLXVybGVuY29kZWQNCkFjY2VwdC1FbmNvZGluZzogZ3ppcA0KDQo="
    val oml =
      """name : enc
        ---
        x = take(option:[a1]) | base64_encode | base64_decode() ;
        y = take(option:[b2]) | base64_decode(Imap) ;
        g = take(option:[g1]) | base64_decode(Gbk) ;
        w = take(option:[w1]) | base64_decode(Windows1252) ;
        bad = take(option:[nb]) | base64_decode() ;
      """
    val model = OmlText.parse(oml)
    // GBK bytes for 中文 (reference decodes Gbk via GB18030 superset)
    val gbk = java.util.Base64.getEncoder.encodeToString(
      "中文".getBytes(java.nio.charset.Charset.forName("GBK")))
    // 0xE9 in windows-1252 = é
    val w1252 = java.util.Base64.getEncoder.encodeToString(Array(0xE9.toByte))
    val src = Vector(
      WField("a1", WChars("hello1")), WField("b2", WChars(b2)),
      WField("g1", WChars(gbk)), WField("w1", WChars(w1252)),
      WField("nb", WChars("%%%not-base64%%%")))
    val out = new OmlEval(model).transform(src).get
    def f(n: String) = out.find(_.name == n).get.value.sval
    assert(f("x") == "hello1")
    val y = f("y")
    assert(y.startsWith("POST /account HTTP/1.1\\r\\nHost: ftp-xto.energymost.com:61222"))
    assert(y.endsWith("Accept-Encoding: gzip\\r\\n\\r\\n"))
    assert(!y.contains("\r")) // real CR/LF got escaped, not emitted
    assert(f("g") == "中文")
    assert(f("w") == "é")
    assert(f("bad") == "") // failed decode → empty field, not dropped
  }

  test("fmt, pipes, object, collect") {
    val oml =
      """name : p
        ---
        msg = fmt("{}-{}", @host, read(port)) ;
        enc = read(host) | base64_encode ;
        ts  = read(when) | Time::to_ts_zone(0, s) ;
        info : obj = object {
          h : chars = read(host) ;
          p : digit = read(port) ;
        } ;
        ports : array = collect read(keys:[port, port2]) ;
        nocase = read(host) | starts_with('web') ;
      """
    val model = OmlText.parse(oml)
    val src = Vector(
      WField("host", WChars("web01")), WField("port", WDigit(8080)),
      WField("port2", WDigit(9090)),
      WField("when", WTime(1684134553000000L, "2023-05-15 07:09:13")))
    val out = new OmlEval(model).transform(src).get
    val m = out.map(f => f.name -> f.value).toMap
    assert(m("msg") == WChars("web01-8080"))
    assert(m("enc") == WChars(java.util.Base64.getEncoder.encodeToString("web01".getBytes)))
    assert(m("ts") == WDigit(1684134553L))
    assert(m("info") == WObj(Vector("h" -> WChars("web01"), "p" -> WDigit(8080))))
    assert(m("ports") == WArr(Vector(WDigit(8080), WDigit(9090))))
    assert(m("nocase") == WBool(true))
  }

  test("Time::to_ts default zone is UTC+8") {
    val oml = "name : t\n---\nts = read(when) | Time::to_ts ;"
    val model = OmlText.parse(oml)
    val naive = WTime(1684134553000000L, "x") // naive micros
    val out = new OmlEval(model).transform(Vector(WField("when", naive))).get
    assert(out.head.value == WDigit(1684134553L - 8 * 3600))
  }

  test("Now::time/date/hour with an injected clock") {
    val oml = "name : n\n---\nt = Now::time() ;\nd = Now::date() ;\nh = Now::hour() ;"
    val model = OmlText.parse(oml.replace("\\n", "\n"))
    // 2023-05-15T07:09:13Z
    val fixed = 1684134553000000L
    val out = new OmlEval(model, KnowDb.empty, () => fixed)
      .transform(Vector(WField("x", WDigit(1)))).get
    val m = out.map(f => f.name -> f.value).toMap
    assert(m("t") == WTime(fixed, "2023-05-15T07:09:13"))
    assert(m("d") == WChars("20230515"))
    assert(m("h") == WChars("2023051507"))
  }

  test("SQL lookup: equality via hash probe + multi-target bind") {
    val db = new KnowDb(Map(
      KnowDb.fromCsv("users", "id,name,email\n7,alice,a@x.com\n9,bob,b@x.com")))
    val oml =
      """name : s
        ---
        name, email = select name, email from users where id = read(user_id) ;
      """
    val model = OmlText.parse(oml)
    val out = new OmlEval(model, db).transform(Vector(WField("user_id", WDigit(7)))).get
    assert(out == Vector(WField("name", WChars("alice")), WField("email", WChars("a@x.com"))))
  }

  test("SQL lookup: ip range with ip4_int") {
    val db = new KnowDb(Map(KnowDb.fromCsv("ip_geo",
      "ip_start_int,ip_end_int,zone\n167772160,184549375,cn-north\n3232235520,3232301055,lan")))
    val oml =
      """name : g
        ---
        zone = select zone from ip_geo
          where ip_start_int <= ip4_int(read(src_ip)) and ip_end_int >= ip4_int(read(src_ip)) ;
      """
    val model = OmlText.parse(oml)
    def run(ip: String) =
      new OmlEval(model, db).transform(Vector(WField("src_ip", WIp(ip)))).map(_.head.value)
    assert(run("10.1.2.3") == Some(WChars("cn-north")))
    assert(run("192.168.5.1") == Some(WChars("lan")))
    assert(run("8.8.8.8") == None) // no dst fields → transform failure
  }

  test("static block constants") {
    val oml =
      """name : st
        ---
        static {
          origin = chars(edge-7) ;
        }
        src = read(origin) ;
        val = read(v) ;
      """
    val model = OmlText.parse(oml)
    val out = new OmlEval(model).transform(Vector(WField("v", WDigit(5)))).get
    assert(out.head == WField("src", WChars("edge-7")))
  }

  test("extract_main_word and extract_subject_object") {
    assert(ExtractWords.mainWord("user login failed") == "user")
    val so = ExtractWords.subjectObject("admin delete database failed")
    val m = so.fields.toMap
    assert(m("subject") == WChars("admin"))
    assert(m("action") == WChars("delete"))
    assert(m("object") == WChars("database"))
    assert(m("status") == WChars("failed"))
  }

  test("privacy section masks declared fields") {
    val oml =
      """name : pv
        ---
        src_ip = read(ip) ;
        phone = read(m) ;
        mail = read(e) ;
        ---
        src_ip : privacy_ip
        phone : privacy_mobile
        mail : privacy_mail
      """
    val model = OmlText.parse(oml)
    val out = new OmlEval(model).transformMasked(Vector(
      WField("ip", WIp("10.1.2.3")), WField("m", WChars("13912345678")),
      WField("e", WChars("alice@x.com")))).get
    val m = out.map(f => f.name -> f.value.sval).toMap
    assert(m("src_ip") == "10.1.2.0")
    assert(m("phone") == "139****5678")
    assert(m("mail") == "a***@x.com")
  }

  test("plg_pipe registry preproc") {
    graft.wpl.PipeRegistry.register("upper", (s: String) => s.toUpperCase)
    val mp = graft.wpl.Runtime.compile(
      "package /p { rule r { |plg_pipe/upper| (chars:x) } }")
    mp.parseLine("hello") match {
      case PSuccess(_, fs) => assert(fs == Vector(WField("x", WChars("HELLO"))))
      case o => fail(o.toString)
    }
    // parenthesized alias (wpl_rule.rs take_plg_pipe_step), alone and
    // chained with a builtin step
    val mp2 = graft.wpl.Runtime.compile(
      "package /p { rule r { |plg_pipe(upper)| (chars:x) } }")
    mp2.parseLine("abc") match {
      case PSuccess(_, fs) => assert(fs == Vector(WField("x", WChars("ABC"))))
      case o => fail(o.toString)
    }
    val mp3 = graft.wpl.Runtime.compile(
      "package /p { rule r { |decode/base64| plg_pipe(upper) | (chars:x) } }")
    val b64 = java.util.Base64.getEncoder.encodeToString("hey".getBytes)
    mp3.parseLine(b64) match {
      case PSuccess(_, fs) => assert(fs == Vector(WField("x", WChars("HEY"))))
      case o => fail(o.toString)
    }
  }

  test("sxf_get extracts fields from semi-structured text") {
    val oml =
      """name : sx
        ---
        status = read(log) | sxf_get(statusCode) ;
        user = read(log) | sxf_get(username) ;
        city = read(log) | sxf_get(city) ;
      """
    val model = OmlText.parse(oml)
    val line = """ts=1 statusCode=404 username="john doe" meta={"city": "berlin"}"""
    val out = new OmlEval(model).transform(Vector(WField("log", WChars(line)))).get
    val m = out.map(f => f.name -> f.value.sval).toMap
    assert(m("status") == "404")
    assert(m("user") == "john doe")
    assert(m("city") == "berlin")
  }

  test("oml_conf.rs round-trips: newline rule lists, wildcard targets, pipes") {
    // test_conf_sample variant 1: newline-separated rule paths
    val m1 = OmlText.parse(
      """name : test
        rule :
            wpx/abc
            wpx/efg
        ---
        version      :chars   = chars(1.0.0) ;
        pos_sn       :chars   = take() ;
        aler*        :auto   = take() ;
        src_ip       :auto   = take();
        update_time  :time    = take() { _ :  time(2020-10-01 12:30:30) };
      """)
    assert(m1.rules == Vector("wpx/abc", "wpx/efg"))
    assert(m1.matchesRule("wpx/abc") && !m1.matchesRule("wpy/zzz"))
    assert(m1.items.length == 5)
    // wildcard read works at eval time
    val out = new OmlEval(m1).transform(Vector(
      WField("pos_sn", WChars("SN1")), WField("alert_lvl", WChars("hi")),
      WField("src_ip", WIp("1.2.3.4")))).get
    val vals = out.map(f => f.name -> f.value.sval).toMap
    assert(vals("version") == "1.0.0")
    assert(vals("aler*") == "hi")
    assert(vals("update_time").nonEmpty) // default literal kicks in
    // test_conf_sample variant 2: space-separated rule paths
    val m2 = OmlText.parse(
      """name : test
        rule :
            wpx/abc   wpx/efg
        ---
        v = chars(x) ;""")
    assert(m2.rules == Vector("wpx/abc", "wpx/efg"))
    // test_conf_pipe: with and without the pipe keyword
    val m3 = OmlText.parse(
      """name : test
        ---
        version : chars = pipe take() | base64_encode ;
        v2 : chars = pipe take(ip) | to_str |  base64_encode ;""")
    assert(m3.items.length == 2)
  }

  test("empty output is a transform failure (error channel)") {
    val oml = "name : e\n---\nx = read(missing) ;"
    val model = OmlText.parse(oml)
    assert(new OmlEval(model).transform(Vector(WField("a", WDigit(1)))).isEmpty)
  }
}
