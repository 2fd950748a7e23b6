package graft.wpl

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests: exact sample lines from the reference's test corpus
  * (FIXTURES.md F1–F5) must parse with the same WPL rules. */
class WplGoldenSpec extends AnyFunSuite {

  private def fields(o: ParseOutcome): Vector[WField] = o match {
    case PSuccess(_, fs) => fs
    case PPartial(_, fs, res) => fail(s"partial, residue='$res' fields=$fs")
    case PMiss(r, d) => fail(s"miss best=$r depth=$d")
    case PBlank => fail("blank")
  }

  // F1: nginx access log — tests/instance/wpl/example/simple/{parse.wpl,sample.dat}
  val nginxWpl =
    """package /example/simple {
       rule nginx {
        (ip:sip,2*_,time:recv_time<[,]>,http/request",http/status,digit,chars",http/agent",_")
       }
      }"""
  val nginxLine =
    """222.133.52.20 - - [06/Aug/2019:12:12:19 +0800] "GET /nginx-logo.png HTTP/1.1" 200 368 "http://119.122.1.4/" "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_14_5) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/75.0.3770.142 Safari/537.36" "-""""

  test("F1 nginx line parses fully") {
    val mp = Runtime.compile(nginxWpl)
    val fs = fields(mp.parseLine(nginxLine))
    val m = fs.map(f => f.name -> f.value).toMap
    assert(m("sip") == WIp("222.133.52.20"))
    assert(fs.exists(_.name == "recv_time"))
    val t = m("recv_time").asInstanceOf[WTime]
    // 2019-08-06 12:12:19 +0800 = 04:12:19 UTC
    assert(t.micros == java.time.Instant.parse("2019-08-06T04:12:19Z").toEpochMilli * 1000)
    val req = m("http/request").asInstanceOf[WObj].fields.toMap
    assert(req("method") == WChars("GET"))
    assert(req("uri") == WChars("/nginx-logo.png"))
    assert(req("version") == WChars("HTTP/1.1"))
    assert(m("http/status") == WDigit(200))
    assert(m("digit") == WDigit(368))
    assert(m("chars") == WChars("http://119.122.1.4/"))
    assert(m("http/agent").sval.startsWith("Mozilla/5.0"))
  }

  // F2: 25-field benchmark CSV — tests/instance/wpl/benchmark/parse.wpl
  val benchWpl =
    """package /benchmark {
        rule benchmark_1 {
          (digit:id,digit:len,time,sn,chars:dev_name,time,kv,sn,chars:dev_name,time,time,ip,kv,chars,kv,kv,chars,kv,kv,chars,chars,ip,chars,http/request<[,]>,http/agent")\,
        }
        rule benchmark_2 {
          (ip:src_ip,digit:port,chars:dev_name,ip:dst_ip,digit:port,time",kv,kv,sn,kv,ip,kv,chars,kv,sn,kv,kv,time,chars,time,sn,kv,chars,chars,ip,chars,http/request",http/agent")\,
        }
      }"""
  val benchLine1 =
    """1407,509,2021-4-20 18:10:19,WCY7-ZT-QEAK-N6PD,ByHJpEtscumFff6FNLLjoFwMsOjVRWHMxxFT56NxfmktY1ASgo,2022-4-4 21:0:13,Tv7=9WxLPktFSMRBH4WRUCiBkmh2swZLod,DQGB-NL-RY2X-0SFD,cqIZXVT8FtAYrrlKI7q2CKL0D69Cg5jgbtnzzaJnUcUusZBIF5,2020-11-8 10:58:21,2022-4-13 14:27:12,111.237.105.120,TeG=ro1WpYpimAoG0n182NqwpkRvX2Xfod,q9gZeTkIxlCoGrAEUNqHhG17CT4OKebKXC0Ze5iXiyi2JYYnwc,hnB=FEdOhmFkM6SxBwiy3ATZePyBJBK5TT,YUC=X9JVE4p4WCNRwNjIdJ8mwnjLzs9fTY,Cmvp92V96paAHM8L60NzWl93AUHSR3WdxriwHmUDDxVohd8NcI,gtd=5srrDgB8YZMipedJ60jpl99HQg2SZR,8Ju=I1C1RzlgmX3IlS9Vp2hLsQWiudvZqz,uVAx1yArjlE1suY3887oCA44dWbm2MNZykeAqCwiq2KJbZlais,3ERd33ADEIKXISZLYWJx8juR455t753fybdcypXE2akn4KqITx,83.213.168.46,tzZ6oyqEA9ffm1e1Pi96344C6HVlw9zti4LWhBd0z9gStkFDuw,[GET /index  HTTP/1.1 ],"Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/70.0.3538.77 Safari/537.36""""
  val benchLine2 =
    """72.239.155.6,1649,I944ZnNOhzfRp5r9Uty3PAJm90uY0v99qifhMKZnj5ffpxoYKy,109.58.83.177,871,"2021-2-11 5:58:51",uiw=kJ7WTzURWSCBAFqndYGT3LyLvlGTvQ,Al7=IgEVbLZ8NY7nku6BAy09upYGLxhkhz,ZBO5-MU-1Y00-R0CC,LFb=hObKOnpop8AqB0txd2mIP5wOmewIYg,92.18.113.95,c92=njjiv2beYuGOIakykMY8ZNX7rnNoL4,lk5kAKxOUfji8jAnHAbiCCtoUFCpDOYdsCHliJp1dvbZvwm9f4,jHJ=noXGAGWkuAfPJhz5DyDZS6DkkphDAg,8IKD-EU-J6LO-OY2U,fSr=qJ5IaAIKQdDWnFszoRASqnX5dOx08b,nlQ=P5yEAqAaKcndGunRyKx56UvtgI3Nf5,2020-10-10 8:54:22,ZCCsP0OPI2OeoMBczUP8TErR0gZGnqNqVx3j619RC5KHtJDQdj,2022-11-14 13:18:52,9FRA-QH-GH9F-NPMW,PAw=cA8XxG4sDxjqcOGw8mAq07dd0FSUri,JzOf0ir7bVrAZkUASKyiUQBWgNN0GaLAgUyRyn3R1kzWrnlwY4,cL1k8UVNujacgqU2OESrStWBEYvzn1PnBaUrA0LkwWZu16ZAIA,74.84.81.139,Mj2HTGMrmbIfKFHSBz4bhyseVmdxCdJgjIqy5B5sLcUdU6sjWg,"GET /index  HTTP/1.1 ","Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/70.0.3538.77 Safari/537.36""""

  test("F2 benchmark line 1 routes to benchmark_1 with duplicate names preserved") {
    val mp = Runtime.compile(benchWpl)
    mp.parseLine(benchLine1) match {
      case PSuccess(key, fs) =>
        assert(key == "/benchmark/benchmark_1")
        assert(fs.head == WField("id", WDigit(1407)))
        assert(fs(1) == WField("len", WDigit(509)))
        // duplicate names preserved in order: dev_name ×2, time ×4
        assert(fs.count(_.name == "dev_name") == 2)
        assert(fs.count(_.name == "time") == 4)
        // kv pairs named by their keys
        assert(fs.exists(f => f.name == "Tv7"))
        assert(fs.exists(f => f.name == "gtd"))
        val req = fs.find(_.name == "http/request").get.value.asInstanceOf[WObj].fields.toMap
        assert(req("method") == WChars("GET") && req("uri") == WChars("/index"))
      case other => fail(s"unexpected: $other")
    }
  }

  test("F2 benchmark line 2 routes to benchmark_2") {
    val mp = Runtime.compile(benchWpl)
    mp.parseLine(benchLine2) match {
      case PSuccess(key, fs) =>
        assert(key == "/benchmark/benchmark_2")
        assert(fs.head == WField("src_ip", WIp("72.239.155.6")))
        assert(fs(1) == WField("port", WDigit(1649)))
      case other => fail(s"unexpected: $other")
    }
  }

  // F4: quoted-KV security log (vm_unit.rs:312)
  val kvLine =
    """id=tos time="2023-05-15 09:11:53" fw=OS  pri=5 type=mgmt user=superman src=10.111.233.51 op="Modify pwd of manager" result=0 recorder=manager_so msg="null""""

  test("F4 kvarr with quoted values and repeated whitespace") {
    val mp = Runtime.compile("package /sec { rule tos { (kvarr) } }")
    val fs = fields(mp.parseLine(kvLine))
    val m = fs.map(f => f.name -> f.value).toMap
    assert(m("id") == WChars("tos"))
    assert(m("time") == WChars("2023-05-15 09:11:53"))
    assert(m("pri") == WDigit(5))
    assert(m("user") == WChars("superman"))
    assert(m("src") == WIp("10.111.233.51"))
    assert(m("op") == WChars("Modify pwd of manager"))
    assert(m("result") == WDigit(0))
    assert(m("msg") == WChars("null"))
  }

  // F5: JSON subfield projection (processor.rs:266-274)
  test("F5 json subfield projection") {
    val mp = Runtime.compile("""package /j { rule a { (json(chars@data)) } }""")
    val fs = fields(mp.parseLine("""{ "data": "192.168.1.1" }"""))
    assert(fs == Vector(WField("data", WChars("192.168.1.1"))))
  }

  // single-quoted field refs for names outside the bare charset
  // (docs 03-wpl/functions/field_reference.md; utils.rs
  // take_ref_path_or_quoted — raw string, only \' escapes)
  test("F5 json quoted @'...' refs reach special field names") {
    val mp = Runtime.compile(
      """package /j { rule q { (json( @'@client-ip': client, @'event type': ev )) } }""")
    val fs = fields(mp.parseLine("""{ "@client-ip": "10.0.0.9", "event type": "login" }"""))
    val m = fs.map(f => f.name -> f.value).toMap
    assert(m("client") == WChars("10.0.0.9"))
    assert(m("ev") == WChars("login"))
  }

  // F5b: nested re-parse of a JSON string field (order.rs:196-210)
  test("F5 json nested group re-parse") {
    val mp = Runtime.compile("""package /j { rule b { (json(chars@data<[,]> | (ip,_,time))) } }""")
    val fs = fields(mp.parseLine("""{ "data" : "[192.168.1.2 _ 06/Aug/2019:12:12:19 +0800]" }"""))
    val m = fs.map(f => f.name -> f.value).toMap
    assert(m("ip") == WIp("192.168.1.2"))
    assert(m.contains("time"))
  }

  // F3: Huawei firewall syslog (vm_unit.rs:336, test_huawei_detail)
  val huaweiLine =
    """<190>May 15 2023 07:09:12 KM-KJY-DC-USG12004-B02 %%01POLICY/6/POLICYPERMIT(l):CID=0x814f041e;vsys=CSG_Security, protocol=6"""

  test("F3 huawei detail rule: scope digit, auto time, kv chain") {
    val mp = Runtime.compile(
      """package /hw { rule detail {
           (digit:pri<<,>>,auto,chars,chars\:,kv\;,auto\,,auto\,)
         } }""")
    val fs = fields(mp.parseLine(huaweiLine))
    val m = fs.map(f => f.name -> f.value).toMap
    assert(m("pri") == WDigit(190))
    // `auto` consumed "May 15 2023 07:09:12" as a time value
    assert(fs(1).value.isInstanceOf[WTime])
    assert(fs(2) == WField("chars", WChars("KM-KJY-DC-USG12004-B02")))
    assert(fs(3) == WField("chars", WChars("%%01POLICY/6/POLICYPERMIT(l)")))
    assert(m("CID") == WChars("0x814f041e"))
    assert(m("vsys") == WChars("CSG_Security"))
    assert(m("protocol") == WDigit(6))
  }

  // reference vm_unit.rs test_huawei_simple2: symbols with length caps
  test("F3b huawei rule with symbol length caps") {
    val mp = Runtime.compile(
      """package /hw { rule s2 {
           (symbol(<190>)[5],time,symbol(KM)[2],chars\:,auto\;,auto\,,auto\,)
         } }""")
    val fs = fields(mp.parseLine(huaweiLine))
    val m = fs.map(f => f.name -> f.value).toMap
    assert(fs.head == WField("symbol", WChars("<190>"))) // duplicate auto-names
    assert(fs.exists(_.value.isInstanceOf[WTime]))
    assert(m("CID") == WChars("0x814f041e"))
    assert(m("protocol") == WDigit(6))
  }

  // reference parser_functionality.rs huawei_zhuru: base64 preproc +
  // multi-group express with opt + unbounded kv group
  test("F3c huawei zhuru: |decode/base64| with opt and *kv groups") {
    val mp = Runtime.compile(
      """package /pkg { rule traffic_probe {
           |decode/base64|(digit:id<<,>>,time,sn,chars\:),opt(kv\;), (*kv\,)
         } }""")
    val b64 = java.util.Base64.getEncoder.encodeToString(huaweiLine.getBytes("UTF-8"))
    val fs = fields(mp.parseLine(b64))
    val m = fs.map(f => f.name -> f.value).toMap
    assert(m("id") == WDigit(190))
    assert(fs.exists(_.value.isInstanceOf[WTime]))
    assert(m("sn") == WChars("KM-KJY-DC-USG12004-B02"))
    assert(m("chars") == WChars("%%01POLICY/6/POLICYPERMIT(l)"))
    assert(m("CID") == WChars("0x814f041e"))
    assert(m("vsys") == WChars("CSG_Security"))
    assert(m("protocol") == WDigit(6))
  }

  // F3d: the shipped h3c_waf fixture (tests/sample/h3c_waf) — |base64|
  // whole-line preprocessing + priority-tag scope + repeated kv runs
  test("F3d h3c_waf fixture: |base64| line with 21 kv fields parses fully") {
    val dir = new java.io.File("/root/reference/tests/sample/h3c_waf")
    assume(dir.isDirectory)
    def read(n: String) = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, n).toPath), "UTF-8")
    val mp = Runtime.compile(s"package /h3c { ${read("parse.wpl")} }")
    val line = read("sample.dat").trim
    val out = mp.parseLine(line)
    val fs = fields(out)
    val m = fs.map(f => f.name -> f.value).toMap
    assert(m("digit") == WDigit(188))               // <188> priority tag
    assert(m("sn") == WChars("KMDLDLH3CW2020G2WAFA01"))
    assert(m("dip") == WIp("10.180.39.12"))
    assert(m("url") == WChars("/OMS/uploadFile.action"))
    assert(m("method") == WChars("POST"))
    assert(m("rule_id") == WDigit(70001))
    assert(m("action") == WChars("REJECT"))
    assert(m("browser") == WDigit(0))
    assert(fs.count(_.value.isInstanceOf[WTime]) == 2) // bsd + iso times
  }

  // F3e: the shipped format fixture (tests/sample/format/quota.dat) —
  // |unquote/unescape| pre-pipe strips unescaped quotes and backslash
  // escapes (quotation.rs:9-23), then json parses the revealed object
  // (parser_functionality.rs:58-74 expects {"a":1,"b":" 中国 "})
  test("F3e format fixture: quoted+escaped JSON unquotes then parses") {
    val f = new java.io.File("/root/reference/tests/sample/format/quota.dat")
    assume(f.isFile)
    val line = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      .stripLineEnd
    val mp = Runtime.compile("package pkg { rule esc_1 {|unquote/unescape|(json)} }")
    val fs = fields(mp.parseLine(line))
    val m = fs.map(f => f.name -> f.value).toMap
    assert(m("a") == WDigit(1))
    assert(m("b") == WChars(" 中国 "))
  }

  // F5c: some_of over CJK-keyed JSON metrics (some_of.rs:82-105)
  test("F5c some_of JSON metrics with symbol guards match in any order") {
    val mp = Runtime.compile(
      """package /m { rule metrics { some_of (
          json( symbol(可用磁盘空间kB)@name,@value:disk_free),
          json( symbol(磁盘使用百分比)@name,@value:disk_used),
          json( symbol(空闲CPU百分比)@name,@value:cpu_free),
          json( symbol(空闲内存kB)@name,@value:memory_free),
          json( symbol(1分钟平均CPU负载)@name,@value:cpu_used_by_one_min),
          json( symbol(15分钟平均CPU负载)@name,@value:cpu_used_by_fifty_min),
          json( symbol(系统启动进程个数)@name,@value:process),
          json( symbol(磁盘1分钟平均负载)@name,@value:disk_used_by_one_min),
          json( symbol(磁盘15分钟平均负载)@name,@value:dist_used_by_fifty_min) )\,
      } }""")
    val line =
      """{"name": "空闲CPU百分比", "value": 96.8}, {"name": "空闲内存kB", "value": 102432896.0}, {"name": "1分钟平均CPU负载", "value": 2.52}, {"name": "15分钟平均CPU负载", "value": 4.9}, {"name": "系统启动进程个数", "value": 1340.0}, {"name": "可用磁盘空间kB", "value": 40565575858.0}, {"name": "磁盘使用百分比", "value": 8.63}, {"name": "磁盘1分钟平均负载", "value": 8.63}, {"name": "磁盘15分钟平均负载", "value": 8.64}"""
    val fs = fields(mp.parseLine(line))
    val m = fs.map(f => f.name -> f.value).toMap
    assert(m("cpu_free") == WFloat(96.8))
    assert(m("memory_free") == WFloat(102432896.0))
    assert(m("process") == WFloat(1340.0))
    assert(m("disk_free") == WFloat(40565575858.0))
    assert(m("dist_used_by_fifty_min") == WFloat(8.64))
    assert(fs.length == 9)
  }

  // reference tests/parser_functionality.rs should_parse_nginx_access_log
  test("parser_functionality.rs: nginx workshop parse with named length") {
    val mp = Runtime.compile(
      """package /pkg { rule test {
           (ip,2*_,time<[,]>,http/request",http/status,digit:length,chars",http/agent",_")
         } }""")
    val line = """192.168.1.2 - - [06/Aug/2019:12:12:19 +0800] "GET /nginx-logo.png HTTP/1.1" 200 368 "http://119.122.1.4/" "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_14_5) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/75.0.3770.142 Safari/537.36" "-""""
    val fs = fields(mp.parseLine(line))
    val m = fs.map(f => f.name -> f.value).toMap
    assert(m("ip") == WIp("192.168.1.2"))
    assert(m("length") == WDigit(368))
    assert(m("http/status") == WDigit(200))
    assert(m("chars") == WChars("http://119.122.1.4/"))
  }

  // reference tests/parser_functionality.rs should_parse_json_with_escaped_quotes
  test("parser_functionality.rs: unquote/unescape then lenient json") {
    val mp = Runtime.compile("""package /pkg { rule esc_1 { |unquote/unescape| (json) } }""")
    val line = """" {\"a\": 1, \"b\" : \" 中国 \" }""""
    val fs = fields(mp.parseLine(line))
    val m = fs.map(f => f.name -> f.value).toMap
    assert(m("a") == WDigit(1))
    assert(m("b") == WChars(" 中国 "))
  }

  // group combinators (alt.rs / opt.rs / some_of.rs / not.rs)
  test("alt takes first matching branch") {
    val mp = Runtime.compile("package /g { rule r { alt(ip,digit,chars) } }")
    assert(fields(mp.parseLine("10.0.0.1")) == Vector(WField("ip", WIp("10.0.0.1"))))
    assert(fields(mp.parseLine("12345")) == Vector(WField("digit", WDigit(12345))))
    assert(fields(mp.parseLine("hello")) == Vector(WField("chars", WChars("hello"))))
  }

  test("opt group is a no-op on failure") {
    val mp = Runtime.compile("package /g { rule r { opt(digit:n),(chars:rest) } }")
    assert(fields(mp.parseLine("42 tail")) ==
      Vector(WField("n", WDigit(42)), WField("rest", WChars("tail"))))
    assert(fields(mp.parseLine("tail")) == Vector(WField("rest", WChars("tail"))))
  }

  test("some_of matches members in any order until exhaustion") {
    val mp = Runtime.compile("package /g { rule r { some_of(ip:a,digit:b) } }")
    val fs = fields(mp.parseLine("8.8.8.8 42 1.1.1.1"))
    assert(fs == Vector(WField("a", WIp("8.8.8.8")), WField("b", WDigit(42)),
      WField("a", WIp("1.1.1.1"))))
  }

  // reference order.rs test_pipeline2: nested group with its own sep
  test("order.rs: nested group pipe with comma sep and space padding") {
    val mp = Runtime.compile("""package /p { rule r { (chars<[,]> | (ip, time)\,) } }""")
    val fs = fields(mp.parseLine("""[192.168.1.2 , 06/Aug/2019:12:12:19 +0800]"""))
    val m = fs.map(f => f.name -> f.value).toMap
    assert(m("ip") == WIp("192.168.1.2"))
    assert(m.contains("time"))
  }

  // reference order.rs test_pipeline3: kv value carrying a nested payload
  test("order.rs: kv subfield with scope + nested group re-parse") {
    val mp = Runtime.compile("""package /p { rule r { (kv(chars<[,]> | (ip,_,time))) } }""")
    val fs = fields(mp.parseLine("""data : [192.168.1.2 _ 06/Aug/2019:12:12:19 +0800]"""))
    val m = fs.map(f => f.name -> f.value).toMap
    assert(m("ip") == WIp("192.168.1.2"))
    assert(m.contains("time"))
  }

  // reference order.rs test_group_sep_and_field_sep_precedence
  test("order.rs: field separator outranks group separator") {
    val mp1 = Runtime.compile("""package /s { rule r { (chars:a, chars:b)\| } }""")
    assert(fields(mp1.parseLine("foo|bar")) ==
      Vector(WField("a", WChars("foo")), WField("b", WChars("bar"))))
    val rule2 = WplText.parsePackages(
      """package /s { rule r2 { (chars:a, chars:b\|)\, } }""").head
    new Runtime.RuleEval(rule2).eval("x,y|z") match {
      case Right((fs, _, _)) =>
        assert(fs.take(2) ==
          Vector(WField("a", WChars("x")), WField("b", WChars("y"))))
      case Left(d) => fail(s"failed at $d")
    }
  }

  // reference alt.rs test_alt_group (verbatim inputs)
  test("alt.rs: alt(ip,digit) with trailing time groups") {
    val mp = Runtime.compile(
      """package /a { rule r { alt(ip:sip,digit:id),(2*_,time<[,]>) } }""")
    val fs1 = fields(mp.parseLine("""192.168.1.2 - - [06/Aug/2019:12:12:19 +0800] """))
    assert(fs1.head == WField("sip", WIp("192.168.1.2")))
    val fs2 = fields(mp.parseLine("""2002 - - [06/Aug/2019:12:12:19 +0800] """))
    assert(fs2.head == WField("id", WDigit(2002)))
    mp.parseLine("""bad - - [06/Aug/2019:12:12:19 +0800] """) match {
      case PMiss(_, _) =>
      case o => fail(s"expected miss: $o")
    }
  }

  // reference opt.rs test_opt_group_1/2 (verbatim inputs)
  test("opt.rs: optional leading ip present/absent; opt after required") {
    val mp = Runtime.compile(
      """package /o { rule r { opt(ip:sip),(2*_,time<[,]>) } }""")
    val fs1 = fields(mp.parseLine("""192.168.1.2 - - [06/Aug/2019:12:12:19 +0800] """))
    assert(fs1.head == WField("sip", WIp("192.168.1.2")))
    val fs2 = fields(mp.parseLine("""- - [06/Aug/2019:12:12:19 +0800] """))
    assert(!fs2.exists(_.name == "sip"))

    val mp2 = Runtime.compile("""package /o { rule r2 { (ip:sip) ,opt(ip:sip) } }""")
    val fs3 = fields(mp2.parseLine("192.168.1.2"))
    assert(fs3 == Vector(WField("sip", WIp("192.168.1.2"))))
  }

  // not group semantics (reference not.rs tests, verbatim cases)
  test("not(symbol) succeeds when absent, emitting a named ignore marker") {
    val rule = WplText.parsePackages(
      "package /n { rule r { not(symbol(ERROR):test) } }").head
    val ge = new Runtime.GroupEval(rule.groups.head)
    val cur = new Cursor("INFO: hello world")
    val rec = new RecBuilder
    assert(ge.eval(cur, rec, Sep.Default))
    assert(rec.fields.exists(f => f.name == "test" && f.value == WIgnore))
  }

  test("not(symbol) fails when the symbol matches") {
    val rule = WplText.parsePackages(
      "package /n { rule r { not(symbol(ERROR):test) } }").head
    val ge = new Runtime.GroupEval(rule.groups.head)
    assert(!ge.eval(new Cursor("ERROR: something wrong"), new RecBuilder, Sep.Default))
  }

  test("not(peek_symbol) leaves input for the next group") {
    val rule = WplText.parsePackages(
      "package /n { rule r { not(peek_symbol(ERROR):test),(chars:msg) } }").head
    new Runtime.RuleEval(rule).eval("INFO message") match {
      case Right((fs, _, _)) =>
        assert(fs.exists(f => f.name == "msg" && f.value == WChars("INFO")))
      case Left(d) => fail(s"failed at depth $d")
    }
  }

  test("miss keeps deepest failure across rules") {
    val mp = Runtime.compile(
      """package /m {
         rule short { (digit:a) }
         rule long  { (digit:a,digit:b,ip:c) }
        }""")
    mp.parseLine("11 22 banana") match {
      case PMiss(best, depth) =>
        assert(best == "/m/long") // consumed "11 22 " = deepest
        assert(depth >= 6)
      case other => fail(s"expected miss, got $other")
    }
  }

  test("partial accepted when residue <= 20%") {
    // 40-char line, rule consumes all but 4 trailing chars (10%)
    val line = "123456 " + ("a" * 29) + " tail"
    val mp = Runtime.compile("package /p { rule r { (digit:n,chars:body) } }")
    mp.parseLine(line) match {
      case PPartial(key, fs, residue) =>
        assert(key == "/p/r")
        assert(residue.trim == "tail")
      case PSuccess(_, fs) => fail(s"expected partial: $fs")
      case other => fail(s"unexpected: $other")
    }
  }

  test("malformed rule text fails at load with a position (err_test parity)") {
    intercept[Exception] { Runtime.compile("package { nope") }
    intercept[Exception] { Runtime.compile("package /x { rule r { (unknown_type:x) } }") }
    intercept[Exception] { graft.oml.OmlText.parse("no header here = broken ;") }
  }

  test("whitespace-only line silently dropped") {
    val mp = Runtime.compile("package /b { rule r { (chars) } }")
    assert(mp.parseLine("   \t  ") == PBlank)
  }

  test("annotations: tag adds const fields, copy_raw copies the line") {
    val mp = Runtime.compile(
      """package /a {
         #[tag(env:"prod"), copy_raw(name:"raw_log")]
         rule r { (digit:n) }
        }""")
    val fs = fields(mp.parseLine("7"))
    assert(fs.contains(WField("env", WChars("prod"))))
    assert(fs.contains(WField("raw_log", WChars("7"))))
  }

  test("preproc decode/base64") {
    val b64 = java.util.Base64.getEncoder.encodeToString("99 10.1.2.3".getBytes)
    val mp = Runtime.compile("package /d { rule r { |decode/base64| (digit:n,ip:a) } }")
    val fs = fields(mp.parseLine(b64))
    assert(fs == Vector(WField("n", WDigit(99)), WField("a", WIp("10.1.2.3"))))
  }

  test("field pipes: predicates gate the match") {
    val mp = Runtime.compile(
      """package /f {
         rule only200 { (chars:m,digit:st|digit_has(200),chars:u) }
        }""")
    assert(fields(mp.parseLine("GET 200 /a")).nonEmpty)
    mp.parseLine("GET 404 /a") match {
      case PMiss(_, _) =>
      case other => fail(s"expected miss, got $other")
    }
  }

  test("sep pattern: chars{*=} reads to equals sign") {
    val mp = Runtime.compile("package /s { rule r { (chars:k{*=},chars:v) } }")
    val fs = fields(mp.parseLine("key=value"))
    assert(fs == Vector(WField("k", WChars("key")), WField("v", WChars("value"))))
  }

  test("kvarr subfield projection with types") {
    val mp = Runtime.compile("package /k { rule r { (kvarr(chars@host, digit@port)) } }")
    val fs = fields(mp.parseLine("host=web01 port=8080 extra=zzz"))
    assert(fs == Vector(WField("host", WChars("web01")), WField("port", WDigit(8080))))
  }

  test("kvarr opt() subfields tolerate absence; required ones gate") {
    val mp = Runtime.compile(
      "package /k { rule r { (kvarr(chars@host, opt(digit)@port)) } }")
    assert(fields(mp.parseLine("host=web01 extra=1")) ==
      Vector(WField("host", WChars("web01"))))
    assert(fields(mp.parseLine("host=web01 port=9090")) ==
      Vector(WField("host", WChars("web01")), WField("port", WDigit(9090))))
    mp.parseLine("other=x extra=1") match {
      case PMiss(_, _) => // required @host missing → no match
      case o => fail(o.toString)
    }
  }
}
