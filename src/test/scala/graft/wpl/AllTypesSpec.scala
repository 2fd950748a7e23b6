package graft.wpl

import org.scalatest.funsuite.AnyFunSuite

/** Line-by-line sweep of the 37 WPL type identifiers (reference
  * docs/usage/zh/03-wpl/04-language-reference.md:19-103), each with the
  * doc's own sample value. */
class AllTypesSpec extends AnyFunSuite {

  private def ok(rule: String, line: String): Vector[WField] = {
    Runtime.compile(s"package /t { rule r { $rule } }").parseLine(line) match {
      case PSuccess(_, fs) => fs
      case PPartial(_, fs, _) => fs
      case o => fail(s"rule=$rule line='$line' -> $o")
    }
  }

  val cases: Seq[(String, String)] = Seq(
    "(peek_symbol(GET):g,chars:m,chars:rest)" -> "GET /path",
    "(_,chars:x)" -> "skip me",
    "(symbol(HTTP):s,chars:x)" -> "HTTP rest",
    "(bool:b)" -> "true",
    "(chars:c)" -> "hello",
    "(digit:d)" -> "123",
    "(float:f)" -> "3.14",
    "(sn:s)" -> "ABC1-23-XYZ",
    "(time:t)" -> "2023-05-15 07:09:12",
    "(time_iso:t)" -> "2023-05-15T07:09:12Z",
    "(time_3339:t)" -> "2022-03-21T12:34:56+00:00",
    "(time_2822:t)" -> "Mon, 07 Jul 2025 09:20:32 +0000",
    "(time/clf:t)" -> "06/Aug/2019:12:12:19 +0800",
    "(time_timestamp:t)" -> "1647849600",
    "(ip:a)" -> "192.168.1.100",
    "(ip:a6)" -> "::1",
    "(ip_net:n)" -> "192.168.0.0/24",
    "(domain:d)" -> "example.com",
    "(email:e)" -> "user@example.com",
    "(port:p)" -> "8080",
    "(url:u)" -> "http://example.com/path",
    "(hex:h)" -> "48656c6c6f",
    "(base64:b)" -> "aGVsbG8=",
    "(kv)" -> "key=value",
    "(kvarr)" -> "a=1 b=2",
    "(json)" -> """{"k":"v"}""",
    "(exact_json)" -> """{"k":"v"}""",
    "(obj)" -> """{"k":{"n":1}}""",
    "(array:a)" -> "[1,2,3]",
    "(array/digit:a)" -> "[1,2,3]",
    "(array/chars:a)" -> "[a,b]",
    "(http/request:r)" -> "GET /path HTTP/1.1",
    "(http/status:s)" -> "200",
    "(http/agent:a)" -> "Mozilla/5.0",
    "(http/method:m)" -> "POST",
    "(id_card:i)" -> "110101199001011234",
    "(mobile_phone:m)" -> "13800138000",
    "(proto_text:p)" -> "name { k: v }",
    "(auto:a)" -> "192.168.1.1")

  for ((rule, line) <- cases) {
    test(s"type sweep: $rule parses '${line.take(30)}'") {
      assert(ok(rule, line).nonEmpty || rule.contains("(_"))
    }
  }

  test("typed values land with the right dtype") {
    assert(ok("(digit:d)", "123").head.value == WDigit(123))
    assert(ok("(float:f)", "3.14").head.value == WFloat(3.14))
    assert(ok("(bool:b)", "true").head.value == WBool(true))
    assert(ok("(ip:a)", "192.168.1.100").head.value == WIp("192.168.1.100"))
    assert(ok("(ip_net:n)", "192.168.0.0/24").head.value == WIpNet("192.168.0.0/24"))
    assert(ok("(array/digit:a)", "[1,2,3]").head.value ==
      WArr(Vector(WDigit(1), WDigit(2), WDigit(3))))
    assert(ok("(time_timestamp:t)", "1647849600").head.value
      .asInstanceOf[WTime].micros == 1647849600000000L)
    assert(ok("(kv)", "key=value").head == WField("key", WChars("value")))
  }
}
