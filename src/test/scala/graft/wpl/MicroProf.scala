package graft.wpl

object MicroProf {
  def t(name: String, n: Int)(f: => Unit): Unit = {
    var i = 0; while (i < 20000) { f; i += 1 }
    val t0 = System.nanoTime()
    i = 0; while (i < n) { f; i += 1 }
    println(f"MICRO $name: ${(System.nanoTime() - t0).toDouble / n}%.0f ns")
  }
  def main(args: Array[String]): Unit = {
    val clf = "06/Aug/2019:12:12:19 +0800"
    t("timeP.parseSegment(clf)", 300000)(TimeP.auto.parseSegment(clf))
    val mtm = new TimeFormats.MTM
    t("clf fmt only", 300000)(TimeFormats.clf.parseInto(clf, 0, mtm))
    t("toMicros", 300000)(TimeFormats.toMicros(TimeFormats.TM(2019,8,6,12,12,19,0,Some(28800))))
    val req = "GET /nginx-logo.png HTTP/1.1"
    t("httpRequest.parseSegment", 300000)(HttpRequestP.parseSegment(req))
    val ip = "222.133.52.20 - - rest"
    t("ipP.parse", 300000)({ val c = new Cursor(ip); IpP.parse(c, Sep.Default) })
    val agent = "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_14_5) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/75.0.3770.142 Safari/537.36"
    t("agent.parseSegment", 300000)(HttpAgentP.parseSegment(agent))
    val wpl = """package /e { rule r { (ip:sip,2*_,time:recv_time<[,]>,http/request",http/status,digit,chars",http/agent",_") } }"""
    t("compile", 30000)(Runtime.compile(wpl))
    val mp = Runtime.compile(wpl)
    val line = """222.133.52.20 - - [06/Aug/2019:12:12:19 +0800] "GET /nginx-logo.png HTTP/1.1" 200 368 "http://119.122.1.4/" "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_14_5) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/75.0.3770.142 Safari/537.36" "-""""
    t("full parseLine", 300000)(mp.parseLine(line))
  }
}
