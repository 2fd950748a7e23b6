package graft.wpl

/** Scratch cost-attribution for the nginx hot path (not part of the
  * suite; run: sbt "Test/runMain graft.wpl.ProfileScratch"). */
object ProfileScratch {
  def bench(name: String, wpl: String, line: String, n: Int = 300000): Double = {
    val mp = Runtime.compile(wpl)
    var i = 0
    while (i < 20000) { mp.parseLine(line); i += 1 }
    var best = Double.MaxValue
    var rep = 0
    while (rep < 3) {
      val t0 = System.nanoTime()
      i = 0
      var ok = 0
      while (i < n) {
        mp.parseLine(line) match { case _: PSuccess => ok += 1; case _ => }
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec < best) best = sec
      rep += 1
      if (rep == 3) println(f"$name%-28s ${best * 1e9 / n}%6.0f ns/line  ok=$ok")
    }
    best
  }

  def main(args: Array[String]): Unit = {
    val line =
      """222.133.52.20 - - [06/Aug/2019:12:12:19 +0800] "GET /nginx-logo.png HTTP/1.1" 200 368 "http://119.122.1.4/" "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_14_5) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/75.0.3770.142 Safari/537.36" "-""""
    def rule(body: String) = s"""package /p { rule r { ($body) } }"""
    bench("full", rule("""ip:sip,2*_,time:recv_time<[,]>,http/request",http/status,digit,chars",http/agent",_""""), line)
    bench("no-http-request", rule("""ip:sip,2*_,time:recv_time<[,]>,chars",http/status,digit,chars",http/agent",_""""), line)
    bench("no-time", rule("""ip:sip,2*_,chars<[,]>,http/request",http/status,digit,chars",http/agent",_""""), line)
    bench("ip-only-prefix", rule("""ip:sip,2*_,_<[,]>,_",_,_,_",_",_""""), line)
    bench("all-ignore", rule("""_,2*_,_<[,]>,_",_,_,_",_",_""""), line)
    // single-field isolation on small inputs
    bench("just-ip", rule("ip:sip"), "222.133.52.20")
    bench("just-time-clf", rule("time:t<[,]>"), "[06/Aug/2019:12:12:19 +0800]")
    bench("just-httpreq", rule("""http/request""""), "\"GET /nginx-logo.png HTTP/1.1\"")
    bench("just-agent", rule("""http/agent""""), "\"Mozilla/5.0 (Macintosh; Intel Mac OS X 10_14_5)\"")
    bench("just-2chars", rule("""chars:a,chars:b"""), "aaaa bbbb")
    // interaction probes
    bench("time+httpreq", rule("""time:t<[,]>,http/request""""),
      """[06/Aug/2019:12:12:19 +0800] "GET /nginx-logo.png HTTP/1.1"""")
    bench("chars+httpreq", rule("""chars:t<[,]>,http/request""""),
      """[06/Aug/2019:12:12:19 +0800] "GET /nginx-logo.png HTTP/1.1"""")
    bench("prefix-thru-time", rule("""ip:sip,2*_,time:recv_time<[,]>"""),
      """222.133.52.20 - - [06/Aug/2019:12:12:19 +0800]""")
    bench("prefix-thru-httpreq", rule("""ip:sip,2*_,time:recv_time<[,]>,http/request""""),
      """222.133.52.20 - - [06/Aug/2019:12:12:19 +0800] "GET /nginx-logo.png HTTP/1.1"""")
    bench("suffix-from-httpreq", rule("""http/request",http/status,digit,chars",http/agent",_""""),
      """"GET /nginx-logo.png HTTP/1.1" 200 368 "http://119.122.1.4/" "Mozilla/5.0 (X)" "-"""")
    bench("full-nosubtags", rule("""ip:sip,2*_,time:recv_time<[,]>,http/request",_,_,_",_",_""""), line)
    bench("full-again", rule("""ip:sip,2*_,time:recv_time<[,]>,http/request",http/status,digit,chars",http/agent",_""""), line)
  }
}
