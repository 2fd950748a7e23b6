package graft.wpl

object RateSteps {
  val line = """222.133.52.20 - - [06/Aug/2019:12:12:19 +0800] "GET /nginx-logo.png HTTP/1.1" 200 368 "http://119.122.1.4/" "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_14_5) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/75.0.3770.142 Safari/537.36" "-""""
  def bench(name: String, rule: String): Unit = {
    val mp = Runtime.compile(s"package /p { rule r { $rule } }")
    var i = 0
    while (i < 30000) { mp.parseLine(line); i += 1 }
    val t0 = System.nanoTime(); i = 0
    while (i < 200000) { mp.parseLine(line); i += 1 }
    println(f"STEP $name: ${(System.nanoTime() - t0).toDouble / 200000}%.0f ns")
  }
  def main(args: Array[String]): Unit = {
    bench("ip only           ", "(ip:sip,chars:rest)")
    bench("+2*_              ", "(ip:sip,2*_,chars:rest)")
    bench("+time<[,]>        ", "(ip:sip,2*_,time:recv<[,]>,chars:rest)")
    bench("+http/request\"    ", "(ip:sip,2*_,time:recv<[,]>,http/request\",chars:rest)")
    bench("+status+digit     ", "(ip:sip,2*_,time:recv<[,]>,http/request\",http/status,digit,chars:rest)")
    bench("full nginx        ", "(ip:sip,2*_,time:recv<[,]>,http/request\",http/status,digit,chars\",http/agent\",_\")")
  }
}
