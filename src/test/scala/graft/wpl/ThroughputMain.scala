package graft.wpl

/** Single-core parser throughput vs BASELINE.md targets:
  * >= 1M lines/s/core (nginx), >= 100k lines/s/core (25-field benchmark).
  * Run: sbt "Test/runMain graft.wpl.ThroughputMain" */
object ThroughputMain {
  def bench(name: String, wpl: String, line: String, n: Int): Unit = {
    val mp = Runtime.compile(wpl)
    // warmup: 500k iterations — a cold JVM needs several hundred k to
    // fully tier up the parse loop; at 20k the first benchmark
    // under-reported steady-state by ~2x (same nginx rule: 1442 ns/line
    // with 20k warmup vs 763 ns/line fully warm, this host)
    var i = 0
    while (i < 500000) { mp.parseLine(line); i += 1 }
    // best-of-3 reps — the shared host throttles unpredictably, so a
    // single rep under-reports; best-of is the machine-capability number
    var best = Double.MaxValue
    var ok = 0
    var rep = 0
    while (rep < 3) {
      val t0 = System.nanoTime()
      i = 0
      ok = 0
      while (i < n) {
        mp.parseLine(line) match {
          case _: PSuccess => ok += 1
          case _ =>
        }
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec < best) best = sec
      rep += 1
    }
    println(f"THROUGHPUT $name: ${n / best / 1000}%.0f k lines/s/core (${best * 1e9 / n}%.0f ns/line, ok=$ok/$n)")
  }

  def main(args: Array[String]): Unit = {
    val nginxWpl =
      """package /example/simple { rule nginx {
        (ip:sip,2*_,time:recv_time<[,]>,http/request",http/status,digit,chars",http/agent",_")
      } }"""
    val nginxLine =
      """222.133.52.20 - - [06/Aug/2019:12:12:19 +0800] "GET /nginx-logo.png HTTP/1.1" 200 368 "http://119.122.1.4/" "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_14_5) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/75.0.3770.142 Safari/537.36" "-""""
    val benchWpl =
      """package /benchmark {
        rule benchmark_1 {
          (digit:id,digit:len,time,sn,chars:dev_name,time,kv,sn,chars:dev_name,time,time,ip,kv,chars,kv,kv,chars,kv,kv,chars,chars,ip,chars,http/request<[,]>,http/agent")\,
        }
        rule benchmark_2 {
          (ip:src_ip,digit:port,chars:dev_name,ip:dst_ip,digit:port,time",kv,kv,sn,kv,ip,kv,chars,kv,sn,kv,kv,time,chars,time,sn,kv,chars,chars,ip,chars,http/request",http/agent")\,
        }
      }"""
    val benchLine =
      """1407,509,2021-4-20 18:10:19,WCY7-ZT-QEAK-N6PD,ByHJpEtscumFff6FNLLjoFwMsOjVRWHMxxFT56NxfmktY1ASgo,2022-4-4 21:0:13,Tv7=9WxLPktFSMRBH4WRUCiBkmh2swZLod,DQGB-NL-RY2X-0SFD,cqIZXVT8FtAYrrlKI7q2CKL0D69Cg5jgbtnzzaJnUcUusZBIF5,2020-11-8 10:58:21,2022-4-13 14:27:12,111.237.105.120,TeG=ro1WpYpimAoG0n182NqwpkRvX2Xfod,q9gZeTkIxlCoGrAEUNqHhG17CT4OKebKXC0Ze5iXiyi2JYYnwc,hnB=FEdOhmFkM6SxBwiy3ATZePyBJBK5TT,YUC=X9JVE4p4WCNRwNjIdJ8mwnjLzs9fTY,Cmvp92V96paAHM8L60NzWl93AUHSR3WdxriwHmUDDxVohd8NcI,gtd=5srrDgB8YZMipedJ60jpl99HQg2SZR,8Ju=I1C1RzlgmX3IlS9Vp2hLsQWiudvZqz,uVAx1yArjlE1suY3887oCA44dWbm2MNZykeAqCwiq2KJbZlais,3ERd33ADEIKXISZLYWJx8juR455t753fybdcypXE2akn4KqITx,83.213.168.46,tzZ6oyqEA9ffm1e1Pi96344C6HVlw9zti4LWhBd0z9gStkFDuw,[GET /index  HTTP/1.1 ],"Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/70.0.3538.77 Safari/537.36""""
    bench("nginx", nginxWpl, nginxLine, 300000)
    bench("benchmark25", benchWpl, benchLine, 100000)
    val kvLine = """id=tos time="2023-05-15 09:11:53" fw=OS  pri=5 type=mgmt user=superman src=10.111.233.51 op="Modify pwd of manager" result=0 recorder=manager_so msg="null""""
    bench("kvarr", "package /sec { rule tos { (kvarr) } }", kvLine, 200000)
  }
}
