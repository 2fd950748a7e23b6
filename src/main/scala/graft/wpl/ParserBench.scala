package graft.wpl

/** Single-core parser throughput measurement, shared by the test-side
  * ThroughputMain (human-readable sweep) and the main-side Bench
  * (machine-readable `lines_per_sec_core` metric checked per round
  * against the BASELINE-derived targets: ≥1M lines/s/core simple rule,
  * ≥100k lines/s/core 25-field rule). Single thread by construction —
  * the per-core number is what multiplies out to cluster throughput. */
object ParserBench {

  /** Distinct input lines for the throughput loop: the benched sample
    * line plus wpgen-generated lines from the SAME rule (seeded,
    * deterministic). A single repeated line stays L1-resident and
    * flatters steady state — ~4k distinct ~250-byte lines (≈1 MB)
    * force realistic memory traffic, and the varied field contents
    * exercise the value parsers' actual branch mix instead of one
    * branch-predicted path. */
  def corpusFor(wpl: String, sampleLine: String, size: Int = 4096): Array[String] = {
    val rule = WplText.parsePackages(wpl).headOption
      .getOrElse(throw new IllegalArgumentException("no rule in wpl"))
    val rnd = new java.util.SplittableRandom(42L)
    Array.tabulate(size)(i =>
      if (i == 0) sampleLine else graft.gen.WpGen.genLine(rule, rnd))
  }

  /** Mean line length of the measured corpus — published next to
    * lines/s so the sentinel is interpretable: wpgen's generated lines
    * are shorter on average than the hand-picked sample (random agent
    * strings vs a 120-char Mozilla UA), so lines/s is NOT directly
    * comparable to the old single-line number; bytes/s
    * (lines/s × mean_len) is the cross-definition-stable view. The
    * fixed seed makes the corpus — and thus round-over-round
    * comparisons — deterministic. */
  def corpusMeanLen(wpl: String, sampleLine: String): Double = {
    val c = corpusFor(wpl, sampleLine)
    c.map(_.length.toLong).sum.toDouble / c.length
  }

  /** Best-of-`reps` lines/second for one rule over a varied-line
    * corpus (see [[corpusFor]]), after `warmup` iterations to tier the
    * parse loop up (a cold JVM under-reports steady state by ~2× —
    * measured on the nginx rule: 1442 ns/line at 20k warmup vs 763
    * ns/line fully warm). */
  def linesPerSec(wpl: String, line: String, n: Int,
                  warmup: Int = 500000, reps: Int = 3): Double = {
    val mp = Runtime.compile(wpl)
    val corpus = corpusFor(wpl, line)
    val mask = corpus.length - 1 // corpusFor size is a power of two
    var i = 0
    while (i < warmup) { mp.parseLine(corpus(i & mask)); i += 1 }
    var best = Double.MaxValue
    var rep = 0
    while (rep < reps) {
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { mp.parseLine(corpus(i & mask)); i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec < best) best = sec
      rep += 1
    }
    n / best
  }

  val nginxWpl: String =
    """package /example/simple { rule nginx {
      (ip:sip,2*_,time:recv_time<[,]>,http/request",http/status,digit,chars",http/agent",_")
    } }"""
  val nginxLine: String =
    """222.133.52.20 - - [06/Aug/2019:12:12:19 +0800] "GET /nginx-logo.png HTTP/1.1" 200 368 "http://119.122.1.4/" "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_14_5) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/75.0.3770.142 Safari/537.36" "-""""
  val bench25Wpl: String =
    """package /benchmark {
      rule benchmark_1 {
        (digit:id,digit:len,time,sn,chars:dev_name,time,kv,sn,chars:dev_name,time,time,ip,kv,chars,kv,kv,chars,kv,kv,chars,chars,ip,chars,http/request<[,]>,http/agent")\,
      }
    }"""
  val bench25Line: String =
    """1407,509,2021-4-20 18:10:19,WCY7-ZT-QEAK-N6PD,ByHJpEtscumFff6FNLLjoFwMsOjVRWHMxxFT56NxfmktY1ASgo,2022-4-4 21:0:13,Tv7=9WxLPktFSMRBH4WRUCiBkmh2swZLod,DQGB-NL-RY2X-0SFD,cqIZXVT8FtAYrrlKI7q2CKL0D69Cg5jgbtnzzaJnUcUusZBIF5,2020-11-8 10:58:21,2022-4-13 14:27:12,111.237.105.120,TeG=ro1WpYpimAoG0n182NqwpkRvX2Xfod,q9gZeTkIxlCoGrAEUNqHhG17CT4OKebKXC0Ze5iXiyi2JYYnwc,hnB=FEdOhmFkM6SxBwiy3ATZePyBJBK5TT,YUC=X9JVE4p4WCNRwNjIdJ8mwnjLzs9fTY,Cmvp92V96paAHM8L60NzWl93AUHSR3WdxriwHmUDDxVohd8NcI,gtd=5srrDgB8YZMipedJ60jpl99HQg2SZR,8Ju=I1C1RzlgmX3IlS9Vp2hLsQWiudvZqz,uVAx1yArjlE1suY3887oCA44dWbm2MNZykeAqCwiq2KJbZlais,3ERd33ADEIKXISZLYWJx8juR455t753fybdcypXE2akn4KqITx,83.213.168.46,tzZ6oyqEA9ffm1e1Pi96344C6HVlw9zti4LWhBd0z9gStkFDuw,[GET /index  HTTP/1.1 ],"Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/70.0.3538.77 Safari/537.36""""
}
