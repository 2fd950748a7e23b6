package graft.wpl

/** Single-core parser throughput vs BASELINE.md targets:
  * >= 1M lines/s/core (nginx), >= 100k lines/s/core (25-field benchmark).
  * Run: sbt "Test/runMain graft.wpl.ThroughputMain"
  * The measurement kernel lives main-side in [[ParserBench]] so the
  * Bench main reports `lines_per_sec_core` every round. */
object ThroughputMain {
  def bench(name: String, wpl: String, line: String, n: Int): Unit = {
    // guard: the timed line must actually parse — a silently-failing
    // parse would bench the error path
    Runtime.compile(wpl).parseLine(line) match {
      case _: PSuccess =>
      case other => sys.error(s"$name bench line does not parse: $other")
    }
    val lps = ParserBench.linesPerSec(wpl, line, n)
    println(f"THROUGHPUT $name: ${lps / 1000}%.0f k lines/s/core (${1e9 / lps}%.0f ns/line)")
  }

  def main(args: Array[String]): Unit = {
    bench("nginx", ParserBench.nginxWpl, ParserBench.nginxLine, 300000)
    bench("benchmark25", ParserBench.bench25Wpl, ParserBench.bench25Line, 100000)
    val kvLine = """id=tos time="2023-05-15 09:11:53" fw=OS  pri=5 type=mgmt user=superman src=10.111.233.51 op="Modify pwd of manager" result=0 recorder=manager_so msg="null""""
    bench("kvarr", "package /sec { rule tos { (kvarr) } }", kvLine, 200000)
  }
}
