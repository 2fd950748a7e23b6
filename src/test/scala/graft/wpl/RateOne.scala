package graft.wpl
import java.util.SplittableRandom
object RateOne {
  def main(args: Array[String]): Unit = {
    val wpl = """package /scale { rule r { (digit:id,ip:src,time:at,sn:dev,chars:name,http/status:st,float:v)\, } }"""
    val rule = WplText.parsePackages(wpl).head
    val rnd = new SplittableRandom(1)
    val lines = Array.fill(2000)(graft.gen.WpGen.genLine(rule, rnd))
    val mp = new Runtime.MultiParser(Vector(rule))
    var i = 0
    while (i < 40000) { mp.parseLine(lines(i % 2000)); i += 1 }
    val t0 = System.nanoTime(); i = 0
    while (i < 400000) { mp.parseLine(lines(i % 2000)); i += 1 }
    val s = (System.nanoTime() - t0) / 1e9
    println(f"RATE scale-rule single-core: ${400000 / s / 1000}%.0f k lines/s (${s * 1e9 / 400000}%.0f ns/line)")
  }
}
