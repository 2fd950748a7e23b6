package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `multi_match(text)` — Aho–Corasick multi-pattern scan (Aho &
  * Corasick, "Efficient String Matching: An Aid to Bibliographic
  * Search", CACM 1975): the blocklist/phrase-filter primitive. One
  * automaton pass per document finds every occurrence of every pattern
  * — O(len + matches) regardless of pattern count — where per-pattern
  * `indexOf` scans are O(len × patterns), the difference between a
  * 10-term and a 10,000-term blocklist at 100 TB.
  *
  * The pattern list is a plan-time constant (the blocklist IS the
  * artifact; the corpus is the stream), the automaton builds once per
  * executor via the codegen object pool, and the scan stays inside
  * whole-stage codegen as a single virtual call per row.
  *
  * Count contract (oracle-replayable): per pattern, LEFTMOST
  * NON-OVERLAPPING occurrences — the automaton emits matches in
  * increasing end order, and accepting a match only when its start ≥
  * the pattern's last accepted end reproduces the greedy `indexOf`
  * scan exactly, which DuckDB replays as
  * `(length(t) − length(replace(t, p, ''))) / length(p)`. Output:
  * struct<total_hits, n_patterns, first_pattern> — total accepted
  * matches, patterns with ≥1 hit, and the pattern of the leftmost
  * match (ties → pattern list order; the "FIRST failing gate named"
  * convention qualityEnsemble uses).
  */
case class MultiPatternStats(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_match needs at least one non-empty pattern")

  override def dataType: DataType = StructType(Seq(
    StructField("total_hits", LongType, nullable = false),
    StructField("n_patterns", IntegerType, nullable = false),
    StructField("first_pattern", StringType, nullable = true)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_match needs a string input, got $other")
  }

  @transient private lazy val automaton = MultiPatternStats.Automaton(patterns)

  override def nullSafeEval(input: Any): Any =
    MultiPatternStats.scan(input.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[MultiPatternStats.Automaton].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MultiPatternStats.scan($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternStats =
    copy(child = newChild)
}

object MultiPatternStats {

  /** Goto/fail/output automaton over chars; built once per executor.
    * Transitions are FLAT sorted (char, target) arrays per state — a
    * binary search per step, no boxed HashMap lookups — plus a dense
    * 65536-entry direct-index table for the root, which is where the
    * overwhelming majority of scan steps land (most text chars start
    * no pattern, so state stays 0 and each step is one array read). */
  case class Automaton(patterns: Seq[String]) extends Serializable {
    @transient lazy val (chars: Array[Array[Char]],
                        targets: Array[Array[Int]],
                        rootNext: Array[Int],
                        fail: Array[Int],
                        out: Array[Array[Int]],
                        patLen: Array[Int]) = build()

    private def build() = {
      val nxt = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
      val outSets = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
      patterns.zipWithIndex.foreach { case (p, pi) =>
        var s = 0
        p.foreach { c =>
          s = nxt(s).getOrElseUpdate(c, {
            nxt += mutable.HashMap.empty[Char, Int]
            outSets += mutable.ArrayBuffer.empty[Int]
            nxt.length - 1
          })
        }
        outSets(s) += pi
      }
      val failA = new Array[Int](nxt.length)
      val queue = mutable.Queue.empty[Int]
      nxt(0).valuesIterator.foreach { s => failA(s) = 0; queue.enqueue(s) }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        nxt(u).foreach { case (c, v) =>
          var f = failA(u)
          while (f != 0 && !nxt(f).contains(c)) f = failA(f)
          failA(v) = if (nxt(f).contains(c) && nxt(f)(c) != v) nxt(f)(c) else 0
          outSets(v) ++= outSets(failA(v))
          queue.enqueue(v)
        }
      }
      // flatten: per-state sorted parallel arrays + dense root table
      val chs = new Array[Array[Char]](nxt.length)
      val tgs = new Array[Array[Int]](nxt.length)
      var st = 0
      while (st < nxt.length) {
        val es = nxt(st).toArray.sortBy(_._1)
        chs(st) = es.map(_._1); tgs(st) = es.map(_._2)
        st += 1
      }
      val root = new Array[Int](65536)
      nxt(0).foreach { case (c, v) => root(c) = v }
      (chs, tgs, root, failA, outSets.map(_.toArray).toArray,
        patterns.map(_.length).toArray)
    }
  }

  /** Binary search `c` in the sorted per-state char array; target or -1. */
  private def findT(cs: Array[Char], ts: Array[Int], c: Char): Int = {
    var lo = 0; var hi = cs.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = cs(mid)
      if (mc == c) return ts(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  def scan(text: UTF8String, a: Automaton): InternalRow = {
    val s = text.toString
    val chars = a.chars; val targets = a.targets; val rootNext = a.rootNext
    val fail = a.fail; val out = a.out; val lens = a.patLen
    val nPat = lens.length
    val counts = new Array[Long](nPat)
    val lastEnd = Array.fill(nPat)(-1)
    val firstStart = Array.fill(nPat)(-1)
    var state = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (state == 0) state = rootNext(c)
      else {
        var tgt = -1
        while ({ tgt = findT(chars(state), targets(state), c)
                 tgt < 0 && state != 0 }) state = fail(state)
        state = if (tgt >= 0) tgt else rootNext(c)
      }
      val hits = out(state)
      var k = 0
      while (k < hits.length) {
        val p = hits(k)
        val start = i - lens(p) + 1
        if (firstStart(p) < 0) firstStart(p) = start
        if (start >= lastEnd(p)) { counts(p) += 1; lastEnd(p) = i + 1 }
        k += 1
      }
      i += 1
    }
    var total = 0L; var seen = 0; var firstP = -1; var firstPos = Int.MaxValue
    var p = 0
    while (p < nPat) {
      total += counts(p)
      if (counts(p) > 0) seen += 1
      if (firstStart(p) >= 0 && firstStart(p) < firstPos) {
        firstPos = firstStart(p); firstP = p
      }
      p += 1
    }
    new GenericInternalRow(Array[Any](total, seen,
      if (firstP < 0) null else UTF8String.fromString(a.patterns(firstP))))
  }

  def multi_match(c: Column, patterns: Seq[String]): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      MultiPatternStats(org.apache.spark.sql.GraftExprBridge.expression(c),
        patterns))
}
