package graft.wpl

/** Separator model (reference: shortcut seps + `{pattern}` sep patterns,
  * crates/wp-lang/src/ast/syntax/sep_pattern.rs; semantics
  * docs/usage/en/03-wpl/08-sep-pattern.md).
  *
  * Three-level priority (field > group > inherited) is resolved by the
  * runtime; `Sep.Default` is the whitespace-run separator.
  *
  * The matcher exposes two operations on a PRIMITIVE ABI (no Option /
  * tuple allocation — these run once-to-thrice per field on the parse
  * hot path):
  *  - `find(input, from)` → packed `(tokenEnd << 32) | resumePos`, or
  *    `Sep.NotFound` (-1): locate the next separator occurrence; a
  *    sep-bounded token spans [from, tokenEnd) and parsing resumes at
  *    resumePos (end of the separator match, minus any `(preserve)`
  *    suffix).
  *  - `consumeAt(input, pos)` → new pos or -1: consume one separator
  *    occurrence anchored exactly at `pos` (used after self-delimited
  *    values).
  *
  * The literal path is an `indexOf` fast path (reference benchmarked it at
  * 13 ns/9 B — docs/design/wpl_sep_pattern_bench.md §2.1); glob patterns
  * compile once to a segment list, no regex engine.
  */
trait Sep {
  /** Packed (tokenEnd << 32) | resumePos, or Sep.NotFound. */
  def find(input: String, from: Int): Long
  /** Resume position after a separator anchored at `pos`, or -1. */
  def consumeAt(input: String, pos: Int): Int
}

object Sep {

  final val NotFound: Long = -1L
  @inline def pack(tokenEnd: Int, resume: Int): Long =
    (tokenEnd.toLong << 32) | (resume.toLong & 0xffffffffL)
  @inline def tokenEnd(packed: Long): Int = (packed >>> 32).toInt
  @inline def resume(packed: Long): Int = packed.toInt

  /** Whitespace-run default separator. */
  case object Default extends Sep {
    def find(input: String, from: Int): Long = {
      var i = from
      while (i < input.length && !isWs(input.charAt(i))) i += 1
      if (i >= input.length) NotFound
      else {
        var j = i
        while (j < input.length && isWs(input.charAt(j))) j += 1
        pack(i, j)
      }
    }
    def consumeAt(input: String, pos: Int): Int = {
      if (pos < input.length && isWs(input.charAt(pos))) {
        var j = pos
        while (j < input.length && isWs(input.charAt(j))) j += 1
        j
      } else -1
    }
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'

  /** Literal (shortcut) separator, e.g. `\,` → ",". */
  final case class Lit(s: String) extends Sep {
    def find(input: String, from: Int): Long = {
      val i = input.indexOf(s, from)
      if (i < 0) NotFound else pack(i, i + s.length)
    }
    def consumeAt(input: String, pos: Int): Int =
      if (input.startsWith(s, pos)) pos + s.length else -1
  }

  sealed trait Seg
  final case class L(s: String) extends Seg     // literal run
  case object Star extends Seg                  // * — non-greedy any
  case object Que extends Seg                   // ? — exactly one char
  case object WsRun extends Seg                 // \s — [ \t\r\n]+
  case object NonWsRun extends Seg              // \S — [^ \t\r\n]+
  case object HWsRun extends Seg                // \h — [ \t]+
  case object NonHWsRun extends Seg             // \H — [^ \t]+

  /** Compiled `{pattern}` separator. `preserve` segments are matched but
    * not consumed (resume position backs up to the preserve start). */
  final case class Pattern(segs: Vector[Seg], preserve: Vector[Seg]) extends Sep {

    // hoisted sub-patterns — find()/matchPreserveAt() run per field, so
    // they must not rebuild Pattern objects per call
    @transient private lazy val tailPattern: Pattern = Pattern(segs.drop(1), Vector.empty)
    @transient private lazy val preservePattern: Pattern = Pattern(preserve, Vector.empty)

    /** Match segs at position `p`; returns end position or -1. */
    private def matchAt(input: String, p: Int): Int = {
      def go(segIdx: Int, pos: Int): Int = {
        if (segIdx >= segs.length) pos
        else segs(segIdx) match {
          case L(s) =>
            if (input.startsWith(s, pos)) go(segIdx + 1, pos + s.length) else -1
          case Que =>
            if (pos < input.length) go(segIdx + 1, pos + 1) else -1
          case WsRun => runBacktrack(segIdx, pos, c => isWs(c))
          case NonWsRun => runBacktrack(segIdx, pos, c => !isWs(c))
          case HWsRun => runBacktrack(segIdx, pos, c => c == ' ' || c == '\t')
          case NonHWsRun => runBacktrack(segIdx, pos, c => c != ' ' && c != '\t')
          case Star => // non-greedy: try the rest at every offset
            var i = pos
            while (i <= input.length) {
              val e = go(segIdx + 1, i)
              if (e >= 0) return e
              i += 1
            }
            -1
        }
      }
      // run macros are greedy but backtrack so a following literal can
      // match inside the run (e.g. `\S=` on "b=2": \S takes "b", not "b=2")
      def runBacktrack(segIdx: Int, pos: Int, pred: Char => Boolean): Int = {
        var j = pos
        while (j < input.length && pred(input.charAt(j))) j += 1
        while (j > pos) {
          val e = go(segIdx + 1, j)
          if (e >= 0) return e
          j -= 1
        }
        -1
      }
      go(0, p)
    }

    private def matchPreserveAt(input: String, p: Int): Boolean =
      preserve.isEmpty || preservePattern.matchAt(input, p) >= 0

    /** Full match anchored at p → resume position (preserve not consumed). */
    def consumeAt(input: String, pos: Int): Int = {
      val end = matchAt(input, pos)
      if (end >= 0 && matchPreserveAt(input, end)) end else -1
    }

    def find(input: String, from: Int): Long = {
      if (segs.nonEmpty && (segs.head eq Star)) {
        // leading star: token = what the star swallows; match the tail
        // at each offset (non-greedy)
        var i = from
        while (i <= input.length) {
          val end = tailPattern.matchAt(input, i)
          if (end >= 0 && matchPreserveAt(input, end)) return pack(i, end)
          i += 1
        }
        NotFound
      } else {
        var i = from
        while (i <= input.length) {
          val end = matchAt(input, i)
          if (end >= 0 && matchPreserveAt(input, end)) return pack(i, end)
          i += 1
        }
        NotFound
      }
    }
  }

  /** Parse the inside of a `{...}` pattern into a compiled Pattern. */
  def compilePattern(src: String): Pattern = {
    val segs = Vector.newBuilder[Seg]
    var i = 0
    val lit = new StringBuilder
    var inPreserve = false
    val preSegs = Vector.newBuilder[Seg]
    def emit(s: Seg): Unit = if (inPreserve) preSegs += s else segs += s
    def flushTo(): Unit = {
      if (lit.nonEmpty) { emit(L(lit.toString)); lit.clear() }
    }
    while (i < src.length) {
      src.charAt(i) match {
        case '\\' if i + 1 < src.length =>
          src.charAt(i + 1) match {
            case 's' => flushTo(); emit(WsRun)
            case 'S' => flushTo(); emit(NonWsRun)
            case 'h' => flushTo(); emit(HWsRun)
            case 'H' => flushTo(); emit(NonHWsRun)
            case '0' => lit.append('\u0000')
            case 'n' => lit.append('\n')
            case 't' => lit.append('\t')
            case 'r' => lit.append('\r')
            case c   => lit.append(c) // escaped literal \* \? \{ \} \( \) \\
          }
          i += 2
        case '*' => flushTo(); emit(Star); i += 1
        case '?' => flushTo(); emit(Que); i += 1
        case '(' => flushTo(); inPreserve = true; i += 1
        case ')' => flushTo(); inPreserve = false; i += 1
        case c   => lit.append(c); i += 1
      }
    }
    flushTo()
    Pattern(segs.result(), preSegs.result())
  }
}
