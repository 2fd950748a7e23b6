package graft.sources

import scala.collection.mutable.ArrayBuffer

/** TCP stream framing (reference src/sources/tcp/framing.rs:23-60):
  * `Auto | Line | Len` where Len is RFC6587 octet-counting
  * (`"<len> <payload>"`), Line is newline-delimited, and Auto detects
  * octet-count framing by a leading digit run + space.
  *
  * This is the only real logic behind the reference's tcp/syslog daemon
  * sources (SURVEY.md §2.1); a DSv2 MicroBatchStream source would wrap
  * this splitter around a socket buffer. Pure function over an input
  * buffer → (complete frames, remaining bytes). */
object Framing {

  sealed trait Mode
  case object Auto extends Mode
  case object Line extends Mode
  case object Len extends Mode

  /** Detect RFC6587 octet-count framing: 1-5 digits then a space
    * (reference framing.rs:37-60). */
  def looksOctetCounted(buf: Array[Byte]): Boolean = {
    var i = 0
    while (i < buf.length && i < 5 && buf(i) >= '0' && buf(i) <= '9') i += 1
    i > 0 && i < buf.length && buf(i) == ' '
  }

  /** Split a buffer into complete frames + unconsumed remainder. */
  def split(buf: Array[Byte], mode: Mode): (Vector[String], Array[Byte]) = {
    val effective = mode match {
      case Auto => if (looksOctetCounted(buf)) Len else Line
      case m => m
    }
    effective match {
      case Line | Auto =>
        val frames = Vector.newBuilder[String]
        var start = 0
        var i = 0
        while (i < buf.length) {
          if (buf(i) == '\n') {
            val end = if (i > start && buf(i - 1) == '\r') i - 1 else i
            frames += new String(buf, start, end - start, "UTF-8")
            start = i + 1
          }
          i += 1
        }
        (frames.result(), java.util.Arrays.copyOfRange(buf, start, buf.length))
      case Len =>
        val frames = Vector.newBuilder[String]
        var pos = 0
        var ok = true
        while (ok && pos < buf.length) {
          var i = pos
          var len = 0
          while (i < buf.length && buf(i) >= '0' && buf(i) <= '9') {
            len = len * 10 + (buf(i) - '0'); i += 1
          }
          if (i == pos || i >= buf.length || buf(i) != ' ') ok = false
          else {
            val start = i + 1
            if (start + len > buf.length) ok = false // incomplete frame
            else {
              frames += new String(buf, start, len, "UTF-8")
              pos = start + len
            }
          }
        }
        (frames.result(), java.util.Arrays.copyOfRange(buf, pos, buf.length))
    }
  }
}
