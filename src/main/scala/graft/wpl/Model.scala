package graft.wpl

import scala.collection.mutable.ArrayBuffer

/** Typed value ADT mirroring the reference's `wp-model-core::Value`
  * (usage census in SURVEY.md §1.2). Pure Scala — usable inside
  * mapPartitions without Spark deps. */
sealed trait WValue {
  /** Canonical string form (used for the generic `sval` column). */
  def sval: String = this match {
    case WChars(s)     => s
    case WDigit(v)     => v.toString
    case WFloat(v)     => v.toString
    case WBool(v)      => v.toString
    case WTime(us, _)  => us.toString // epoch micros
    case WIp(s)        => s
    case WIpNet(s)     => s
    case WBytes(b)     => java.util.Base64.getEncoder.encodeToString(b)
    case WObj(fs)      => fs.map { case (k, v) => Json.quote(k) + ":" + v.jval }
                            .mkString("{", ",", "}")
    case WArr(xs)      => xs.map(_.jval).mkString("[", ",", "]")
    case WNull         => ""
    case WIgnore       => ""
    case WDecoded(_, _, d) => d
  }
  /** JSON-encoded form (for nested obj/array serialization). */
  def jval: String = this match {
    case WChars(s) => Json.quote(s)
    case WIp(s)    => Json.quote(s)
    case WIpNet(s) => Json.quote(s)
    case WTime(us, raw) => Json.quote(raw)
    case WNull | WIgnore => "null"
    case o: WObj   => o.sval
    case a: WArr   => a.sval
    case d: WDecoded => Json.quote(d.decoded)
    case v         => v.sval
  }
  def dtype: String = this match {
    case _: WChars => "chars"; case _: WDigit => "digit"; case _: WFloat => "float"
    case _: WBool => "bool"; case _: WTime => "time"; case _: WIp => "ip"
    case _: WIpNet => "ip_net"; case _: WBytes => "bytes"; case _: WObj => "obj"
    case _: WArr => "array"; case WNull => "null"; case WIgnore => "ignore"
    case d: WDecoded => d.encoding
  }
}
final case class WChars(s: String) extends WValue
final case class WDigit(v: Long) extends WValue
final case class WFloat(v: Double) extends WValue
final case class WBool(v: Boolean) extends WValue
/** Naive timestamp in epoch micros (UTC unless the text carried an offset,
  * in which case it has been normalized to UTC). `raw` keeps the input. */
final case class WTime(micros: Long, raw: String) extends WValue
final case class WIp(s: String) extends WValue
final case class WIpNet(s: String) extends WValue
final case class WBytes(b: Array[Byte]) extends WValue
/** Decoded-content value: the parser decoded `raw` (base64/hex) and the
  * DECODED form is the value, tagged with its source encoding (reference
  * protocol/base64.rs stores the decoded string under DataType::Base64;
  * base/hex.rs parses the numeric value). */
final case class WDecoded(encoding: String, raw: String, decoded: String) extends WValue
final case class WObj(fields: Vector[(String, WValue)]) extends WValue
final case class WArr(items: Vector[WValue]) extends WValue
case object WNull extends WValue
case object WIgnore extends WValue

object Json {
  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.append('"').toString
  }
}

/** One named field. Duplicate names allowed; order preserved
  * (reference: DataRecord, crates/wp-lang/src/eval/runtime/vm_unit.rs:230-248). */
final case class WField(name: String, value: WValue)

/** Parse outcome of one line against a rule set
  * (reference: src/core/parser/wpl_engine/processor.rs:16-67). */
sealed trait ParseOutcome
final case class PSuccess(ruleKey: String, fields: Vector[WField]) extends ParseOutcome
final case class PPartial(ruleKey: String, fields: Vector[WField], residue: String) extends ParseOutcome
final case class PMiss(bestRule: String, depth: Int) extends ParseOutcome
case object PBlank extends ParseOutcome // whitespace-only line, silently dropped

/** Mutable parse cursor over one line. */
final class Cursor(val input: String, var pos: Int = 0) {
  @inline def len: Int = input.length
  @inline def atEnd: Boolean = pos >= input.length
  @inline def remaining: Int = input.length - pos
  @inline def peek: Char = input.charAt(pos)
  @inline def rest: String = input.substring(pos)
  def mark: Int = pos
  def reset(m: Int): Unit = pos = m
}

/** Record under construction during a rule match. */
final class RecBuilder {
  val fields = new ArrayBuffer[WField]()
  /** index of the "active" field for pipe functions (take/last). */
  var active: Int = -1
  def add(name: String, v: WValue): Unit = {
    if (v ne WIgnore) { fields += WField(name, v); active = fields.length - 1 }
  }
  /** first-match name lookup (reference record.field(key), processor.rs:84). */
  def find(name: String): Option[WField] = fields.find(_.name == name)
  def findIdx(name: String): Int = fields.indexWhere(_.name == name)
  /** ArrayBuffer.toVector iterates through a mutation-CHECKED view
    * (ArrayBufferView + CheckedIterator allocation and a check per
    * element) — measured ~15% of leaf samples on the parse hot path.
    * Copy to a raw array first (bounds-checked apply only), then build
    * the Vector from the wrapped array's unchecked iterator. */
  def result: Vector[WField] = {
    val n = fields.length
    val arr = new Array[WField](n)
    var i = 0
    while (i < n) { arr(i) = fields(i); i += 1 }
    Vector.from(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
  }
}
