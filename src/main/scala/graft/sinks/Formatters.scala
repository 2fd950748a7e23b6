package graft.sinks

import graft.wpl._

/** Record → line formatters for file/tcp/syslog sinks (reference fmt
  * `json|kv|csv|raw|proto_text`, src/sinks/utils/formatter.rs:25-38).
  * Pure functions: on the Spark side they run as a projection before a
  * text/kafka write (sink-side serialization stays map-only). */
object Formatters {

  def json(fields: Vector[WField]): String =
    fields.map(f => Json.quote(f.name) + ":" + f.value.jval).mkString("{", ",", "}")

  def kv(fields: Vector[WField]): String =
    fields.map(f => s"${f.name}=${f.value.sval}").mkString(" ")

  def csv(fields: Vector[WField]): String =
    fields.map { f =>
      val s = f.value.sval
      if (s.contains(",") || s.contains("\"") || s.contains("\n"))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }.mkString(",")

  /** raw: the copy_raw'd original line if present, else kv fallback. */
  def raw(fields: Vector[WField], rawField: String = "raw_log"): String =
    fields.find(_.name == rawField).map(_.value.sval).getOrElse(kv(fields))

  def protoText(fields: Vector[WField]): String =
    fields.map(f => f.value match {
      case WObj(fs) => s"${f.name} { ${fs.map { case (k, v) => s"$k: ${pbScalar(v)}" }.mkString(" ")} }"
      case v => s"${f.name}: ${pbScalar(v)}"
    }).mkString(" ")

  private def pbScalar(v: WValue): String = v match {
    case WChars(s) => "\"" + s.replace("\"", "\\\"") + "\""
    case WIp(s) => "\"" + s + "\""
    case other => other.sval
  }

  def format(fmt: String, fields: Vector[WField]): String = fmt match {
    case "json" => json(fields)
    case "kv" => kv(fields)
    case "csv" => csv(fields)
    case "raw" => raw(fields)
    case "proto_text" => protoText(fields)
    case other => throw new IllegalArgumentException(s"unknown sink fmt: $other")
  }
}
