package graft.sinks

import graft.wpl._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Record → line formatters for file/tcp/syslog sinks (reference fmt
  * `json|kv|csv|raw|proto_text`, src/sinks/utils/formatter.rs:25-38).
  * Pure functions: on the Spark side they run as a projection before a
  * text/kafka write (sink-side serialization stays map-only). */
object Formatters {

  /** Native-Column formatter over a pipeline `fields` column
    * (array<struct<name, dtype, sval>>) — the dtype-aware twin of the
    * pure functions below, shared by the project sink path, `wparse
    * batch`'s channel writer and the kafka wrapper so every surface
    * emits TYPED json (`"st":200`, not `"st":"200"` — reference
    * src/sinks/utils/formatter.rs:27 serializes the typed Value).
    * Whole-stage-codegen'd: no UDF, no WValue rebuild per row.
    *
    * Documented divergence (same as the pure-path note in ProjectRun):
    * the reference re-renders from its typed in-memory Value, so a
    * `time` field emits its raw text there but its epoch-micros sval
    * here, and proto_text does not re-nest `obj` svals. */
  def line(fmt: String, fields: Column): Column = fmt match {
    case "json" =>
      val item = (f: Column) => concat(
        graft.engine.WplEngine.jsonQuote(f.getField("name")), lit(":"),
        when(f.getField("dtype").isin("digit", "float", "bool", "obj", "array"),
          f.getField("sval"))
          .when(f.getField("dtype") === "null", lit("null"))
          .otherwise(graft.engine.WplEngine.jsonQuote(f.getField("sval"))))
      concat(lit("{"), array_join(transform(fields, item), ","), lit("}"))
    case "kv" =>
      array_join(transform(fields, f =>
        concat(f.getField("name"), lit("="), f.getField("sval"))), " ")
    case "csv" =>
      array_join(transform(fields, f => {
        val s = f.getField("sval")
        when(s.contains(",") || s.contains("\"") || s.contains("\n"),
          concat(lit("\""), replace(s, lit("\""), lit("\"\"")), lit("\"")))
          .otherwise(s)
      }), ",")
    case "raw" =>
      coalesce(
        try_element_at(filter(fields, f => f.getField("name") === "raw_log"), lit(1))
          .getField("sval"),
        array_join(transform(fields, f =>
          concat(f.getField("name"), lit("="), f.getField("sval"))), " "))
    case "proto_text" =>
      array_join(transform(fields, f =>
        concat(f.getField("name"), lit(": "),
          when(f.getField("dtype").isin("digit", "float", "bool"), f.getField("sval"))
            .otherwise(concat(lit("\""),
              replace(f.getField("sval"), lit("\""), lit("\\\"")), lit("\""))))), " ")
    case other => throw new IllegalArgumentException(s"unknown sink fmt: $other")
  }

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
