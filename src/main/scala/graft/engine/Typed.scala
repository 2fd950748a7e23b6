package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Typed Dataset[T] façade over the parse engine — for pipelines where a
  * rule's output schema is fixed and compile-time field checks pay off
  * (the `Dataset[T]` side of the DataFrame/Dataset guidance). The parse
  * itself stays the codegen parse_wpl expression; `as[T]` only adds the
  * typed boundary at the edge. */
object Typed {

  /** The canonical nginx access-log record (rule F1). */
  final case class NginxAccess(
      sip: String,
      recv_time: java.sql.Timestamp,
      method: String,
      uri: String,
      status: Long,
      bytes: Long,
      referer: String,
      agent: String)

  val nginxWpl: String =
    """package /example/simple {
       rule nginx {
        (ip:sip,2*_,time:recv_time<[,]>,http/request",http/status,digit,chars",http/agent",_")
       }
      }"""

  /** Dataset[String] of raw lines → Dataset[NginxAccess] (drops
    * miss/partial rows; route them via WplEngine side outputs first if
    * they need a rescue channel). */
  def parseNginx(lines: Dataset[String]): Dataset[NginxAccess] = {
    val parsed = WplEngine.parse(lines.toDF("line"), "line", nginxWpl)
    WplEngine.successes(parsed).select(
      WplEngine.extractString("sip").as("sip"),
      WplEngine.extractTimestamp("recv_time").as("recv_time"),
      WplEngine.extractJsonField("http/request", "method").as("method"),
      WplEngine.extractJsonField("http/request", "uri").as("uri"),
      WplEngine.extractLong("http/status").as("status"),
      WplEngine.extractLong("digit").as("bytes"),
      WplEngine.extractString("chars").as("referer"),
      WplEngine.extractString("http/agent").as("agent"))
      .as(Encoders.product[NginxAccess])
  }
}
