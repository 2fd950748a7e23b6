package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Syslog header normalization (reference src/sources/syslog/normalize.rs:
  * 27-207): RFC5424 (`<PRI>VERSION TS HOST APP PROCID MSGID SD MSG`) and
  * RFC3164/BSD (`<PRI>Mmm dd hh:mm:ss host tag: msg`); anything else falls
  * through with the whole line as message. Deterministic scalar function —
  * partition-local, no state. */
object Syslog {

  final case class SyslogHeader(pri: Option[Int], facility: String, severity: String,
                                host: String, app: String, message: String)

  private val facilities = Array("kern", "user", "mail", "daemon", "auth", "syslog",
    "lpr", "news", "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "alert",
    "clock", "local0", "local1", "local2", "local3", "local4", "local5", "local6", "local7")
  private val severities = Array("emerg", "alert", "crit", "err", "warning",
    "notice", "info", "debug")

  def facilityName(pri: Int): String = {
    val f = pri / 8
    if (f < facilities.length) facilities(f) else s"facility$f"
  }
  def severityName(pri: Int): String = severities(pri % 8)

  private val months = Set("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
    "Aug", "Sep", "Oct", "Nov", "Dec")

  def normalize(line: String): SyslogHeader = {
    if (line == null || line.isEmpty || line.charAt(0) != '<')
      return SyslogHeader(None, null, null, null, null, line)
    val close = line.indexOf('>')
    if (close <= 1 || close > 4 || !line.substring(1, close).forall(_.isDigit))
      return SyslogHeader(None, null, null, null, null, line)
    val pri = line.substring(1, close).toInt
    if (pri > 191) return SyslogHeader(None, null, null, null, null, line)
    val rest = line.substring(close + 1)
    // RFC5424: VERSION SP TIMESTAMP SP HOSTNAME SP APP ...
    if (rest.length > 2 && rest.charAt(0).isDigit && rest.charAt(1) == ' ') {
      val parts = rest.split(" ", 7)
      if (parts.length >= 7) {
        val msgIdx = {
          // skip SD: either '-' or bracketed blocks
          val sd = parts(6)
          if (sd.startsWith("- ")) sd.substring(2)
          else if (sd.startsWith("-")) sd.drop(1).dropWhile(_ == ' ')
          else {
            var i = 0; var depth = 0; var end = -1
            while (i < sd.length && end < 0) {
              sd.charAt(i) match {
                case '[' => depth += 1
                case ']' => depth -= 1; if (depth == 0 && (i + 1 >= sd.length || sd.charAt(i + 1) != '[')) end = i + 1
                case _ =>
              }
              i += 1
            }
            if (end < 0) sd else sd.substring(end).dropWhile(_ == ' ')
          }
        }
        return SyslogHeader(Some(pri), facilityName(pri), severityName(pri),
          parts(2), parts(3), msgIdx)
      }
    }
    // RFC3164: Mmm dd hh:mm:ss host tag: msg
    if (rest.length > 16 && months.contains(rest.substring(0, 3))) {
      val afterTs = 15 // "Mmm dd hh:mm:ss"
      if (rest.length > afterTs && rest.charAt(afterTs) == ' ') {
        val r2 = rest.substring(afterTs + 1)
        val sp = r2.indexOf(' ')
        if (sp > 0) {
          val host = r2.substring(0, sp)
          val tail = r2.substring(sp + 1)
          val colon = tail.indexOf(':')
          val (app, msg) =
            if (colon > 0 && colon < 48) (tail.substring(0, colon),
              tail.substring(colon + 1).dropWhile(_ == ' '))
            else (null, tail)
          return SyslogHeader(Some(pri), facilityName(pri), severityName(pri), host, app, msg)
        }
      }
    }
    SyslogHeader(Some(pri), facilityName(pri), severityName(pri), null, null, rest)
  }

  val normalizeUdf = udf((line: String) => normalize(line))
  def parseSyslog(c: Column): Column = normalizeUdf(c)
}
