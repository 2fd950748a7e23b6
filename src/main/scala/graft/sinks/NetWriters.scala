package graft.sinks

import org.apache.spark.sql.{ForeachWriter, Row}

/** Network sink writers (reference backends/tcp.rs, backends/syslog.rs):
  * `ForeachWriter` implementations for streaming writes — one connection
  * per partition per epoch, line or length-prefixed framing, bounded
  * retry with backoff (reference reconnection/probe logic). */
object NetWriters {

  /** TCP line sink. framing "line" appends \n; "len" prefixes RFC6587
    * octet count. */
  final class TcpLineWriter(host: String, port: Int, framing: String = "line",
                            maxRetries: Int = 3, backoffMs: Long = 200L)
      extends ForeachWriter[String] {
    @transient private var socket: java.net.Socket = _
    @transient private var out: java.io.OutputStream = _

    override def open(partitionId: Long, epochId: Long): Boolean = {
      var attempt = 0
      while (socket == null && attempt <= maxRetries) {
        try {
          socket = new java.net.Socket(host, port)
          out = new java.io.BufferedOutputStream(socket.getOutputStream)
        } catch {
          case _: java.io.IOException =>
            attempt += 1
            if (attempt > maxRetries) return false
            Thread.sleep(backoffMs * attempt)
        }
      }
      true
    }

    override def process(value: String): Unit = {
      val payload = framing match {
        case "len" => s"${value.getBytes("UTF-8").length} $value"
        case _ => value + "\n"
      }
      out.write(payload.getBytes("UTF-8"))
    }

    override def close(errorOrNull: Throwable): Unit = {
      if (out != null) out.flush()
      if (socket != null) socket.close()
    }
  }

  /** Syslog UDP datagram sink: one datagram per record with the RFC3164
    * header prepended (reference backends/syslog.rs). */
  final class SyslogUdpWriter(host: String, port: Int, facility: Int = 16,
                              severity: Int = 6, tag: String = "graft")
      extends ForeachWriter[String] {
    @transient private var socket: java.net.DatagramSocket = _
    @transient private var addr: java.net.InetAddress = _

    override def open(partitionId: Long, epochId: Long): Boolean = {
      socket = new java.net.DatagramSocket()
      addr = java.net.InetAddress.getByName(host)
      true
    }

    override def process(value: String): Unit = {
      val pri = facility * 8 + severity
      val ts = java.time.format.DateTimeFormatter.ofPattern("MMM dd HH:mm:ss")
        .withLocale(java.util.Locale.US)
        .format(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))
      val msg = s"<$pri>$ts localhost $tag: $value".getBytes("UTF-8")
      socket.send(new java.net.DatagramPacket(msg, msg.length, addr, port))
    }

    override def close(errorOrNull: Throwable): Unit =
      if (socket != null) socket.close()
  }
}
