package graft.sources

import java.util
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 streaming sources for daemon mode (reference src/sources/tcp +
  * src/sources/syslog): a TCP listener with Auto/Line/Len (RFC6587)
  * framing and a syslog UDP datagram receiver.
  *
  * Design notes (mirroring the reference's own decisions):
  *  - single reader per port (the reference explicitly rejected
  *    SO_REUSEPORT multi-instance — docs/dar/udp_reuseport.md:7); the
  *    listener lives on the driver, frames are buffered with monotonically
  *    increasing offsets and shipped to executors per micro-batch. This is
  *    the right shape for a push protocol: parallelism comes AFTER the
  *    accept point, from the parse stage over the batch.
  *  - per-connection client-ip tag rides along as a column (reference
  *    conn/connection.rs).
  *
  * Usage:
  *   spark.readStream.format("graft-tcp").option("port","5140")
  *     .option("framing","auto").load()
  *   spark.readStream.format("graft-syslog-udp").option("port","5141").load()
  */
object NetSources {
  val schema: StructType = StructType(Seq(
    StructField("value", StringType),
    StructField("client_ip", StringType)))

  final case class Frame(value: String, clientIp: String)

  /** Driver-side frame buffer with absolute offsets.
    *
    * Bounded: `evictTo` (called on micro-batch commit) drops frames below
    * the committed offset, so steady-state memory is one in-flight batch,
    * not the whole ingest history. `base` tracks the absolute offset of
    * the first retained frame; `slice` clamps requests that predate the
    * buffer (checkpoint restart replaying offsets from a previous process)
    * instead of throwing. */
  final class FrameBuffer {
    private val frames = new java.util.ArrayDeque[Frame]()
    private var base = 0L

    def append(f: Frame): Unit = synchronized { frames.addLast(f) }
    def size: Long = synchronized { base + frames.size }
    /** Frames currently held in memory (for tests / metrics). */
    def retained: Int = synchronized { frames.size }

    /** Drop frames with absolute offset < `offset` (commit point). */
    def evictTo(offset: Long): Unit = synchronized {
      while (base < offset && !frames.isEmpty) { frames.pollFirst(); base += 1 }
    }

    /** On restart, checkpointed offsets from the previous process index an
      * empty buffer; rebase so new appends continue past them and the
      * stream's offsets stay monotonic. */
    def rebaseIfEmpty(offset: Long): Unit = synchronized {
      if (frames.isEmpty && offset > base) base = offset
    }

    def slice(from: Long, until: Long): Array[Frame] = synchronized {
      val lo = math.max(from, base)
      val hi = math.min(until, base + frames.size)
      if (hi <= lo) return Array.empty
      val out = new Array[Frame]((hi - lo).toInt)
      val it = frames.iterator()
      var pos = base
      var i = 0
      while (pos < hi) {
        val f = it.next()
        if (pos >= lo) { out(i) = f; i += 1 }
        pos += 1
      }
      out
    }
  }

  case class LongOffset(value: Long) extends Offset {
    override def json(): String = value.toString
  }
}

// ---------------------------------------------------------------------------
// TCP
// ---------------------------------------------------------------------------

class TcpSourceProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-tcp"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = NetSources.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new NetTable("graft-tcp", props => new TcpStream(
      props.getOrDefault("port", "5140").toInt,
      props.getOrDefault("framing", "auto")), properties)
}

class SyslogUdpSourceProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-syslog-udp"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = NetSources.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new NetTable("graft-syslog-udp", props => new UdpStream(
      props.getOrDefault("port", "5141").toInt), properties)
}

/** Dedicated syslog-over-TCP source (reference src/sources/syslog/
  * tcp_source.rs): RFC6587 auto framing (octet-count vs LF detected per
  * buffer) like graft-tcp, plus syslog transport edge cases — trailing
  * NUL terminators (RFC6587 §3.4.2 legacy senders) and CR remnants are
  * stripped from each frame. Default port 6514. */
class SyslogTcpSourceProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-syslog-tcp"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = NetSources.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new NetTable("graft-syslog-tcp", props => new TcpStream(
      props.getOrDefault("port", "6514").toInt,
      props.getOrDefault("framing", "auto"),
      trimFrames = true), properties)
}

class NetTable(sourceName: String,
               mkStream: util.Map[String, String] => MicroBatchStream,
               properties: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = sourceName
  override def schema(): StructType = NetSources.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = NetSources.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          mkStream(properties)
      }
    }
}

/** TCP listener stream: accept loop + per-connection reader threads feed
  * the frame buffer through `Framing.split`. */
class TcpStream(port: Int, framingMode: String,
                trimFrames: Boolean = false) extends MicroBatchStream {
  import NetSources._

  private val buf = new FrameBuffer
  /** Frames currently held on the driver (tests / metrics). */
  def bufferedFrames: Int = buf.retained
  @volatile private var server: java.net.ServerSocket = _

  private val mode = framingMode match {
    case "line" => Framing.Line
    case "len" => Framing.Len
    case _ => Framing.Auto
  }

  /** syslog transport hygiene: legacy senders NUL-terminate frames and
    * CRLF remnants survive LF framing (tcp_source.rs edge cases). */
  private def trim(f: String): String =
    if (!trimFrames) f
    else {
      var end = f.length
      while (end > 0 && { val c = f.charAt(end - 1); c == '\u0000' || c == '\r' || c == '\n' }) end -= 1
      if (end == f.length) f else f.substring(0, end)
    }

  private def ensureStarted(): Unit = synchronized {
    if (server == null) {
      server = new java.net.ServerSocket(port)
      val acceptor = new Thread(() => {
        try {
          while (!server.isClosed) {
            val sock = server.accept()
            val clientIp = sock.getInetAddress.getHostAddress
            new Thread(() => {
              val in = sock.getInputStream
              var pending = Array.empty[Byte]
              val chunk = new Array[Byte](8192)
              var n = in.read(chunk)
              while (n >= 0) {
                pending = pending ++ chunk.take(n)
                val (frames, rest) = Framing.split(pending, mode)
                frames.foreach(f => buf.append(Frame(trim(f), clientIp)))
                pending = rest
                n = in.read(chunk)
              }
              // flush a trailing unterminated line on close
              if (pending.nonEmpty && mode != Framing.Len)
                buf.append(Frame(trim(new String(pending, "UTF-8")), clientIp))
              sock.close()
            }, s"graft-tcp-conn-$clientIp").start()
          }
        } catch { case _: java.io.IOException => /* closed */ }
      }, s"graft-tcp-accept-$port")
      acceptor.setDaemon(true)
      acceptor.start()
    }
  }

  override def latestOffset(): Offset = { ensureStarted(); LongOffset(buf.size) }
  override def initialOffset(): Offset = { ensureStarted(); LongOffset(0L) }
  override def deserializeOffset(json: String): Offset = {
    val v = json.toLong
    buf.rebaseIfEmpty(v)
    LongOffset(v)
  }
  override def commit(end: Offset): Unit =
    buf.evictTo(end.asInstanceOf[LongOffset].value)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LongOffset].value
    val e = end.asInstanceOf[LongOffset].value
    Array(FramesPartition(buf.slice(s, e)))
  }
  override def createReaderFactory(): PartitionReaderFactory = FramesReaderFactory
  override def stop(): Unit = if (server != null) server.close()
}

/** Syslog UDP stream: one datagram = one frame (reference udp_source.rs). */
class UdpStream(port: Int) extends MicroBatchStream {
  import NetSources._

  private val buf = new FrameBuffer
  @volatile private var socket: java.net.DatagramSocket = _

  private def ensureStarted(): Unit = synchronized {
    if (socket == null) {
      socket = new java.net.DatagramSocket(port)
      val reader = new Thread(() => {
        val pkt = new java.net.DatagramPacket(new Array[Byte](65535), 65535)
        try {
          while (!socket.isClosed) {
            socket.receive(pkt)
            buf.append(Frame(new String(pkt.getData, 0, pkt.getLength, "UTF-8"),
              pkt.getAddress.getHostAddress))
          }
        } catch { case _: java.io.IOException => /* closed */ }
      }, s"graft-udp-$port")
      reader.setDaemon(true)
      reader.start()
    }
  }

  override def latestOffset(): Offset = { ensureStarted(); LongOffset(buf.size) }
  override def initialOffset(): Offset = { ensureStarted(); LongOffset(0L) }
  override def deserializeOffset(json: String): Offset = {
    val v = json.toLong
    buf.rebaseIfEmpty(v)
    LongOffset(v)
  }
  override def commit(end: Offset): Unit =
    buf.evictTo(end.asInstanceOf[NetSources.LongOffset].value)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[NetSources.LongOffset].value
    val e = end.asInstanceOf[NetSources.LongOffset].value
    Array(FramesPartition(buf.slice(s, e)))
  }
  override def createReaderFactory(): PartitionReaderFactory = FramesReaderFactory
  override def stop(): Unit = if (socket != null) socket.close()
}

final case class FramesPartition(frames: Array[NetSources.Frame]) extends InputPartition

object FramesReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val frames = partition.asInstanceOf[FramesPartition].frames
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < frames.length }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(frames(i).value),
        UTF8String.fromString(frames(i).clientIp))
      override def close(): Unit = ()
    }
  }
}
