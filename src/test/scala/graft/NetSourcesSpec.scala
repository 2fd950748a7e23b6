package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** End-to-end tests for the DSv2 TCP / syslog-UDP streaming sources. */
class NetSourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    val p = s.getLocalPort; s.close(); p
  }

  test("graft-tcp source receives line-framed data with client ip") {
    val port = freePort()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tcp-ck").toString
    val df = spark.readStream.format("graft-tcp")
      .option("port", port.toString).option("framing", "line").load()
    val q = df.writeStream.format("memory").queryName("tcp_out")
      .option("checkpointLocation", ckpt).start()
    // let the listener bind (first latestOffset call starts it)
    Thread.sleep(1500)
    val sock = new java.net.Socket("127.0.0.1", port)
    sock.getOutputStream.write("hello one\nhello two\n".getBytes)
    sock.getOutputStream.flush()
    sock.close()
    Thread.sleep(500)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tcp_out").collect()
    assert(rows.map(_.getString(0)).toSet == Set("hello one", "hello two"))
    assert(rows.forall(_.getString(1) == "127.0.0.1"))
  }

  test("graft-tcp source with RFC6587 octet-count framing") {
    val port = freePort()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tcp6587-ck").toString
    val df = spark.readStream.format("graft-tcp")
      .option("port", port.toString).option("framing", "len").load()
    val q = df.writeStream.format("memory").queryName("tcp6587_out")
      .option("checkpointLocation", ckpt).start()
    Thread.sleep(1500)
    val sock = new java.net.Socket("127.0.0.1", port)
    sock.getOutputStream.write("5 alpha4 beta".getBytes)
    sock.getOutputStream.flush()
    sock.close()
    Thread.sleep(500)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("tcp6587_out").collect().map(_.getString(0)).toSet ==
      Set("alpha", "beta"))
  }

  test("frame buffer evicts on commit and clamps stale restart offsets") {
    import graft.sources.NetSources.{Frame, FrameBuffer}
    val buf = new FrameBuffer
    (0 until 100).foreach(i => buf.append(Frame(s"m$i", "ip")))
    assert(buf.size == 100 && buf.retained == 100)
    // micro-batch [0,60) committed → frames below 60 are dropped
    buf.evictTo(60)
    assert(buf.retained == 40)
    assert(buf.size == 100) // absolute offsets keep counting
    // slice after eviction still serves the retained window
    assert(buf.slice(60, 100).map(_.value).head == "m60")
    // a stale range that predates the buffer clamps instead of throwing
    assert(buf.slice(0, 60).isEmpty)
    assert(buf.slice(50, 70).map(_.value).toSeq == (60 until 70).map(i => s"m$i"))
    // restart: checkpointed offset 100 lands on an empty buffer → rebase
    buf.evictTo(100)
    assert(buf.retained == 0)
    val fresh = new FrameBuffer
    fresh.rebaseIfEmpty(100)
    fresh.append(Frame("post-restart", "ip"))
    assert(fresh.size == 101)
    assert(fresh.slice(100, 101).map(_.value).toSeq == Seq("post-restart"))
  }

  test("tcp stream buffer shrinks after commit under sustained send") {
    import graft.sources.{TcpStream, NetSources}
    val port = freePort()
    val stream = new TcpStream(port, "line")
    try {
      stream.initialOffset() // starts the listener
      Thread.sleep(500)
      val sock = new java.net.Socket("127.0.0.1", port)
      (0 until 500).foreach(i => sock.getOutputStream.write(s"line $i\n".getBytes))
      sock.getOutputStream.flush()
      sock.close()
      val deadline = System.currentTimeMillis() + 5000
      def latest(): Long =
        stream.latestOffset().asInstanceOf[NetSources.LongOffset].value
      while (latest() < 500 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(latest() == 500)
      assert(stream.bufferedFrames == 500)
      // micro-batch cycle: plan [0,500), then commit → buffer trimmed
      val parts = stream.planInputPartitions(
        NetSources.LongOffset(0), NetSources.LongOffset(500))
      assert(parts.length == 1)
      stream.commit(NetSources.LongOffset(500))
      assert(stream.bufferedFrames == 0)
      // offsets stay monotonic after eviction
      assert(latest() == 500)
    } finally stream.stop()
  }

  test("graft-syslog-tcp source: NUL-terminated + CRLF frames normalized") {
    val port = freePort()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-systcp-ck").toString
    val df = spark.readStream.format("graft-syslog-tcp")
      .option("port", port.toString).load()
    val q = df.writeStream.format("memory").queryName("systcp_out")
      .option("checkpointLocation", ckpt).start()
    Thread.sleep(1500)
    val sock = new java.net.Socket("127.0.0.1", port)
    // legacy sender: NUL-terminated frame, CRLF line ending, plain LF
    sock.getOutputStream.write("<34>Oct 11 22:14:15 h app: one\u0000\n".getBytes)
    sock.getOutputStream.write("<34>Oct 11 22:14:16 h app: two\r\n".getBytes)
    sock.getOutputStream.write("<34>Oct 11 22:14:17 h app: three\n".getBytes)
    sock.getOutputStream.flush()
    sock.close()
    Thread.sleep(500)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("systcp_out").collect().map(_.getString(0)).toSet
    assert(got == Set(
      "<34>Oct 11 22:14:15 h app: one",
      "<34>Oct 11 22:14:16 h app: two",
      "<34>Oct 11 22:14:17 h app: three"))
  }

  test("graft-syslog-udp source receives datagrams") {
    val port = freePort()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-udp-ck").toString
    val df = spark.readStream.format("graft-syslog-udp")
      .option("port", port.toString).load()
    val q = df.writeStream.format("memory").queryName("udp_out")
      .option("checkpointLocation", ckpt).start()
    Thread.sleep(1500)
    val sock = new java.net.DatagramSocket()
    val msg = "<34>Oct 11 22:14:15 host app: boom".getBytes
    sock.send(new java.net.DatagramPacket(msg, msg.length,
      java.net.InetAddress.getByName("127.0.0.1"), port))
    sock.close()
    Thread.sleep(500)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("udp_out").collect()
    assert(got.length == 1)
    assert(got(0).getString(0).contains("boom"))
  }
}
