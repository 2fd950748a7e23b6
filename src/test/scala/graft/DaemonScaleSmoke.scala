package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path}

/** Daemon soak/scale smoke (Test/runMain graft.DaemonScaleSmoke [scale]):
  *
  *  1. file-tail at rate: 40·scale drip files × 5k lines through
  *     `runStream` (maxFilesPerTrigger forces multiple micro-batches),
  *     with a checkpoint STOP/RESTART mid-run — asserts exactly-once
  *     sink rows (idempotent per-batch sink dirs: a replayed batch
  *     overwrites itself) and that multiple batches actually ran;
  *  2. net-source boundedness: 100k·scale frames through a TcpStream
  *     under sustained commit cycles — asserts the FrameBuffer retains
  *     only the un-committed window (evict-on-commit), never the whole
  *     stream.
  *
  * The optional scale arg (default 1) multiplies both legs; scale=10
  * (2M file lines, 1M net frames) is the soak configuration — the
  * boundedness/exactly-once assertions are scale-invariant, so any
  * leak or replay shows up as a hard failure, not a slowdown. */
object DaemonScaleSmoke {

  private def write(root: Path, rel: String, content: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"))
  }

  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- leg 1: file-tail daemon with checkpoint restart ----
    val root = Files.createTempDirectory("graft-daemon-soak")
    write(root, "conf/wparse.toml",
      """version = "1.0"
        |[models]
        |wpl = "./wpl"
        |oml = "./oml"
        |[topology]
        |sources = "./topology/sources"
        |sinks = "./topology/sinks"
        |""".stripMargin)
    write(root, "wpl/parse.wpl", "package /s { rule kv { (kvarr) } }")
    write(root, "oml/m.oml",
      """name : m
        |rule : /s/*
        |---
        |user : chars = take(option:[user]) ;
        |* = take() ;
        |""".stripMargin)
    // the source watches a DIRECTORY so files can drip in
    write(root, "topology/sources/wpsrc.toml",
      """[[source_file]]
        |key = "drip"
        |path = "./src_dat"
        |enable = true
        |""".stripMargin)
    write(root, "topology/sinks/business.d/all.toml",
      """[sink_group]
        |name = "all"
        |oml = ["*"]
        |[[sink_group.sinks]]
        |name = "all_file"
        |target = "file"
        |fmt = "kv"
        |path = "./out/all.dat"
        |""".stripMargin)
    Files.createDirectories(root.resolve("src_dat"))

    val linesPerFile = 5000
    val filesPerPhase = 20 * scale
    def drip(phase: Int): Unit =
      (0 until filesPerPhase).foreach { i =>
        val body = (0 until linesPerFile)
          .map(j => s"user=u${phase}_${i}_$j st=${200 + j % 5} op=w")
          .mkString("\n")
        write(root, f"src_dat/in_p${phase}_f$i%02d.dat", body)
      }

    val p = graft.project.Project.load(root.toString)
    val t0 = System.nanoTime()
    drip(0)
    val q1 = graft.project.ProjectRun.runStream(spark, p, triggerMs = 50L)
    q1.processAllAvailable()
    q1.stop() // mid-run stop: checkpoint holds the processed-file log

    drip(1) // more files arrive while the daemon is down
    val q2 = graft.project.ProjectRun.runStream(spark, p, triggerMs = 50L)
    q2.processAllAvailable()
    q2.stop()
    val secs = (System.nanoTime() - t0) / 1e9

    val total = filesPerPhase * 2 * linesPerFile
    val sink = graft.project.ProjectRun.readSinkLines(
      root.resolve("out/all.dat").toFile)
    val batchDirs = Option(root.resolve("out/all.dat.d").toFile.listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("batch="))
    println(f"DAEMON-SOAK files: $total%d lines in $secs%.1f s across " +
      f"$batchDirs%d batches (restart mid-run)")
    assert(sink.size == total,
      s"exactly-once violated: sink=${sink.size} expected=$total")
    assert(sink.distinct.size == total, "duplicate rows in sink")
    assert(batchDirs >= 2, s"expected multiple micro-batches, got $batchDirs")

    // ---- leg 2: net-source FrameBuffer boundedness under load ----
    import graft.sources.{NetSources, TcpStream}
    val port = {
      val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort finally ss.close()
    }
    val stream = new TcpStream(port, "line")
    try {
      stream.initialOffset()
      Thread.sleep(300)
      val nFrames = 100000 * scale
      val batch = 5000
      val sock = new java.net.Socket("127.0.0.1", port)
      val os = new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16)
      var sent = 0L
      var committed = 0L
      var maxRetained = 0
      def latest(): Long =
        stream.latestOffset().asInstanceOf[NetSources.LongOffset].value
      while (sent < nFrames) {
        (0 until batch).foreach { i => os.write(s"frame ${sent + i}\n".getBytes) }
        os.flush()
        sent += batch
        val deadline = System.currentTimeMillis() + 5000
        while (latest() < sent && System.currentTimeMillis() < deadline)
          Thread.sleep(10)
        // high-water BEFORE the commit: the un-committed window is all
        // the buffer may ever hold
        maxRetained = math.max(maxRetained, stream.bufferedFrames)
        // micro-batch cycle: plan + commit the window → evict
        stream.planInputPartitions(
          NetSources.LongOffset(committed), NetSources.LongOffset(sent))
        stream.commit(NetSources.LongOffset(sent))
        committed = sent
      }
      os.close(); sock.close()
      println(s"DAEMON-SOAK net: $nFrames frames, max retained " +
        s"$maxRetained (window $batch)")
      assert(stream.bufferedFrames == 0, "buffer not drained after commits")
      assert(maxRetained <= 2 * batch,
        s"FrameBuffer unbounded: retained $maxRetained for window $batch")
    } finally stream.stop()

    spark.stop()
  }
}
