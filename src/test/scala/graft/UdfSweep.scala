package graft

import org.apache.spark.sql.SparkSession

/** UDF ratchet: sweeps every registered query's optimized+executed plan
  * for Scala UDF projections and asserts the set equals the documented
  * allowlist — each entry below is deliberately a UDF (sequential
  * per-row scans where an expression buys nothing, or kernels whose
  * cost is the decode itself, not the call overhead). Scan-side
  * SIGNAL kernels (simhash, minhash, lang-id, fingerprint, char
  * entropy) are native codegen expressions and must stay off this
  * list — a regression that reintroduces one fails the sweep.
  *
  * Run: sbt "Test/runMain graft.UdfSweep"
  */
object UdfSweep {

  /** Queries allowed to carry a ScalaUDF, and why:
    *  - cdc_dedup: content-defined-chunking cut scan — inherently
    *    sequential rolling hash over the token stream, one call/row;
    *  - contamination_bloom: the Bloom probe must run tokenize+shingle+
    *    test in ONE pass over raw text (argument-side expression trees
    *    re-evaluate on the interpreted path: measured ~25× slower);
    *  - multimodal_*: binary media decodes — cost is the codec, not
    *    the call boundary;
    *  - syslog_normalize: the RFC5424/3164 fallthrough parser (one
    *    call/row, the parse IS the work);
    *  - image_dhash / image_dhash_pairs / audio_fingerprint /
    *    video_fingerprint: the UDF is the synthBmp/Wav/Mp4 FIXTURE
    *    SYNTHESIS (no real media ships in the container) — the
    *    signature kernels themselves (media_dhash / media_audio_fp /
    *    media_video_fp) are codegen expressions; a production run over
    *    a real binary column carries no UDF;
    *  - corpus_novelty: the register-pair union/estimate UDFs run on
    *    the GROUPS-sized frame (three 512-byte arrays per group), never
    *    the scan — the scan side is the HLL TypedImperativeAggregate. */
  private val allowed = Set(
    "cdc_dedup", "contamination_bloom", "syslog_normalize",
    "multimodal_meta", "multimodal_bmp_decode", "multimodal_gif_decode",
    "multimodal_jpeg_decode", "multimodal_mp4_decode",
    "multimodal_png_decode", "multimodal_wav_decode",
    "image_dhash", "image_dhash_pairs", "audio_fingerprint",
    "video_fingerprint", "corpus_novelty")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    var withUdf = Set.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sf).queryExecution
        val o = qe.optimizedPlan.toString
        val e = qe.executedPlan.toString
        if (o.contains("ScalaUDF") || o.contains("UDF(") ||
            e.contains("ScalaUDF") || e.contains("UDF("))
          withUdf += name
      } finally graft.operators.CacheScope.drain()
    }
    spark.stop()
    val unexpected = withUdf -- allowed
    val stale = allowed -- withUdf
    println(s"UDFSWEEP with-udf=${withUdf.toSeq.sorted.mkString(",")}")
    assert(unexpected.isEmpty,
      s"UDFSWEEP FAIL: new UDF-bearing queries (expression-ize or allowlist): $unexpected")
    assert(stale.isEmpty,
      s"UDFSWEEP FAIL: allowlist entries no longer carry UDFs (prune them): $stale")
    println("UDFSWEEP OK: UDF set matches the documented allowlist")
  }
}
