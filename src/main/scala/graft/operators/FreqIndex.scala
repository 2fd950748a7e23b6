package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CmsSketch

/** Persisted frequency sketch — the thirteenth build-once/probe-many
  * artifact: per-group Count–Min COUNTER TABLES (d·w longs each), not
  * key counts. Because CMS merges by elementwise addition — the exact
  * merge, unique in the sketch family — `appendTo` folds a new slice in
  * with plain `zip_with(+)` column math and the result is bit-identical
  * to a from-scratch rebuild, at any batch split. The probe answers the
  * per-key question the cardinality profile ([[Cardinality]]) cannot:
  * "how often has the corpus seen THIS key" — the stop-shingle cap,
  * per-key rate limit, and hot-key prior for salting decisions, from a
  * 24 KB table per group instead of a key-space groupBy over 100 TB.
  *
  * Scale shape: scan-side work is the mergeable
  * [[graft.functions.CmsSketch]] aggregate (bounded partials through
  * the exchange, map-side combined); append and probe run on the
  * groups-sized frame with native column math only — no UDFs anywhere
  * in this artifact. Estimates are one-sided (never undercount) with
  * the standard εN overestimate bound. */
object FreqIndex {

  /** Per-group CMS counter tables over `keyCol` (cast to string). */
  def sketchOf(df: DataFrame, grpCol: String, keyCol: String,
               d: Int, wExp: Int): DataFrame =
    df.groupBy(col(grpCol).as("grp"))
      .agg(CmsSketch.cms_sketch(col(keyCol).cast("string"), d, wExp)
        .as("cms"))

  final case class FreqRef(cms: DataFrame, d: Int, wExp: Int) {
    private def zeros = array_repeat(lit(0L), d * (1 << wExp))

    def save(path: String): Unit = {
      new java.io.File(path).mkdirs()
      cms.write.mode("overwrite").parquet(s"$path/cms")
      ArtifactMeta.store(path, "freq",
        Seq("d" -> d.toString, "wExp" -> wExp.toString),
        layout = Seq("cms" -> ""))
    }

    /** Fold a new slice in: elementwise counter addition via zip_with
      * — the EXACT merge (result ≡ rebuild from the union corpus).
      * localCheckpoint materializes before overwriting the files the
      * plan read. */
    def appendTo(path: String, newData: DataFrame, grpCol: String,
                 keyCol: String): Unit = {
      val nb = sketchOf(newData, grpCol, keyCol, d, wExp)
        .withColumnRenamed("cms", "ncms")
      val merged = cms.join(nb, Seq("grp"), "full_outer")
        .select(col("grp"),
          zip_with(coalesce(col("cms"), zeros), coalesce(col("ncms"), zeros),
            (a, b) => a + b).as("cms"))
        .localCheckpoint()
      merged.write.mode("overwrite").parquet(s"$path/cms")
    }

    /** Per-(group, key) corpus-frequency estimates for a batch's keys:
      * batch count (exact, batch-local) + corpus estimate from the
      * stored table (one-sided). Keys in groups the corpus has never
      * seen estimate 0 from the zero table. */
    def estimateOf(batch: DataFrame, grpCol: String, keyCol: String): DataFrame = {
      val keys = batch.groupBy(col(grpCol).as("grp"),
          col(keyCol).cast("string").as("key"))
        .agg(count(lit(1)).as("batch_cnt"))
      keys.join(broadcast(cms), Seq("grp"), "left")
        .select(col("grp"), col("key"), col("batch_cnt"),
          CmsSketch.cmsEstimate(coalesce(col("cms"), zeros), col("key"),
            d, wExp).as("corpus_est"))
    }
  }

  object FreqRef {
    def build(df: DataFrame, grpCol: String, keyCol: String,
              d: Int = 3, wExp: Int = 10): FreqRef =
      FreqRef(sketchOf(df, grpCol, keyCol, d, wExp), d, wExp)

    def load(spark: SparkSession, path: String): FreqRef = {
      val props = ArtifactMeta.load(path, "freq")
      FreqRef(spark.read.parquet(s"$path/cms"),
        props.getProperty("d").toInt, props.getProperty("wExp").toInt)
    }
  }
}
