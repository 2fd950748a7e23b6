package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HllSketch

/** Persisted cardinality profile — the ninth build-once/probe-many
  * artifact: per-group HLL REGISTERS (2^p bytes each), not key sets.
  * Because registers merge by elementwise max into the union sketch,
  * the profile is incrementally maintainable (`appendTo` folds a new
  * slice in without re-reading the corpus) and answers the
  * continual-ingest question no exact structure can at 100 TB without
  * a full shuffle: "how many of this batch's keys are NEW?" —
  * `noveltyOf` estimates |corpus ∪ batch| − |corpus| per group from
  * three 512-byte register arrays. The novelty rate is the standard
  * crawl-health signal (a collapsing rate means the source is
  * exhausted or the crawler is looping).
  *
  * Scale shape: the scan-side work is the mergeable
  * [[graft.functions.HllRegisters]] aggregate (register arrays cross
  * the exchange, map-side combined); everything after runs on the
  * groups-sized frame, where the register-pair UDFs are explicitly
  * fine (never on the data path). Estimates use the same
  * exact-integer harmonic sum as `hll_distinct`, so the novelty query
  * is DuckDB-replayable. */
object Cardinality {

  /** Per-group registers over `keyCol` (cast to string — the hash is
    * the splitmix-finalized FNV over the key's characters). */
  def registersOf(df: DataFrame, grpCol: String, keyCol: String,
                  p: Int): DataFrame =
    df.groupBy(col(grpCol).as("grp"))
      .agg(graft.functions.HllRegisters
        .hll_registers(col(keyCol).cast("string"), p).as("regs"))

  final case class CardRef(regs: DataFrame, p: Int) {

    def save(path: String): Unit = {
      new java.io.File(path).mkdirs()
      regs.write.mode("overwrite").parquet(s"$path/regs")
      ArtifactMeta.store(path, "card", Seq("p" -> p.toString),
        layout = Seq("regs" -> ""))
    }

    private def mergeUdf = {
      val m = 1 << p
      udf((a: Array[Byte], b: Array[Byte]) => {
        val x = if (a == null) new Array[Byte](m) else a.clone()
        HllSketch.mergeRegisters(x, if (b == null) new Array[Byte](m) else b)
      })
    }

    /** Fold a new slice's registers into the saved profile (elementwise
      * max — exact HLL union, order-independent). localCheckpoint
      * materializes the merge BEFORE overwriting the files it read. */
    def appendTo(path: String, newData: DataFrame, grpCol: String,
                 keyCol: String): Unit = {
      val nb = registersOf(newData, grpCol, keyCol, p)
        .withColumnRenamed("regs", "nregs")
      val merged = regs.join(nb, Seq("grp"), "full_outer")
        .select(col("grp"), mergeUdf(col("regs"), col("nregs")).as("regs"))
        .localCheckpoint()
      merged.write.mode("overwrite").parquet(s"$path/regs")
    }

    /** Per-group batch novelty vs the stored profile:
      * (est_corpus, est_batch, est_union, novelty = union − corpus).
      * Groups absent from one side estimate from all-zero registers
      * (exactly 0.0 — the linear-counting branch at V = m). */
    def noveltyOf(batch: DataFrame, grpCol: String, keyCol: String): DataFrame = {
      val m = 1 << p
      val pp = p
      val statsUdf = udf((c: Array[Byte], b: Array[Byte]) => {
        val cc = if (c == null) new Array[Byte](m) else c
        val bb = if (b == null) new Array[Byte](m) else b
        val u = cc.clone()
        HllSketch.mergeRegisters(u, bb)
        val ec = HllSketch.estimate(cc, pp)._1
        val eb = HllSketch.estimate(bb, pp)._1
        val eu = HllSketch.estimate(u, pp)._1
        (ec, eb, eu, eu - ec)
      })
      val b = registersOf(batch, grpCol, keyCol, p)
        .withColumnRenamed("regs", "bregs")
      regs.withColumnRenamed("regs", "cregs")
        .join(b, Seq("grp"), "full_outer")
        .withColumn("s", statsUdf(col("cregs"), col("bregs")))
        .select(col("grp"),
          col("s._1").as("est_corpus"), col("s._2").as("est_batch"),
          col("s._3").as("est_union"), col("s._4").as("novelty"))
    }
  }

  /** Pairwise group-overlap estimates from a per-group registers frame
    * (inclusion–exclusion on HLL sketches): for every unordered group
    * pair, |A|, |B|, |A∪B| (the elementwise-max merged sketch) and the
    * derived |A∩B| = |A|+|B|−|A∪B| with a Jaccard estimate. This is
    * the "how much vocabulary/user-base do these sources share?"
    * readout, answered from 2^p-byte sketches built in ONE corpus
    * pass — never a key-level pairwise join. The pair frame is
    * groups², and the register-merge UDF runs only there (explicitly
    * off the data path, as with [[CardRef.noveltyOf]]). est_inter can
    * go slightly negative at HLL noise scale for disjoint sets —
    * reported raw, not clamped, so the error model stays visible. */
  def pairOverlap(regsDf: DataFrame, p: Int): DataFrame = {
    val pp = p
    val estUdf = udf((a: Array[Byte], b: Array[Byte]) => {
      val u = a.clone()
      HllSketch.mergeRegisters(u, b)
      (HllSketch.estimate(a, pp)._1, HllSketch.estimate(b, pp)._1,
        HllSketch.estimate(u, pp)._1)
    })
    val l = regsDf.select(col("grp").as("grp_a"), col("regs").as("__ra"))
    val r = regsDf.select(col("grp").as("grp_b"), col("regs").as("__rb"))
    val inter = (col("e._1") + col("e._2")) - col("e._3")
    l.join(r, col("grp_a") < col("grp_b"))
      .withColumn("e", estUdf(col("__ra"), col("__rb")))
      .select(col("grp_a"), col("grp_b"),
        round(col("e._1"), 4).as("est_a"),
        round(col("e._2"), 4).as("est_b"),
        round(col("e._3"), 4).as("est_union"),
        round(inter, 4).as("est_inter"),
        when(col("e._3") > 0, round(inter / col("e._3"), 6))
          .as("jaccard_est"))
  }

  object CardRef {
    def build(df: DataFrame, grpCol: String, keyCol: String,
              p: Int = 9): CardRef =
      CardRef(registersOf(df, grpCol, keyCol, p), p)

    def load(spark: SparkSession, path: String): CardRef = {
      val props = ArtifactMeta.load(path, "card")
      CardRef(spark.read.parquet(s"$path/regs"),
        props.getProperty("p").toInt)
    }
  }
}
