package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: decompose `wpindex append bm25` wall time
  * against an existing 100× index (the r13 rehearsal showed 9.2 s for
  * a fixed 1000-doc delta — which sub-step is corpus-proportional?).
  * Run: Test/runMain graft.Bm25AppendProbe <idxDir> <deltaParquet>
  */
object Bm25AppendProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val Array(idx, deltaP) = args.take(2)
    import graft.operators.{Maintenance, Retrieval}
    val bi = t("load")(Retrieval.Bm25Index.load(spark, idx))
    val nd = t("readDelta")(spark.read.parquet(deltaP))
    def bucketed(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("bucket",
        Retrieval.Bm25Index.bucketOf(col("term"), bi.nBuckets).cast("int"))
    val np = bucketed(Retrieval.postings(nd, "text", "doc_id"))
    t("appendDelta:post")(Maintenance.appendDelta(np, idx, "post",
      sort = Seq("term")))
    t("appendDelta:terms")(Maintenance.appendDelta(
      bucketed(Retrieval.docFreq(np.drop("bucket"))),
      idx, "terms", sort = Seq("term")))
    t("meta-agg")(nd.agg(count(lit(1)),
      sum(size(graft.operators.TextAnalysis.tokens(lower(col("text"))))
        .cast("long"))).head())
    t("fold:post")(Maintenance.foldDelta(spark, idx, "post", Seq("bucket"),
      sort = Seq("term")))
    t("fold:terms")(Maintenance.foldDelta(spark, idx, "terms", Seq("bucket"),
      sort = Seq("term")))
    t("autoCompact")(Maintenance.autoCompact(spark, idx))
    val (pf, pd) = Maintenance.fileAndLeafDirCount(spark, s"$idx/post")
    val (tf, td) = Maintenance.fileAndLeafDirCount(spark, s"$idx/terms")
    println(s"PROBE layout post files=$pf dirs=$pd terms files=$tf dirs=$td")
    spark.stop()
  }
}
