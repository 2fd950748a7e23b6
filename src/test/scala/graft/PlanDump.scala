package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan-audit helper: prints exchange counts + scan pruning/pushdown for
  * a set of queries (all queries when no args are given).
  * Run: sbt "Test/runMain graft.PlanDump [query ...]" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val scans = df.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
      println(s"== $q: exchanges=" +
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size)
      scans.foreach(s => println("   scan cols: " + s.requiredSchema.fieldNames.mkString(",") +
        "  pushed: " + s.metadata.getOrElse("PushedFilters", "")))
    }
    spark.stop()
  }
}
