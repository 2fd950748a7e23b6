package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deequ-style data-quality profiling: per-column completeness,
  * cardinality, range, and central tendency in ONE pass over the scan
  * — the pre-ingest quality report a curation pipeline publishes next
  * to its dataset card (which profiles the corpus semantically; this
  * profiles it relationally).
  *
  * Numeric columns only, deliberately: min/max/mean stay doubles end
  * to end, so results are engine-replayable without string-formatting
  * parity problems. One aggregation computes every column's stats
  * (the multi-countDistinct expands the scan |cols|× map-side — the
  * standard cost of exact column cardinality; at extreme scale swap
  * the distinct counts for the HLL sketch and keep the rest). The
  * 1-row aggregate then explodes to one row per column — rows ∝
  * |cols|, never the data.
  */
object Profile {

  /** Pearson correlation matrix over numeric columns in ONE aggregation
    * pass — the multicollinearity / redundant-feature card next to
    * [[numericProfile]]. Every value quantizes to integer units at
    * `scale` decimal digits (exact for fixed-point business data), so
    * all 2nd-order moments are EXACT decimal sums — the correlations
    * are one fixed double dag over integers, partition-invariant and
    * engine-replayable. Output: one row per unordered column pair.
    * Degenerate (zero-variance) columns yield NULL, not NaN. */
  def corrMatrix(df: DataFrame, cols: Seq[String],
                 scale: Int = 100): DataFrame = {
    require(cols.size >= 2, "corrMatrix: need at least two columns")
    def q(c: String) =
      floor(col(c).cast("double") * scale + 0.5).cast("decimal(18,0)")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
      cols.flatMap { c => Seq(
        sum(q(c)).as(s"__s_$c"),
        sum(q(c) * q(c)).as(s"__ss_$c")) } ++
      pairs.map { case (a, b) => sum(q(a) * q(b)).as(s"__p_${a}__$b") }
    // the 1-row moment frame feeds one select per pair below —
    // materialize it once so the union doesn't re-run the scan agg
    val m = df.agg(aggs.head, aggs.tail: _*).localCheckpoint()
    val rows = pairs.map { case (a, b) =>
      val n = col("__n").cast("decimal(38,0)")
      val covNum = (n * col(s"__p_${a}__$b") - col(s"__s_$a") * col(s"__s_$b"))
        .cast("double")
      def varNum(c: String) =
        (n * col(s"__ss_$c") - col(s"__s_$c") * col(s"__s_$c")).cast("double")
      m.select(lit(a).as("col_a"), lit(b).as("col_b"),
        when(varNum(a) > 0 && varNum(b) > 0,
          round(covNum / sqrt(varNum(a) * varNum(b)), 6)).as("corr"))
    }
    rows.reduce(_.unionByName(_)).orderBy(col("col_a"), col("col_b"))
  }

  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericProfile: need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c).cast("double")).as(s"__min_$c"),
        max(col(c).cast("double")).as(s"__max_$c"),
        avg(col(c).cast("double")).as(s"__mean_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col(s"__rows_$c").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        round(col(s"__min_$c"), 4).as("min_v"),
        round(col(s"__max_$c"), 4).as("max_v"),
        round(col(s"__mean_$c"), 4).as("mean_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Benford first-significant-digit profile of a positive monetary
    * column — the classic fabricated-/synthetic-data flag: naturally
    * occurring multi-scale amounts follow P(d) = log10(1 + 1/d);
    * uniform or clamped generators don't. Digit extraction goes
    * through EXACT INTEGER cents and integer-to-string (identical on
    * any engine) — never float log10 of the value, whose power-of-ten
    * edge cases are engine-dependent. One scan aggregation; everything
    * after runs on the 9-row digit frame. */
  def benfordProfile(df: DataFrame, valueCol: String): DataFrame = {
    val cents = df.filter(col(valueCol) > 0)
      .select(round(col(valueCol) * 100, 0).cast("long").as("n"))
    val c = cents
      .select(substring(col("n").cast("string"), 1, 1).cast("int").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("cnt"))
    val tot = c.agg(sum(col("cnt")).as("n_total"))
    c.crossJoin(broadcast(tot))
      .select(col("d"), col("cnt"),
        round(col("cnt").cast("double") / col("n_total"), 4).as("share"),
        round(log(10.0, lit(1.0) + lit(1.0) / col("d")), 4)
          .as("benford"),
        round(col("cnt").cast("double") / col("n_total") -
          log(10.0, lit(1.0) + lit(1.0) / col("d")), 4).as("deviation"))
  }
}
