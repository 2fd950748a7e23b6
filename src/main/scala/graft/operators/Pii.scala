package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over document text — a standard
  * pre-training scrub pass.
  *
  * Pure native `regexp_extract_all` / `regexp_replace` expressions:
  * codegen'd, map-only, zero shuffles — the whole scrub rides inside
  * the scan stage at any corpus size. Patterns deliberately stay in
  * the RE2-compatible subset (character classes, bounded repeats,
  * `\b`) so the DuckDB oracle runs the byte-identical regex.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val CardRe  = "\\b\\d{4} \\d{4} \\d{4} \\d{4}\\b"

  /** Per-category match counts (email / ipv4 / phone / card). */
  def scanColumns(text: Column): Seq[Column] = Seq(
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
    size(regexp_extract_all(text, lit(CardRe), lit(0))).cast("long").as("n_cards"))

  /** Masked text. Order matters and is part of the contract (mirrored in
    * the oracle): card → phone → email → ipv4, so the longer numeric
    * patterns are consumed before the shorter ones can split them. */
  def redact(text: Column): Column = {
    val c1 = regexp_replace(text, CardRe, "<CARD>")
    val c2 = regexp_replace(c1, PhoneRe, "<PHONE>")
    val c3 = regexp_replace(c2, EmailRe, "<EMAIL>")
    regexp_replace(c3, Ipv4Re, "<IP>")
  }

  /** True when any category matches (cheap pre-filter for routing
    * PII-bearing docs to a quarantine sink). */
  def hasPii(text: Column): Column =
    scanColumns(text).map(_ > 0).reduce(_ || _)

  /** k-anonymity / l-diversity audit of a release table: group rows by
    * the quasi-identifier columns (the attributes an adversary can link
    * externally) and measure the re-identification surface —
    * `k_anonymity` = the smallest equivalence class, `n_rows_below_k` =
    * the row mass in classes smaller than the target k, `l_diversity` =
    * the minimum count of distinct sensitive values within any class
    * (Sweeney 2002; Machanavajjhala et al. 2007).
    *
    * Scale shape: one hash groupBy on the quasi-id tuple with map-side
    * combine (class count is bounded by the quasi-id domain, not the
    * row count), then a single-row fold over classes. The per-class
    * distinct-sensitive count is exact; all outputs are integer until
    * the two final ratios. */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], sensitive: String,
                 k: Int): DataFrame = {
    val cls = df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("sz"),
        countDistinct(col(sensitive)).as("ldiv"))
    val below = sum(when(col("sz") < k, col("sz")).otherwise(0L))
    cls.agg(
      min(col("sz")).as("k_anonymity"),
      count(lit(1)).as("n_classes"),
      sum(col("sz")).as("n_rows"),
      below.as("n_rows_below_k"),
      round(below.cast("double") / sum(col("sz")), 4).as("pct_below_k"),
      min(col("ldiv")).as("l_diversity"),
      round(avg(col("sz")), 4).as("avg_class_size"))
  }

  /** t-closeness audit (Li–Li–Venkatasubramanian, ICDE 2007) — the
    * third leg of the release-table privacy trio: per equivalence
    * class, the Earth-Mover's Distance between the class's
    * sensitive-value distribution and the GLOBAL one over the ordered
    * value domain, EMD = Σ_v |cum(p_cls − p_glob)| / (m−1); the table's
    * t is the worst class. k-anonymity says classes are big,
    * l-diversity says they hold several values — t-closeness says their
    * MIX doesn't leak (a class can pass both and still be 95% one
    * salary bucket).
    *
    * Exactness: the per-value difference multiplies through by n_c·N to
    * the integer d = c_cv·N − g_v·n_c (decimal(38,0) — the product
    * passes 2^63 at ~3·10⁹ rows); cumulative sums and |·| stay integer,
    * ONE division per class at the end. Grid = classes × value domain
    * (both bounded by construction), value margins broadcast. */
  def tCloseness(df: DataFrame, quasiIds: Seq[String],
                 sensitive: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qi = quasiIds.map(col)
    val cell = df.groupBy(qi :+ col(sensitive).as("v"): _*)
      .agg(count(lit(1)).as("c"))
    val cls = cell.groupBy(qi: _*).agg(sum(col("c")).as("nc"))
    val vals = cell.groupBy(col("v")).agg(sum(col("c")).as("gv"))
    val tot = vals.agg(sum(col("gv")).as("nn"),
      count(lit(1)).as("m"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val grid = cls.crossJoin(broadcast(vals))
      .join(cell, quasiIds :+ "v", "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tot))
      .withColumn("d", dec(col("c")) * col("nn") - dec(col("gv")) * col("nc"))
      .withColumn("cum", sum(col("d")).over(
        Window.partitionBy(qi: _*).orderBy(col("v"))))
    val perClass = grid.groupBy(qi: _*)
      .agg(first(col("nc")).as("nc"), first(col("nn")).as("nn"),
        first(col("m")).as("m"), sum(abs(col("cum"))).as("numer"))
      // per-class EMD quantized to a long at 1e-9 BEFORE the fold —
      // max is order-invariant but the avg's double sum is not
      .withColumn("emdq", when(col("m") > 1,
        floor(col("numer").cast("double") /
          (col("nc").cast("double") * col("nn") * (col("m") - 1)) *
          lit(1e9) + lit(0.5)).cast("long"))
        .otherwise(lit(0L)))
    perClass.agg(count(lit(1)).as("n_classes"),
      first(col("m")).as("n_values"),
      round(max(col("emdq")).cast("double") / lit(1e9), 6).as("t_closeness"),
      round(sum(col("emdq")).cast("double") / lit(1e9) / count(lit(1)), 6)
        .as("avg_emd"))
  }
}
