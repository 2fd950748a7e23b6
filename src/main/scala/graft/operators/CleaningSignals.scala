package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scan-side text-cleaning signals for web-crawl curation — the three
  * damage classes a pretraining pipeline gates on BEFORE quality
  * scoring ever sees the text:
  *
  *  - encoding damage: U+FFFD replacement chars, stray C0 controls,
  *    and UTF-8-read-as-Latin-1 mojibake digraphs (`Ã·`, `â€¦` families)
  *    — the signature of a double-decoded or truncated byte stream;
  *  - residual HTML: tag count and link-character density (the
  *    trafilatura-style "this is navigation chrome, not prose" gate);
  *  - code-vs-prose: indented-line fraction and code-symbol density,
  *    the cheap router between code and text mixture buckets.
  *
  * All signals are native regex/array expressions (codegen'd, map-only,
  * zero shuffles — they ride the scan at any corpus size), and every
  * pattern stays in the RE2-compatible subset so the DuckDB oracle runs
  * the byte-identical regex (same discipline as [[Pii]]).
  */
object CleaningSignals {

  val ReplacementRe = "\\x{FFFD}"
  val ControlRe     = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
  /** The cp1252/Latin-1 IMAGE of UTF-8 continuation bytes 0x80–0xBF —
    * what a misdecoded second byte can render as: U+0080–U+00BF
    * directly (Latin-1 and the cp1252 0xA0+ range) plus the 27
    * codepoints cp1252 remaps 0x80–0x9F to (€‚ƒ„…†‡ˆ‰Š‹ŒŽ''""•–—˜™š›œžŸ). */
  val ContinuationCls: String =
    "[\\x{0080}-\\x{00BF}\\x{20AC}\\x{201A}\\x{0192}\\x{201E}\\x{2026}" +
    "\\x{2020}\\x{2021}\\x{02C6}\\x{2030}\\x{0160}\\x{2039}\\x{0152}" +
    "\\x{017D}\\x{2018}\\x{2019}\\x{201C}\\x{201D}\\x{2022}\\x{2013}" +
    "\\x{2014}\\x{02DC}\\x{2122}\\x{0161}\\x{203A}\\x{0153}\\x{017E}" +
    "\\x{0178}]"
  /** UTF-8 bytes decoded as Latin-1/cp1252: C3xx ('Ã' + continuation)
    * and the E2-80xx punctuation family ('â€' + continuation). The
    * follower is CONSTRAINED to [[ContinuationCls]] so legitimate text
    * containing 'Ã' before an ordinary letter ('JOÃO', 'SÃO PAULO')
    * never counts as damage (it previously did, and the opt-in
    * --encclean gate silently dropped such docs). */
  val MojibakeRe: String =
    s"\\x{00C3}$ContinuationCls|\\x{00E2}\\x{20AC}$ContinuationCls"
  val TagRe         = "<[A-Za-z/][^>]*>"
  val UrlRe         = "https?://[^ \\t\\n]+"
  val IndentRe      = "(?m)^(    |\\t)"
  val CodeSymRe     = "[{}();=]"

  private def nMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** True when the text carries none of the three encoding-damage
    * classes — the predicate form the wpcurate `--encclean` gate
    * filters on (pure map-side, plan-time constant patterns). */
  def encClean(text: Column): Column =
    nMatches(text, ReplacementRe) === 0 &&
      nMatches(text, ControlRe) === 0 &&
      nMatches(text, MojibakeRe) === 0

  /** Per-document damage/structure columns (append to a select). */
  def signals(text: Column): Seq[Column] = {
    val linkChars = aggregate(
      transform(regexp_extract_all(text, lit(UrlRe), lit(0)),
        x => length(x).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val len = length(text).cast("long")
    val nLines = size(split(text, "\n")).cast("long")
    Seq(
      nMatches(text, ReplacementRe).as("n_replacement"),
      nMatches(text, ControlRe).as("n_control"),
      nMatches(text, MojibakeRe).as("n_mojibake"),
      nMatches(text, TagRe).as("n_tags"),
      nMatches(text, UrlRe).as("n_links"),
      linkChars.as("link_chars"),
      when(len > 0, round(linkChars.cast("double") / len, 4))
        .as("link_density"),
      nLines.as("n_lines"),
      nMatches(text, IndentRe).as("n_indented"),
      round(nMatches(text, IndentRe).cast("double") / nLines, 4)
        .as("indented_frac"),
      when(len > 0, round(nMatches(text, CodeSymRe).cast("double") / len, 4))
        .as("code_sym_density"),
      encClean(text).as("enc_clean"))
  }

  /** Corpus-level LINE boilerplate profile (the CCNet/Dolma-style
    * repeated-line remover): exact line strings that appear in ≥
    * `minDocs` DISTINCT documents are boilerplate (nav chrome, cookie
    * banners, copyright footers — the stuff per-doc dedup never sees
    * because every HOST page repeats it). Per doc: line count,
    * boilerplate line count/fraction, and the char count a cleaned
    * rewrite would keep.
    *
    * Scale shape: one explode → one exact (line → distinct-doc count)
    * hash groupBy with map-side combine → an id-keyed join back. Line
    * strings cross the exchange once; at corpus scale swap the join
    * for a Bloom/frequency-index probe (the `--blocklist`/`--freq`
    * gates' artifact machinery) — the relation shape is identical. */
  import org.apache.spark.sql.DataFrame
  def lineBoilerplate(df: DataFrame, textCol: String, idCol: String,
                      minDocs: Int = 3): DataFrame = {
    val lines = df
      .select(col(idCol).as("bp_id"),
        explode(split(col(textCol), "\n")).as("line"))
    val docFreq = lines.groupBy(col("line"))
      .agg(count_distinct(col("bp_id")).as("ndocs"))
    lines.join(docFreq, "line")
      .groupBy(col("bp_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("ndocs") >= minDocs, 1L).otherwise(0L))
          .as("n_boiler"),
        sum(when(col("ndocs") < minDocs, length(col("line")).cast("long"))
          .otherwise(0L)).as("kept_chars"))
      .select(col("bp_id"), col("n_lines"), col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_lines"), 4)
          .as("boiler_frac"),
        col("kept_chars"))
  }

  /** Paragraph-level duplicate profile per source: split on blank
    * lines, trim, and count the paragraph/char mass sitting in
    * paragraphs that appear in ≥2 DISTINCT docs anywhere in the corpus
    * — the granularity between [[lineBoilerplate]]'s nav chrome and
    * whole-doc dedup (licence blocks, shared disclaimers, quoted
    * intros survive both). Same shape: one explode → one
    * distinct-doc-count groupBy → one equi-join back. */
  def paragraphDupStats(df: DataFrame, textCol: String, idCol: String,
                        srcCol: String): DataFrame = {
    val paras = df.select(col(idCol).as("pd_id"), col(srcCol).as("src"),
      explode(filter(transform(split(col(textCol), "\n\n"),
        p => trim(p)), p => length(p) > 0)).as("para"))
    val docFreq = paras.groupBy(col("para"))
      .agg(count_distinct(col("pd_id")).as("nd"))
    paras.join(docFreq, "para")
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_paras"),
        sum(length(col("para")).cast("long")).as("n_chars"),
        sum(when(col("nd") >= 2, length(col("para")).cast("long"))
          .otherwise(0L)).as("n_dup_chars"))
      .select(col("src"), col("n_paras"), col("n_dup_paras"),
        round(col("n_dup_paras").cast("double") / col("n_paras"), 6)
          .as("dup_para_share"),
        round(col("n_dup_chars").cast("double") / col("n_chars"), 6)
          .as("dup_char_share"))
  }
}
