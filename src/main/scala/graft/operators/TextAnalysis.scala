package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything here is expressed over native Spark SQL functions (codegen'd,
  * whole-stage friendly); language-ID and fingerprinting kernels live here
  * as deterministic scalar functions and ride the scan as native codegen
  * expressions ([[graft.functions.LangId]], [[graft.functions.DocFingerprint]];
  * the UDF wrappers remain for mapPartitions-style callers). All operators
  * are per-row map-only: at 100 TB they scale linearly with input splits
  * and introduce zero exchanges.
  *
  * Reference capabilities mirrored: `extract_main_word`-style keyword
  * extraction lives in the reference at
  * crates/wp-oml/src/core/evaluator/transform/pipe/extract_word.rs; the
  * quality/langid/token operators are the north-star additions described in
  * SURVEY.md §2.9.
  */
object TextAnalysis {

  /** Whitespace tokens, empty-free. Native (codegen). */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > lit(0))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: word runs, digit runs, and single punctuation
    * each count as one token (approximates subword tokenizer load). */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Shared English stoplist — also the phrase-delimiter set of
    * [[rakeKeywords]]/[[textRank]] and interpolated into their
    * oracles, so both engines gate on the identical list. */
  val stopwordsEn: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
        "that", "this", "for", "on", "with", "as", "at", "by", "be")

  /** Quality-scoring columns: deterministic per-document signals used to
    * filter low-quality training text. All native expressions. */
  def qualityColumns(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val nTok = size(toks)
    val nChars = length(text)
    val stopHits = size(filter(toks, t => lower(t).isin(stopwordsEn: _*)))
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    Seq(
      nChars.cast("long").as("q_chars"),
      nTok.cast("long").as("q_tokens"),
      round(when(nTok > 0, length(regexp_replace(text, "\\s+", "")).cast("double") / nTok)
        .otherwise(lit(0.0)), 4).as("q_avg_token_len"),
      round(when(nTok > 0, stopHits.cast("double") / nTok).otherwise(lit(0.0)), 4)
        .as("q_stopword_ratio"),
      round(when(nChars > 0, punct.cast("double") / nChars).otherwise(lit(0.0)), 4)
        .as("q_punct_ratio")
    )
  }

  /** Gopher-style rule battery (Rae et al. 2021, Table A1 — public
    * paper): per-document named rule flags plus the conjunctive keep
    * decision. Unlike [[qualityColumns]]'s continuous signals, these
    * are the hard gates a crawl pipeline applies first; emitting the
    * per-rule booleans (not just `keep`) is what makes rejection-rate
    * dashboards per rule possible. Entirely map-only native
    * expressions — the scan-side filter shape, zero exchanges before
    * any downstream agg. Thresholds are the paper's, word-count bounds
    * scaled to the corpus's short synthetic docs. */
  def gopherRules(df: DataFrame, textCol: String, idCol: String,
                  minWords: Int = 10, maxWords: Int = 100000): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]")))
    val stopHits = size(filter(toks,
      t => lower(t).isin("the", "be", "to", "of", "and", "that", "have", "with")))
    val symbolChars = length(col(textCol)) -
      length(regexp_replace(col(textCol), "[#…]", ""))
    val meanWordLen = when(nTok > 0,
      length(regexp_replace(col(textCol), "\\s+", "")).cast("double") / nTok)
      .otherwise(lit(0.0))
    df.select(col(idCol),
        nTok.cast("long").as("n_words"),
        round(meanWordLen, 4).as("mean_word_len"),
        round(when(nTok > 0, symbolChars.cast("double") / nTok)
          .otherwise(lit(0.0)), 4).as("symbol_ratio"),
        round(when(nTok > 0, alphaWords.cast("double") / nTok)
          .otherwise(lit(0.0)), 4).as("alpha_word_frac"),
        stopHits.cast("long").as("n_stopwords"))
      .withColumn("r_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_mean_word_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("r_symbol_ratio", col("symbol_ratio") <= 0.1)
      .withColumn("r_alpha_words", col("alpha_word_frac") >= 0.8)
      .withColumn("r_stopwords", col("n_stopwords") >= 2L)
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") &&
        col("r_symbol_ratio") && col("r_alpha_words") && col("r_stopwords"))
  }

  /** Per-document char-entropy quality signal (compression-ratio
    * proxy) via the codegen'd [[graft.functions.CharEntropy]]
    * expression, bucketed into a histogram companion: the per-doc rows
    * feed filtering, the histogram is the 1-row-per-bucket corpus
    * health read. Map-only before the (tiny) bucket agg. */
  def charEntropy(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import graft.functions.CharEntropy.char_entropy
    df.select(col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      round(char_entropy(col(textCol)), 4).as("char_entropy"))
  }

  /** Per-source (domain-analogue) curation stats — the corpus-level
    * keep/drop/reweight signal a crawl pipeline applies before
    * doc-level filtering: per source, doc/token counts, exact-duplicate
    * share (docs whose content hash repeats corpus-WIDE — cross-source
    * mirrors count in every source they appear in), mean doc length,
    * and token share of the corpus. Scale shape: one partial-agg
    * exchange on the content hash, a streaming join back (hot
    * boilerplate hashes absorbed map-side, never window-buffered), one
    * partial-agg exchange on the low-cardinality source key, and a
    * single-row broadcast for the corpus total. Ratio columns are
    * single IEEE divisions of exact BIGINTs (cross-engine
    * bit-identical). */
  def sourceStats(df: DataFrame, textCol: String, srcCol: String): DataFrame = {
    val base = df.select(col(srcCol).as("source"), md5(col(textCol)).as("__h"),
      tokenCount(col(textCol)).cast("long").as("n_tok"))
    val hashCnt = base.groupBy(col("__h")).agg(count(lit(1)).as("__hc"))
    val perSource = base.join(hashCnt, "__h")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(when(col("__hc") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
    val total = perSource.agg(sum(col("n_tokens")).as("__tot"))
    perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_dup_docs"),
        (col("n_dup_docs").cast("double") / col("n_docs")).as("dup_frac"),
        (col("n_tokens").cast("double") / col("n_docs")).as("mean_tokens"),
        (col("n_tokens").cast("double") / col("__tot")).as("token_share"))
  }

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Deterministic, dependency-free. */
  private val langProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Set("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Set("le", "la", "et", "les", "des", "en", "un", "du", "une", "est"),
    "pt" -> Set("o", "a", "e", "de", "do", "da", "em", "um", "para", "com")
  )

  /** Language-ID: stopword-hit voting with a CJK codepoint fast path.
    * Returns ISO code or "und". Pure function → usable inside mapPartitions
    * or as a UDF; no state, no shuffle. */
  def detectLanguage(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0; var total = 0
    var i = 0
    while (i < text.length && i < 4096) {
      val ch = text.charAt(i)
      if (!Character.isWhitespace(ch)) {
        total += 1
        val b = Character.UnicodeBlock.of(ch)
        if (b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
            b == Character.UnicodeBlock.HIRAGANA ||
            b == Character.UnicodeBlock.KATAKANA ||
            b == Character.UnicodeBlock.HANGUL_SYLLABLES) cjk += 1
      }
      i += 1
    }
    if (total > 0 && cjk.toDouble / total > 0.3) return "zh"
    val toks = text.toLowerCase.split("\\s+")
    var best = "und"; var bestHits = 0
    for ((lang, words) <- langProfiles.toSeq.sortBy(_._1)) {
      var hits = 0
      var j = 0
      while (j < toks.length && j < 512) { if (words.contains(toks(j))) hits += 1; j += 1 }
      if (hits > bestHits) { best = lang; bestHits = hits }
    }
    best
  }

  val langIdUdf = udf(detectLanguage _)

  /** 64-bit FNV-1a over a string — the shared deterministic token hash for
    * fingerprinting / simhash / minhash. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Rolling-hash document fingerprint over whitespace tokens (order
    * sensitive, whitespace-normalization insensitive). */
  def fingerprint(text: String): Long = {
    if (text == null) return 0L
    var h = 0xcbf29ce484222325L
    for (t <- text.split("\\s+") if t.nonEmpty) {
      h = h * 31L + fnv1a64(t)
    }
    h
  }

  val fingerprintUdf = udf(fingerprint _)

  /** Corpus-statistics quality score: mean unigram log-probability of
    * each document under the corpus's own unigram distribution (the
    * classic cheap perplexity proxy — boilerplate and word soup score
    * low, typical prose high).
    *
    * Shape: one aggregation builds the (token, tf) table, the exploded
    * token stream joins it on the token key, and a per-doc aggregation
    * folds the logs. Hot tokens are not a skew hazard: each joins to
    * ONE freq row, and the per-doc re-agg keys on (doc). The corpus
    * total is a single scalar (one number to the driver). At 100 TB
    * the freq table is disk-resident and the join shuffles — broadcast
    * a top-K vocab with a rare-token fallback if that shuffle
    * dominates. */
  def unigramLogprob(df: DataFrame, textCol: String, idCol: String,
                     carryCols: Seq[String] = Nil): DataFrame = {
    val toks = CacheScope.scratch(df.select(col(idCol).as("lp_id"),
        explode_outer(tokens(lower(col(textCol)))).as("tok"))
      .filter(col("tok").isNotNull))
    val total = toks.count().toDouble
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val perDoc = toks.join(freq, "tok")
      .groupBy(col("lp_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(log(col("tf").cast("double") / total)) / count(lit(1)), 4)
          .as("avg_logprob"))
    df.select(col(idCol) +: carryCols.map(col): _*)
      .join(perDoc, col(idCol) === col("lp_id"), "left")
      .select(col(idCol) +: carryCols.map(col) :+
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens") :+
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"): _*)
  }

  /** Word n-grams WITH multiplicity (unlike `Dedup.shinglesOf`, no
    * array_distinct — repetition measurement needs duplicate grams). */
  def ngramsWithMultiplicity(toks: Column, n: Int): Column =
    filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => when(i + n <= size(toks), concat_ws(" ", slice(toks, i + 1, lit(n))))),
      x => x.isNotNull)

  /** Gopher-style repetition signals per document: total/duplicate
    * 2-gram fractions and the share of the single most frequent 2-gram.
    * One exchange keyed by (doc, gram) — the doc id in the key bounds
    * any hot gram's group to one document, so the shuffle is skew-free
    * at corpus scale. Docs with < 2 tokens report zeros. */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val grams = df
      .select(col(idCol).as("rep_id"), tokens(col(textCol)).as("toks"))
      .select(col("rep_id"), explode_outer(ngramsWithMultiplicity(col("toks"), 2)).as("gram"))
      .filter(col("gram").isNotNull)
    val perDoc = grams.groupBy(col("rep_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("rep_id"))
      .agg(sum(col("c")).as("n_2grams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_c"))
    df.select(col(idCol))
      .join(perDoc, col(idCol) === col("rep_id"), "left")
      .select(col(idCol),
        coalesce(col("n_2grams"), lit(0L)).as("n_2grams"),
        round(when(col("n_2grams") > 0,
          lit(1.0) - col("n_distinct").cast("double") / col("n_2grams"))
          .otherwise(lit(0.0)), 4).as("dup_2gram_frac"),
        round(when(col("n_2grams") > 0,
          col("top_c").cast("double") / col("n_2grams"))
          .otherwise(lit(0.0)), 4).as("top_2gram_frac"))
  }

  /** Vocabulary coverage — the corpus-profiling measure of how much of
    * the token stream a top-N vocabulary captures (the quick proxy for
    * tokenizer fit / OOV rate per domain). Per group: total tokens and
    * the fraction covered by that group's N most frequent tokens
    * (ties broken by token text, so the cut is deterministic).
    *
    * Scale shape: explode → (group, token) partial-agg count (map-side
    * combine absorbs hot tokens) → per-group rank window over the
    * DISTINCT-token table (bounded by vocabulary, not corpus size) →
    * one tiny final agg. */
  def vocabCoverage(df: DataFrame, textCol: String, grpCol: String,
                    topN: Int): DataFrame = {
    val counts = CacheScope.scratch(df.select(col(grpCol).as("grp"),
        explode_outer(tokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull)
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("c")))
    // totals from one partial agg; the top-N rank runs over a frame
    // per-partition-pruned to topN×#partitions per group, so a web-scale
    // vocabulary never buffers in one window task
    val totals = counts.groupBy(col("grp"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
      .orderBy(col("c").desc, col("tok").asc)
    val top = PartitionPrune.firstNPerKey(counts, "grp",
        Seq(col("c").desc, col("tok").asc), topN)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN)
      .groupBy(col("grp")).agg(sum(col("c")).as("top_c"))
    totals.join(top, "grp")
      .select(col("grp"), col("n_tokens"), col("n_distinct"),
        round(col("top_c").cast("double") / col("n_tokens"), 6).as("coverage"))
  }

  /** Top adjacent-token-pair counts — the selection step of one BPE
    * merge round (tokenizer induction): count every adjacent pair
    * occurrence corpus-wide, return the topN merge candidates. Explode
    * → partial-agg count (map-side combine absorbs hot pairs) →
    * TakeOrderedAndProject; the token array materializes in its own
    * projection so the tokenizer runs once per row (the shinglesOf
    * re-evaluation hazard). */
  def topBigramMerges(df: DataFrame, textCol: String, topN: Int): DataFrame =
    df.select(tokens(lower(col(textCol))).as("t"))
      .select(explode(
        filter(
          transform(sequence(lit(0), greatest(size(col("t")) - 2, lit(0))),
            i => when(i + 2 <= size(col("t")),
              struct(element_at(col("t"), i + 1).as("a"),
                element_at(col("t"), i + 2).as("b")))),
          x => x.isNotNull)).as("p"))
      .groupBy(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok_a"), col("tok_b"))
      .limit(topN)

  /** Per-document top-k TF-IDF keywords — the classic corpus-aware
    * term extraction (doc topicality signal for mixture building,
    * clustering labels, near-dup triage). tfidf = (count/doclen) ·
    * ln(N/df), rounded to 4 BEFORE ranking so the cross-engine order
    * is robust to 1-ulp `ln` differences; ties break on the term.
    *
    * Scale shape: the doc length is computed MAP-SIDE (size of the
    * token array, carried through the explode) so there is no doc-
    * marginal re-aggregation or join-back; one (doc, term) partial
    * aggregation then feeds both the score and the document frequency
    * (so a boilerplate term combines map-side; no count-distinct over
    * raw tokens — scratch-persisted because two consumers read it and
    * the explode would otherwise run twice; measured 2.4× slower
    * unpersisted), the corpus size rides a 1-row broadcast, and the
    * per-doc rank window is naturally bounded: its
    * partition is one document's distinct terms, which can never
    * exceed that document's token count. */
  def tfidfKeywords(df0: DataFrame, textCol: String, idCol: String,
                    topK: Int): DataFrame = {
    val df = Spread(df0) // r13: parallelize the tokenize fan-out on one-split inputs
    val tf = CacheScope.scratch(df.select(col(idCol).as("doc_id"),
        tokens(lower(col(textCol))).as("__t"))
      .select(col("doc_id"), size(col("__t")).as("__dlen"),
        explode(col("__t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("c"), max(col("__dlen")).as("dlen")))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("dft"))
    val nd = df.agg(count(lit(1)).as("nd"))
    val scored = tf.join(dft, "term")
      .crossJoin(broadcast(nd))
      .select(col("doc_id"), col("term"),
        round((col("c").cast("double") / col("dlen")) *
          log(col("nd").cast("double") / col("dft")), 4).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
  }

  /** RAKE keyword extraction (Rose et al. 2010) at corpus level:
    * candidate phrases are maximal stopword-free token runs inside
    * punctuation-delimited fragments; word score = degree/frequency
    * over the candidate set; phrase score = Σ word scores.
    *
    * Exact shared spec (the oracle replays it verbatim): lowercase →
    * split fragments on `[^a-z0-9\s]+` → whitespace tokens →
    * gaps-and-islands on the stoplist → runs of length 1..maxLen kept
    * (longer runs DROPPED, not truncated — a >maxLen run is template
    * noise, not a keyphrase). Word scores are quantized to longs at
    * 1e-6 (deg·1e6/freq, half-up) so per-phrase sums are associative
    * and partition-invariant; identical phrases share one score by
    * construction.
    *
    * Scale shape: map-only explode to phrase instances, one
    * (word)-keyed agg for scores, one broadcast-joinable word-score
    * frame (vocabulary-bounded) back onto phrase words, one
    * phrase-keyed agg, TakeOrdered top-k. No global sort. */
  def rakeKeywords(df0: DataFrame, textCol: String, idCol: String,
                   topK: Int = 25, maxLen: Int = 4,
                   stops: Seq[String] = stopwordsEn): DataFrame = {
    val df = Spread(df0) // r13: parallelize the phrase fan-out on one-split inputs
    val frags = df.select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), "[^a-z0-9\\s]+"))
          .as(Seq("frag_idx", "frag")))
      .select(col("doc_id"), col("frag_idx"),
        posexplode(tokens(col("frag"))).as(Seq("pos", "tok")))
      .filter(!col("tok").isin(stops: _*))
    val w = Window.partitionBy(col("doc_id"), col("frag_idx"))
      .orderBy(col("pos"))
    val phrases = CacheScope.scratch(frags
      .withColumn("isl", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("frag_idx"), col("isl"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("tok")))),
        p => p.getField("tok")).as("ws"))
      .select(col("ws"), size(col("ws")).as("plen"))
      .filter(col("plen") <= maxLen))
    val words = phrases.select(explode(col("ws")).as("wrd"), col("plen"))
      .groupBy(col("wrd"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("wrd"),
        floor(col("deg") * lit(1e6) / col("freq") + lit(0.5))
          .cast("long").as("scoreq"))
    phrases
      // pid is assigned on the PHRASE row, in its own projection, then
      // repeated by the explode — a single select would let the
      // generator projection re-evaluate the nondeterministic id per
      // exploded row and shatter the group
      .select(monotonically_increasing_id().as("pid"), col("ws"))
      .select(col("pid"), col("ws"), explode(col("ws")).as("wrd"))
      .join(words, "wrd")
      .groupBy(col("pid"))
      .agg(concat_ws(" ", first(col("ws"))).as("phrase"),
        sum(col("scoreq")).as("sq"))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"), max(col("sq")).as("sq"))
      .select(col("phrase"), col("n_occurrences"),
        round(col("sq") / lit(1e6), 4).as("score"))
      .orderBy(col("score").desc, col("phrase").asc)
      .limit(topK)
  }

  /** Heaps'-law fit V = k·N^β over a cumulative vocabulary-growth
    * frame (e.g. `vocab_growth`'s output): closed-form OLS on the
    * ln-ln points. β near the corpus-typical 0.4–0.6 says vocabulary
    * is still growing normally; β → 0 flags a templated/synthetic
    * corpus whose vocabulary has saturated — the single-number summary
    * of the growth curve a mixing dashboard wants.
    *
    * Determinism: x/y are ln of exact integers (libm contract); every
    * OLS moment quantizes to a long at 1e-12 before the (bounded,
    * checkpoint-count-sized) sum, so the fit replays exactly. */
  def heapsFit(growth: DataFrame, tokensCol: String,
               vocabCol: String): DataFrame = {
    val x = log(col(tokensCol).cast("double"))
    val y = log(col(vocabCol).cast("double"))
    def q(c: Column) = floor(c * lit(1e12) + lit(0.5))
    val agg = growth.filter(col(tokensCol) > 0 && col(vocabCol) > 0)
      .agg(count(lit(1)).as("n"), sum(q(x)).as("sx"), sum(q(y)).as("sy"),
        sum(q(x * y)).as("sxy"), sum(q(x * x)).as("sxx"),
        sum(q(y * y)).as("syy"))
    def u(c: Column) = c / lit(1e12)
    val n = col("n").cast("double")
    val (sx, sy, sxy) = (u(col("sx")), u(col("sy")), u(col("sxy")))
    val (sxx, syy) = (u(col("sxx")), u(col("syy")))
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    val beta = cov / varx
    agg.select(col("n").as("n_points"), round(beta, 6).as("beta"),
      round(exp((sy - beta * sx) / n), 6).as("k"),
      when(varx > 0 && vary > 0, round(cov * cov / (varx * vary), 6))
        .as("r2"))
  }

  /** TextRank keywords (Mihalcea & Tarau 2004): quantized PageRank
    * ([[Graph.pageRank]]'s exact integer-mass contract) over the
    * corpus-level adjacent-content-word co-occurrence graph. Token
    * stream = `[a-z0-9]+` runs of the lowercased text; stopwords
    * removed KEEPING adjacency (the standard window-over-content-words
    * form); edges are undirected with occurrence-count weights.
    * Pair generation is map-only (per-row transform over the content
    * array — no self-join); the graph agg is vocabulary²-bounded but
    * support-pruned by `minCount` before ranking. */
  def textRank(df0: DataFrame, textCol: String, topK: Int = 30,
               iters: Int = 10, minCount: Int = 2,
               stops: Seq[String] = stopwordsEn): DataFrame = {
    val df = Spread(df0) // r13: parallelize the pair fan-out on one-split inputs
    val toks = regexp_extract_all(lower(col(textCol)),
      lit("[a-z0-9]+"), lit(0))
    val content = filter(toks, t => !t.isin(stops: _*))
    val pairs = df.select(content.as("c"))
      .filter(size(col("c")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("c")) - 2),
        i => struct(least(element_at(col("c"), i + 1),
            element_at(col("c"), i + 2)).as("a"),
          greatest(element_at(col("c"), i + 1),
            element_at(col("c"), i + 2)).as("b")))).as("p"))
      .select(col("p.a").as("wa"), col("p.b").as("wb"))
      .filter(col("wa") =!= col("wb"))
    val edges = pairs.groupBy(col("wa"), col("wb"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    val nodes = edges.select(col("wa").as("wrd"))
      .union(edges.select(col("wb").as("wrd"))).distinct()
    Graph.pageRank(edges, "wa", "wb", "n", nodes, "wrd", iters = iters)
      .select(col("node").as("word"), round(col("pr"), 6).as("textrank"))
      .orderBy(col("textrank").desc, col("word").asc)
      .limit(topK)
  }

  /** Fixed-token document chunking with overlap — the step that turns
    * variable-length documents into model-window-sized sequences
    * (pretraining contexts, RAG passages). Chunk starts advance by
    * `stride` (< chunkSize ⇒ overlapping windows); every start < the
    * doc's token count emits a chunk of up to `chunkSize` tokens, so
    * the tail is always covered. Docs with zero tokens emit nothing.
    *
    * Output: (id, chunk_idx, start_token, n_tokens, chunk_text).
    *
    * Scale shape: map-only — tokens/sequence/posexplode/slice are all
    * native codegen expressions, no UDF, no shuffle; output rows ≈
    * total_tokens/stride, linear in input splits. */
  def chunkTokens(df: DataFrame, textCol: String, idCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride))))
      .select(col(idCol),
        col("pos").as("chunk_idx"),
        col("col").as("start_token"),
        size(slice(col("__toks"), col("col") + 1, lit(chunkSize))).as("n_tokens"),
        array_join(slice(col("__toks"), col("col") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Sequence-length histogram over power-of-two token buckets — the
    * context-window-fit profile that decides packing budgets and
    * truncation policy (where the tokens live: how much of the corpus
    * fits a 2k/8k context, where padding waste would concentrate).
    * bucket_lo = 2^⌊log2 n⌋ via INTEGER bit ops (length of the binary
    * string — exact in any engine, no float log2 edge cases at exact
    * powers of two). One map-side bucket aggregation; the share and
    * cumulative windows run over the ~log2(max_len) bucket rows. */
  def seqLenHistogram(df: DataFrame, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val wc = org.apache.spark.sql.expressions.Window.orderBy(col("bucket_lo"))
    df.select(tokenCount(col(textCol)).cast("long").as("n"))
      .filter(col("n") > 0)
      .withColumn("bucket_lo",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(length(bin(n)) AS INT) - 1)"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      .select(col("bucket_lo"), col("n_docs"), col("n_tokens"),
        round(col("n_docs").cast("double") / sum(col("n_docs")).over(w), 6)
          .as("doc_share"),
        round(col("n_tokens").cast("double") / sum(col("n_tokens")).over(w), 6)
          .as("token_share"),
        round(sum(col("n_tokens")).over(wc).cast("double") /
          sum(col("n_tokens")).over(w), 6).as("cum_token_share"))
  }

  /** Fixed weights of the linear quality classifier — the shape of a
    * fasttext-style keep/drop filter with the model baked in (the
    * sandbox has no trained weights; the PIPELINE is the deliverable:
    * swap the constants for a learned vector and nothing else moves).
    * Weights are over the [[qualityColumns]] feature values as emitted
    * (i.e. post-round(4) ratios), so any engine can replay the score. */
  val QualityWeights: Map[String, Double] = Map(
    "intercept"       -> -2.0,
    "log1p_tokens"    -> 0.55,
    "stopword_ratio"  -> 4.0,
    "punct_ratio"     -> -6.0,
    "avg_token_len"   -> -0.12)

  /** Linear quality classifier: logistic score over the deterministic
    * [[qualityColumns]] features + a keep decision at 0.5. Map-only —
    * one projection, no shuffle; at 100 TB this is a pure scan-side
    * filter that composes with any downstream stage. Score is rounded
    * to 4 decimals (like every cross-engine float in this library). */
  def qualityClassify(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = QualityWeights
    val feats = qualityColumns(col(textCol))
    val base = df.select(col(idCol) +: feats: _*)
    val z = lit(w("intercept")) +
      lit(w("log1p_tokens")) * log1p(col("q_tokens").cast("double")) +
      lit(w("stopword_ratio")) * col("q_stopword_ratio") +
      lit(w("punct_ratio")) * col("q_punct_ratio") +
      lit(w("avg_token_len")) * col("q_avg_token_len")
    base.select(col(idCol),
      col("q_tokens"), col("q_stopword_ratio"), col("q_punct_ratio"),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("quality_score"),
      (lit(1.0) / (lit(1.0) + exp(-z)) >= 0.5).as("keep"))
  }

  /** Dataset card: the per-(source, lang) rollup a curation run
    * publishes — doc/token counts, mean length, and the exact-duplicate
    * rate within the slice (1 − distinct texts / docs). Scale shape:
    * token counting is map-side; the distinct count is over
    * `xxhash64(text)` — 8 bytes/row through the two-exchange
    * count-distinct expand instead of every distinct document's bytes
    * (at 100 TB, distinct-over-raw-text ships the corpus over the wire
    * for a count). Same answer modulo 2⁻⁶⁴ hash collisions, which is
    * also why the oracle can keep counting raw distinct texts. The
    * partial agg on (source, lang, hash) still collapses boilerplate
    * repeats map-side; the final agg keys on the low-cardinality
    * (source, lang). No windows, no collect. */
  def datasetCard(df: DataFrame, textCol: String, srcCol: String,
                  langCol: String): DataFrame =
    df.groupBy(col(srcCol), col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(xxhash64(col(textCol))).as("n_distinct_texts"),
        sum(tokenCount(col(textCol)).cast("long")).as("total_tokens"),
        round(avg(length(col(textCol)).cast("double")), 4).as("avg_chars"),
        round((count(lit(1)) - countDistinct(xxhash64(col(textCol)))).cast("double") /
          count(lit(1)), 4).as("dup_rate"))

  /** Multi-signal curation verdict — the composed keep/drop decision a
    * production filter stage actually emits: every Gopher hard gate,
    * the char-entropy floor (word-soup / repeated-char junk), and the
    * logistic classifier score evaluated together, with the FIRST
    * failing gate named as `reject_reason` (null when kept). Naming
    * the reason is what makes per-gate rejection dashboards and
    * salvage passes ("only re-review docs rejected by the classifier")
    * possible; a bare boolean loses it.
    *
    * Gate priority (fixed, documented, cheap-to-expensive):
    * word_count → mean_word_len → symbol_ratio → alpha_words →
    * stopwords → low_entropy → classifier.
    *
    * Scale shape: map-only, one projection over the scan — zero
    * exchanges; every signal is a codegen'd native expression (entropy
    * is the [[graft.functions.CharEntropy]] expression). At 100 TB this
    * runs at scan speed and composes as the first stage of any
    * curation pipeline.
    *
    * EVERY gate threshold is a parameter (defaults = the Gopher paper
    * values): a code corpus legitimately fails the symbol-ratio rule,
    * non-English text the English stop-word floor, URL-heavy text the
    * alpha-word fraction — each must be relaxable per corpus without
    * abandoning the rest of the battery. Disable an individual rule by
    * pushing its bound out (minStopwords=0, maxSymbolRatio=1, ...). */
  def qualityEnsemble(df: DataFrame, textCol: String, idCol: String,
                      minWords: Int = 10, maxWords: Int = 100000,
                      minEntropy: Double = 3.5,
                      minScore: Double = 0.5,
                      minStopwords: Int = 2,
                      maxSymbolRatio: Double = 0.1,
                      minAlphaFrac: Double = 0.8,
                      minMeanWordLen: Double = 3.0,
                      maxMeanWordLen: Double = 10.0): DataFrame = {
    import graft.functions.CharEntropy.char_entropy
    val w = QualityWeights
    val text = col(textCol)
    val toks = tokens(text)
    val nTok = size(toks)
    val nChars = length(text)
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]")))
    val gopherStop = size(filter(toks, t => lower(t).isin(
      "the", "be", "to", "of", "and", "that", "have", "with")))
    val symbolChars = nChars - length(regexp_replace(text, "[#…]", ""))
    val noWs = length(regexp_replace(text, "\\s+", ""))
    val meanWordLen = when(nTok > 0, noWs.cast("double") / nTok).otherwise(lit(0.0))
    // classifier features replayed exactly as qualityColumns emits them
    // (ratios rounded BEFORE entering the logistic, so any engine can
    // replay the score bit-for-bit)
    val clsStop = size(filter(toks, t => lower(t).isin(stopwordsEn: _*)))
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    val qAvgTokLen = round(meanWordLen, 4)
    val qStopRatio = round(when(nTok > 0, clsStop.cast("double") / nTok)
      .otherwise(lit(0.0)), 4)
    val qPunctRatio = round(when(nChars > 0, punct.cast("double") / nChars)
      .otherwise(lit(0.0)), 4)
    val z = lit(w("intercept")) +
      lit(w("log1p_tokens")) * log1p(nTok.cast("double")) +
      lit(w("stopword_ratio")) * qStopRatio +
      lit(w("punct_ratio")) * qPunctRatio +
      lit(w("avg_token_len")) * qAvgTokLen
    val f = df.select(col(idCol),
      nTok.cast("long").as("n_words"),
      round(meanWordLen, 4).as("mean_word_len"),
      round(when(nTok > 0, symbolChars.cast("double") / nTok)
        .otherwise(lit(0.0)), 4).as("symbol_ratio"),
      round(when(nTok > 0, alphaWords.cast("double") / nTok)
        .otherwise(lit(0.0)), 4).as("alpha_word_frac"),
      gopherStop.cast("long").as("n_stopwords"),
      round(char_entropy(text), 4).as("char_entropy"),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("quality_score"))
    val reason =
      when(!(col("n_words") >= minWords && col("n_words") <= maxWords),
        "word_count")
      .when(!(col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen),
        "mean_word_len")
      .when(col("symbol_ratio") > maxSymbolRatio, "symbol_ratio")
      .when(col("alpha_word_frac") < minAlphaFrac, "alpha_words")
      .when(col("n_stopwords") < minStopwords.toLong, "stopwords")
      .when(col("char_entropy") < minEntropy, "low_entropy")
      .when(col("quality_score") < minScore, "classifier")
    f.withColumn("reject_reason", reason)
      .withColumn("keep", col("reject_reason").isNull)
  }

  /** Perplexity-bucket mixture card: the per-(lang, logprob-bucket)
    * histogram a mixture designer reads before setting sampling
    * temperatures — how many docs/tokens sit in each quality band of
    * each language, and the band's share of its language. Buckets are
    * FIXED-WIDTH floors of the per-doc mean unigram log-probability
    * (width 0.5), not quantiles: quantile buckets need a global sort
    * or an approx sketch, while fixed floors are a map-side cast, keep
    * the bucket key domain tiny and dense, and are reproducible across
    * engines.
    *
    * Scale shape: rides [[unigramLogprob]] (freq agg + token join +
    * per-doc fold), then one partial agg on the low-cardinality
    * (lang, bucket) key and a language-total window over the
    * bucket-count-sized frame — no per-doc window anywhere. */
  def logprobBuckets(df: DataFrame, textCol: String, idCol: String,
                     langCol: String): DataFrame = {
    val perDoc = unigramLogprob(df, textCol, idCol, carryCols = Seq(langCol))
      .withColumnRenamed(langCol, "lang")
    val bucketed = perDoc
      .withColumn("ppl_bucket",
        floor(col("avg_logprob") / 0.5).cast("int"))
      .groupBy(col("lang"), col("ppl_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        round(avg(col("avg_logprob")), 4).as("mean_logprob"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    bucketed
      .withColumn("lang_share",
        round(col("n_docs").cast("double") / sum(col("n_docs")).over(w), 4))
  }

  /** Tokenizer fertility per language: subword-ish tokens per
    * whitespace word and characters per subword token — the
    * vocabulary-fit read a tokenizer owner checks per language before
    * committing a mixture (high fertility = the vocab fragments that
    * language, its token budget buys less text). Uses the same BPE-ish
    * segmentation as [[bpeTokenCount]] so the numbers compose with
    * token_stats/vocab_coverage.
    *
    * Scale shape: map-only per-doc counts, one partial agg on the
    * tiny lang key; ratios are single divisions of exact BIGINT sums.
    */
  def tokenizerFertility(df: DataFrame, textCol: String,
                         langCol: String): DataFrame =
    df.select(col(langCol).as("lang"),
        tokenCount(col(textCol)).cast("long").as("ws"),
        bpeTokenCount(col(textCol)).cast("long").as("bpe"),
        length(col(textCol)).cast("long").as("chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("n_words"),
        sum(col("bpe")).as("n_tokens"),
        sum(col("chars")).as("n_chars"))
      .withColumn("fertility",
        round(col("n_tokens").cast("double") / col("n_words"), 4))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("n_tokens"), 4))

  /** Collocation mining: the corpus's top-N adjacent-token pairs by
    * pointwise mutual information, `PMI = ln(P(xy) / (P(x)·P(y)))` with
    * bigram probability over the bigram stream and unigram
    * probabilities over the token stream. High-PMI pairs are the
    * multiword units ("new york", "source code") a tokenizer or
    * phrase-aware dedup wants as single symbols; a count floor keeps
    * the estimate out of the small-count PMI noise regime.
    *
    * Scale shape: two corpus-keyed partial aggs (token and bigram
    * counts — map-side combine absorbs hot keys), the count floor is
    * applied BEFORE any join so only surviving bigrams (vocabulary-
    * bounded, not corpus-bounded) flow into the two single-row unigram
    * lookups, and the top-N is a TakeOrdered, never a global sort.
    * Totals ride along as 1-row broadcast joins. Determinism: ordering
    * is (rounded PMI desc, w1, w2), so the cut is stable and an
    * external engine replays it exactly. */
  def pmiCollocations(df0: DataFrame, textCol: String,
                      minCount: Long = 5, topN: Int = 50): DataFrame = {
    val df = Spread(df0) // r13: parallelize the tokenize on one-split inputs
    val toksDf = CacheScope.scratch(
      df.select(tokens(lower(col(textCol))).as("tk")))
    val ucnt = CacheScope.scratch(
      toksDf.select(explode(col("tk")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("uc")))
    val utot = ucnt.agg(sum(col("uc")).cast("double").as("n_tok"))
    val big = toksDf.select(
      explode(ngramsWithMultiplicity(col("tk"), 2)).as("gram"))
    val bcnt = big.groupBy(col("gram")).agg(count(lit(1)).as("c_xy"))
    val btot = bcnt.agg(sum(col("c_xy")).cast("double").as("m_big"))
    bcnt.filter(col("c_xy") >= minCount)
      .withColumn("w1", split(col("gram"), " ").getItem(0))
      .withColumn("w2", split(col("gram"), " ").getItem(1))
      .join(ucnt.select(col("w").as("w1"), col("uc").as("c1")), "w1")
      .join(ucnt.select(col("w").as("w2"), col("uc").as("c2")), "w2")
      .crossJoin(broadcast(btot))
      .crossJoin(broadcast(utot))
      .select(col("w1"), col("w2"), col("c_xy"),
        round(log((col("c_xy") / col("m_big")) /
          ((col("c1") / col("n_tok")) * (col("c2") / col("n_tok")))), 4)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** Collocation strength by Dunning's log-likelihood ratio (Dunning
    * 1993): G² over the bigram 2×2 contingency table — the
    * low-frequency-robust replacement for [[pmiCollocations]] (PMI
    * explodes on rare pairs; G² weights by evidence mass). Margins are
    * BIGRAM-based (first-word / second-word totals), each G² is four
    * per-row `k·ln(k·N/E)` terms folded in one fixed expression (no
    * cross-row float sums to pin), and ranking uses the ROUNDED score
    * so both engines break ties identically.
    *
    * Scale shape: same as PMI — one exploded bigram pass, three
    * grouped counts, two margin joins, TakeOrdered. */
  def llrCollocations(df: DataFrame, textCol: String, minCount: Long = 5,
                      topN: Int = 30): DataFrame = {
    val toksDf = CacheScope.scratch(
      df.select(tokens(lower(col(textCol))).as("tk")))
    val big = CacheScope.scratch(
      toksDf.select(explode(ngramsWithMultiplicity(col("tk"), 2)).as("gram"))
        .withColumn("w1", split(col("gram"), " ").getItem(0))
        .withColumn("w2", split(col("gram"), " ").getItem(1)))
    val bcnt = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("k11"))
    val f1 = big.groupBy(col("w1")).agg(count(lit(1)).as("r1"))
    val f2 = big.groupBy(col("w2")).agg(count(lit(1)).as("c1t"))
    val n = big.agg(count(lit(1)).as("nn"))
    def term(k: Column, e: Column) =
      when(k > 0, k.cast("double") *
        log(k.cast("double") * col("nn") / e)).otherwise(lit(0.0))
    val k12 = col("r1") - col("k11")
    val k21 = col("c1t") - col("k11")
    val k22 = col("nn") - col("r1") - col("c1t") + col("k11")
    val nd = col("nn").cast("double")
    val g2 = lit(2.0) * (
      term(col("k11"), col("r1").cast("double") * col("c1t")) +
      term(k12, col("r1").cast("double") * (nd - col("c1t"))) +
      term(k21, (nd - col("r1")) * col("c1t")) +
      term(k22, (nd - col("r1")) * (nd - col("c1t"))))
    bcnt.filter(col("k11") >= minCount)
      .join(f1, "w1").join(f2, "w2").crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("k11").as("c_xy"),
        round(g2, 4).as("llr_g2"))
      .orderBy(col("llr_g2").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** Interpolated bigram language-model score per document — the
    * CCNet-style perplexity filter one tier above [[unigramLogprob]]:
    * each in-document bigram (w1,w2) scores
    * `ln(λ·c(w1 w2)/c(w1) + (1−λ)·c(w2)/N)` under the corpus's own
    * counts, and the document's quality signal is the mean. Word soup
    * scores near the unigram floor; text whose local order matches
    * corpus statistics scores higher. Docs with <2 tokens report
    * (0, 0.0).
    *
    * Scale shape: identical to [[unigramLogprob]] one level up — one
    * (gram) partial agg builds the bigram table, one (token) partial
    * agg the unigram table, the exploded bigram stream joins each on
    * its single key (hot grams join ONE row; no skew hazard), and the
    * per-doc agg folds the logs. The corpus total is one scalar. At
    * 100 TB both count tables are disk-resident shuffle joins;
    * broadcast a top-K vocabulary with a backoff-to-unigram fallback
    * if they dominate. */
  def bigramLogprob(df: DataFrame, textCol: String, idCol: String,
                    lambda: Double = 0.7, residual: Double = 0.3): DataFrame = {
    // `residual` is an explicit literal, not `1 - lambda`: the computed
    // difference (0.30000000000000004) differs from the literal 0.3 an
    // external replay would write, and the discrepancy survives rounding
    // often enough to matter at corpus scale.
    val toksDf = CacheScope.scratch(df.select(col(idCol).as("lp_id"),
      tokens(lower(col(textCol))).as("tk")))
    val ucnt = CacheScope.scratch(
      toksDf.select(explode(col("tk")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("uc")))
    val utot = ucnt.agg(sum(col("uc")).cast("double").as("n_tok"))
    val docBig = CacheScope.scratch(toksDf.select(col("lp_id"),
      explode(ngramsWithMultiplicity(col("tk"), 2)).as("gram")))
    val bcnt = docBig.groupBy(col("gram")).agg(count(lit(1)).as("c_xy"))
    val perDoc = docBig
      .join(bcnt, "gram")
      .withColumn("w1", split(col("gram"), " ").getItem(0))
      .withColumn("w2", split(col("gram"), " ").getItem(1))
      .join(ucnt.select(col("w").as("w1"), col("uc").as("c1")), "w1")
      .join(ucnt.select(col("w").as("w2"), col("uc").as("c2")), "w2")
      .crossJoin(broadcast(utot))
      .groupBy(col("lp_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(log(lit(lambda) * (col("c_xy") / col("c1")) +
          lit(residual) * (col("c2") / col("n_tok")))) / count(lit(1)), 4)
          .as("avg_logprob"))
    df.select(col(idCol))
      .join(perDoc, col(idCol) === col("lp_id"), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Interpolated TRIGRAM log-likelihood scorer:
    * p(w₃|w₁w₂) = λ₃·c₁₂₃/c₁₂ + λ₂·c₂₃/c(w₂) + λ₁·c(w₃)/N — one more
    * context order than [[bigramLogprob]], the fluency scorer that
    * separates scrambled from coherent text (a bigram model cannot see
    * across the middle word). Same shape: exact-integer n-gram count
    * frames joined back to per-doc occurrences; the log fold runs over
    * the small per-doc group (the bigram scorer's contract). λ values
    * are EXPLICIT literals, never computed differences. */
  def trigramLogprob(df: DataFrame, textCol: String, idCol: String,
                     l3: Double = 0.6, l2: Double = 0.3,
                     l1: Double = 0.1): DataFrame = {
    val toksDf = CacheScope.scratch(df.select(col(idCol).as("lp_id"),
      tokens(lower(col(textCol))).as("tk")))
    val ucnt = CacheScope.scratch(
      toksDf.select(explode(col("tk")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("uc")))
    val utot = ucnt.agg(sum(col("uc")).cast("double").as("n_tok"))
    val bcnt = CacheScope.scratch(
      toksDf.select(explode(ngramsWithMultiplicity(col("tk"), 2)).as("g2"))
        .groupBy(col("g2")).agg(count(lit(1)).as("c2g")))
    val docTri = CacheScope.scratch(toksDf.select(col("lp_id"),
      explode(ngramsWithMultiplicity(col("tk"), 3)).as("g3")))
    val tcnt = docTri.groupBy(col("g3")).agg(count(lit(1)).as("c123"))
    val sp = split(col("g3"), " ")
    val perDoc = docTri.join(tcnt, "g3")
      .withColumn("w1", sp.getItem(0))
      .withColumn("w2", sp.getItem(1))
      .withColumn("w3", sp.getItem(2))
      .withColumn("g12", concat_ws(" ", col("w1"), col("w2")))
      .withColumn("g23", concat_ws(" ", col("w2"), col("w3")))
      .join(bcnt.select(col("g2").as("g12"), col("c2g").as("c12")), "g12")
      .join(bcnt.select(col("g2").as("g23"), col("c2g").as("c23")), "g23")
      .join(ucnt.select(col("w").as("w2"), col("uc").as("cw2")), "w2")
      .join(ucnt.select(col("w").as("w3"), col("uc").as("cw3")), "w3")
      .crossJoin(broadcast(utot))
      .groupBy(col("lp_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        round(sum(log(lit(l3) * (col("c123") / col("c12")) +
          lit(l2) * (col("c23") / col("cw2")) +
          lit(l1) * (col("cw3") / col("n_tok")))) / count(lit(1)), 4)
          .as("avg_logprob"))
    df.select(col(idCol))
      .join(perDoc, col(idCol) === col("lp_id"), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Quality-gate co-failure matrix: for the four hard Gopher-style
    * gates (too short / too few stopwords / symbol-heavy / non-alpha),
    * the pairwise co-failure counts and Jaccard overlaps — "are my
    * gates four filters or one filter written four times". A pair with
    * Jaccard ≈ 1 is redundant; near 0, the gates cut independent
    * slices. ONE map-side pass (indicator products summed in a single
    * aggregation), then a literal pair explode — no joins at all. */
  def gateOverlapMatrix(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nTok = size(toks)
    val gopherStop = size(filter(toks, t => lower(t).isin(
      "the", "be", "to", "of", "and", "that", "have", "with")))
    val symbolChars = length(text) - length(regexp_replace(text, "[#…]", ""))
    val symbolRatio = round(when(nTok > 0,
      symbolChars.cast("double") / nTok).otherwise(lit(0.0)), 4)
    val alphaFrac = round(when(nTok > 0,
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nTok)
      .otherwise(lit(0.0)), 4)
    val gates: Seq[(String, Column)] = Seq(
      "short" -> (nTok < 10),
      "few_stopwords" -> (gopherStop < 2),
      "symbol_heavy" -> (symbolRatio > 0.1),
      "non_alpha" -> (alphaFrac < 0.8))
    val b = df.select(gates.map { case (n, c) =>
      when(c, 1L).otherwise(0L).as(n) }: _*)
    val sums: Seq[Column] = count(lit(1)).as("n_docs") +:
      (for { i <- gates.indices; j <- gates.indices if i <= j }
        yield sum(col(gates(i)._1) * col(gates(j)._1)).as(s"s_${i}_$j"))
    val agg = b.agg(sums.head, sums.tail: _*)
    val rows = for { i <- gates.indices; j <- gates.indices if i < j }
      yield struct(lit(gates(i)._1).as("gate_a"),
        lit(gates(j)._1).as("gate_b"),
        col(s"s_${i}_$i").as("fail_a"), col(s"s_${j}_$j").as("fail_b"),
        col(s"s_${i}_$j").as("co_fail"))
    agg.select(col("n_docs"), explode(array(rows: _*)).as("x"))
      .select(col("x.gate_a"), col("x.gate_b"), col("n_docs"),
        col("x.fail_a"), col("x.fail_b"), col("x.co_fail"),
        round(when(col("x.fail_a") + col("x.fail_b") - col("x.co_fail") > 0,
          col("x.co_fail").cast("double") /
            (col("x.fail_a") + col("x.fail_b") - col("x.co_fail")))
          .otherwise(lit(0.0)), 6).as("jaccard"))
  }

  /** Per-doc Unicode SCRIPT mix: counts and fractions of ASCII-Latin
    * letters, digits, Han, Cyrillic, and Arabic codepoints — the
    * router a multilingual pipeline needs BEFORE language-ID (n-gram
    * lang-id assumes one script; a 60/40 Latin/Han doc needs
    * splitting, not classifying). Map-only codegen'd regexp counts,
    * zero exchanges. Script classes use each engine's own property
    * syntax (Java `\p{IsHan}` / RE2 `\p{Han}`) for the SAME Unicode
    * script sets. */
  def scriptMix(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    def cnt(re: String) = regexp_count(col(textCol), lit(re)).cast("long")
    val len = length(col(textCol)).cast("long")
    def frac(c: Column) =
      when(len > 0, round(c.cast("double") / len, 4))
    val latin = cnt("[A-Za-z]"); val digit = cnt("[0-9]")
    val han = cnt("\\p{IsHan}"); val cyr = cnt("\\p{IsCyrillic}")
    val arab = cnt("\\p{IsArabic}")
    df.select(col(idCol), len.as("n_chars"),
      latin.as("n_latin"), digit.as("n_digit"), han.as("n_han"),
      cyr.as("n_cyrillic"), arab.as("n_arabic"),
      frac(latin).as("frac_latin"), frac(han).as("frac_han"),
      frac(cyr).as("frac_cyrillic"), frac(arab).as("frac_arabic"))
  }

  /** Interpolated Kneser–Ney bigram log-probability (Kneser–Ney 1995 /
    * Chen–Goodman 1998, fixed discount D): the smoothing that actually
    * ships in n-gram quality scorers —
    *   P(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁)
    *            + (D·N₁₊(w₁·)/c(w₁)) · N₁₊(·w₂)/N_types,
    * where the backoff weight redistributes exactly the discounted
    * mass and the continuation probability N₁₊(·w₂)/N_types scores a
    * word by how many CONTEXTS it follows, not raw frequency (the
    * "san FRANCISCO" correction plain interpolation gets wrong).
    * Same relational shape as [[bigramLogprob]] plus two
    * distinct-count relations off the SAME bigram-type frame — all
    * counts exact integers, one log per bigram instance. */
  def bigramLogprobKn(df: DataFrame, textCol: String, idCol: String,
                      discount: Double = 0.75): DataFrame = {
    val toksDf = CacheScope.scratch(df.select(col(idCol).as("lp_id"),
      tokens(lower(col(textCol))).as("tk")))
    val ucnt = toksDf.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("uc"))
    val docBig = CacheScope.scratch(toksDf.select(col("lp_id"),
      explode(ngramsWithMultiplicity(col("tk"), 2)).as("gram")))
    val bcnt = CacheScope.scratch(
      docBig.groupBy(col("gram")).agg(count(lit(1)).as("c_xy"))
        .withColumn("w1", split(col("gram"), " ").getItem(0))
        .withColumn("w2", split(col("gram"), " ").getItem(1)))
    val cont = bcnt.groupBy(col("w1")).agg(count(lit(1)).as("nc1"))
    val lft = bcnt.groupBy(col("w2")).agg(count(lit(1)).as("nl2"))
    val nbt = bcnt.agg(count(lit(1)).cast("double").as("nbt"))
    val perDoc = docBig
      .withColumn("w1", split(col("gram"), " ").getItem(0))
      .withColumn("w2", split(col("gram"), " ").getItem(1))
      .join(bcnt.select(col("gram"), col("c_xy")), "gram")
      .join(ucnt.select(col("w").as("w1"), col("uc").as("c1")), "w1")
      .join(cont, "w1")
      .join(lft, "w2")
      .crossJoin(broadcast(nbt))
      .groupBy(col("lp_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(log(
          greatest(col("c_xy") - lit(discount), lit(0.0)) / col("c1") +
            (lit(discount) * col("nc1") / col("c1")) *
              (col("nl2") / col("nbt"))))
          / count(lit(1)), 4).as("avg_logprob_kn"))
    df.select(col(idCol))
      .join(perDoc, col(idCol) === col("lp_id"), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logprob_kn"), lit(0.0)).as("avg_logprob_kn"))
  }

  /** Mine the top-N BPE merges and re-encode the corpus with them in
    * one pipeline — the full induction-round loop (select → apply →
    * measure). The collect is the N-row merge table (the ANN-codebook
    * precedent: the artifact is tiny by construction, the corpus never
    * moves); application is the [[graft.functions.BpeApply]] native
    * expression, map-only over the scan. Returns per-group token
    * compression: the measure that decides whether another merge round
    * pays for itself. */
  def bpeCompressionStats(df: DataFrame, textCol: String, grpCol: String,
                          topN: Int): DataFrame = {
    val merges = topBigramMerges(df, textCol, topN).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    df.select(col(grpCol).as("grp"),
        tokenCount(col(textCol)).cast("long").as("n_in"),
        size(graft.functions.BpeApply.bpe_apply(lower(col(textCol)), merges))
          .cast("long").as("n_out"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_in")).as("tokens_in"),
        sum(col("n_out")).as("tokens_out"),
        round(sum(col("n_out")).cast("double") / sum(col("n_in")), 4)
          .as("compression"))
  }

  /** Zipf rank-frequency profile: OLS slope of ln(freq) on ln(rank)
    * over the top-N vocabulary — natural corpora slope toward −1
    * (Zipf's law); a flat slope flags synthetic/templated text the
    * same way a Benford miss flags fabricated amounts. One term-count
    * aggregation over the scan; the regression runs on the N-point
    * frame (closed-form sums, deterministic under the
    * (freq desc, term) rank order). */
  /** Automated Readability Index (Senter & Smith 1967) per document —
    * the count-only readability score (no syllable heuristics, so the
    * integer inputs are engine-exact): ARI = 4.71·chars/words +
    * 0.5·words/sentences − 21.43, chars = non-whitespace characters,
    * sentences = runs of sentence punctuation (floor 1). Map-only,
    * zero exchanges; the readability twin of the Gopher length gates. */
  def readability(df: DataFrame, textCol: String,
                  idCol: String = "doc_id"): DataFrame = {
    val nChars = length(regexp_replace(col(textCol), "\\s", ""))
    val nWords = size(tokens(col(textCol)))
    val nSent = greatest(lit(1),
      size(split(col(textCol), "[.!?]+")) - 1)
    df.select(col(idCol),
        nChars.cast("long").as("n_chars"),
        nWords.cast("long").as("n_words"),
        nSent.cast("long").as("n_sentences"))
      .withColumn("ari",
        // explicit floor(x·1e4 + 0.5)/1e4 instead of round(): the raw
        // score lands on 4-dp midpoints (0.5·words/sentences is exact
        // halves), where BigDecimal HALF_UP and DuckDB's scaled round
        // disagree by 1 ulp — this form is the same IEEE ops on both
        when(col("n_words") > 0,
          floor((lit(4.71) * col("n_chars").cast("double") / col("n_words")
            + lit(0.5) * col("n_words").cast("double") / col("n_sentences")
            - lit(21.43)) * 1e4 + 0.5) / 1e4))
      .orderBy(col(idCol))
  }

  /** Unigram-distribution divergence between two corpus slices —
    * KL(A‖B), KL(B‖A), and the symmetric bounded Jensen–Shannon
    * divergence over the union top-N vocabulary with add-one
    * smoothing: the vocabulary-level domain-shift signal (PSI's text
    * twin; DSIR's importance weights are the per-doc form of the same
    * ratio). Shapes: one token agg (vocabulary-bounded, the zipf
    * frame), a topN window on that frame, then term math with each
    * term QUANTIZED to a long at 1e-12 so the sums are associative —
    * bit-identical under any partitioning, the PageRank integer-mass
    * contract. */
  def vocabDivergence(df: DataFrame, textCol: String, sliceACond: Column,
                      topN: Int = 100): DataFrame = {
    val toks = df.select(sliceACond.as("is_a"),
      explode(tokens(lower(col(textCol)))).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
    // distributed top-k (TakeOrderedAndProject), NOT a global
    // row_number window: the vocabulary frame scales with the corpus
    // and a partition-less rank funnels it through one task (r11
    // audit — same class as the rfm/quantile-norm ntile fix). The
    // total order (mass desc, tok) is unique, so limit() selects the
    // identical row set the rank filter did.
    val top = counts
      .orderBy((col("ca") + col("cb")).desc, col("tok")).limit(topN)
    val tot = top.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    def quant(x: Column): Column = round(x * lit(1e12), 0).cast("long")
    val terms = top.crossJoin(broadcast(tot))
      .withColumn("p", (col("ca") + 1).cast("double") / (col("na") + col("v")))
      .withColumn("q", (col("cb") + 1).cast("double") / (col("nb") + col("v")))
      .withColumn("m", (col("p") + col("q")) / 2)
    terms.agg(
        first(col("v")).as("vocab_size"),
        sum(quant(col("p") * log(col("p") / col("q")))).as("skl_ab"),
        sum(quant(col("q") * log(col("q") / col("p")))).as("skl_ba"),
        sum(quant(col("p") * log(col("p") / col("m")) / 2
          + col("q") * log(col("q") / col("m")) / 2)).as("sjs"))
      .select(col("vocab_size"),
        round(col("skl_ab").cast("double") / 1e12, 6).as("kl_ab"),
        round(col("skl_ba").cast("double") / 1e12, 6).as("kl_ba"),
        round(col("sjs").cast("double") / 1e12, 6).as("js"))
  }

  /** Good–Turing missing mass + Chao1 richness per group — the
    * "how much vocabulary have we NOT seen yet" crawl-planning card:
    * P(next token is unseen) ≈ N₁/N (Good 1953), total-vocabulary
    * estimate = V + N₁²/(2N₂) (Chao 1984). A collapsing missing mass
    * says the source is exhausted; a high one says keep crawling —
    * the token-level twin of the HLL novelty watch. All inputs are
    * exact integer counts (V, N, singletons N₁, doubletons N₂);
    * the two divisions are the only doubles. Two partial aggs
    * (token counts → frequency-of-frequency), nothing else. */
  def vocabMissingMass(df: DataFrame, grpCol: String,
                       textCol: String): DataFrame = {
    val tc = df.select(col(grpCol).as("grp"),
        explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("c"))
    tc.groupBy(col("grp"))
      .agg(count(lit(1)).as("vocab"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
      .select(col("grp").as(grpCol), col("vocab"), col("n_tokens"),
        col("n1"), col("n2"),
        round(col("n1").cast("double") / col("n_tokens"), 6)
          .as("missing_mass"),
        when(col("n2") > 0,
          round(col("vocab") + col("n1").cast("double") * col("n1")
            / (lit(2.0) * col("n2")), 4))
          .as("chao1_vocab"))
      .orderBy(col(grpCol))
  }

  /** Subword-vocabulary seeding — the unigram-LM (SentencePiece,
    * Kudo & Richardson 2018) counterpart to the BPE merge miner
    * ([[topBigramMerges]]): enumerate every within-token character
    * substring of length [minLen, maxLen], count corpus-wide, score
    * by count·(len−1) (the compression gain of replacing the piece
    * with one symbol), and keep the top-V above a count floor — the
    * seed vocabulary the unigram-LM EM prune starts from. Where BPE
    * grows pieces bottom-up one merge at a time, this surfaces
    * high-value LONG pieces directly.
    *
    * Scale shape: map-side substring explode (bounded ≈ maxLen
    * substrings per character), one count agg with map-side combine,
    * count-floor prune BEFORE ranking, TakeOrdered top-V. */
  def subwordVocab(df0: DataFrame, textCol: String, minLen: Int = 2,
                   maxLen: Int = 6, topV: Int = 50,
                   minCount: Long = 2): DataFrame = {
    // r13: the substring fan-out is the whole cost — parallelize it on
    // one-split inputs (measured 3 serial tasks at sf0.1)
    val subs = Spread(df0).select(explode(tokens(lower(col(textCol)))).as("tok"))
      .filter(length(col("tok")) >= minLen)
      .select(col("tok"),
        explode(sequence(lit(minLen), least(lit(maxLen), length(col("tok")))))
          .as("l"))
      .select(explode(expr(
        "transform(sequence(0, length(tok) - l), i -> substr(tok, i + 1, l))"))
        .as("piece"))
    subs.groupBy(col("piece")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .withColumn("score", col("cnt") * (length(col("piece")) - 1))
      .orderBy(col("score").desc, col("piece").asc)
      .limit(topV)
  }

  def zipfProfile(df: DataFrame, textCol: String,
                  topN: Int = 100): DataFrame = {
    val tc = df.select(explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    // distributed top-k first (vocab is corpus-scaled — see
    // vocabDivergence), then rank INSIDE the topN-bounded frame; the
    // rank window partitions on a constant-valued attribute expression
    // so no WindowExec in the plan is partition-less
    val w = Window.partitionBy(pmod(length(col("tok")), lit(1)))
      .orderBy(col("c").desc, col("tok"))
    val top = tc.orderBy(col("c").desc, col("tok")).limit(topN)
      .withColumn("rk", row_number().over(w).cast("long"))
    val pts = top.select(log(col("rk").cast("double")).as("x"),
      log(col("c").cast("double")).as("y"))
    val agg = pts.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    agg.crossJoin(broadcast(tc.agg(count(lit(1)).as("n_vocab"))))
      .select(col("n_vocab"), round(slope, 4).as("zipf_slope"),
        round((col("sy") - slope * col("sx")) / col("n"), 4).as("intercept"))
  }

  /** Distinct-n diversity per group (Li et al., NAACL 2016): for
    * n = 1..maxN, the share of UNIQUE n-grams among all n-grams — the
    * standard repetitiveness/diversity readout for generated corpora
    * (distinct-2 near 0 ⇒ the source is template spam or decode-mode
    * collapse). N-grams stay within documents (no cross-doc joins);
    * building them is a bounded map-side transform over the token
    * array, then one exact count + count-distinct per (group, n). */
  def distinctN(df: DataFrame, textCol: String, grpCol: Column,
                maxN: Int = 3): DataFrame = {
    val base = df.select(grpCol.as("g"),
      tokens(lower(col(textCol))).as("t"))
    (1 to maxN).map { n =>
      val grams =
        if (n == 1) col("t")
        else when(size(col("t")) >= n,
          transform(sequence(lit(1), size(col("t")) - (n - 1)), i =>
            concat_ws(" ", (0 until n).map(o =>
              element_at(col("t"), i + o)): _*)))
          .otherwise(array())
      base.select(col("g"), explode(grams).as("gram"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n_grams"),
          countDistinct(col("gram")).as("n_unique"))
        .select(col("g"), lit(n).as("n"), col("n_grams"), col("n_unique"),
          round(col("n_unique").cast("double") / col("n_grams"), 6)
            .as("distinct_n"))
    }.reduce(_ unionAll _)
  }

  /** Markdown/structure profile per document: line counts for ATX
    * headings, code fences, and list bullets, plus inline link count
    * and a 0–4 signal score — the format router a mixed web/docs
    * corpus needs before choosing a text-vs-markup cleaning path
    * (stripping "markup" from real markdown destroys code blocks;
    * keeping it in prose poisons token stats).
    *
    * Map-only: one line split + anchored per-line regexes + one
    * full-text link scan; no shuffle at all. */
  def markdownProfile(df: DataFrame, textCol: String,
                      idCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    def nMatch(re: String) =
      size(filter(lines, l => l.rlike(re))).cast("long")
    df.select(col(idCol),
        size(lines).cast("long").as("n_lines"),
        nMatch("^#{1,6} ").as("n_headings"),
        nMatch("^```").as("n_fences"),
        nMatch("^[-*] ").as("n_list_lines"),
        regexp_count(col(textCol), lit("\\[[^\\]]+\\]\\([^)]+\\)"))
          .cast("long").as("n_links"))
      .withColumn("md_signals",
        (col("n_headings") > 0).cast("int") +
        (col("n_fences") > 0).cast("int") +
        (col("n_list_lines") > 0).cast("int") +
        (col("n_links") > 0).cast("int"))
  }

  /** Lexical-diversity card per group: token mass N, type count V,
    * type–token ratio V/N, hapax share V₁/V, and Yule's K
    * = 10⁴·(Σ_t c_t² − N)/N² (Yule 1944) — the repeat-rate measure
    * that, unlike raw TTR, barely moves with corpus size, so it
    * compares sources of different volume honestly. Low K ⇒ varied
    * vocabulary; high K ⇒ repetitive/templated text.
    *
    * Same whitespace-token contract as the vocab battery. Two hash
    * groupBys (corpus → (g, token) counts → per-g moments); Σc² rides
    * decimal(38,0) (a 10⁹-count token alone passes 2^63). */
  def lexicalDiversity(df: DataFrame, textCol: String,
                       grpCol: Column): DataFrame = {
    val tc = df.select(grpCol.as("g"),
        explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy(col("g"), col("tok")).agg(count(lit(1)).as("c"))
    val m = tc.groupBy(col("g"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("sc2"))
    m.select(col("g"), col("n_tokens"), col("n_types"), col("n_hapax"),
      round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
      round(col("n_hapax").cast("double") / col("n_types"), 6)
        .as("hapax_share"),
      round(lit(1e4) * (col("sc2").cast("double") - col("n_tokens")) /
        (col("n_tokens").cast("double") * col("n_tokens")), 4).as("yule_k"))
  }
}
