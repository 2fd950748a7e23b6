package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the step before any
  * URL-keyed dedup: crawl frontiers emit the same page as
  * `HTTPS://WWW.Site.COM:443/p/?utm_source=feed#frag` and
  * `https://site.com/p`, and URL-exact dedup without canonicalization
  * silently under-merges.
  *
  * Normalization applied (all native codegen expressions, one
  * projection, zero exchanges; the regex subset is RE2-safe — no
  * lookaround, no backreferences — so an external engine can replay
  * every step verbatim):
  *   1. lowercase scheme + authority (path/query case is preserved);
  *   2. drop the fragment;
  *   3. drop explicit default ports (`https…:443`, `http…:80`);
  *   4. drop a leading `www.` label;
  *   5. drop `utm_*` tracking params, keeping the relative order of
  *      the survivors, and the `?` itself when none survive;
  *   6. drop a trailing path slash.
  *
  * Not attempted (documented non-goals): percent-decoding, IDN/punycode
  * folding, and query-param re-sorting — those change byte semantics
  * and belong to a site-specific policy layer.
  */
object UrlOps {

  /** Canonical form of a raw absolute URL. */
  def normalizeUrl(u: Column): Column = {
    val lowered = concat(
      lower(regexp_extract(u, "^([^/?#]*://[^/?#]*)", 1)),
      regexp_replace(u, "^[^/?#]*://[^/?#]*", ""))
    val noFrag = regexp_replace(lowered, "#.*$", "")
    val noPort = regexp_replace(
      regexp_replace(noFrag, "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2"),
      "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    val base = regexp_replace(
      regexp_replace(noWww, "\\?.*$", ""), "/$", "")
    val query = regexp_extract(noWww, "\\?(.*)$", 1)
    val keep = filter(split(query, "&"),
      p => (!p.startsWith("utm_")) && p =!= "")
    when(size(keep) > 0, concat(base, lit("?"), concat_ws("&", keep)))
      .otherwise(base)
  }

  /** Host (no port) of a normalized URL. */
  def hostOf(normUrl: Column): Column =
    regexp_extract(normUrl, "^[^/?#]*://([^/?#:]*)", 1)

  /** Last-two-labels registrable domain — the blocklist/rollup key.
    * (A production deployment swaps in the public-suffix list; the
    * two-label rule is the deterministic, dependency-free core.) */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Every suffix of `host` with ≥2 labels, the host itself included:
    * `a.b.example.io` → [`a.b.example.io`, `b.example.io`, `example.io`].
    * This is how "block a domain AND its subdomains" becomes an
    * EQUI-join: a host has ≤ a handful of labels, so the expansion is
    * a constant-factor explode, never a suffix scan of the blocklist. */
  def domainSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    filter(
      transform(sequence(lit(0), greatest(size(labels) - 2, lit(0))),
        i => when(i <= size(labels) - 2,
          concat_ws(".", slice(labels, i + 1, size(labels) - i)))),
      s => s.isNotNull)
  }

  /** URL-keyed dedup + blocklist rollup per group: raw URL count,
    * distinct canonical URLs, the dup share canonicalization exposed,
    * and how many raw URLs a domain blocklist (domain + its subdomains)
    * removes. Blocklist matching runs on the DISTINCT-host dimension —
    * suffix-explode each host, broadcast hash equi-join against the
    * blocklist, then flag the url rows with one more host-keyed
    * broadcast join. URL rows never explode and never see a non-equi
    * predicate. */
  def urlDedupStats(urls: DataFrame, rawCol: String, grpCol: String,
                    blocklist: DataFrame): DataFrame = {
    val normed = urls.withColumn("__norm", normalizeUrl(col(rawCol)))
      .withColumn("__host", hostOf(col("__norm")))
    val blockedHosts = normed.select(col("__host")).distinct()
      .withColumn("__sfx", explode(domainSuffixes(col("__host"))))
      .join(broadcast(blocklist.select(col("domain").as("__sfx"))), Seq("__sfx"))
      .select(col("__host")).distinct()
      .withColumn("__blocked", lit(1L))
    // no broadcast hint here: blocked-host cardinality is data-dependent
    // (bounded by the blocklist's reach, not by the corpus — but a
    // wildcard-ish blocklist can make it large); the key is an equi-join
    // either way, so AQE picks broadcast when it fits
    normed.join(blockedHosts, Seq("__host"), "left")
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n_raw"),
        countDistinct(col("__norm")).as("n_norm"),
        round(lit(1.0) - countDistinct(col("__norm")).cast("double") /
          count(lit(1)), 4).as("dup_share"),
        sum(coalesce(col("__blocked"), lit(0L))).as("n_blocked"))
  }
}
