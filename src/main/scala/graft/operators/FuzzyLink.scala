package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance record linkage — the fuzzy-string member of
  * the dedup family ([[Dedup]] covers token/shingle/embedding
  * similarity; this covers typo-level variation in short key strings:
  * names, titles, product labels, venue strings).
  *
  * The scale discipline is dictionary-first: real corpora repeat key
  * strings heavily, so pairs are mined over the DISTINCT-value
  * dictionary (with per-value row counts carried along), never row×row.
  * A blocking key (caller-supplied expression — last token, prefix,
  * phonetic bucket) turns the dictionary self-join into an equi-join;
  * candidate pairs are verified with `levenshtein` (codegen'd built-in)
  * under `maxDist`. At 100 TB the dictionary is orders of magnitude
  * smaller than the fact table and the block key bounds every join
  * bucket — the only quadratic work is within-block dictionary pairs,
  * the same bound every blocking-based ER system (Fellegi–Sunter
  * lineage) accepts by construction.
  */
object FuzzyLink {

  /** Distinct-value dictionary of `nameCol` with row counts and the
    * blocking key. */
  def dictionary(df: DataFrame, nameCol: String, blockExpr: Column): DataFrame =
    df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("block", blockExpr)

  /** Within-block dictionary pairs (name_a < name_b) with edit distance
    * ≤ `maxDist`. `pair_rows` = how many underlying row pairs each
    * dictionary pair represents (cnt_a · cnt_b) — the linkage "mass"
    * without ever joining the fact rows. */
  def blockedPairs(df: DataFrame, nameCol: String, blockExpr: Column,
                   maxDist: Int): DataFrame = {
    val dim = dictionary(df, nameCol, blockExpr)
    val a = dim.select(col("block"), col("name").as("name_a"),
      col("cnt").as("cnt_a"))
    val b = dim.select(col("block"), col("name").as("name_b"),
      col("cnt").as("cnt_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"),
        (col("cnt_a") * col("cnt_b")).as("pair_rows"))
  }

  /** Canonicalization map: every matched name → the canonical
    * representative of its fuzzy cluster (min name under ≤-maxDist
    * min-label connected components over the blocked pair graph).
    * Unmatched names map to themselves. Consumes [[blockedPairs]]
    * output; the label propagation is [[Clustering.connectedComponents]]
    * on the name dictionary (ids = dense hash of name is avoided — the
    * component runs directly on string labels via min-string folding,
    * bounded by block size, iterated to fixpoint like min-label CC). */
  def canonicalMap(pairs: DataFrame, dict: DataFrame): DataFrame = {
    // Min-string label propagation over the (undirected) pair edges.
    // Blocks bound component diameter in practice (names in a block
    // share the blocking token), so a handful of rounds converge; we
    // iterate to fixpoint with a driver-side count check per round
    // (rounds, not rows — the per-round work is two equi-joins).
    var labels = dict.select(col("name"), col("name").as("canon"))
    val edges = pairs.select(col("name_a"), col("name_b"))
      .union(pairs.select(col("name_b").as("name_a"),
        col("name_a").as("name_b")))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 16) {
      val viaEdge = edges
        .join(labels.withColumnRenamed("name", "name_b")
          .withColumnRenamed("canon", "nb_canon"), Seq("name_b"))
        .groupBy(col("name_a").as("name"))
        .agg(min(col("nb_canon")).as("edge_canon"))
      val next = labels.join(viaEdge, Seq("name"), "left")
        .select(col("name"),
          least(col("canon"), coalesce(col("edge_canon"), col("canon")))
            .as("canon"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("canon", "old"), Seq("name"))
        .filter(col("canon") =!= col("old")).count()
      labels = next
      rounds += 1
    }
    labels
  }

  /** [[blockedPairs]] scored with Jaro–Winkler (and unboosted Jaro) —
    * the linkage surface person/org names want, where Levenshtein
    * over-penalizes transposed syllables. The candidate gate stays the
    * integer edit distance (exact in any engine); the JW score is an
    * output column, so float-boundary effects can never change WHICH
    * pairs are emitted, only their 6-dp-rounded score. Same
    * dictionary-first blocked equi-join shape. */
  def jwScoredPairs(df: DataFrame, nameCol: String, blockExpr: Column,
                    maxDist: Int): DataFrame = {
    import graft.functions.JaroWinklerSim.jaro_winkler_sim
    blockedPairs(df, nameCol, blockExpr, maxDist)
      .withColumn("jw",
        round(jaro_winkler_sim(col("name_a"), col("name_b")), 6))
  }

  /** Within-block pairs gated on TRUE Damerau–Levenshtein ≤ maxDist —
    * transposition-tolerant edit distance, so "marta"/"matra" style
    * swaps cost 1 where plain Levenshtein charges 2. Emits both
    * distances; the gap (`lev − dl`) is exactly the edit mass the
    * transposition op absorbed. Integer gate → cross-engine exact. */
  def dlPairs(df: DataFrame, nameCol: String, blockExpr: Column,
              maxDist: Int): DataFrame = {
    import graft.functions.DamerauLevenshtein.damerau_levenshtein
    val dim = dictionary(df, nameCol, blockExpr)
    val a = dim.select(col("block"), col("name").as("name_a"),
      col("cnt").as("cnt_a"))
    val b = dim.select(col("block"), col("name").as("name_b"),
      col("cnt").as("cnt_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dl", damerau_levenshtein(col("name_a"), col("name_b")))
      .filter(col("dl") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dl"),
        levenshtein(col("name_a"), col("name_b")).as("lev"),
        (col("cnt_a") * col("cnt_b")).as("pair_rows"))
  }

  /** Sorted-neighborhood candidate generation (Hernández–Stolfo 1995)
    * — the complementary blocking strategy to the equi-join blocks
    * above: instead of "same block key", candidates are "within
    * `window` positions of each other in sort order", which catches
    * matches an equality block splits (typo in the block token itself)
    * at linear candidate cost (each dictionary entry pairs with at
    * most window−1 neighbors).
    *
    * Scale shape: the sort runs INSIDE coarse partitions
    * (`partExpr` — e.g. a 1–2 char prefix), never as a global
    * single-partition window; each partition's neighbor generation is
    * `window−1` `lead()`s over one partitioned-and-sorted pass, then
    * a map-side explode + codegen'd edit-distance gate. Pairs whose
    * members fall in different partitions are not candidates — the
    * standard sorted-blocks tradeoff, tuned by partExpr granularity
    * (multi-pass SNM with rotated sort keys is the classic recall
    * fix and composes by unioning passes). */
  def sortedNeighborhoodPairs(df: DataFrame, nameCol: String,
                              partExpr: Column, sortExpr: Column,
                              window: Int, maxDist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("name"), col("cnt"), partExpr.as("part"),
        sortExpr.as("skey"))
    val w = Window.partitionBy(col("part")).orderBy(col("skey"), col("name"))
    // window exprs hoisted to top-level columns (they can't nest inside
    // the array constructor) — still ONE window pass; the array+explode
    // below is plain map-side column work
    val withLeads = (1 until window).foldLeft(dim) { (d, o) =>
      d.withColumn(s"__n$o", lead(col("name"), o).over(w))
        .withColumn(s"__c$o", lead(col("cnt"), o).over(w))
    }
    val nbrs = array((1 until window).map(o =>
      struct(col(s"__n$o").as("nname"), col(s"__c$o").as("ncnt"))): _*)
    withLeads.withColumn("nb", explode(nbrs))
      .filter(col("nb.nname").isNotNull)
      .withColumn("dist", levenshtein(col("name"), col("nb.nname")))
      .filter(col("dist") <= maxDist)
      .select(least(col("name"), col("nb.nname")).as("name_a"),
        greatest(col("name"), col("nb.nname")).as("name_b"),
        col("dist"), (col("cnt") * col("nb.ncnt")).as("pair_rows"))
  }
}
