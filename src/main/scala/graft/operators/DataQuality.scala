package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational data-quality audits over a table graph — the checks a
  * warehouse runs before trusting a snapshot for training-data
  * derivation (a dangling FK silently drops rows from every enrich
  * join downstream; [[graft.oml.OmlEval]]'s KnowDB lookups and the
  * TPC-H-style joins here both assume closure).
  */
object DataQuality {

  /** One relationship to audit: child rows whose `childKey` has no
    * match in `parent[parentKey]` are orphans. */
  final case class FkSpec(name: String, child: DataFrame, childKey: String,
                          parent: DataFrame, parentKey: String)

  /** Referential-integrity audit: per relationship, child cardinality,
    * orphan count, and orphan rate. NULL child keys count as orphans
    * (a NULL FK also drops the row from an inner enrich join — that is
    * the integrity property being audited).
    *
    * Scale shape: per relationship one left anti join against the
    * DISTINCT parent-key frame (dimension-sized — broadcastable for
    * every dim table; the biggest parent here is orders) + two 1-row
    * aggs unioned across specs. Nothing driver-side but the
    * spec list. */
  def referentialAudit(specs: Seq[FkSpec]): DataFrame = {
    require(specs.nonEmpty, "referentialAudit needs at least one FkSpec")
    specs.map { fk =>
      val childKeys = fk.child.select(col(fk.childKey).as("k"))
      val parentKeys = fk.parent.select(col(fk.parentKey).as("k")).distinct()
      val totals = childKeys.agg(count(lit(1)).as("n_child"))
      val orphans = childKeys
        .join(broadcast(parentKeys), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      totals.crossJoin(orphans)
        .select(lit(fk.name).as("relation"), col("n_child"),
          col("n_orphans"),
          round(when(col("n_child") > 0,
              col("n_orphans").cast("double") / col("n_child"))
            .otherwise(lit(0.0)), 6).as("orphan_rate"))
    }.reduce(_ unionAll _)
  }

  /** One candidate functional dependency to audit: does
    * `lhs → rhs` hold in `df` (every lhs tuple maps to one rhs)? */
  final case class FdSpec(name: String, df: DataFrame,
                          lhs: Seq[String], rhs: String)

  /** Functional-dependency audit: per candidate FD, the number of
    * determinant groups, how many map to MORE than one dependent value
    * (violations), the row mass inside violating groups, and the worst
    * group's dependent-value count. `fd_holds` is the exact verdict —
    * the schema-inference / normalization check run before trusting a
    * column as a lookup key (a "dimension" whose key maps to two
    * descriptions silently forks every enrich join through it).
    *
    * Scale shape: per FD one (lhs, rhs) hash groupBy collapsing rows to
    * the bounded distinct-pair frame, one lhs groupBy over that, one
    * 1-row fold — all map-side-combining aggs, no joins. */
  def fdAudit(specs: Seq[FdSpec]): DataFrame = {
    require(specs.nonEmpty, "fdAudit needs at least one FdSpec")
    specs.map { fd =>
      val pairs = fd.df
        .groupBy(fd.lhs.map(col) :+ col(fd.rhs).as("rhs"): _*)
        .agg(count(lit(1)).as("c"))
      val grp = pairs.groupBy(fd.lhs.map(col): _*)
        .agg(countDistinct(col("rhs")).as("nv"), sum(col("c")).as("sz"))
      grp.agg(
        lit(fd.name).as("fd"),
        count(lit(1)).as("n_groups"),
        sum(when(col("nv") > 1, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("nv") > 1, col("sz")).otherwise(0L))
          .as("n_rows_violating"),
        max(col("nv")).as("max_rhs_values"),
        (max(col("nv")) === 1).as("fd_holds"))
    }.reduce(_ unionAll _)
  }

  /** The standard TPC-H-shaped audit over the test corpus tables. */
  def tpchAudit(s: SparkSession, load: String => DataFrame): DataFrame = {
    val li = load("lineitem"); val o = load("orders")
    val c = load("customer"); val p = load("part")
    val su = load("supplier"); val n = load("nation"); val r = load("region")
    referentialAudit(Seq(
      FkSpec("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
      FkSpec("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"),
      FkSpec("lineitem.l_suppkey->supplier", li, "l_suppkey", su, "s_suppkey"),
      FkSpec("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
      FkSpec("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
      FkSpec("supplier.s_nationkey->nation", su, "s_nationkey", n, "n_nationkey"),
      FkSpec("nation.n_regionkey->region", n, "n_regionkey", r, "r_regionkey")))
  }
}
