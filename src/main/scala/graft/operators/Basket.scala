package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules over (order, item) facts: pair
  * support, confidence, and lift — the classic co-occurrence miner
  * (Agrawal & Srikant's Apriori output for itemsets of size 2, which
  * is the level that matters for cross-sell / co-retrieval analytics).
  *
  * lift(a,b) = P(a,b)/(P(a)·P(b)) = c_ab·N/(c_a·c_b) — exact integer
  * counts until the final divisions.
  *
  * Scale shape: distinct (order, item) first (dictionary discipline —
  * quantity repeats don't inflate support), then the pair join is a
  * self equi-join ON THE ORDER KEY, bounded by basket size squared per
  * order — never item×item. The min-support HAVING prunes before the
  * per-item count joins; top-k is a rounded-lift TakeOrdered. */
object Basket {

  def associationRules(df: DataFrame, orderCol: String, itemCol: String,
                       minSupport: Long = 3, topK: Int = 20): DataFrame = {
    val items = df.select(col(orderCol).as("o"), col(itemCol).as("p"))
      .distinct()
    val n = items.agg(countDistinct(col("o")).as("n_orders"))
    val pc = items.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val pairs = items.alias("a")
      .join(items.alias("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("item_a"), col("b.p").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(pc.select(col("p").as("item_a"), col("c").as("c_a")), "item_a")
      .join(pc.select(col("p").as("item_b"), col("c").as("c_b")), "item_b")
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("support"),
        round(col("support").cast("double") / col("c_a"), 4)
          .as("confidence"),
        round(col("support").cast("double") * col("n_orders") /
          (col("c_a").cast("double") * col("c_b")), 4).as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** Item-item collaborative-filtering neighbors: per-item top-k
    * co-purchased items by co-occurrence cosine
    * cos(a,b) = c_ab / √(c_a·c_b) — the classic Sarwar et al. (WWW'01)
    * item-kNN model, the "users who bought X also bought Y" readout.
    *
    * Scale shape: same order-key self equi-join as
    * [[associationRules]] (bounded by basket size² per order — never
    * item×item), min-support pruned BEFORE the per-item count joins;
    * ranking is a window PARTITIONED BY item over the support-pruned
    * pair frame (pairs-sized, never catalog²). Ties break on neighbor
    * id, so the per-item lists are total-ordered and replayable. */
  def itemNeighbors(df: DataFrame, orderCol: String, itemCol: String,
                    minSupport: Long = 2, k: Int = 5): DataFrame = {
    val items = df.select(col(orderCol).as("o"), col(itemCol).as("p"))
      .distinct()
    val pc = items.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val pairs = items.alias("a")
      .join(items.alias("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val sym = pairs.select(col("pa").as("item"), col("pb").as("neighbor"),
        col("support"))
      .unionAll(pairs.select(col("pb").as("item"), col("pa").as("neighbor"),
        col("support")))
    val scored = sym
      .join(pc.select(col("p").as("item"), col("c").as("c_i")), "item")
      .join(pc.select(col("p").as("neighbor"), col("c").as("c_n")),
        "neighbor")
      .select(col("item"), col("neighbor"), col("support"),
        round(col("support").cast("double") /
          sqrt(col("c_i").cast("double") * col("c_n")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Sequential (temporal) association rules across a customer's
    * order HISTORY: part a in an earlier order → part b in a strictly
    * later order, supported by distinct customers; confidence =
    * customers(a→b)/customers(a) — the repeat-purchase complement of
    * [[associationRules]]' within-basket pairs (replenishment and
    * upgrade paths are invisible inside one basket).
    *
    * Scale shape: the pair join is an equi-join ON THE CUSTOMER KEY
    * bounded by per-customer history² (not catalog²); distinct
    * (customer, a, b) before counting keeps multi-repeat customers
    * from inflating support. At whale-customer skew, salt the history
    * join per [[graft.operators.Skew]]. Ranked on the rounded
    * confidence with (a, b) tie-break. */
  def sequentialRules(lineitem: DataFrame, orders: DataFrame,
                      minSupport: Long = 2, topK: Int = 20): DataFrame = {
    val items = lineitem
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("p"),
        col("o_orderdate").as("d"))
      .distinct()
    // r13 (guide §2.3 "aggregate before you shuffle"): countDistinct
    // replaces the explicit `.distinct().groupBy().count()` chain — the
    // planner's partial aggregate dedups (pa, pb, cust) map-side (the
    // join output is cust-partitioned, so every duplicate is
    // partition-local), and the full pair fan-out (24M rows at sf0.1)
    // crosses the network ONCE keyed by (pa, pb) instead of twice
    // (once for the distinct, once for the re-group). Identical counts.
    val pairs = items.alias("a")
      .join(items.alias("b"),
        col("a.cust") === col("b.cust") && col("a.d") < col("b.d") &&
          col("a.p") =!= col("b.p"))
      .select(col("a.cust").as("cust"), col("a.p").as("pa"),
        col("b.p").as("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(countDistinct(col("cust")).as("n_customers"))
      .filter(col("n_customers") >= minSupport)
    val custA = items.select(col("cust"), col("p")).distinct()
      .groupBy(col("p")).agg(count(lit(1)).as("n_a"))
    pairs.join(custA.select(col("p").as("pa"), col("n_a")), "pa")
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("n_customers"),
        round(col("n_customers").cast("double") / col("n_a"), 6)
          .as("confidence"))
      .orderBy(col("confidence").desc, col("part_a"), col("part_b"))
      .limit(topK)
  }
}
