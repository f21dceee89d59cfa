package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence analysis (beyond-parity): pairwise
  * association rules — support / confidence / lift — over (basket,
  * item) rows, the classic retail companion to the reference's
  * aggregation queries.
  *
  * Scale shape: the only quadratic step is per-basket pair
  * generation, bounded by `maxBasketSize` — baskets above the cap are
  * DROPPED (standard frequent-itemset practice: a 10K-item basket is
  * a crawler, not a customer, and would alone emit 50M pairs). The
  * pair self-join shuffles on the basket key, so work per reducer is
  * O(cap²); item margins and the basket total ride in as broadcast
  * frames (items ≪ rows, total = 1 row) — no driver actions. All
  * counts are exact integers; the derived ratios are computed from
  * those scalars and rounded, so any engine replaying the same
  * algebra agrees exactly.
  */
object Basket {

  /** Association rules over unordered item pairs: for each pair
    * co-occurring in at least `minSupport` baskets, the pair count,
    * item margins, support share, both directed confidences, and
    * lift. `df` is one row per (basket, item) observation; duplicates
    * collapse (presence, not quantity). */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 1L, maxBasketSize: Int = 1024): DataFrame = {
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val kept = items
      .withColumn("__sz", count(lit(1)).over(
        Window.partitionBy("__b")))
      .filter(col("__sz") <= maxBasketSize)
      .select("__b", "__i")
      // four consumers (total, margins, both self-join sides): compute
      // the distinct + size-cap subtree once, not per consumer
      .localCheckpoint()
    val nBaskets = broadcast(
      kept.select("__b").distinct().agg(count(lit(1)).as("__n")))
    val margins = kept.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val pairs = kept.as("l").join(kept.as("r"), col("l.__b") === col("r.__b"))
      .filter(col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("item_a"), col("r.__i").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    val joined = pairs
      .join(broadcast(margins.withColumnRenamed("__c", "n_a")),
        col("item_a") === col("__i")).drop("__i")
      .join(broadcast(margins.withColumnRenamed("__c", "n_b")),
        col("item_b") === col("__i")).drop("__i")
      .crossJoin(nBaskets)
    val np = col("n_pair").cast("double")
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val n = col("__n").cast("double")
    joined.select(col("item_a"), col("item_b"),
      col("n_pair"), col("n_a"), col("n_b"),
      round(np / n, 6).as("support"),
      round(np / na, 6).as("conf_a_b"),
      round(np / nb, 6).as("conf_b_a"),
      round(n * np / (na * nb), 6).as("lift"))
  }
}
