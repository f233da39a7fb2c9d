package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining (Agrawal & Srikant's Apriori
  * support/confidence framing, at the pair level): which items co-occur
  * in the same basket beyond chance — the recommendation/affinity
  * primitive retail and "users who bought" features build on.
  *
  * Scale design: the pair generation is a basket-keyed self-join of the
  * DISTINCT (basket, item) set with an `itemA < itemB` orientation, so
  * its fan-out is Σ C(basket_size, 2) — bounded by real basket sizes,
  * never |items|². The min-count floor is applied at the pair aggregate
  * (the Apriori pruning insight: infrequent pairs can be dropped before
  * any downstream join), and the item-count/total sides that feed
  * confidence and lift are group-bounded frames AQE broadcasts.
  */
object Association {

  /** Pair rules: one row per DIRECTED pair (antecedent → consequent) of
    * an unordered co-occurring pair with `pair_count ≥ minPairCount`.
    * Emits support (pair share of baskets), confidence
    * (P(consequent|antecedent)), and lift (confidence over the
    * consequent's base rate); lift > 1 means genuinely associated.
    */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
                minPairCount: Long): DataFrame = {
    require(minPairCount >= 1, "minPairCount must be >= 1")
    // The distinct item set feeds four consumers (total, item counts,
    // both self-join sides); materialize it once.
    val items = baskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct().localCheckpoint()
    val nBaskets = items.agg(countDistinct(col("__b")).as("__n"))
    val itemCounts = items.groupBy(col("__i"))
      .agg(count(lit(1)).as("__icnt"))
    val a = items.select(col("__b"), col("__i").as("item_a"))
    val b = items.select(col("__b"), col("__i").as("item_b"))
    val pairs = a.join(b, Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minPairCount)
    val directed = pairs.unionByName(pairs.select(
      col("item_b").as("item_a"), col("item_a").as("item_b"),
      col("pair_count")))
    val joined = directed
      .join(itemCounts.select(col("__i").as("item_a"),
        col("__icnt").as("__ca")), Seq("item_a"))
      .join(itemCounts.select(col("__i").as("item_b"),
        col("__icnt").as("__cb")), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
    joined.select(col("item_a").as("antecedent"),
      col("item_b").as("consequent"), col("pair_count"),
      round(col("pair_count").cast("double") / col("__n").cast("double"), 6)
        .as("support"),
      round(col("pair_count").cast("double") / col("__ca").cast("double"), 6)
        .as("confidence"),
      round((col("pair_count").cast("double") / col("__ca").cast("double")) /
        (col("__cb").cast("double") / col("__n").cast("double")), 6)
        .as("lift"))
  }
}
