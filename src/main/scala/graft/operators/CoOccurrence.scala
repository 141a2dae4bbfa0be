package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence — item pairs that appear in the same
  * basket, with support counts and an exact-scaled basket-Jaccard
  * (the association-mining / "co-viewed items" primitive; also the
  * co-click signal a curation pipeline uses to link related
  * documents).
  *
  * The pair expansion is quadratic PER BASKET, never globally:
  * baskets larger than `maxBasketSize` are excluded up front (the
  * standard market-basket guard — a single degenerate 1M-item basket
  * would otherwise emit 10¹² pairs), so a basket contributes at most
  * `maxBasketSize²/2` pairs and the self-join shuffles on the basket
  * key with bounded per-key multiplicity. Item frequencies are
  * counted over the SAME capped basket set the pairs come from, so
  * `jaccard_e6 = n_co/(n_a+n_b−n_co)` is internally consistent.
  *
  * Shape at scale: one distinct (basket, item) pass, one per-basket
  * count window (small partitions), one self-join on basket key, one
  * map-side-combinable pair count, two joins of the support-filtered
  * pair table against the item-frequency table. No driver state.
  */
object CoOccurrence {

  /** Item pairs (item_a < item_b) co-occurring in >= `minSupport`
    * baskets: (item_a, item_b, n_co, n_a, n_b, jaccard_e6). */
  def basketPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasketSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val capped = graft.Caches.register(df
      .select(col(basketCol).as("b__"), col(itemCol).as("it__"))
      .distinct()
      .withColumn("bs__",
        count(lit(1)).over(Window.partitionBy(col("b__"))))
      .filter(col("bs__") <= maxBasketSize)
      .select(col("b__"), col("it__"))
      .persist())
    val pairs = capped.select(col("b__"), col("it__").as("item_a"))
      .join(capped.select(col("b__"), col("it__").as("item_b")), Seq("b__"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minSupport)
    val freq = capped.groupBy(col("it__")).agg(count(lit(1)).as("c_i"))
    pairs
      .join(freq.select(col("it__").as("item_a"), col("c_i").as("n_a")),
        "item_a")
      .join(freq.select(col("it__").as("item_b"), col("c_i").as("n_b")),
        "item_b")
      .select(col("item_a"), col("item_b"), col("n_co"), col("n_a"),
        col("n_b"),
        graft.functions.ExactRound.ratioScaled(col("n_co"),
          col("n_a") + col("n_b") - col("n_co"), 6).as("jaccard_e6"))
  }
}
