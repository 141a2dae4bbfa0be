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
  /** The capped distinct (basket, item) set both [[basketPairs]] and
    * [[associationRules]] derive from — see the object doc for the
    * `maxBasketSize` guard. */
  private def cappedBaskets(df: DataFrame, basketCol: String,
      itemCol: String, maxBasketSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.Caches.register(df
      .select(col(basketCol).as("b__"), col(itemCol).as("it__"))
      .distinct()
      .withColumn("bs__",
        count(lit(1)).over(Window.partitionBy(col("b__"))))
      .filter(col("bs__") <= maxBasketSize)
      .select(col("b__"), col("it__"))
      .persist())
  }

  def basketPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasketSize: Int = 64): DataFrame = {
    val capped = cappedBaskets(df, basketCol, itemCol, maxBasketSize)
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

  /** DIRECTIONAL association rules A → B from the same capped basket
    * set: for every co-occurring ordered item pair with
    * `n_co >= minSupport`, the classic market-basket triple
    *
    *   support_e6    = n_co / B           (B = capped basket count)
    *   confidence_e6 = n_co / n_ante      (P(B | A))
    *   lift_e6       = n_co·B / (n_a·n_b) (>1e6 ⇒ positively associated)
    *
    * as exact-rounded e6 integers — the "users who did A also did B"
    * sheet over event types, and the related-documents linker over
    * co-click baskets. Each undirected pair emits BOTH directions
    * (confidence is asymmetric; support and lift are shared).
    *
    * Shape at scale: [[basketPairs]]' bounded pair expansion plus a
    * 1-row broadcast basket total; lift's denominator n_a·n_b is a
    * product of longs, so the wide-denominator [[graft.functions
    * .ExactRound.ratioScaledBig]] guard applies. */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasketSize: Int = 64): DataFrame = {
    import graft.functions.ExactRound
    val capped = cappedBaskets(df, basketCol, itemCol, maxBasketSize)
    val totB = capped.select(col("b__")).distinct()
      .agg(count(lit(1)).as("nb__"))
    val undirected = basketPairs(df, basketCol, itemCol, minSupport,
      maxBasketSize)
    val directed = undirected.select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("n_co"),
        col("n_a").as("n_ante"), col("n_b").as("n_cons"))
      .union(undirected.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("n_co"),
        col("n_b").as("n_ante"), col("n_a").as("n_cons")))
    directed.crossJoin(broadcast(totB))
      .select(col("antecedent"), col("consequent"), col("n_co"),
        col("n_ante"), col("n_cons"),
        ExactRound.ratioScaled(col("n_co"), col("nb__"), 6)
          .as("support_e6"),
        ExactRound.ratioScaled(col("n_co"), col("n_ante"), 6)
          .as("confidence_e6"),
        ExactRound.ratioScaledBig(
          col("n_co").cast("decimal(38,0)") * col("nb__"),
          col("n_ante").cast("decimal(38,0)") * col("n_cons"), 6)
          .as("lift_e6"))
  }

  /** Frequent ITEM TRIPLES — the A-priori level above [[basketPairs]]:
    * ordered item triples (a < b < c) co-occurring in ≥ `minSupport`
    * capped baskets, with the e6 support share against the capped
    * basket count. The candidate space is pruned STRUCTURALLY, not by
    * an A-priori pass: the same `maxBasketSize` cap bounds per-basket
    * expansion at C(cap, 3) — the documented cap trade
    * ([[basketPairs]]' contract); a hot basket above the cap is
    * catalog noise, not signal, and is excluded identically at every
    * level so pair and triple supports stay consistent.
    *
    * Shape at scale: two self-equi-joins on the basket key over the
    * capped (basket, item) table, then one tally. */
  def basketTriples(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasketSize: Int = 64): DataFrame = {
    import graft.functions.ExactRound
    val capped = cappedBaskets(df, basketCol, itemCol, maxBasketSize)
    val totB = capped.select(col("b__")).distinct()
      .agg(count(lit(1)).as("nb__"))
    capped.select(col("b__"), col("it__").as("item_a"))
      .join(capped.select(col("b__"), col("it__").as("item_b")),
        Seq("b__"))
      .filter(col("item_a") < col("item_b"))
      .join(capped.select(col("b__"), col("it__").as("item_c")),
        Seq("b__"))
      .filter(col("item_b") < col("item_c"))
      .groupBy(col("item_a"), col("item_b"), col("item_c"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minSupport)
      .crossJoin(broadcast(totB))
      .select(col("item_a"), col("item_b"), col("item_c"), col("n_co"),
        ExactRound.ratioScaled(col("n_co"), col("nb__"), 6)
          .as("support_e6"))
  }
}
