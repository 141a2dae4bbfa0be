package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.MisraGries

/** Frequent-items (heavy-hitter) detection for corpus statistics — the
  * "what are the dominant tokens/templates/domains" scan a curation
  * pipeline runs before choosing filters.
  *
  * Two-phase shape, the only one that works at 100 TB:
  *   1. a single Misra–Gries sketch aggregate over the exploded item
  *     rows — map-side partials of ≤ k counters each, merged pairwise
  *     (Agarwal et al., PODS'12), so the full scan reduces to ONE
  *     bounded row no matter the item cardinality. Every item with
  *     frequency > N/(k+1) is guaranteed tracked;
  *   2. exact counts for the ≤ k tracked candidates only — the
  *     candidate set broadcast-semi-joins the item rows, so the second
  *     pass shuffles nothing but the (candidate, partial-count) rows
  *     map-side-combined down to ≤ k groups.
  *
  * Filtering the exact counts at the same support threshold makes the
  * output EXACTLY the φ-heavy-hitter set (φ = 1/(k+1)) with exact
  * counts: the sketch can only add spurious candidates (killed by the
  * exact filter) and can never miss a qualifying item (MG guarantee) —
  * approximate candidate generation, exact answer. A full all-items
  * groupBy would shuffle the entire item domain to learn the same ≤ k
  * rows.
  */
object FrequentItems {

  /** Exact φ-heavy hitters (φ = 1/(k+1)) of `itemCol` over `rows`:
    * items whose frequency strictly exceeds N/(k+1), with exact counts,
    * via an MG-sketch candidate pass + an exact candidate-only count.
    * The sketch row (≤ k counters) is collected — legitimate driver
    * state, same contract as IVF centroids — so the second pass is a
    * plain `isin` filter compiled into the scan, counted map-side down
    * to ≤ k groups. Output: (item, n_occurrences). */
  def heavyHitters(rows: DataFrame, itemCol: String, k: Int): DataFrame = {
    val items = rows.select(col(itemCol))
    val r = items.agg(
      count(col(itemCol)).as("n_total"),
      MisraGries.frequent_items_sketch(col(itemCol), k).as("mg")).head()
    val nTotal = r.getLong(0)
    val cands = r.getMap[String, Long](1).keys.toSeq
    if (cands.isEmpty) {
      items.groupBy(col(itemCol)).agg(count(lit(1)).as("n_occurrences"))
        .filter(lit(false))
    } else {
      items
        .filter(col(itemCol).isin(cands: _*))
        .groupBy(col(itemCol))
        .agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") * (k + 1) > lit(nTotal))
        .select(col(itemCol), col("n_occurrences"))
    }
  }

  /** Heavy-hitter word tokens of a text corpus (the same tokenization
    * as every other text operator). */
  def frequentTokens(docs: DataFrame, textCol: String, k: Int): DataFrame =
    heavyHitters(
      docs.select(explode(graft.functions.TextFns.words(col(textCol))).as("token")),
      "token", k)

  /** MG guarantee audit rows for [[graft.operators.AccuracyAudit]]:
    * sketch at `k` vs exact counts over an arbitrary item expression.
    * Returns (tracked_bounds_ok, no_missed_heavy):
    *   - every tracked item's estimate is in [true − N/(k+1), true];
    *   - every item with true count > N/(k+1) is tracked.
    * Both hold by theorem for ANY input and arbitrary partial-merge
    * trees — a false here means the sketch implementation broke, not
    * that the data changed. */
  def mgGuaranteeAudit(rows: DataFrame, item: Column, k: Int): (Boolean, Boolean) = {
    val spark = rows.sparkSession
    import spark.implicits._
    val items = rows.select(item.as("it"))
    val r = items.agg(
      count(col("it")).as("n_total"),
      MisraGries.frequent_items_sketch(col("it"), k).as("mg")).head()
    val nTotal = r.getLong(0)
    val est = r.getMap[String, Long](1).toSeq
    val exact = items.groupBy(col("it")).agg(count(lit(1)).as("tru"))
    val boundsOk =
      if (est.isEmpty) true
      else {
        val estDf = est.toDF("it", "est")
        exact.join(broadcast(estDf), Seq("it"))
          .filter(col("est") > col("tru") ||
            (col("tru") - col("est")) * (k + 1) > lit(nTotal))
          .isEmpty &&
        // every tracked item must actually occur (estimates are lower
        // bounds of real counts, never inventions)
        estDf.join(exact, Seq("it"), "left_anti").isEmpty
      }
    val tracked = est.map(_._1).toSet
    val missed = exact
      .filter(col("tru") * (k + 1) > lit(nTotal))
      .select(col("it")).as[String].collect()
      .exists(!tracked.contains(_))
    (boundsOk, !missed)
  }
}
