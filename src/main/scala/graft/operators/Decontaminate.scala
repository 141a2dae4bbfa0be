package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: measure, per corpus
  * document, how much of its word n-gram mass also appears in a held-out
  * benchmark set, and flag documents above a containment threshold.
  *
  * This is the n-gram–overlap decontamination used by LLM training
  * pipelines (cf. the 13-gram filters described in the GPT-3 and PaLM
  * papers): a benchmark document leaking into pretraining data inflates
  * eval scores, and membership is decided by SHARED n-GRAMS, not exact
  * text equality, so paraphrased or partially quoted leaks are caught.
  *
  * Shape (all linear, shuffle-parallel):
  *   1. distinct word n-grams per corpus doc — the same exploded-shingle
  *      kernel as [[Dedup]] (posexplode + lead window, no interpreted
  *      array lambdas);
  *   2. the benchmark's DISTINCT gram set, broadcast: benchmark suites
  *      are small by construction (thousands of documents, not
  *      billions), so the gram set fits in a broadcast and the per-doc
  *      hit count needs no shuffle of the corpus grams. Set
  *      `broadcastBench = false` for an unusually large benchmark and
  *      the same plan runs as a standard shuffle hash join;
  *   3. per-doc containment = |grams ∩ benchGrams| / |grams|, a groupBy
  *      count — NOT Jaccard: a 100-word leak inside a 10k-word document
  *      should score on the document's own gram count, not be diluted by
  *      the benchmark's total size.
  *
  * Every corpus row is preserved (left joins): a doc with fewer than `n`
  * words has no grams and reports overlap 0.0 — it cannot leak an
  * n-gram it does not contain.
  */
object Decontaminate {

  /** Per-doc overlap report: (id, n_grams, n_hit, overlap, contaminated).
    * `threshold` applies to the UNROUNDED containment ratio; `overlap` is
    * reported rounded to 4dp.
    *
    * Single-pass shape: each corpus gram is marked hit/miss by ONE
    * broadcast left join against the benchmark gram set, and n_grams /
    * n_hit come out of the SAME groupBy — the corpus explode pipeline
    * (the expensive part at scale) runs once, not once per statistic
    * (separate size and hit aggregates would make Spark recompute the
    * whole explode→shuffle→window shingle subtree per branch). */
  def overlapReport(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      n: Int = 5, threshold: Double = 0.3,
      broadcastBench: Boolean = true): DataFrame = {
    val corpusGrams = Dedup.explodedShingles(corpus, idCol, textCol, n)
    val benchGrams = {
      val g = Dedup.explodedShingles(bench, idCol, textCol, n)
        .select(col("shingle")).distinct()
        .withColumn("hit__", lit(1L))
      if (broadcastBench) broadcast(g) else g
    }
    val stats = corpusGrams.join(benchGrams, Seq("shingle"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit__"), lit(0L))).as("n_hit"))
    val ratio = when(col("n_grams") === 0, lit(0.0))
      .otherwise(col("n_hit").cast("double") / col("n_grams").cast("double"))
    corpus.select(col(idCol))
      .join(stats.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .select(col(idCol), col("n_grams"), col("n_hit"),
        round(ratio, 4).as("overlap"),
        (ratio >= threshold).as("contaminated"))
  }

  /** Drop contaminated documents, keep everything else — the actionable
    * form: `corpus` minus any doc whose containment is >= `threshold`. */
  def clean(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      n: Int = 5, threshold: Double = 0.3,
      broadcastBench: Boolean = true): DataFrame = {
    val flagged = overlapReport(corpus, bench, idCol, textCol, n, threshold,
        broadcastBench)
      .filter(col("contaminated"))
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
