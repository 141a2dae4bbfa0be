package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Self-trained bigram language-model likelihood — the CCNet-family
  * "score documents against an LM over the corpus itself" quality
  * signal, in a fully RATIONAL form so the gate surface is exact
  * integers (the q71 discipline at design time; a log-perplexity sits
  * one `ln` away for consumers, but logs are libm-dependent and never
  * enter the gate).
  *
  * Model: Laplace-smoothed bigram probabilities trained on the whole
  * corpus, p(w2|w1) = (c12 + 1)/(c1 + V), where c12 counts the bigram,
  * c1 counts w1 as a bigram prefix, and V is the corpus vocabulary.
  * Per document: the count, sum, min, and max of the e6-scaled
  * probabilities of its bigrams (ExactRound integer rounding). A doc
  * whose bigrams are common corpus-wide scores high; boilerplate-free
  * rare-word soup scores low — the LM-filter ordering signal.
  *
  * Shape: one codegen'd gram kernel per doc (WordNGrams, zero
  * shuffle), two map-side-combinable count aggregates over the gram
  * stream (c12 bounded by observed-bigram vocabulary, c1 by unigram
  * vocabulary), one scalar vocabulary count broadcast back, and the
  * per-doc re-join — all shuffle-parallel, no per-doc state beyond
  * the aggregates. The gram stream is referenced three times (c12,
  * c1, the scoring join) and the tokenized base twice (grams, vocab),
  * so both persist via [[graft.Caches]].
  */
object NgramLm {

  /** (id, n_bigrams, sum_p_e6, min_p_e6, max_p_e6) per document; docs
    * with fewer than two words emit zeros. */
  def bigramLikelihood(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import graft.functions.ExactRound
    // base is read by the gram stream AND the corpus vocabulary count
    // (the final id join prunes ws__ away); persisting it runs the
    // tokenization once per doc instead of twice.
    val base = graft.Caches.register(df.select(col(idCol),
        TextFns.words(col(textCol)).as("ws__"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val grams = graft.Caches.register(base
      .filter(size(col("ws__")) >= 2)
      .select(col(idCol),
        explode(graft.expressions.WordNGrams.allGrams(col("ws__"), 2))
          .as("g__"))
      .select(col(idCol),
        substring_index(col("g__"), " ", 1).as("w1"),
        substring_index(col("g__"), " ", -1).as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val c12 = grams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12__"))
    // prefix counts derive from c12 (Σ over w2) — aggregating the
    // bigram-vocabulary-sized c12 frame, not a second full shuffle of
    // the corpus-wide gram stream
    val c1 = c12.groupBy(col("w1"))
      .agg(sum(col("c12__")).as("c1__"))
    val vocab = base.select(explode(col("ws__")).as("w"))
      .agg(count_distinct(col("w")).as("vocab__"))
    val scored = grams
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("p6__", ExactRound.ratioScaled(
        col("c12__") + 1L, col("c1__") + col("vocab__"), 6))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p6__")).as("sum_p_e6"),
        min(col("p6__")).as("min_p_e6"),
        max(col("p6__")).as("max_p_e6"))
    base.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_p_e6"), lit(0L)).as("sum_p_e6"),
        coalesce(col("min_p_e6"), lit(0L)).as("min_p_e6"),
        coalesce(col("max_p_e6"), lit(0L)).as("max_p_e6"))
  }
}
