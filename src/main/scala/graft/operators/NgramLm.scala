package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** STUPID BACKOFF trigram scoring (Brants et al., EMNLP 2007 — the
    * score Google's distributed LM shipped instead of a normalized
    * probability) of `scored` documents against counts trained on a
    * DISJOINT `ref` corpus — the cross-corpus form is the point:
    * self-scoring makes every observed trigram a level-3 hit and the
    * backoff dead code. Per scored trigram (w1,w2,w3):
    *
    *   S = c123/c12             if the reference saw the trigram,
    *     = 0.4 · c23/c2         else if it saw the bigram (w2,w3),
    *     = 0.4² · c3/N          else if it saw w3,
    *     = 0                    else (out-of-vocabulary),
    *
    * each level an exact e6 half-up rational (0.4 enters as the
    * integer 4/10 factor, never a float). Per document: trigram
    * count, Σ score, and the per-level hit tally — the backoff-depth
    * histogram is the domain-shift signal ("how far does the
    * reference LM have to reach?").
    *
    * Shape at scale: count tables are vocabulary-sized map-side
    * combinable aggregates (c12/c2 derive from the gram tables, not
    * second corpus shuffles); scoring is three left hash joins of the
    * scored gram stream against them plus one 1-row broadcast (N);
    * the scored base and gram stream persist (two consumers each). */
  def stupidBackoff(ref: DataFrame, scored: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import graft.functions.ExactRound
    def grams3(df: DataFrame, keep: Seq[Column]): DataFrame = df
      .filter(size(col("ws__")) >= 3)
      .select(keep :+ explode(graft.expressions.WordNGrams
        .allGrams(col("ws__"), 3)).as("g__"): _*)
      .select(keep ++ Seq(
        substring_index(col("g__"), " ", 1).as("w1"),
        substring_index(substring_index(col("g__"), " ", 2), " ", -1)
          .as("w2"),
        substring_index(col("g__"), " ", -1).as("w3")): _*)
    val refBase = graft.Caches.register(ref
      .select(graft.functions.TextFns.words(col(textCol)).as("ws__"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val tri = grams3(refBase, Seq.empty)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c123__"))
    val triC = graft.Caches.register(
      tri.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val pre2 = triC.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c123__")).cast("long").as("c12__"))
    val bi = refBase
      .filter(size(col("ws__")) >= 2)
      .select(explode(graft.expressions.WordNGrams
        .allGrams(col("ws__"), 2)).as("g__"))
      .select(substring_index(col("g__"), " ", 1).as("w2"),
        substring_index(col("g__"), " ", -1).as("w3"))
    val biC = graft.Caches.register(bi
      .groupBy(col("w2"), col("w3")).agg(count(lit(1)).as("c23__"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val pre1 = biC.groupBy(col("w2"))
      .agg(sum(col("c23__")).cast("long").as("c2__"))
    val uni = refBase.select(explode(col("ws__")).as("w3"))
      .groupBy(col("w3")).agg(count(lit(1)).as("c3__"))
    val nTok = refBase
      .agg(sum(size(col("ws__"))).cast("long").as("ntok__"))
    val scoredBase = graft.Caches.register(scored
      .select(col(idCol),
        graft.functions.TextFns.words(col(textCol)).as("ws__"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val levels = grams3(scoredBase, Seq(col(idCol)))
      .join(triC, Seq("w1", "w2", "w3"), "left")
      .join(pre2, Seq("w1", "w2"), "left")
      .join(biC, Seq("w2", "w3"), "left")
      .join(pre1, Seq("w2"), "left")
      .join(uni, Seq("w3"), "left")
      .crossJoin(broadcast(nTok))
      .select(col(idCol),
        when(col("c123__").isNotNull, lit(3))
          .when(col("c23__").isNotNull, lit(2))
          .when(col("c3__").isNotNull, lit(1))
          .otherwise(lit(0)).as("lvl__"),
        when(col("c123__").isNotNull,
          ExactRound.ratioScaled(col("c123__"), col("c12__"), 6))
          .when(col("c23__").isNotNull,
            ExactRound.ratioScaled(col("c23__") * 4L,
              col("c2__") * 10L, 6))
          .when(col("c3__").isNotNull,
            ExactRound.ratioScaled(col("c3__") * 16L,
              col("ntok__") * 100L, 6))
          .otherwise(lit(0L)).as("s6__"))
    val perDoc = levels.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("s6__")).cast("long").as("sum_score_e6"),
        sum(when(col("lvl__") === 3, 1L).otherwise(0L)).cast("long")
          .as("n_l3"),
        sum(when(col("lvl__") === 2, 1L).otherwise(0L)).cast("long")
          .as("n_l2"),
        sum(when(col("lvl__") === 1, 1L).otherwise(0L)).cast("long")
          .as("n_l1"),
        sum(when(col("lvl__") === 0, 1L).otherwise(0L)).cast("long")
          .as("n_oov"))
    scoredBase.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("sum_score_e6"), lit(0L)).as("sum_score_e6"),
        coalesce(col("n_l3"), lit(0L)).as("n_l3"),
        coalesce(col("n_l2"), lit(0L)).as("n_l2"),
        coalesce(col("n_l1"), lit(0L)).as("n_l1"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
  }
}
