package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** DSIR-flavored importance scoring (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"): score every
  * document by how TARGET-LIKE its vocabulary is — the smoothed
  * unigram likelihood ratio between a designated target slice and the
  * whole corpus, kept fully RATIONAL so the gate surface is exact
  * integers (the NgramLm discipline: DSIR's log-ratio sum sits one
  * `ln` away for consumers, but logs are libm-dependent and never
  * enter the gate; the per-word mean ratio emitted here induces the
  * same "which docs look like the target distribution?" ordering
  * family).
  *
  * Model: for each word w, the Laplace-smoothed ratio
  *
  *   r(w) = p_target(w) / p_corpus(w)
  *        = (ct + 1)/(Ct + V)  ÷  (cc + 1)/(Cc + V)
  *        = (ct + 1)(Cc + V)  /  (Ct + V)(cc + 1)
  *
  * with ct/cc the word's token count in the target slice / corpus,
  * Ct/Cc the slice/corpus token totals, V the corpus vocabulary.
  * Per document: word count, sum and mean of the e6-scaled ratios
  * (ExactRound; the cross-multiplied products run in DECIMAL(38,0) —
  * count·total products cross long range at corpus scale). Docs whose
  * words over-index in the target score above 1e6; zero-word docs
  * emit zeros.
  *
  * Shape at scale: ONE token shuffle builds both count tables (target
  * count rides the corpus aggregate as a conditional sum), the scalar
  * totals broadcast back via a 1-row crossJoin, and scoring is the
  * token-to-word-stats equi-join — the q85 shape, no per-doc state.
  */
object ImportanceScore {

  /** (id, n_words, sum_ratio_e6, mean_ratio_e6) per document;
    * `isTarget` is any boolean column over the input rows (a language
    * flag, a source predicate, a curated-set membership). */
  def targetLikeness(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    import graft.functions.ExactRound
    def d(c: Column) = c.cast("decimal(38,0)")
    val base = graft.Caches.register(df.select(col(idCol),
        isTarget.cast("boolean").as("tgt__"),
        TextFns.words(col(textCol)).as("ws__"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // token stream is read twice (word counts, scoring join)
    val toks = graft.Caches.register(base
      .select(col(idCol), col("tgt__"), explode(col("ws__")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // one aggregate carries BOTH count tables: corpus count plus the
    // target count as a conditional sum — no second token shuffle
    val wc = toks.groupBy(col("w"))
      .agg(count(lit(1)).as("cc__"),
        sum(when(col("tgt__"), 1L).otherwise(0L)).as("ct__"))
    val totals = wc.agg(sum(col("cc__")).as("allc__"),
      sum(col("ct__")).as("allt__"), count(lit(1)).as("vocab__"))
    val scored = toks.join(wc, Seq("w"))
      .crossJoin(broadcast(totals))
      .withColumn("r6__", ExactRound.ratioScaledBig(
        d(col("ct__") + 1L) * d(col("allc__") + col("vocab__")),
        d(col("allt__") + col("vocab__")) * d(col("cc__") + 1L), 6))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("r6__")).as("sum_r__"))
    base.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("sum_r__"), lit(0L)).as("sum_ratio_e6"),
        ExactRound.ratioScaled(col("sum_r__"), col("n_words"), 0)
          .as("mean_ratio_e6"))
  }
}
