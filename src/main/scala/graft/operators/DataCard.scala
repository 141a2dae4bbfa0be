package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Per-source corpus "data card" — the summary table a curation run
  * publishes next to the shipped dataset (docs, token volume, language
  * spread, exact-duplicate exposure per source; reference
  * `README.md`'s per-table row accounting is the spirit). One pass of
  * map-side-combinable aggregates plus one corpus-wide fingerprint
  * count; every emitted column is a long, so the gate surface is
  * engine-proof by construction.
  */
object DataCard {

  /** One row per `sourceCol` value:
    * (source, n_docs, n_tokens, n_chars, n_langs, n_dup_docs) where
    * n_dup_docs counts the source's docs whose whitespace-normalized
    * fingerprint occurs ≥ 2 times CORPUS-wide (cross-source dups count
    * in every source holding a copy — the deduplication exposure a
    * mixture designer needs, not the within-source count). */
  def perSource(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, langCol: String): DataFrame = {
    // base feeds two scans (the corpus-wide dup-fingerprint aggregate
    // and the join back), so the tokenization + md5 — the dominant
    // per-doc cost — must run once, not twice: persist via the Caches
    // registry like the sibling operators (NgramLm, SubstringDedup).
    val base = graft.Caches.register(df.select(
        col(idCol), col(sourceCol), col(langCol),
        size(TextFns.regexTokens(col(textCol))).cast("long").as("n_toks__"),
        length(col(textCol)).cast("long").as("n_chars__"),
        TextFns.fingerprint(col(textCol)).as("fp__"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // corpus-wide duplicated fingerprints (count >= 2); the join back
    // is on the md5 — small distinct set, map-side combinable count
    val dupFps = base.groupBy(col("fp__"))
      .agg(count(lit(1)).as("c__"))
      .filter(col("c__") >= 2)
      .select(col("fp__"))
    val flagged = base.join(dupFps.withColumn("dup__", lit(1L)),
      Seq("fp__"), "left")
    flagged.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks__")).as("n_tokens"),
        sum(col("n_chars__")).as("n_chars"),
        countDistinct(col(langCol)).as("n_langs"),
        sum(coalesce(col("dup__"), lit(0L))).as("n_dup_docs"))
  }
}
