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

  /** Cross-source duplication matrix — which source duplicates which:
    * one row per unordered source pair (zero-overlap pairs INCLUDED —
    * the complete governance matrix), with shared-fingerprint count,
    * set sizes, and the exact Jaccard of the two whitespace-normalized
    * fingerprint sets (e4-scaled integer, gate-safe).
    *
    * Scale shape: the corpus reduces to DISTINCT (source, fp) — one
    * shuffle on the projected pair, cardinality <= corpus — and the
    * overlap self-join is on fp, where a fingerprint held by k sources
    * emits k² pairs with k bounded by the SOURCE count (tens), never
    * by corpus size. The full pair grid is sizes×sizes — source-count
    * squared, a broadcast-sized frame. No all-pairs over documents
    * exists. */
  def sourceOverlap(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    // persisted: sizes and BOTH sides of the overlap self-join read the
    // distinct frame — uncached, the per-doc md5 runs three times
    val fps = graft.Caches.register(df.select(col(sourceCol).as("src__"),
        TextFns.fingerprint(col(textCol)).as("fp__")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sizes = fps.groupBy(col("src__")).agg(count(lit(1)).as("n__"))
    val shared = fps.as("a").join(fps.as("b"),
        col("a.fp__") === col("b.fp__") && col("a.src__") < col("b.src__"))
      .groupBy(col("a.src__").as("src_a"), col("b.src__").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    sizes.select(col("src__").as("src_a"), col("n__").as("n_a"))
      .crossJoin(sizes.select(col("src__").as("src_b"), col("n__").as("n_b")))
      .filter(col("src_a") < col("src_b"))
      .join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        col("n_a"), col("n_b"),
        graft.functions.ExactRound.ratioScaled(
          coalesce(col("n_shared"), lit(0L)),
          col("n_a") + col("n_b") - coalesce(col("n_shared"), lit(0L)), 4)
          .as("jaccard_e4"))
  }

  /** Exact-dedup impact report — what a keep-first (min id per
    * fingerprint) dedup pass would REMOVE, attributed per source:
    * (source, n_docs, n_removed, tokens_removed). The survivor id per
    * fingerprint comes from a map-side-combinable min aggregate over
    * the fingerprint groups (bounded by distinct-fp cardinality) joined
    * back on the md5 — no window over the corpus, all longs. */
  def dedupImpact(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    // persisted: the keep_id aggregate and the join back both read it
    val base = graft.Caches.register(df.select(col(idCol), col(sourceCol),
        size(TextFns.regexTokens(col(textCol))).cast("long").as("n_toks__"),
        TextFns.fingerprint(col(textCol)).as("fp__"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val keep = base.groupBy(col("fp__"))
      .agg(min(col(idCol)).as("keep_id__"))
    base.join(keep, Seq("fp__"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col(idCol) =!= col("keep_id__"), 1L).otherwise(0L))
          .as("n_removed"),
        sum(when(col(idCol) =!= col("keep_id__"), col("n_toks__"))
          .otherwise(0L)).as("tokens_removed"))
  }
}
