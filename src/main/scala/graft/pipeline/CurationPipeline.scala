package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._

/** End-to-end training-data curation funnel, composing the curation
  * operators in their canonical order:
  *
  *   1. exact dedup (min-id representative per normalized content);
  *   2. benchmark decontamination (n-gram containment);
  *   3. quality gating — length/stopword/punctuation score AND the
  *      Gopher-style repetition signals;
  *   4. PII scrubbing (masked text replaces the original);
  *   5. deterministic stratified sampling per language stratum;
  *   6. sequence packing into fixed context windows.
  *
  * Order matters and is the standard one: dedup before decontamination
  * (don't pay gram joins for copies), filters before scrubbing (don't
  * regex text you will drop), sampling before packing (quotas are about
  * docs, packs are about tokens). Every stage is one of the oracle-
  * gated operators — this pipeline adds composition, not new semantics.
  *
  * Each stage's output feeds the next lazily; a caller iterating the
  * funnel repeatedly (or computing [[funnelStats]], which counts every
  * stage) should persist `docs` upstream — the pipeline itself does not
  * cache, matching the other domain pipelines.
  */
object CurationPipeline {

  case class Config(
      gram: Int = 5,
      decontamThreshold: Double = 0.3,
      minQuality: Double = 0.2,
      quotaPerLang: Int = 200,
      packCapacity: Long = 256L,
      packBuckets: Int = 16)

  /** Stages 1-2: exact dedup (min-id representative), then benchmark
    * decontamination. */
  private def decontaminatedPool(docs: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, cfg: Config): DataFrame = {
    val reps = Dedup.exact(docs, idCol, textCol)
      .select(col("rep_id").as(idCol))
    val deduped = docs.join(reps, Seq(idCol), "left_semi")
    Decontaminate.clean(deduped, bench, idCol, textCol,
      n = cfg.gram, threshold = cfg.decontamThreshold)
  }

  /** Stages 3-4 from an already-decontaminated pool: quality +
    * repetition gates, PII scrub, language stratum. */
  private def gatePool(decontaminated: DataFrame, idCol: String,
      textCol: String, cfg: Config): DataFrame = {
    val quality = TextAnalysis.qualityScore(decontaminated, idCol, textCol)
      .filter(col("quality") >= cfg.minQuality).select(col(idCol))
    val notRepetitive =
      TextAnalysis.repetitionSignals(decontaminated, idCol, textCol)
        .filter(!col("repetitive")).select(col(idCol))
    val gated = decontaminated
      .join(quality, Seq(idCol), "left_semi")
      .join(notRepetitive, Seq(idCol), "left_semi")
    val scrubbed = PiiScrub.scrub(gated, idCol, textCol)
      .select(col(idCol), col("text_clean").as(textCol))
    // language stratum for sampling, from the gated text
    scrubbed.join(
      TextAnalysis.languageId(scrubbed, idCol, textCol)
        .withColumnRenamed("pred_lang", "lang_stratum"),
      Seq(idCol))
  }

  /** Docs surviving stages 1-4: (id, lang stratum, scrubbed text). */
  def curated(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, cfg: Config = Config()): DataFrame =
    gatePool(decontaminatedPool(docs, bench, idCol, textCol, cfg),
      idCol, textCol, cfg)

  /** Full funnel: curated docs → per-language quota sample → packed
    * context windows. Output: (id, lang_stratum, n_tokens, bucket,
    * pack_seq, pack_offset, text). */
  def apply(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, cfg: Config = Config()): DataFrame = {
    val pool = curated(docs, bench, idCol, textCol, cfg)
    val sampled = Sampling.stratifiedSample(pool, "lang_stratum", idCol,
      cfg.quotaPerLang)
    val toks = TextAnalysis.tokenCounts(sampled, idCol, textCol)
      .select(col(idCol), col("n_tokens"))
    SequencePack.packGreedy(toks, idCol, "n_tokens",
        cfg.packCapacity, cfg.packBuckets)
      .join(sampled.select(col(idCol), col("lang_stratum"), col(textCol)),
        Seq(idCol))
  }

  /** One row per funnel stage with its surviving doc count — the
    * audit/monitoring artifact. Triggers one job per stage, but each
    * stage is built ONCE: dedup feeds decontamination feeds the
    * quality gates (the decontaminated pool — the only frame two
    * counts and the downstream chain all read — is persisted for the
    * duration), instead of re-deriving the chain per count. Persist
    * `docs` upstream too at scale. */
  def funnelStats(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val reps = Dedup.exact(docs, idCol, textCol)
      .select(col("rep_id").as(idCol))
    // deduped and pool each feed TWO consumers (their own stage count
    // plus the next stage's lineage) — without the persists the exact-
    // dedup pass and the quality/repetition text gates recompute once
    // per consumer (r20, guide §5: reused + expensive ⇒ cache)
    val deduped = graft.Caches.register(
      docs.join(reps, Seq(idCol), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val decontaminated = graft.Caches.register(
      Decontaminate.clean(deduped, bench, idCol, textCol,
          n = cfg.gram, threshold = cfg.decontamThreshold)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val pool = graft.Caches.register(
      gatePool(decontaminated, idCol, textCol, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sampled = Sampling.stratifiedSample(pool, "lang_stratum", idCol,
      cfg.quotaPerLang)
    Seq(
      ("0_input", docs.count()),
      ("1_deduped", deduped.count()),
      ("2_decontaminated", decontaminated.count()),
      ("3_quality_gated", pool.count()),
      ("4_sampled", sampled.count()))
      .toDF("stage", "n_docs")
  }
}
