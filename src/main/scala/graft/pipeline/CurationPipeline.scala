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

  /** Docs surviving stages 1-4: (id, lang stratum, scrubbed text). */
  def curated(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, cfg: Config = Config()): DataFrame = {
    // 1. exact dedup — keep each fingerprint's min-id representative
    val reps = Dedup.exact(docs, idCol, textCol)
      .select(col("rep_id").as(idCol))
    val deduped = docs.join(reps, Seq(idCol), "left_semi")
    // 2. decontamination against the benchmark
    val decontaminated = Decontaminate.clean(deduped, bench, idCol, textCol,
      n = cfg.gram, threshold = cfg.decontamThreshold)
    // 3. quality + repetition gates
    val quality = TextAnalysis.qualityScore(decontaminated, idCol, textCol)
      .filter(col("quality") >= cfg.minQuality).select(col(idCol))
    val notRepetitive =
      TextAnalysis.repetitionSignals(decontaminated, idCol, textCol)
        .filter(!col("repetitive")).select(col(idCol))
    val gated = decontaminated
      .join(quality, Seq(idCol), "left_semi")
      .join(notRepetitive, Seq(idCol), "left_semi")
    // 4. scrub PII; masked text replaces the original
    val scrubbed = PiiScrub.scrub(gated, idCol, textCol)
      .select(col(idCol), col("text_clean").as(textCol))
    // language stratum for sampling, from the gated text
    scrubbed.join(
      TextAnalysis.languageId(scrubbed, idCol, textCol)
        .withColumnRenamed("pred_lang", "lang_stratum"),
      Seq(idCol))
  }

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
    * audit/monitoring artifact. Triggers one job per stage; persist
    * `docs` first at scale. */
  def funnelStats(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val reps = Dedup.exact(docs, idCol, textCol)
      .select(col("rep_id").as(idCol))
    val deduped = docs.join(reps, Seq(idCol), "left_semi")
    val decontaminated = Decontaminate.clean(deduped, bench, idCol, textCol,
      n = cfg.gram, threshold = cfg.decontamThreshold)
    val pool = curated(docs, bench, idCol, textCol, cfg)
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
