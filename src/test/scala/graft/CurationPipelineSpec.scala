package graft

import org.apache.spark.sql.functions._
import graft.pipeline.CurationPipeline

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  // The stopword-rich base phrase keeps qualityScore above the gate.
  private val good = "the quick brown fox jumps of the lazy dog and then " +
    "a second sentence of ordinary text follows here"

  private val bench = Seq(
    (900L, "held out benchmark question about the meaning of life itself")
  ).toDF("doc_id", "text")

  private val docs = Seq(
    (1L, good + " one"),
    (2L, good + " one"),                     // exact dup of 1 -> dropped
    (3L, good + " two"),
    // contaminated: contains the benchmark's 5-grams verbatim
    (4L, "held out benchmark question about the meaning of life itself " +
      "padded with unrelated trailing words to a reasonable length"),
    // repetitive: one word dominates far past the flag thresholds
    (5L, ("spam " * 30).trim),
    (6L, good + " with alice@corp.io inside")  // PII: scrubbed, kept
  ).toDF("doc_id", "text")

  test("funnel drops dups, contamination, repetition; scrubs PII; packs the rest") {
    val cfg = CurationPipeline.Config(quotaPerLang = 10, packCapacity = 64L,
      packBuckets = 2)
    val out = CurationPipeline(docs, bench, "doc_id", "text", cfg)
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId.keySet == Set(1L, 3L, 6L))
    // PII masked in the surviving text
    assert(byId(6L).getAs[String]("text").contains("<EMAIL>"))
    assert(!byId(6L).getAs[String]("text").contains("alice@corp.io"))
    // every survivor has a pack assignment
    assert(out.filter($"pack_seq".isNull || $"bucket".isNull).isEmpty)
    // language stratum present (marker heuristic says 'en' for these)
    assert(byId(1L).getAs[String]("lang_stratum") == "en")
  }

  test("funnelStats is monotonically non-increasing") {
    val cfg = CurationPipeline.Config(quotaPerLang = 10)
    val stats = CurationPipeline.funnelStats(docs, bench, "doc_id", "text", cfg)
      .collect().sortBy(_.getString(0)).map(r => r.getString(0) -> r.getLong(1))
    assert(stats.map(_._1).toSeq == Seq("0_input", "1_deduped",
      "2_decontaminated", "3_quality_gated", "4_sampled"))
    val counts = stats.map(_._2)
    assert(counts.head == 6L)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    assert(counts.last == 3L)
  }

  test("quota caps survivors per language stratum") {
    val many = (1L to 40L).map(i => (i, good + s" variant$i"))
      .toDF("doc_id", "text")
    val cfg = CurationPipeline.Config(quotaPerLang = 5)
    val out = CurationPipeline(many, bench, "doc_id", "text", cfg)
    assert(out.count() == 5L)
  }
}
