package graft

import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // bench doc has exactly two distinct 5-grams
  private val bench = Seq(
    (100L, "alpha beta gamma delta epsilon zeta")
  ).toDF("doc_id", "text")

  private val corpus = Seq(
    (10L, "alpha beta gamma delta epsilon zeta"),      // exact leak: 2/2
    (11L, "alpha beta gamma delta epsilon omega psi"), // partial: 1/3
    (12L, "one two three four five six"),              // disjoint: 0/2
    (13L, "tiny doc")                                  // < 5 words: no grams
  ).toDF("doc_id", "text")

  test("overlapReport computes containment, flags at unrounded threshold") {
    val out = Decontaminate.overlapReport(corpus, bench, "doc_id", "text",
      n = 5, threshold = 0.3).rowsSet
    assert(out == Set(
      Seq(10L, 2L, 2L, 1.0, true),
      // 1/3 = 0.3333 rounded, but the flag compares the raw ratio >= 0.3
      Seq(11L, 3L, 1L, 0.3333, true),
      Seq(12L, 2L, 0L, 0.0, false),
      Seq(13L, 0L, 0L, 0.0, false)))
  }

  test("threshold boundary uses the raw ratio, not the rounded overlap") {
    // 1/3 raw = 0.333... >= 0.34 is false even though it rounds to 0.3333
    val strict = Decontaminate.overlapReport(corpus, bench, "doc_id", "text",
      n = 5, threshold = 0.3334)
      .filter($"doc_id" === 11L).select($"contaminated").rowsSet
    assert(strict == Set(Seq(false)))
  }

  test("clean drops contaminated docs and keeps the rest intact") {
    val kept = Decontaminate.clean(corpus, bench, "doc_id", "text",
      n = 5, threshold = 0.3).select($"doc_id").rowsSet
    assert(kept == Set(Seq(12L), Seq(13L)))
  }

  test("empty benchmark contaminates nothing") {
    val out = Decontaminate.overlapReport(corpus, bench.limit(0), "doc_id",
      "text", n = 5, threshold = 0.3)
      .filter($"contaminated").count()
    assert(out == 0L)
  }
}
