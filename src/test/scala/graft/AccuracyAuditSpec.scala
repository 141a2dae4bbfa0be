package graft

import org.apache.spark.sql.functions._
import graft.operators.{AccuracyAudit, SimilaritySearch}

/** Pins the recall/error contracts of every approximate operator — the
  * checks behind q40_accuracy_audit — so a band-shift bug or recall
  * collapse fails CI, not just the driver gate. */
class AccuracyAuditSpec extends SparkSpec {
  import spark.implicits._

  // The exact expected check-name set: a size-only assert went stale in
  // r18 when check #10 landed after the close suite run (sbt test ended
  // the round red), and a size assert also can't catch one check being
  // silently dropped while another is added. Keep this list in lockstep
  // with AccuracyAudit's output rows.
  private val expectedChecks = Set(
    "simhash_pigeonhole_exact",
    "ann_lsh_top10_overlap",
    "ann_ivf_top10_overlap",
    "embedding_lsh_recall",
    "semantic_dedup_recall",
    "bloom_decontaminate_superset",
    "kmv_rel_err_bound",
    "mg_tracked_bounds",
    "mg_no_missed_heavy",
    "hyperball_register_exact")

  test("accuracy audit passes on the smallest gate corpus") {
    val out = AccuracyAudit(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out.keySet == expectedChecks,
      s"check set drifted: missing=${expectedChecks -- out.keySet} " +
        s"unexpected=${out.keySet -- expectedChecks}")
    out.foreach { case (check, pass) => assert(pass, s"check failed: $check") }
  }

  test("bounded audit slice still yields every check, consistently paired") {
    // at fleet scale the quadratic twins run over a deterministic
    // lowest-id slice; both sides of each check must see the SAME slice,
    // so every check still passes (possibly vacuously for near-dups)
    val out = AccuracyAudit(spark, "/root/testdata/sf0.001", maxAuditRows = 40)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out.keySet == expectedChecks,
      s"check set drifted: missing=${expectedChecks -- out.keySet} " +
        s"unexpected=${out.keySet -- expectedChecks}")
    out.foreach { case (check, pass) => assert(pass, s"check failed: $check") }
  }

  test("embedding LSH near-dup recovers planted pairs across the threshold band") {
    // deterministic corpus: 60 random 32-dim vectors + planted near-dups
    // of three of them at descending cosine (~0.97 / ~0.85 / ~0.55) —
    // recall must hold even for the weakest planted pair
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(32)(rnd.nextGaussian())
    def mix(v: Array[Double], w: Double) = {
      val n = vec()
      v.zip(n).map { case (a, b) => w * a + (1 - w) * b }
    }
    val base = (0L until 60L).map(i => (i, vec()))
    val planted = Seq(
      (100L, mix(base(3)._2, 0.92)),
      (101L, mix(base(7)._2, 0.75)),
      (102L, mix(base(11)._2, 0.55)))
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val exact = SimilaritySearch.embeddingNearDupExact(
      df, "vec_id", "embedding", threshold = 0.45)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(exact.contains((3L, 100L)) && exact.contains((7L, 101L)),
      "fixture must plant pairs above the threshold")
    val lsh = SimilaritySearch.embeddingNearDup(
      df, "vec_id", "embedding", threshold = 0.45)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH output is exact-verified: no false positives")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall below 0.8 (missed: ${exact -- lsh})")
  }

  test("ANN LSH top-k overlaps exact top-k on a planted-neighborhood corpus") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(32)(rnd.nextGaussian())
    val q = vec()
    // ten planted neighbors at graded similarity + 80 background vectors
    val neighbors = (1L to 10L).map { i =>
      val w = 0.95 - 0.05 * i
      (i, q.zip(vec()).map { case (a, b) => w * a + (1 - w) * b })
    }
    val bg = (11L until 91L).map(i => (i, vec()))
    val df = ((0L, q) +: (neighbors ++ bg)).toDF("vec_id", "embedding")
    val exact = SimilaritySearch.bruteForceTopK(df, "vec_id", "embedding", 0L, 10)
      .select($"vec_id").as[Long].collect().toSet
    val lsh = SimilaritySearch.lshTopK(df, "vec_id", "embedding", 0L, 10,
      bands = 8192)
      .select($"vec_id").as[Long].collect().toSet
    assert((exact & lsh).size >= 8,
      s"LSH top-10 overlap ${(exact & lsh).size}/10 below 8")
  }
}
