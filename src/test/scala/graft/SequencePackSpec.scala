package graft

import org.apache.spark.sql.functions._
import graft.operators.SequencePack

class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  test("next-fit packs in id order, opens packs on overflow") {
    // one bucket (nBuckets = 1); capacity 10
    val docs = Seq((0L, 4L), (1L, 5L), (2L, 3L), (3L, 10L), (4L, 1L))
      .toDF("doc_id", "n_toks")
    val out = SequencePack.packGreedy(docs, "doc_id", "n_toks",
      capacity = 10L, nBuckets = 1).rowsSet
    assert(out == Set(
      Seq(0L, 4L, 0L, 0L, 0L),  // pack 0: [4
      Seq(1L, 5L, 0L, 0L, 4L),  //          5] fill 9
      Seq(2L, 3L, 0L, 1L, 0L),  // pack 1: [3] (9+3 > 10)
      Seq(3L, 10L, 0L, 2L, 0L), // pack 2: [10] exact fit alone
      Seq(4L, 1L, 0L, 3L, 0L))) // pack 3 (10+1 > 10)
  }

  test("oversize docs get their own pack; next doc starts fresh") {
    val docs = Seq((0L, 25L), (1L, 2L)).toDF("doc_id", "n_toks")
    val out = SequencePack.packGreedy(docs, "doc_id", "n_toks",
      capacity = 10L, nBuckets = 1).rowsSet
    assert(out == Set(
      Seq(0L, 25L, 0L, 0L, 0L),
      Seq(1L, 2L, 0L, 1L, 0L)))
  }

  test("buckets pack independently even when co-resident in a partition") {
    // 2 buckets forced into 1 partition: state must reset on bucket change
    val docs = (0L to 9L).map(i => (i, 6L)).toDF("doc_id", "n_toks")
      .coalesce(1)
    val out = SequencePack.packGreedy(docs, "doc_id", "n_toks",
      capacity = 13L, nBuckets = 2)
    // per bucket: 5 docs of 6 tokens, 2 per pack -> packs of sizes 2,2,1
    val perBucket = out.groupBy($"bucket", $"pack_seq").count()
      .as[(Long, Long, Long)].collect().toSet
    assert(perBucket == Set((0L, 0L, 2L), (0L, 1L, 2L), (0L, 2L, 1L),
      (1L, 0L, 2L), (1L, 1L, 2L), (1L, 2L, 1L)))
  }

  test("result is partitioning-independent") {
    val docs = (0L to 200L).map(i => (i, 1L + i % 37)).toDF("doc_id", "n_toks")
    val a = SequencePack.packGreedy(docs, "doc_id", "n_toks", 64L, 8)
    val b = SequencePack.packGreedy(docs.repartition(11), "doc_id", "n_toks",
      64L, 8)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("packStats reports fill and utilization") {
    val docs = Seq((0L, 4L), (1L, 5L), (2L, 3L)).toDF("doc_id", "n_toks")
    val packs = SequencePack.packGreedy(docs, "doc_id", "n_toks", 10L, 1)
    val stats = SequencePack.packStats(packs, 10L).rowsSet
    assert(stats == Set(
      Seq(0L, 0L, 2L, 9L, 0.9),
      Seq(0L, 1L, 1L, 3L, 0.3)))
  }

  test("null ids and null token counts are dropped") {
    val docs = Seq((Some(1L), Some(3L)), (None, Some(4L)), (Some(2L), None))
      .toDF("doc_id", "n_toks")
    val out = SequencePack.packGreedy(docs, "doc_id", "n_toks", 10L, 1)
    assert(out.select($"doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("materialize concatenates pack docs in offset order") {
    val docs = Seq((0L, "aa bb"), (1L, "cc dd"), (2L, "ee"))
      .toDF("doc_id", "text")
    val toks = Seq((0L, 2L), (1L, 2L), (2L, 1L)).toDF("doc_id", "n_tokens")
    val packs = SequencePack.packGreedy(toks, "doc_id", "n_tokens",
      capacity = 4L, nBuckets = 1)
    val out = SequencePack.materialize(packs, docs, "doc_id", "text")
      .select($"bucket", $"pack_seq", $"n_docs", $"fill", $"pack_text")
      .rowsSet
    // docs 0,1 fill pack 0 (2+2 = 4); doc 2 opens pack 1
    assert(out == Set(
      Seq(0L, 0L, 2L, 4L, "aa bb cc dd"),
      Seq(0L, 1L, 1L, 1L, "ee")))
  }

  test("packDigests: XOR member digests are order- and partition-independent" +
      " and recombine to the expected per-member hashes") {
    val docs = Seq((0L, "aa bb"), (1L, "cc dd"), (2L, "ee"))
      .toDF("doc_id", "text")
    val toks = Seq((0L, 2L), (1L, 2L), (2L, 1L)).toDF("doc_id", "n_tokens")
    val packs = SequencePack.packGreedy(toks, "doc_id", "n_tokens",
      capacity = 4L, nBuckets = 1)
    val out = SequencePack.packDigests(packs, docs, "doc_id", "text")
    // independent of input partitioning/order (XOR is commutative)
    val shuffled = SequencePack.packDigests(
      packs.repartition(7), docs.repartition(5).sort($"text"), "doc_id", "text")
    assert(out.except(shuffled).isEmpty && shuffled.except(out).isEmpty)
    // recompute expected digests member-wise on the driver
    def h64(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
    }
    // pack 0: doc 0 at offset 0, doc 1 at offset 2; pack 1: doc 2 at 0
    val p0 = h64("0@0@aa bb") ^ h64("1@2@cc dd")
    val p1 = h64("2@0@ee")
    val got = out.select($"pack_seq", $"digest_hi", $"digest_lo").rowsSet
    def hi(x: Long) = x >>> 32
    def lo(x: Long) = x & 0xffffffffL
    assert(got == Set(Seq(0L, hi(p0), lo(p0)), Seq(1L, hi(p1), lo(p1))))
  }
}
