package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionSignals: dup-gram fractions, top-word dominance, flag") {
    val docs = Seq(
      (1L, "a a a a b a a a a b a a"),                    // heavy repetition
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),     // all distinct
      (3L, "x y z"),                                      // short: no flag
      (4L, "solo")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text").rowsSet
    // doc 1: words a*10 b*2 -> top 10/12; 2-grams 11 total 3 distinct
    // -> 8/11; 3-grams 10 total 4 distinct -> 0.6
    assert(out == Set(
      Seq(1L, 12L, 0.7273, 0.6, 0.8333, true),
      Seq(2L, 12L, 0.0, 0.0, 0.0833, false),
      Seq(3L, 3L, 0.0, 0.0, 0.3333, false),
      Seq(4L, 1L, 0.0, 0.0, 1.0, false)))
  }

  test("repetitionSignals: thresholds compare raw ratios; minWords gates") {
    // 10 words, top word 3/10 = 0.3 -> NOT > 0.3 threshold (strict)
    val docs = Seq((1L, "a a a b c d e f g h")).toDF("doc_id", "text")
    val strict = TextAnalysis.repetitionSignals(docs, "doc_id", "text",
      dup2Threshold = 1.0, dup3Threshold = 1.0, topWordThreshold = 0.3)
    assert(strict.select($"repetitive").rowsSet == Set(Seq(false)))
    val loose = TextAnalysis.repetitionSignals(docs, "doc_id", "text",
      dup2Threshold = 1.0, dup3Threshold = 1.0, topWordThreshold = 0.29)
    assert(loose.select($"repetitive").rowsSet == Set(Seq(true)))
    // same doc under a higher minWords: never flagged
    val gated = TextAnalysis.repetitionSignals(docs, "doc_id", "text",
      dup2Threshold = 1.0, dup3Threshold = 1.0, topWordThreshold = 0.29,
      minWords = 11)
    assert(gated.select($"repetitive").rowsSet == Set(Seq(false)))
  }

  private val docs = Seq(
    (1L, "the cat sat of the mat and a hat"),
    (2L, "der hund und die katze"),
    (3L, "xyzzy plugh !!!"),
    (4L, "one")
  ).toDF("doc_id", "text")

  test("tokenCounts: whitespace words vs regex tokens vs chars") {
    val out = TextAnalysis.tokenCounts(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._1 == 9L)
    assert(out(4L) == ((1L, 1L, 3L)))
    // "xyzzy plugh !!!" -> regex tokens: xyzzy, plugh, !, !, ! = 5
    assert(out(3L) == ((3L, 5L, 15L)))
  }

  test("languageId: marker argmax with alphabetical tie-break and und fallback") {
    val out = TextAnalysis.languageId(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en") // the, of, the, a, and -> en markers dominate
    assert(out(2L) == "de") // der, und, die
    assert(out(3L) == "und") // no markers at all
  }

  test("qualityScore: ratios are consistent and bounded") {
    val out = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val (n1, stop1, punct1, q1) = out(1L)
    assert(n1 == 9L)
    assert(stop1 == math.rint(5.0 / 9.0 * 10000) / 10000)
    assert(punct1 == 0.0)
    assert(q1 > 0.0 && q1 <= 1.0)
    val (_, _, punct3, _) = out(3L)
    assert(punct3 > 0.0)
  }

  test("winnowing fingerprints overlap for shared substrings, not for disjoint text") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "something else first but the quick brown fox jumps over it"),
      (3L, "zzzz yyyy xxxx wwww vvvv uuuu")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowingFingerprints(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // docs 1 and 2 share "the quick brown fox jumps over" (len 30 >= w+k-1)
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // winnowing compresses: far fewer fingerprints than k-gram positions
    assert(byDoc(1L).size < 51 - 7)
  }

  test("gram-hash kernels byte-identical to relational md5 on multi-byte text") {
    // the kernels walk raw UTF-8 bytes with a code-point offset index
    // (ASCII fast-paths to identity) — this pins the multi-byte path to
    // the relational substring+md5 formulation the oracles reconstruct
    val t = "héllo wörld éé 多言語テキ mixed ascii tail"
    val k = 4
    val df = Seq((1L, t)).toDF("doc_id", "text")
    val kern = df.select(
        graft.expressions.CharGramHashes($"text", k).as("hx"),
        graft.expressions.CharGramHashes64($"text", k).as("h64"))
      .collect()(0)
    val hex = kern.getSeq[String](0)
    val h64 = kern.getSeq[Long](1)
    val rel = df.selectExpr(
        s"transform(sequence(1, char_length(text) - $k + 1), " +
          s"i -> substring(md5(encode(substring(text, i, $k), 'UTF-8')), 1, 16)) g")
      .collect()(0).getSeq[String](0)
    assert(hex == rel)
    assert(h64 == hex.map(java.lang.Long.parseUnsignedLong(_, 16)))
    // winnowing over the same text: distinct sliding-window minima of
    // exactly those gram hashes, in first-seen order
    val w = 3
    val fps = df.select(
        graft.expressions.WinnowFingerprints($"text", k, w).as("f"))
      .collect()(0).getSeq[String](0)
    val mins = rel.indices.map(i => rel.slice(i, math.min(i + w, rel.size)).min)
    assert(fps == mins.distinct)
  }

  test("fingerprints stable under whitespace/case noise") {
    val noisy = Seq((1L, "Hello  World"), (2L, "hello world"),
      (3L, "different")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(noisy, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(fp(1L)._1 == fp(2L)._1)       // normalized fingerprint matches
    assert(fp(1L)._2 != fp(2L)._2)       // raw surrogate key differs
    assert(fp(1L)._1 != fp(3L)._1)
    assert(fp(1L)._2.startsWith("tv_"))
  }
}
