package graft

import org.apache.spark.sql.functions._
import graft.operators.SubstringDedup

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 and 2 share a 30+ char block; doc 3 is unique; doc 4 repeats
  // its own text internally (within-doc repeat counts too)
  private val shared = "the quick brown fox jumps over the lazy dog again"
  private val docs = Seq(
    (1L, s"unique preamble one $shared unique tail alpha"),
    (2L, s"different lead-in text $shared other ending beta"),
    (3L, "entirely distinctive content with no overlaps anywhere at all zz"),
    (4L, "abcdefghijklmnopqrstuvwxyz0123 abcdefghijklmnopqrstuvwxyz0123")
  ).toDF("doc_id", "text")

  test("shared block is found in both docs; unique doc reports nothing") {
    val spans = SubstringDedup.repeatedSpans(docs, "doc_id", "text", minLen = 20)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(spans.contains(1L) && spans.contains(2L) && spans.contains(4L))
    assert(!spans.contains(3L))
    // each sharing doc has exactly one maximal span, at least as long
    // as the shared block
    assert(spans(1L).length === 1 && spans(1L).head._4 >= shared.length)
    assert(spans(2L).length === 1 && spans(2L).head._4 >= shared.length)
  }

  test("span positions index the normalized text and spans are disjoint") {
    val row = SubstringDedup.repeatedSpans(docs, "doc_id", "text", 20)
      .filter(col("doc_id") === 2L)
      .as[(Long, Long, Long, Long)].head()
    val norm = "different lead-in text " + shared + " other ending beta"
    val found = norm.substring(row._2.toInt - 1, row._3.toInt)
    assert(found.contains(shared))
  }

  test("coverage report: fractions in [0,1], zero for unique docs, sums exact") {
    val cov = SubstringDedup.coverageReport(docs, "doc_id", "text", 20)
      .select("doc_id", "repeated_frac").as[(Long, Double)]
      .collect().toMap
    assert(cov(3L) === 0.0)
    assert(cov(1L) > 0.4 && cov(1L) < 1.0)
    // both copies flag (two spans: the connecting windows across the
    // middle space occur only once) -> 60 of 61 chars repeated
    assert(cov(4L) > 0.9)
    cov.values.foreach(f => assert(f >= 0.0 && f <= 1.0))
  }

  test("minLen longer than any repeat finds nothing") {
    val out = SubstringDedup.repeatedSpans(docs, "doc_id", "text",
      minLen = 60)
    assert(out.filter(col("doc_id") =!= 4L).isEmpty)
  }

  test("trimSpans cuts exactly the repeated spans and stitches the rest") {
    val trimmed = SubstringDedup.trimSpans(docs, "doc_id", "text",
        minLen = 20)
      .as[(Long, String)].collect().toMap
    // reconstruct expected: normalized text minus each doc's spans
    val norm = docs.select($"doc_id",
        trim(regexp_replace(lower($"text"), "\\s+", " ")).as("tn"))
      .as[(Long, String)].collect().toMap
    val spans = SubstringDedup.repeatedSpans(docs, "doc_id", "text",
        minLen = 20)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).sorted).toMap
    for ((id, tn) <- norm) {
      val cut = spans.getOrElse(id, Array.empty[(Long, Long)])
        .foldLeft((new StringBuilder, 1L)) { case ((sbuf, from), (a, b)) =>
          (sbuf.append(tn.substring(from.toInt - 1, a.toInt - 1)), b + 1)
        }
      val expected = (cut._1 ++= tn.substring((cut._2 - 1).toInt)).toString
      assert(trimmed(id) == expected, s"doc $id")
    }
    // doc 3 (no repeats) survives whole; doc 1/2 lose the shared block
    assert(trimmed(3L) == norm(3L))
    assert(!trimmed(1L).contains(shared) && !trimmed(2L).contains(shared))
    Caches.unpersistAll(blocking = true)
  }

  test("exact duplicates trim to an EMPTY row, not a vanished one") {
    val dupDocs = docs.unionByName(Seq(
      (5L, "verbatim duplicated paragraph body here"),
      (6L, "verbatim duplicated paragraph body here")
    ).toDF("doc_id", "text"))
    val trimmed = SubstringDedup.trimSpans(dupDocs, "doc_id", "text",
        minLen = 20)
      .as[(Long, String)].collect().toMap
    assert(trimmed.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L),
      "every input doc must appear in the trimmed corpus")
    assert(trimmed(5L) == "" && trimmed(6L) == "",
      "fully-repeated docs emit empty text")
    // and the digest surface agrees: kept_chars 0 for both
    val dig = SubstringDedup.trimDigest(dupDocs, "doc_id", "text", 20)
      .select($"doc_id", $"kept_chars").as[(Long, Long)].collect().toMap
    assert(dig(5L) == 0L && dig(6L) == 0L)
    Caches.unpersistAll(blocking = true)
  }

  test("trimDigest accounting: kept_chars + repeated_chars == n_chars") {
    val cov = SubstringDedup.coverageReport(docs, "doc_id", "text", 20)
      .select($"doc_id", $"repeated_chars", $"n_chars")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val dig = SubstringDedup.trimDigest(docs, "doc_id", "text", 20)
      .select($"doc_id", $"kept_chars", $"n_chars")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    for ((id, (_, rep, n)) <- cov)
      assert(dig(id)._2 + rep == n, s"doc $id accounting")
    Caches.unpersistAll(blocking = true)
  }
}
