package graft

import graft.operators.PiiScrub

class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "contact alice@corp.io or bob.smith@mail.example.com today"),
    (2L, "call +91 555-0142 or 044 555-9999 now"),
    (3L, "server 10.0.3.77 and 192.168.001.1 are up"),
    (4L, "clean text with no pii at all"),
    (5L, "mixed: x@y.de from 10.1.2.3 call +44 123-4567")
  ).toDF("doc_id", "text")

  test("masks each type with its token and counts matches") {
    val out = PiiScrub.scrub(docs, "doc_id", "text")
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(1L) == ("contact <EMAIL> or <EMAIL> today", 2L, 0L, 0L))
    assert(rows(2L) == ("call <PHONE> or <PHONE> now", 0L, 2L, 0L))
    assert(rows(3L) == ("server <IP> and <IP> are up", 0L, 0L, 2L))
    assert(rows(4L) == ("clean text with no pii at all", 0L, 0L, 0L))
    assert(rows(5L) == ("mixed: <EMAIL> from <IP> call <PHONE>", 1L, 1L, 1L))
  }

  test("rule order partitions matches: email hosts never double-count as IPs") {
    // an email whose local/host parts carry dotted digit runs
    val tricky = Seq((1L, "w 10.0.0.1@h4.example.com x"))
      .toDF("doc_id", "text")
    val out = PiiScrub.scrub(tricky, "doc_id", "text").collect().head
    assert(out.getString(1) == "w <EMAIL> x")
    assert(out.getLong(2) == 1L && out.getLong(4) == 0L)
  }

  test("summary totals and doc coverage") {
    val s = PiiScrub.summary(PiiScrub.scrub(docs, "doc_id", "text"))
      .collect().head
    assert(s.getLong(0) == 5L)                       // n_docs
    assert(s.getLong(1) == 3L && s.getLong(4) == 2L) // email total / docs_with
    assert(s.getLong(2) == 3L && s.getLong(5) == 2L) // phone
    assert(s.getLong(3) == 3L && s.getLong(6) == 2L) // ip
  }

  test("rejects duplicate rule names") {
    intercept[IllegalArgumentException] {
      PiiScrub.scrub(docs, "doc_id", "text",
        Seq(PiiScrub.Rule("a", "x", "<A>"), PiiScrub.Rule("a", "y", "<B>")))
    }
  }
}
