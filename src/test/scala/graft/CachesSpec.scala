package graft

import org.apache.spark.sql.functions._

/** Operator-internal persists register with [[Caches]] and one
  * unpersistAll() call releases them — no MEMORY_AND_DISK residue
  * after an operator completes (round-7 verdict item). */
class CachesSpec extends SparkSpec {
  import spark.implicits._

  private def cachedRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("SubstringDedup + fingerprintOverlapPairs + minhashLSH caches release") {
    Caches.unpersistAll(blocking = true)
    spark.catalog.clearCache()
    val docs = (1 to 30).map { i =>
      val rep = if (i % 3 == 0) "the quick brown fox jumps over the lazy dog " * 4
        else s"unique text number $i with several distinct words inside it "
      (i.toLong, rep + s"tail $i")
    }.toDF("doc_id", "text")

    // materialize each operator so its internal persist actually fills
    operators.SubstringDedup.coverageReport(docs, "doc_id", "text",
      minLen = 10).count()
    operators.TextAnalysis.fingerprintOverlapPairs(docs, "doc_id", "text")
      .count()
    operators.Dedup.minhashLSH(docs, "doc_id", "text").count()

    assert(Caches.registered > 0, "operators should have registered caches")
    assert(cachedRddCount > 0, "caches should be materialized")
    val released = Caches.unpersistAll(blocking = true)
    assert(released > 0)
    assert(Caches.registered === 0)
    assert(cachedRddCount === 0,
      "no persisted RDD residue after unpersistAll")
  }

  test("unpersistAll is idempotent and safe on empty registry") {
    assert(Caches.unpersistAll() === 0)
  }

  test("mark/releaseSince releases only the scope's caches") {
    Caches.unpersistAll(blocking = true)
    spark.catalog.clearCache()
    val docs = (1 to 20).map(i =>
      (i.toLong, s"some repeated shared words plus marker $i here"))
      .toDF("doc_id", "text")

    // an "outer" operator whose lazy result must keep its caches
    val outer = operators.Dedup.minhashLSH(docs, "doc_id", "text")
    outer.count()
    val outerCaches = Caches.registered
    assert(outerCaches > 0)

    // a scoped "inner" operator releases only its own registrations
    val scope = Caches.mark()
    operators.SubstringDedup.coverageReport(docs, "doc_id", "text",
      minLen = 10).count()
    assert(Caches.registered > outerCaches)
    val released = Caches.releaseSince(scope, blocking = true)
    assert(released > 0)
    assert(Caches.registered === outerCaches,
      "outer operator's caches must survive a scoped release")
    // outer caches still live in the block manager
    assert(cachedRddCount > 0)
    Caches.unpersistAll(blocking = true)
    assert(cachedRddCount === 0)
  }
}
