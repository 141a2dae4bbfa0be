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

  test("releaseSince is thread-confined: a concurrent thread's " +
    "registration inside the bracket survives") {
    Caches.unpersistAll(blocking = true)
    spark.catalog.clearCache()
    import spark.implicits._
    val mine = Caches.register(
      Seq(1L, 2L).toDF("a").persist())
    mine.count()
    val scope = Caches.mark()
    val insideMine = Caches.register(
      Seq(3L, 4L).toDF("b").persist())
    insideMine.count()
    // another thread registers INSIDE my bracket — pre-r16 this frame
    // fell into the scope and lost its load-bearing persist
    @volatile var otherFrame: org.apache.spark.sql.DataFrame = null
    val t = new Thread(() => {
      otherFrame = Caches.register(
        Seq(5L, 6L).toDF("c").persist())
      otherFrame.count()
    })
    t.start(); t.join()
    val before = Caches.registered
    val released = Caches.releaseSince(scope, blocking = true)
    assert(released === 1, "only the calling thread's in-scope frame")
    assert(Caches.registered === before - 1)
    assert(otherFrame.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE,
      "concurrent thread's persist must survive my bracket")
    assert(mine.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE,
      "pre-scope frame must survive")
    Caches.unpersistAll(blocking = true)
    assert(cachedRddCount === 0)
  }
}
