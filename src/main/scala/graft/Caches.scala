package graft

import org.apache.spark.sql.Dataset

/** Session-scoped registry for DataFrames that operators persist
  * internally (shared explode/shingle subtrees referenced by several
  * downstream stages — see SubstringDedup, fingerprintOverlapPairs,
  * minhashLSH). The persists are load-bearing: dropping them re-runs
  * the shared subtree once per reference. But an operator cannot
  * unpersist them itself — its result is lazy, so the cache must
  * outlive the call — which previously left MEMORY_AND_DISK residue
  * for the whole session unless the caller knew to `clearCache()`.
  *
  * Every operator-internal persist registers here; a long-lived
  * session reclaims them all with ONE call once results are
  * materialized:
  *
  * {{{
  *   val report = SubstringDedup.coverageReport(docs, "doc_id", "text")
  *   report.write.parquet(out)   // caches earn their keep here
  *   Caches.unpersistAll()       // then release them
  * }}}
  *
  * Verify/Bench equivalently call `spark.catalog.clearCache()` per
  * query; this registry is the surgical alternative that does not
  * drop caches the USER created.
  */
object Caches {
  private val frames = scala.collection.mutable.Buffer.empty[Dataset[_]]

  /** Register an operator-persisted frame; returns it unchanged.
    * Entries whose cache was already dropped externally (e.g.
    * `spark.catalog.clearCache()` between Verify/Bench queries) are
    * pruned on every registration, so the registry tracks only LIVE
    * caches instead of growing by one plan reference per operator
    * call for the JVM lifetime. */
  def register[T <: Dataset[_]](df: T): T = synchronized {
    val live = frames.filter(
      _.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    frames.clear()
    frames ++= live
    frames += df
    df
  }

  /** Number of registered (not yet released) frames. */
  def registered: Int = synchronized(frames.size)

  /** Unpersist every registered frame; returns how many were
    * released. Safe against double-release (unpersist is idempotent)
    * and concurrent registration. */
  def unpersistAll(blocking: Boolean = false): Int = synchronized {
    val n = frames.size
    frames.foreach(_.unpersist(blocking))
    frames.clear()
    n
  }
}
