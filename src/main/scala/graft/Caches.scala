package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Session-scoped registry for DataFrames that operators persist
  * internally (shared explode/shingle subtrees referenced by several
  * downstream stages — see SubstringDedup, fingerprintOverlapPairs,
  * minhashLSH). The persists are load-bearing: dropping them re-runs
  * the shared subtree once per reference. But an operator cannot
  * unpersist them itself — its result is lazy, so the cache must
  * outlive the call — which previously left MEMORY_AND_DISK residue
  * for the whole session unless the caller knew to `clearCache()`.
  *
  * Every operator-internal persist registers here. A caller that owns
  * the WHOLE session reclaims everything with one call once results
  * are materialized:
  *
  * {{{
  *   val report = SubstringDedup.coverageReport(docs, "doc_id", "text")
  *   report.write.parquet(out)   // caches earn their keep here
  *   Caches.unpersistAll()       // then release them
  * }}}
  *
  * A caller that does NOT own the session (other operators may hold
  * still-lazy results whose persists must survive) brackets its own
  * work with a [[mark]]/[[releaseSince]] scope — only caches
  * registered inside the bracket are dropped:
  *
  * {{{
  *   val scope = Caches.mark()
  *   val pairs = Dedup.minhashLSH(docs, "doc_id", "text")
  *   pairs.count()               // materialize through the caches
  *   Caches.releaseSince(scope)  // release THIS operator's caches only
  * }}}
  *
  * In a JVM shared by several SparkSessions, [[unpersistAll(session*]]
  * releases only the caches belonging to one session. Verify/Bench
  * equivalently call `spark.catalog.clearCache()` per query; this
  * registry is the surgical alternative that does not drop caches the
  * USER created.
  */
object Caches {
  private var nextId = 0L
  // (id, registering thread id, frame) — the thread id makes the
  // mark()/releaseSince() bracket THREAD-CONFINED (r15 verdict #6):
  // a concurrent pipeline runner's operators register on their own
  // threads, so one runner's release cannot drop another's
  // load-bearing persist.
  private val frames =
    scala.collection.mutable.Buffer.empty[(Long, Long, Dataset[_])]

  /** Register an operator-persisted frame; returns it unchanged.
    * Entries whose cache was already dropped externally (e.g.
    * `spark.catalog.clearCache()` between Verify/Bench queries) are
    * pruned on every registration, so the registry tracks only LIVE
    * caches instead of growing by one plan reference per operator
    * call for the JVM lifetime. */
  def register[T <: Dataset[_]](df: T): T = synchronized {
    val live = frames.filter(
      _._3.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    frames.clear()
    frames ++= live
    frames += ((nextId, Thread.currentThread().getId, df))
    nextId += 1
    df
  }

  /** Number of registered (not yet released) frames. */
  def registered: Int = synchronized(frames.size)

  /** A scope token: caches registered from now on BY THIS THREAD
    * belong to the scope and are released together by
    * [[releaseSince]]. Cheap (a counter read); nesting works as long
    * as inner scopes release before outer ones (stack discipline).
    *
    * Thread-confined: registrations are stamped with the registering
    * thread, and [[releaseSince]] only releases frames the CALLING
    * thread registered inside the bracket — a frame another thread
    * registers between mark() and releaseSince() is untouched, so
    * concurrent operator construction on separate threads is safe.
    * (Operators build plans synchronously on the calling thread, so
    * an operator's internal persists always carry its caller's
    * thread id.) A bracket opened on one thread cannot be released
    * from another — hand work across threads only at whole-bracket
    * granularity, or use [[unpersistAll(session*]] boundaries. */
  def mark(): Long = synchronized(nextId)

  /** Unpersist every frame the CALLING THREAD registered at or after
    * `scope` (a [[mark]] token); earlier registrations and other
    * threads' frames — other operators' still-lazy results — keep
    * their caches. Returns how many were released. */
  def releaseSince(scope: Long, blocking: Boolean = false): Int =
    synchronized {
      val me = Thread.currentThread().getId
      val (mine, keep) =
        frames.partition(f => f._1 >= scope && f._2 == me)
      mine.foreach(_._3.unpersist(blocking))
      frames.clear()
      frames ++= keep
      mine.size
    }

  /** Unpersist every registered frame; returns how many were
    * released. Safe against double-release (unpersist is idempotent)
    * and concurrent registration. */
  def unpersistAll(blocking: Boolean = false): Int = synchronized {
    val n = frames.size
    frames.foreach(_._3.unpersist(blocking))
    frames.clear()
    n
  }

  /** Unpersist only the frames created by `session` — the multi-session
    * JVM variant: one session's cleanup must not drop the persists
    * backing another session's still-lazy results. */
  def unpersistAll(session: SparkSession, blocking: Boolean): Int =
    synchronized {
      val (mine, keep) = frames.partition(_._3.sparkSession eq session)
      mine.foreach(_._3.unpersist(blocking))
      frames.clear()
      frames ++= keep
      mine.size
    }

  def unpersistAll(session: SparkSession): Int =
    unpersistAll(session, blocking = false)
}
