package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-lifetime registry for library-internal persists.
  *
  * Queries like the dedup family persist shared intermediates (shingle
  * postings) so that sequential queries in one session reuse one cache
  * entry (Spark's CacheManager matches identical analyzed plans). Those
  * entries must NOT live forever: a long-running session that touches
  * many sfDirs would accumulate one cache entry per distinct plan.
  * Every persist goes through here; entry points (Verify, Bench, user
  * sessions via [[GraftSession]]) call [[releaseAll]] when a batch of
  * work is done. Unpersisting an already-released DataFrame is a no-op,
  * so double-release is safe.
  */
object CachePool {
  private val refs = new ConcurrentLinkedQueue[DataFrame]()
  // JVM-lifetime release hooks: operator families that memoize
  // DataFrame-shaped intermediates OUTSIDE the pool (e.g. the graph
  // tier's per-(dir, beam) search memo) register a clear() here so one
  // releaseAll() drops every cache layer coherently — otherwise a memo
  // outlives the persisted relations it was built from, the reuse
  // pricer reports a fake-cold first run, and regenerated data at the
  // same path can serve stale results within one JVM (r13 advice).
  private val resetHooks = new ConcurrentLinkedQueue[() => Unit]()

  /** Register a hook to run on every [[releaseAll]] (never drained). */
  def onRelease(hook: () => Unit): Unit = resetHooks.add(hook)

  /** Persist (MEMORY_AND_DISK) and register for later release.
    *
    * Skips plans the CacheManager already holds: two queries in one
    * session often build the same intermediate (e.g. the dedup family's
    * shingle postings) as distinct DataFrame objects with identical
    * analyzed plans. Re-persisting the second object is a no-op for
    * Spark but logs "WARN CacheManager: Asked to cache already cached
    * data" — noise that competes with the bench's one-line JSON contract
    * for the driver's bounded output tail.
    */
  def persist(df: DataFrame): DataFrame = {
    // The Dataset overload of lookupCachedData wants the classic
    // subclass; the (session, plan) overload takes the public API types.
    val session =
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cached = session.sharedState.cacheManager
      .lookupCachedData(session, df.queryExecution.analyzed).isDefined
    if (!cached) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      refs.add(df)
    }
    df
  }

  /** Unpersist every registered DataFrame (non-blocking) and run the
    * registered reset hooks (memo clears in operator families).
    */
  def releaseAll(): Unit = {
    var df = refs.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = refs.poll()
    }
    resetHooks.forEach(h => h())
  }
}
