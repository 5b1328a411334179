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

  /** Persist (MEMORY_AND_DISK) and register for later release. */
  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    refs.add(df)
    df
  }

  /** Unpersist every registered DataFrame (non-blocking). */
  def releaseAll(): Unit = {
    var df = refs.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = refs.poll()
    }
  }
}
