package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Bounded, session-aware memo for expensive per-(session, dataset)
  * artifacts — checkpointed DataFrames, trained models, pair graphs.
  *
  * Replaces the ad-hoc `TrieMap[identityHashCode(spark):dir, V]` memos,
  * which had two failure modes in a long-lived deployment:
  *
  *  - '''identity reuse''': `System.identityHashCode` can recur after
  *    the original session is GC'd, so a fresh session with the same
  *    dataset key could be served a DataFrame or model bound to a dead
  *    session. Here the owning session rides in the map key and is
  *    compared by REFERENCE (`eq`), which can never alias two distinct
  *    sessions; entries whose session has been stopped are purged (and
  *    released) on the next access rather than reused.
  *
  *  - '''unbounded growth''': entries were never evicted, so cached
  *    `localCheckpoint` blocks accumulated disk for the session's
  *    lifetime as a session cycled datasets. Here the map is bounded:
  *    past `maxEntries`, the oldest entry is evicted through the
  *    `release` callback (unpersist / checkpoint-block free), so
  *    storage tracks the working set, not the history.
  *
  * Compute runs under the memo lock — the artifacts memoized here are
  * multi-second Spark jobs shared by a handful of registered queries,
  * so serializing their first materialization is the point (two
  * concurrent consumers must not both pay the build).
  */
final class SessionMemo[V](maxEntries: Int)(release: V => Unit) {
  require(maxEntries >= 1, s"maxEntries must be >= 1, got $maxEntries")

  import SessionMemo.K

  // insertion-ordered so eviction drops the oldest artifact
  private val map = new java.util.LinkedHashMap[K, V]()

  def getOrElseUpdate(spark: SparkSession, key: String)(compute: => V): V =
    synchronized {
      // purge dead-session entries first: their checkpoint blocks are
      // already gone with the session, and serving one would hand the
      // caller a plan bound to a stopped context
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.session.sparkContext.isStopped) {
          release(e.getValue)
          it.remove()
        }
      }
      val k = new K(spark, key)
      val hit = map.get(k)
      if (hit != null) hit
      else {
        val v = compute
        map.put(k, v)
        while (map.size > maxEntries) {
          val eldest = map.entrySet().iterator().next()
          release(eldest.getValue)
          map.remove(eldest.getKey)
        }
        v
      }
    }

  private[graft] def size: Int = synchronized(map.size)
}

object SessionMemo {

  /** Reference-identity session key: two sessions are the same entry
    * owner iff they are the same object, never merely equal hashes.
    */
  private final class K(val session: SparkSession, val key: String) {
    override def hashCode: Int =
      System.identityHashCode(session) * 31 + key.hashCode
    override def equals(o: Any): Boolean = o match {
      case k: K => (k.session eq session) && k.key == key
      case _ => false
    }
  }

  /** Free the storage behind a memoized DataFrame: the cache-manager
    * entry if it was `persist()`ed, plus the checkpoint RDD's blocks
    * when the plan root is the `LogicalRDD` that
    * `Dataset.localCheckpoint` returns (plain `unpersist` does not
    * reach those — they are RDD-level storage, not SQL cache entries).
    */
  def free(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.logical match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
