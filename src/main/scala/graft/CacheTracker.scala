package graft

import org.apache.spark.sql.Dataset

/** Lifecycle registry for operator-internal persists.
  *
  * Operators like `Dedup.jaccardPairs` persist intermediates (shingle
  * indexes, band tables) that outlive the returned lazy frame — the
  * operator cannot know when the caller has finished materializing, so
  * it cannot unpersist safely itself. Every such persist is registered
  * here, and harness code that runs MANY queries in one session
  * (Bench's measured loop) calls [[releaseAll]] between runs so cached
  * blocks don't accumulate across an unbounded query sweep.
  *
  * Deliberately NOT tracked: the EDW star (`EdwQueries.star`), which
  * models a materialized warehouse table and must survive across the
  * serving queries — that is its whole point.
  *
  * Unpersisting is always safe (Spark falls back to recompute), so a
  * release racing an in-flight job costs time, not correctness; Verify
  * (which runs queries concurrently) therefore leaves the session-
  * lifetime default alone and lets eviction handle pressure.
  */
object CacheTracker {
  private val tracked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Dataset[_]]()

  /** Register a persisted intermediate; returns it unchanged. */
  def track[T](d: Dataset[T]): Dataset[T] = {
    tracked.add(d)
    d
  }

  /** Unpersist every tracked intermediate (non-blocking) and forget it. */
  def releaseAll(): Unit = {
    tracked.forEach { d =>
      try d.unpersist(blocking = false)
      catch { case _: Throwable => () } // stopped session: nothing to free
    }
    tracked.clear()
  }
}
