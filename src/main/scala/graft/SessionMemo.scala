package graft

import org.apache.spark.sql.SparkSession

/** Memoize one value per (live SparkSession, string key) WITHOUT
  * pinning the session: entries hang off a weak-keyed outer map, so a
  * stopped session that becomes unreachable drops its whole entry —
  * and every localCheckpointed frame it holds — at the next GC.
  *
  * This replaces the `identityHashCode(session)|key` string-keyed
  * ConcurrentHashMap pattern, which had two defects: identity hashes
  * can be REUSED once the original session is collected (and can even
  * collide between live objects), so a later session could be handed
  * a checkpointed DataFrame bound to a dead SparkContext; and entries
  * were never evicted, leaking pinned checkpoint blocks per
  * (session, key).
  *
  * SparkSession does not override equals/hashCode, so WeakHashMap's
  * key semantics are identity — exactly what "this session" means.
  * The brief outer lock only resolves the inner map; `compute` runs
  * under the inner map's per-key computeIfAbsent, preserving the
  * build-once guarantee the callers rely on. */
final class SessionMemo[V] {
  private val memos = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, V]]()

  def getOrElseUpdate(s: SparkSession, key: String, compute: => V): V = {
    val inner = memos.synchronized {
      var m = memos.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, V]()
        memos.put(s, m)
      }
      m
    }
    inner.computeIfAbsent(key, _ => compute)
  }
}
