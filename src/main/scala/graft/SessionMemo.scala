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
  * build-once guarantee the callers rely on.
  *
  * The WeakHashMap alone is NOT sufficient: the memoized values
  * (DataFrames, trained indexes) hold a strong reference back to
  * their SparkSession — the classic WeakHashMap value→key trap — so
  * an entry would never become weakly reachable on its own. Every
  * access therefore also PURGES entries whose session has been
  * STOPPED (`sparkContext.isStopped`): a stopped session's frames are
  * unusable anyway, and dropping the entry severs the value→key chain
  * so the weak semantics can finish the job for the
  * unreachable-without-stop case. */
final class SessionMemo[V] {
  private val memos = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, SessionMemo.Cell[V]]]()

  def getOrElseUpdate(s: SparkSession, key: String, compute: => V): V = {
    val inner = memos.synchronized {
      val it = memos.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val sess = e.getKey
        if (sess != null &&
            (try sess.sparkContext.isStopped catch { case _: Throwable => true }))
          it.remove()
      }
      var m = memos.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String,
          SessionMemo.Cell[V]]()
        memos.put(s, m)
      }
      m
    }
    // build-once runs in the CELL's own latch, never inside the map's
    // computeIfAbsent: a minutes-long build (IVF-PQ training) under
    // the map's bin lock blocked unrelated keys hashing to the same
    // bin, and a compute that touched the same memo again threw
    // ConcurrentHashMap's recursive-update IllegalStateException (or
    // deadlocked). computeIfAbsent now only allocates the empty cell
    // (cheap, non-reentrant); same-key callers serialize on the cell,
    // different keys never wait on each other.
    inner.computeIfAbsent(key, _ => new SessionMemo.Cell[V]).get(compute)
  }

  /** Peek: the memoized value if one was already computed for this
    * (live session, key) — never computes. Lets a caller memoize
    * CONDITIONALLY (e.g. cache only positive results). May briefly
    * block on the cell monitor while another thread's compute for the
    * same key is in flight. */
  def get(s: SparkSession, key: String): Option[V] = {
    val inner = memos.synchronized(Option(memos.get(s)))
    inner.flatMap(m => Option(m.get(key))).flatMap(_.peek)
  }
}

object SessionMemo {
  /** One lazily-completed slot: the first caller computes under the
    * cell's monitor, later callers read the memoized value. Only
    * SAME-KEY callers contend here.
    *
    * Re-entrancy: the cell's monitor is a JVM intrinsic lock, which
    * is REENTRANT — a compute that touches the same memo key again
    * would re-enter the monitor, see `value == None`, and recurse
    * unboundedly (StackOverflow), where the old computeIfAbsent path
    * failed fast. Track the owning thread and throw
    * IllegalStateException on same-thread same-key re-entry to keep
    * the fail-fast contract. (Cross-thread compute CYCLES across
    * different keys can still deadlock — same as any lock cycle; a
    * memoized build must not depend on itself.) A failed compute
    * resets the owner so later callers retry rather than inherit the
    * failure. */
  final class Cell[V] {
    private var value: Option[V] = None
    private var owner: Thread = null
    /** Non-blocking read of a completed value (None while empty or
      * mid-compute). Best-effort by design — used for peeks only. */
    def peek: Option[V] = this.synchronized(value)
    def get(compute: => V): V = this.synchronized {
      value match {
        case Some(v) => v
        case None =>
          if (owner eq Thread.currentThread())
            throw new IllegalStateException(
              "re-entrant SessionMemo compute on the same key")
          owner = Thread.currentThread()
          try { val v = compute; value = Some(v); v }
          finally owner = null
      }
    }
  }
}
