package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Registry of SQL-started streaming queries — the handle store
  * behind `GRAFT STREAM SYNC …` / `GRAFT STREAM STOP '<id>'`
  * ([[graft.sql.GraftSqlParser]]). A statement-text user has no Scala
  * [[StreamingQuery]] reference to hold; the id returned by SYNC is
  * the reference. JVM-local by design: a streaming query IS a
  * JVM-local object (restart recovery is the CHECKPOINT's job, and
  * exactly-once is the sink's batch keys — see
  * [[CdfStream.runSyncSink]] — so losing this map with the JVM loses
  * nothing but the convenience handle). */
object GraftStreams {

  private val running =
    scala.collection.concurrent.TrieMap.empty[String, StreamingQuery]

  /** Track a started query; returns the id handed back to SQL. */
  def register(q: StreamingQuery): String = {
    val id = q.id.toString
    running.put(id, q)
    id
  }

  def get(id: String): Option[StreamingQuery] = running.get(id)

  /** Stop by id — loud on an unknown/already-stopped id (a silent
    * no-op would leave the caller believing a live stream stopped). */
  def stop(id: String): Unit = running.remove(id) match {
    case Some(q) => q.stop()
    case None => throw new IllegalArgumentException(
      s"graft: no running stream with id $id")
  }
}
