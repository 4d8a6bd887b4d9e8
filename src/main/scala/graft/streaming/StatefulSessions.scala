package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Custom-state streaming (builder brief: `KeyValueGroupedDataset
  * .flatMapGroupsWithState` for custom state): user sessionization
  * with an inactivity gap, emitting a session row when the gap expires
  * (event-time timeout driven by the watermark).
  *
  * This is the stateful-native alternative to `session_window`
  * aggregation: arbitrary per-session state (here: count + value sum +
  * bounds) and full control of emission. State per key is O(1); the
  * state store shuffles by user_id — the layout that scales to any
  * user count.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(
      start: Long, lastTs: Long, nEvents: Long, sumValue: Double)
  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long,
      sum_value: Double)

  val eventSchema: StructType =
    StructType.fromDDL("user_id BIGINT, ts TIMESTAMP, value DOUBLE")

  def updateState(
      gapMs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    def toSession(s: SessionState) = Session(
      userId, new java.sql.Timestamp(s.start),
      new java.sql.Timestamp(s.lastTs + gapMs), s.nEvents, s.sumValue)

    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession).toSeq
      state.remove()
      out.iterator
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var closed = Seq.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastTs <= gapMs =>
            cur = Some(SessionState(s.start, math.max(s.lastTs, t),
              s.nEvents + 1, s.sumValue + e.value))
          case Some(s) =>
            closed :+= toSession(s)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastTs + gapMs)
      }
      closed.iterator
    }
  }

  /** Wire the stateful sessionizer over a streaming event source. */
  def sessionStream(
      spark: SparkSession,
      events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "30 minutes"): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        updateState(gapMs))
  }
}
