package graft.ops

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interval (band) join: completeness at bucket boundaries is the
  * property the 3-bucket probe explosion exists for. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Double): Timestamp =
    new Timestamp((sec * 1000).round)

  test("intervalJoin: inclusive radius, complete across bucket boundaries") {
    // radius 10s -> buckets of 10s; probe at 100s sits at a bucket edge
    val probes = Seq((1L, 1L, ts(100.0))).toDF("probe_id", "k", "pts")
    val events = Seq(
      (10L, 1L, ts(90.0)),   // exactly -radius: inclusive, bucket b-1
      (11L, 1L, ts(89.999)), // just outside
      (12L, 1L, ts(110.0)),  // exactly +radius, bucket b+1
      (13L, 1L, ts(110.001)),// just outside
      (14L, 1L, ts(100.0)),  // same instant
      (15L, 2L, ts(100.0))   // other key: never matches
    ).toDF("event_id", "k", "ets")
    val out = IntervalJoin.intervalJoin(probes, events,
        keys = Seq("k"), probeTs = "pts", eventTs = "ets",
        radiusSec = 10L, valueCols = Seq("event_id"))
      .select("evt_event_id").as[Long].collect().toSet
    assert(out == Set(10L, 12L, 14L))
  }

  test("intervalJoin: each in-radius pair appears exactly once") {
    val probes = Seq((1L, 1L, ts(55.0)), (2L, 1L, ts(58.0)))
      .toDF("probe_id", "k", "pts")
    val events = (50 to 65).map(s => (s.toLong, 1L, ts(s.toDouble)))
      .toDF("event_id", "k", "ets")
    val out = IntervalJoin.intervalJoin(probes, events,
        keys = Seq("k"), probeTs = "pts", eventTs = "ets",
        radiusSec = 5L, valueCols = Seq("event_id"))
      .groupBy("probe_id", "evt_event_id").count()
    assert(out.filter(col("count") =!= 1L).count() == 0L,
      "no duplicate pairs from the bucket explosion")
    // probe 1 at 55s +/-5s -> events 50..60 inclusive = 11 matches
    assert(out.filter(col("probe_id") === 1L).count() == 11L)
  }
}
