package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import StatefulSessions._

/** flatMapGroupsWithState sessionization: sessions close on the
  * inactivity gap (event-driven) or on event-time timeout when the
  * watermark passes (no further events for the user), across
  * checkpointed AvailableNow runs. */
class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def drop(dir: Path, name: String, rows: String*): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  test("stateful sessions: gap-close within batch, timeout-close across batches") {
    val landing = Files.createTempDirectory("graft_sess_landing_")
    val work = Files.createTempDirectory("graft_sess_")
    val out = s"$work/out"; val ckpt = s"$work/ckpt"

    def runOnce(): Unit = {
      val src = spark.readStream.schema(eventSchema)
        .json(landing.toString).as[Event]
      val q = sessionStream(spark, src)
        .toDF()
        .writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // user 1: two sessions separated by > 30 min in ONE batch (first
    // closes by gap), user 2: one open session
    drop(landing, "b1.json",
      """{"user_id":1,"ts":"2024-01-01T10:00:00","value":1.0}""",
      """{"user_id":1,"ts":"2024-01-01T10:10:00","value":2.0}""",
      """{"user_id":1,"ts":"2024-01-01T12:00:00","value":5.0}""",
      """{"user_id":2,"ts":"2024-01-01T10:00:00","value":7.0}""")
    runOnce()
    // user 1's first session closes by gap; user 2's closes by
    // event-time timeout in the trailing micro-batch (watermark 11:30
    // passed its 10:30 timeout); user 1's 12:00 session stays open
    val s1 = spark.read.parquet(out)
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(s1 == Set((1L, 2L, 3.0), (2L, 1L, 7.0)), s"got $s1")

    // advance the watermark far past the open session -> closes by
    // event-time timeout on the next run
    drop(landing, "b2.json",
      """{"user_id":3,"ts":"2024-01-01T15:00:00","value":0.5}""")
    runOnce()
    val s2 = spark.read.parquet(out)
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(s2 == Set((1L, 2L, 3.0), (1L, 1L, 5.0), (2L, 1L, 7.0)),
      s"got $s2")
  }
}
