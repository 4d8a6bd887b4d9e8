package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Structured Streaming watermark + tumbling-window aggregation: late
  * data within the watermark is folded into its window; data later
  * than the watermark is dropped; windows emit (append mode) only once
  * the watermark passes their end. State survives across AvailableNow
  * runs via the checkpoint — the micro-batch cadence of the
  * reference's scheduled DAG runs. */
class WatermarkWindowSpec extends SparkSpec {

  private val schema = StructType.fromDDL("event_id INT, ts TIMESTAMP")

  private def drop(dir: Path, name: String, rows: String*): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  private def runOnce(landing: Path, out: String, ckpt: String): Unit = {
    val q = spark.readStream.schema(schema).json(landing.toString)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("watermarked windows: late-within-watermark kept, too-late dropped") {
    val landing = Files.createTempDirectory("graft_wm_landing_")
    val work = Files.createTempDirectory("graft_wm_")
    val out = s"$work/out"; val ckpt = s"$work/ckpt"

    // run 1: two events in the 10:00 window
    drop(landing, "b1.json",
      """{"event_id":1,"ts":"2024-01-01T10:05:00"}""",
      """{"event_id":2,"ts":"2024-01-01T10:30:00"}""")
    runOnce(landing, out, ckpt)

    // run 2: watermark is 09:30; a late 10:10 event is ABOVE it -> kept;
    // fresh 12:30 events push the watermark to 11:30, closing window 10:00
    drop(landing, "b2.json",
      """{"event_id":3,"ts":"2024-01-01T10:10:00"}""",
      """{"event_id":4,"ts":"2024-01-01T12:30:00"}""")
    runOnce(landing, out, ckpt)
    val afterRun2 = spark.read.parquet(out)
      .select(date_format(col("ws"), "HH:mm").as("w"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterRun2 == Map("10:00" -> 3L), s"got $afterRun2")

    // run 3: watermark is 11:30; a 10:20 event is BELOW it -> dropped
    // (window 10:00 already finalized with n=3 and must not re-emit)
    drop(landing, "b3.json",
      """{"event_id":5,"ts":"2024-01-01T10:20:00"}""",
      """{"event_id":6,"ts":"2024-01-01T14:30:00"}""")
    runOnce(landing, out, ckpt)
    val afterRun3 = spark.read.parquet(out)
      .select(date_format(col("ws"), "HH:mm").as("w"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 12:00 window closed by the 14:30 watermark push; 10:00 unchanged
    assert(afterRun3 == Map("10:00" -> 3L, "12:00" -> 1L), s"got $afterRun3")
  }
}
