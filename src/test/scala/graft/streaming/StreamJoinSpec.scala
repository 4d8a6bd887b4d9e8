package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Stream-stream interval join ([[StreamJoins.intervalJoin]]) and
  * dropDuplicatesWithinWatermark — the bounded-state streaming
  * correlation surface. File sources + AvailableNow + a shared
  * checkpoint mirror the reference's scheduled micro-batch cadence
  * (state must survive across runs). */
class StreamJoinSpec extends SparkSpec {

  private val orderSchema = StructType.fromDDL("order_id INT, ots TIMESTAMP")
  private val shipSchema = StructType.fromDDL("order_id INT, sts TIMESTAMP")

  private def drop(dir: Path, name: String, rows: String*): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  test("interval join: in-window shipment joins, out-of-window and orphan drop") {
    val ordDir = Files.createTempDirectory("graft_sj_ord_")
    val shpDir = Files.createTempDirectory("graft_sj_shp_")
    val work = Files.createTempDirectory("graft_sj_")
    drop(ordDir, "o1.json",
      """{"order_id":1,"ots":"2024-01-01T10:00:00"}""",
      """{"order_id":2,"ots":"2024-01-01T10:00:00"}""")
    drop(shpDir, "s1.json",
      """{"order_id":1,"sts":"2024-01-01T10:30:00"}""", // within 1h -> joins
      """{"order_id":1,"sts":"2024-01-01T12:00:00"}""", // outside    -> drops
      """{"order_id":9,"sts":"2024-01-01T10:10:00"}""") // orphan     -> drops
    val orders = spark.readStream.schema(orderSchema).json(ordDir.toString)
    val ships = spark.readStream.schema(shipSchema).json(shpDir.toString)
    val q = StreamJoins.intervalJoin(orders, ships,
        key = "order_id", leftTs = "ots", rightTs = "sts",
        within = "1 hour", watermark = "30 minutes")
      .writeStream.format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$work/out")
      .select(col("order_id"), date_format(col("sts"), "HH:mm").as("s"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "10:30")), s"got $got")
  }

  test("dropDuplicatesWithinWatermark: dedupes across batches via checkpoint state") {
    val landing = Files.createTempDirectory("graft_ddw_landing_")
    val work = Files.createTempDirectory("graft_ddw_")
    val schema = StructType.fromDDL("event_id INT, ts TIMESTAMP")
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).json(landing.toString)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
        .writeStream.format("parquet")
        .option("path", s"$work/out")
        .option("checkpointLocation", s"$work/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drop(landing, "b1.json",
      """{"event_id":1,"ts":"2024-01-01T10:00:00"}""",
      """{"event_id":1,"ts":"2024-01-01T10:05:00"}""", // in-batch dup
      """{"event_id":2,"ts":"2024-01-01T10:10:00"}""")
    runOnce()
    // second RUN: event 1 again, still within the watermark window ->
    // suppressed by state restored from the checkpoint; event 3 is new
    drop(landing, "b2.json",
      """{"event_id":1,"ts":"2024-01-01T10:20:00"}""",
      """{"event_id":3,"ts":"2024-01-01T10:30:00"}""")
    runOnce()
    val ids = spark.read.parquet(s"$work/out")
      .groupBy(col("event_id")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ids == Map(1 -> 1L, 2 -> 1L, 3 -> 1L), s"got $ids")
  }
}
