package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** File-drop → foreachBatch-upsert pipeline: two "DAG runs" (AvailableNow
  * passes) over a landing dir; the checkpoint guarantees each file is
  * processed exactly once, and the merge is last-writer-wins by event
  * timestamp — the semantics of `dags/2_logistics-shipment-dag.py`. */
class IncrementalStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "shipment_id STRING, status STRING, updated_at TIMESTAMP")

  private def drop(dir: Path, name: String, rows: String*): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  test("file-drop stream: exactly-once per file, last-writer-wins merge") {
    val landing = Files.createTempDirectory("graft_landing_")
    val work = Files.createTempDirectory("graft_stream_")
    val target = s"$work/fact_shipments"
    val ckpt = s"$work/ckpt"

    def runOnce(): Unit = IncrementalStream.runUpsertSink(
      IncrementalStream.fileDropJson(spark, landing.toString, schema),
      target, ckpt, keys = Seq("shipment_id"),
      order = Seq(col("updated_at")))

    drop(landing, "shipment_20240101_100000.json",
      """{"shipment_id":"S1","status":"Created","updated_at":"2024-01-01T10:00:00"}""",
      """{"shipment_id":"S2","status":"Created","updated_at":"2024-01-01T10:00:00"}""",
      """{"shipment_id":"S1","status":"In Transit","updated_at":"2024-01-01T11:00:00"}""")
    runOnce()
    val t1 = spark.read.parquet(target)
      .select("shipment_id", "status").as[(String, String)].collect().toMap
    assert(t1 == Map("S1" -> "In Transit", "S2" -> "Created"))

    // second drop: S1 delivered (newer), S3 new; old file must NOT be
    // reprocessed (checkpoint) and S2 must survive the merge untouched
    drop(landing, "shipment_20240102_090000.json",
      """{"shipment_id":"S1","status":"Delivered","updated_at":"2024-01-02T09:00:00"}""",
      """{"shipment_id":"S3","status":"Created","updated_at":"2024-01-02T09:00:00"}""")
    runOnce()
    val t2 = spark.read.parquet(target)
      .select("shipment_id", "status").as[(String, String)].collect().toMap
    assert(t2 == Map("S1" -> "Delivered", "S2" -> "Created", "S3" -> "Created"))
  }
}
