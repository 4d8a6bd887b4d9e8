package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Partition-scoped streaming MERGE: each batch rewrites only the
  * date partitions it touches; untouched partitions keep their files. */
class PartitionedSinkSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "shipment_id STRING, status STRING, created_at TIMESTAMP, updated_at TIMESTAMP")

  private def drop(dir: Path, name: String, rows: String*): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  test("partitioned sink rewrites only touched date partitions") {
    val landing = Files.createTempDirectory("graft_psink_landing_")
    val work = Files.createTempDirectory("graft_psink_")
    val target = s"$work/fact"; val ckpt = s"$work/ckpt"

    def runOnce(): Unit = IncrementalStream.runPartitionedUpsertSink(
      IncrementalStream.fileDropJson(spark, landing.toString, schema),
      target, ckpt, keys = Seq("shipment_id"), order = Seq(col("updated_at")),
      partitionCol = "created_date", partition = to_date(col("created_at")))

    drop(landing, "b1.json",
      """{"shipment_id":"S1","status":"Created","created_at":"2024-01-01T08:00:00","updated_at":"2024-01-01T08:00:00"}""",
      """{"shipment_id":"S2","status":"Created","created_at":"2024-01-02T08:00:00","updated_at":"2024-01-02T08:00:00"}""")
    runOnce()
    val fs = new org.apache.hadoop.fs.Path(target).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def partFiles(d: String): Set[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$target/created_date=$d"))
        .filter(_.getPath.getName.startsWith("part-"))
        .map(s => s.getPath.getName + ":" + s.getModificationTime).toSet
    val day1Before = partFiles("2024-01-01")

    // batch 2 touches only 2024-01-02 (update S2) and 2024-01-03 (new S3)
    drop(landing, "b2.json",
      """{"shipment_id":"S2","status":"Delivered","created_at":"2024-01-02T08:00:00","updated_at":"2024-01-03T09:00:00"}""",
      """{"shipment_id":"S3","status":"Created","created_at":"2024-01-03T10:00:00","updated_at":"2024-01-03T10:00:00"}""")
    runOnce()

    val t = spark.read.parquet(target)
      .select("shipment_id", "status").as[(String, String)].collect().toMap
    assert(t == Map("S1" -> "Created", "S2" -> "Delivered", "S3" -> "Created"))
    // day-1 partition untouched: same files, same mtimes
    assert(partFiles("2024-01-01") == day1Before)
  }
}
