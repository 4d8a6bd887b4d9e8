package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import StreamingDedup._

/** Streaming first-seen dedup: duplicates are suppressed within a
  * micro-batch, across micro-batches in one run, and across
  * checkpointed runs; expired fingerprints re-emit after retention. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def drop(dir: Path, name: String, rows: String*): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  test("first-seen dedup across batches and runs; earliest row wins in-batch") {
    val landing = Files.createTempDirectory("graft_sdedup_landing_")
    val work = Files.createTempDirectory("graft_sdedup_")
    val out = s"$work/out"; val ckpt = s"$work/ckpt"

    def runOnce(): Unit = {
      val src = spark.readStream.schema(docSchema)
        .json(landing.toString).as[Doc]
      val q = dedupStream(spark, src)
        .toDF()
        .writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // fp A appears 3x in batch 1 (earliest ts wins), fp B once
    drop(landing, "b1.json",
      """{"doc_id":11,"fp":"A","ts":"2024-01-01T10:05:00"}""",
      """{"doc_id":10,"fp":"A","ts":"2024-01-01T10:00:00"}""",
      """{"doc_id":12,"fp":"A","ts":"2024-01-01T10:10:00"}""",
      """{"doc_id":20,"fp":"B","ts":"2024-01-01T10:01:00"}""")
    runOnce()
    val r1 = spark.read.parquet(out).select("doc_id", "fp")
      .as[(Long, String)].collect().toSet
    assert(r1 == Set((10L, "A"), (20L, "B")), s"got $r1")

    // batch 2 in a NEW run: A again (suppressed via checkpointed
    // state), C new (emitted)
    drop(landing, "b2.json",
      """{"doc_id":13,"fp":"A","ts":"2024-01-01T11:00:00"}""",
      """{"doc_id":30,"fp":"C","ts":"2024-01-01T11:00:00"}""")
    runOnce()
    val r2 = spark.read.parquet(out).select("doc_id", "fp")
      .as[(Long, String)].collect().toSet
    assert(r2 == Set((10L, "A"), (20L, "B"), (30L, "C")), s"got $r2")
  }

  test("duplicate arriving as the watermark overtakes its expiry re-emits, not crashes") {
    // crash + semantics regression: fp X first seen at 10:00 (TTL 1h ->
    // expiry 11:00). One run, one file per micro-batch: batch(b2:
    // Y@13:05) advances the watermark to 13:05 WITHOUT evicting X (at
    // that batch's start the watermark was still 10:00 < 11:00);
    // batch(b3: X@13:10) then invokes X with data (hasTimedOut=false).
    // Naively re-arming the stored expiry 11:00 against watermark 13:05
    // would throw and kill the query; and since X's retention HAS
    // elapsed in event time, the correct output is a re-emit — the
    // same as if an intervening batch had fired the eviction timer
    // (re-emit must not depend on micro-batch timing).
    val landing = Files.createTempDirectory("graft_sdedup_clamp_l_")
    val work = Files.createTempDirectory("graft_sdedup_clamp_")
    val out = s"$work/out"; val ckpt = s"$work/ckpt"
    def runOnce(): Unit = {
      val src = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", 1)
        .json(landing.toString).as[Doc]
      val q = dedupStream(spark, src, retentionMs = 60L * 60 * 1000,
          watermarkDelay = "0 seconds")
        .toDF()
        .writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drop(landing, "b1.json",
      """{"doc_id":1,"fp":"X","ts":"2024-01-01T10:00:00"}""")
    runOnce()
    drop(landing, "b2.json",
      """{"doc_id":2,"fp":"Y","ts":"2024-01-01T13:05:00"}""")
    drop(landing, "b3.json",
      """{"doc_id":4,"fp":"X","ts":"2024-01-01T13:10:00"}""")
    // order the two micro-batches by mtime (recent: the file source
    // ignores files older than maxFileAge relative to the newest)
    val now = System.currentTimeMillis()
    landing.resolve("b2.json").toFile.setLastModified(now - 2000)
    landing.resolve("b3.json").toFile.setLastModified(now - 1000)
    runOnce()
    val r = spark.read.parquet(out).select("doc_id", "fp")
      .as[(Long, String)].collect().toSet
    assert(r == Set((1L, "X"), (2L, "Y"), (4L, "X")), s"got $r")
  }

  test("retention expiry: a fingerprint seen again after TTL re-emits") {
    val landing = Files.createTempDirectory("graft_sdedup_ttl_l_")
    val work = Files.createTempDirectory("graft_sdedup_ttl_")
    val out = s"$work/out"; val ckpt = s"$work/ckpt"

    def runOnce(): Unit = {
      val src = spark.readStream.schema(docSchema)
        .json(landing.toString).as[Doc]
      val q = dedupStream(spark, src, retentionMs = 60L * 60 * 1000,
          watermarkDelay = "0 seconds")
        .toDF()
        .writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    drop(landing, "b1.json",
      """{"doc_id":1,"fp":"X","ts":"2024-01-01T10:00:00"}""")
    runOnce()
    // watermark jumps past 11:00 (state TTL), then X arrives again
    drop(landing, "b2.json",
      """{"doc_id":2,"fp":"Y","ts":"2024-01-01T13:00:00"}""")
    runOnce()
    drop(landing, "b3.json",
      """{"doc_id":3,"fp":"X","ts":"2024-01-01T13:30:00"}""")
    runOnce()
    val r = spark.read.parquet(out).select("doc_id", "fp")
      .as[(Long, String)].collect().toSet
    assert(r == Set((1L, "X"), (2L, "Y"), (3L, "X")), s"got $r")
  }
}
