package graft.streaming

import java.nio.file.{Files, Path}
import graft.SparkSpec
import graft.ops.ManifestTable

/** Streaming MERGE into the manifest-committed transactional table:
  * each micro-batch becomes a committed version, last-writer-wins on
  * keys, replays are exactly-once, and a fresh checkpoint against the
  * same table gets a fresh batch-key namespace (never mistaken for a
  * replay). */
class TransactionalStreamSpec extends SparkSpec {
  import spark.implicits._

  private def row(k: Long, v: String): String = s"""{"k":$k,"v":"$v"}"""
  private def drop(dir: Path, name: String, rows: String*): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  test("foreachBatch merge: versions advance per batch, upsert " +
      "semantics hold, history is time-travelable") {
    val landing = Files.createTempDirectory("graft_txstream_landing_")
    val work = Files.createTempDirectory("graft_txstream_")
    val root = s"$work/tbl"; val ckpt = s"$work/ckpt"

    def runOnce(): Unit = {
      val src = spark.readStream.schema("k BIGINT, v STRING")
        .json(landing.toString)
      val q = TransactionalStream.runMergeSink(src, root, Seq("k"), ckpt)
      q.processAllAvailable()
      q.stop()
    }

    drop(landing, "b1.json", row(1, "a"), row(2, "b"))
    runOnce()
    assert(ManifestTable.currentVersion(spark, root).contains(1L))

    // batch 2 updates key 1 and inserts key 3 (same checkpoint → next
    // batch id in the SAME namespace)
    drop(landing, "b2.json", row(1, "a2"), row(3, "c"))
    runOnce()
    assert(ManifestTable.currentVersion(spark, root).contains(2L))
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a2"), (2L, "b"), (3L, "c")))
    // version 1 is still readable, exactly as committed
    assert(ManifestTable.readVersion(spark, root, 1L)
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b")))

    // restarting from the SAME checkpoint with no new files replays
    // nothing: version stays
    runOnce()
    assert(ManifestTable.currentVersion(spark, root).contains(2L))

    // a FRESH checkpoint restarts bids at 0 but gets a fresh
    // namespace: the landing files re-deliver as NEW batches and merge
    // idempotently on keys (last-writer-wins), never silently skipped
    // as someone else's replay
    val ckpt2 = s"$work/ckpt2"
    val src2 = spark.readStream.schema("k BIGINT, v STRING")
      .json(landing.toString)
    // both landing files land in ONE micro-batch here, so key 1
    // arrives twice — dedupOrder resolves it last-writer-wins by v
    // (the CDC updated_at idiom) before the MERGE kernel runs
    val q2 = TransactionalStream.runMergeSink(src2, root, Seq("k"), ckpt2,
      dedupOrder = Some(Seq(org.apache.spark.sql.functions.col("v"))))
    q2.processAllAvailable()
    q2.stop()
    assert(ManifestTable.currentVersion(spark, root).get >= 3L)
    val cur = ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // the re-delivered content merges idempotently on keys
    assert(cur == Seq((1L, "a2"), (2L, "b"), (3L, "c")))
  }
}
