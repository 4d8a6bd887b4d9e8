package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.{Dedup, ManifestTable}

/** The composed file-drop → quality → exact dedup → decision →
  * manifest-MERGE pipeline: the final committed table equals the
  * batch recompute for any batching, a re-run of a drained checkpoint
  * is a no-op, and a later drop merges incrementally to the same
  * state a full recompute gives. */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private def row(id: Long, text: String): String =
    s"""{"doc_id":$id,"text":"$text"}"""
  private def drop(dir: Path, name: String, rows: String*): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  private val good1 = "alpha beta gamma delta epsilon zeta"
  private val good2 = "one two three four five six seven"
  private val short1 = "too short" // fails the 5-token quality gate

  private def runOnce(landing: Path, root: String, ckpt: String): Unit = {
    val src = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1").json(landing.toString)
    val q = CorpusStream.runCorpusSink(src, root, ckpt)
    q.awaitTermination()
  }

  private def recompute(rows: Seq[(Long, String)]) =
    Dedup.exactDupGroups(
        rows.toDF("doc_id", "text")
          .filter(size(split(col("text"), "\\s+")) >= 5),
        "doc_id", "text")
      .orderBy("fp").as[(String, Long, Long)].collect().toSeq

  test("end-to-end: multi-file drop drains one file per batch; final " +
      "committed table equals the batch recompute; quality-failed " +
      "docs never reach state; re-run of a drained checkpoint is a " +
      "no-op; a later drop merges incrementally") {
    val landing = Files.createTempDirectory("graft_corpus_landing_")
    val work = Files.createTempDirectory("graft_corpus_")
    val root = s"$work/tbl"; val ckpt = s"$work/ckpt"

    // three files → three micro-batches; doc 5 duplicates doc 1's
    // text ACROSS batches (the state the decision table exists for),
    // doc 9 fails quality
    drop(landing, "f1.json", row(1, good1), row(2, good2))
    drop(landing, "f2.json", row(5, good1), row(9, short1))
    drop(landing, "f3.json", row(7, "seven eight nine ten eleven twelve"))
    runOnce(landing, root, ckpt)

    val vAfterFirst = ManifestTable.currentVersion(spark, root).get
    assert(vAfterFirst >= 2L, "multi-file drop must commit per batch")
    val got = ManifestTable.read(spark, root).get
      .orderBy("fp").as[(String, Long, Long)].collect().toSeq
    val want = recompute(Seq(1L -> good1, 2L -> good2, 5L -> good1,
      7L -> "seven eight nine ten eleven twelve", 9L -> short1))
    assert(got == want, s"streamed state diverged:\n$got\nvs\n$want")
    // the cross-batch duplicate resolved: keeper is the global min
    val dupRow = got.find(_._2 == 1L).get
    assert(dupRow._3 == 2L, s"dup count wrong: $dupRow")

    // re-running the drained stream (same checkpoint): nothing new,
    // no version advance, state identical
    runOnce(landing, root, ckpt)
    assert(ManifestTable.currentVersion(spark, root).contains(vAfterFirst))
    assert(ManifestTable.read(spark, root).get
      .orderBy("fp").as[(String, Long, Long)].collect().toSeq == got)

    // a LATER drop: doc 11 duplicates good2 — the incremental merge
    // must fold it into the existing fingerprint's count, and the
    // whole state must still equal a from-scratch recompute
    drop(landing, "f4.json", row(11, good2))
    runOnce(landing, root, ckpt)
    val got2 = ManifestTable.read(spark, root).get
      .orderBy("fp").as[(String, Long, Long)].collect().toSeq
    val want2 = recompute(Seq(1L -> good1, 2L -> good2, 5L -> good1,
      7L -> "seven eight nine ten eleven twelve", 9L -> short1,
      11L -> good2))
    assert(got2 == want2, s"incremental state diverged:\n$got2\nvs\n$want2")
  }

  test("crash-replay: a batch whose commit landed is skipped on " +
      "replay; a batch that died before its marker recomputes " +
      "identically from the prior version") {
    val landing = Files.createTempDirectory("graft_corpus_crash_")
    val work = Files.createTempDirectory("graft_corpus_crash_w_")
    val root = s"$work/tbl"; val ckpt = s"$work/ckpt"
    drop(landing, "f1.json", row(1, good1), row(3, good2))
    runOnce(landing, root, ckpt)
    val committed = ManifestTable.read(spark, root).get
      .orderBy("fp").as[(String, Long, Long)].collect().toSeq
    val ver = ManifestTable.currentVersion(spark, root).get

    // simulate the crash-before-marker of the NEXT batch: data dir
    // written, marker absent — readers still see the old version, and
    // the stream's replay (same checkpoint, same batch key) must land
    // the batch exactly once on top of the UNTORN prior state
    ManifestTable.writeVersionData(
      Seq(("TORN", 0L, 0L)).toDF("fp", "keeper", "n_docs"), root, ver + 1)
    assert(ManifestTable.read(spark, root).get
      .orderBy("fp").as[(String, Long, Long)].collect().toSeq == committed)

    drop(landing, "f2.json", row(5, good1))
    runOnce(landing, root, ckpt)
    val got = ManifestTable.read(spark, root).get
      .orderBy("fp").as[(String, Long, Long)].collect().toSeq
    val want = recompute(Seq(1L -> good1, 3L -> good2, 5L -> good1))
    assert(got == want, s"replay state diverged:\n$got\nvs\n$want")
  }
}
