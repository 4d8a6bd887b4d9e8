package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Dedup

/** Streaming keeper-decision maintenance: micro-batches append bands,
  * replay prior assignments as star edges, and relabel through one CC;
  * the streamed decision state equals a one-shot full recompute over
  * every document seen. */
class DedupDecisionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "alpha beta gamma delta epsilon zeta eta theta"
  private val textB = "one two three four five six seven eight"

  private def docRow(i: Long, text: String): String =
    s"""{"doc_id":$i,"text":"$text"}"""
  private def drop(dir: Path, name: String, rows: String*): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  test("foreachBatch decision sink: cross-micro-batch merge relabels, " +
      "state equals full recompute, namespaced batch subdirs") {
    val landing = Files.createTempDirectory("graft_ccstream_landing_")
    val work = Files.createTempDirectory("graft_ccstream_")
    val bands = s"$work/bands"; val dec = s"$work/decisions"
    val ckpt = s"$work/ckpt"

    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .json(landing.toString)
      val q = DedupDecisionStream.runDecisionSink(src, bands, dec, ckpt)
      q.processAllAvailable()
      q.stop()
    }

    // micro-batch 0: families A (1,3) and B (5,7) + a singleton
    drop(landing, "b1.json",
      docRow(1L, textA), docRow(3L, textA),
      docRow(5L, textB), docRow(7L, textB),
      docRow(9L, "lonely unique content nine"))
    runOnce()
    // micro-batch 1: doc 2 joins family A, doc 6 joins family B,
    // doc 8 is new and unrelated
    drop(landing, "b2.json",
      docRow(2L, textA), docRow(6L, textB),
      docRow(8L, "totally new content eight"))
    runOnce()

    // read the decision state latest-epoch-wins, as a consumer would
    val state = spark.read.option("recursiveFileLookup", "true")
      .parquet(dec)
      .groupBy($"doc_id")
      .agg(max_by($"cluster", $"epoch").as("cluster"))
      .as[(Long, Long)].collect().toMap
    assert(state.keySet == Set(1L, 2L, 3L, 5L, 6L, 7L, 8L, 9L))
    assert(state(2L) == state(1L) && state(1L) == state(3L))
    assert(state(6L) == state(5L) && state(5L) == state(7L))
    assert(state(8L) == 8L && state(9L) == 9L)

    // streamed state == one-shot full recompute over everything seen
    val all = Seq(
      (1L, textA), (3L, textA), (5L, textB), (7L, textB),
      (9L, "lonely unique content nine"), (2L, textA), (6L, textB),
      (8L, "totally new content eight")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(all, "doc_id", "text", n = 3, k = 16)
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", k = 16, rows = 4)
    val full = Dedup.dedupDecision(all.select($"doc_id"), "doc_id", pairs)
      .select($"doc_id", $"cluster").as[(Long, Long)].collect().toMap
    assert(state == full,
      s"streamed decision state diverged:\n$state\nvs\n$full")

    // band subdirs are namespaced stream-<ns>-<bid> with one namespace
    val fs = new java.io.File(bands).listFiles().map(_.getName)
      .filter(_.startsWith("stream-")).toSet
    val ns = fs.map(_.split("-")(1))
    assert(ns.size == 1 && ns.head.matches("[0-9a-f]{8}"), s"dirs: $fs")
    assert(fs.map(_.split("-")(2)) == Set("0", "1"))
  }

  test("fresh checkpoint lineage against the same decision state: " +
      "relabels from the new lineage outrank every prior epoch " +
      "(micro-batch counter resets to 0 — the round-9 ADVICE race)") {
    val work = Files.createTempDirectory("graft_ccstream_lineage_")
    val bands = s"$work/bands"; val dec = s"$work/decisions"

    def run(landing: Path, ckpt: String): Unit = {
      val src = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1") // one micro-batch per file
        .json(landing.toString)
      val q = DedupDecisionStream.runDecisionSink(src, bands, dec, ckpt)
      q.processAllAvailable()
      q.stop()
    }

    // lineage 1, two micro-batches: families A and B resolve, and the
    // second batch already writes deltas at a POSITIVE epoch
    val landing1 = Files.createTempDirectory("graft_ccs_l1_")
    drop(landing1, "b1.json", docRow(1L, textA), docRow(3L, textA))
    drop(landing1, "b2.json", docRow(5L, textB), docRow(7L, textB))
    run(landing1, s"$work/ckpt1")

    // lineage 2: FRESH checkpoint (its micro-batch counter restarts
    // at 0), new landing, same decision state. Doc 2 copies family
    // B's text — and its id is SMALLER than B's keeper (5), so the
    // increment must RELABEL old docs 5 and 7 to cluster 2. Those
    // relabel deltas come from lineage 2's batch 0: with the raw
    // micro-batch counter as the epoch they'd land at epoch 0 and
    // LOSE the latest-wins read against the same docs' lineage-1
    // epoch-1 deltas (cluster 5) — silent state corruption. The
    // auto-derived epoch (max prior + 1) makes them win.
    val landing2 = Files.createTempDirectory("graft_ccs_l2_")
    drop(landing2, "b1.json", docRow(2L, textB))
    run(landing2, s"$work/ckpt2")

    val state = spark.read.option("recursiveFileLookup", "true")
      .parquet(dec)
      .groupBy($"doc_id")
      .agg(max_by($"cluster", $"epoch").as("cluster"))
      .as[(Long, Long)].collect().toMap
    assert(state.keySet == Set(1L, 2L, 3L, 5L, 7L))
    assert(state(1L) == 1L && state(3L) == 1L, s"family A moved: $state")
    assert(state(2L) == 2L && state(5L) == 2L && state(7L) == 2L,
      s"fresh-lineage relabels lost the latest-wins read: $state")
    // and the persisted epochs are strictly monotone ACROSS lineages:
    // the new lineage's subdir epoch exceeds every lineage-1 epoch
    val byDir = new java.io.File(dec).listFiles().toSeq
      .filter(d => d.isDirectory && !d.getName.contains("__"))
      .map(d => d.getName ->
        spark.read.parquet(d.toString).agg(max($"epoch")).as[Int].head())
      .toMap
    val (l2, l1) = byDir.partition(_._2 == byDir.values.max)
    assert(l2.size == 1 && l1.size == 2,
      s"expected 2 lineage-1 batches + 1 lineage-2 batch: $byDir")
    assert(l2.values.head > l1.values.max,
      s"lineage-2 epoch did not continue past lineage 1: $byDir")
  }
}
