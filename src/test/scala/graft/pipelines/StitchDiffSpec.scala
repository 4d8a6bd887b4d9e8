package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 batch C: stitch-pair adjacency recovery, snapshot diff. */
class StitchDiffSpec extends SparkSpec {
  import spark.implicits._

  test("stitchPairs: suffix-k == prefix-k links; short rows skipped") {
    val d = Seq(
      ("c1", "a b c d e f"), // suffix-2 "e f"
      ("c2", "e f g h i j"), // prefix-2 "e f" -> c1 stitches into c2
      ("c3", "x y z w q r"),
      ("c4", "e f")          // 2 tokens < 2k: skipped entirely
    ).toDF("chunk_id", "text")
    val out = CorpusPipeline.stitchPairs(d, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("c1", "c2")))
  }

  test("stitchPairs: chunked doc re-links its consecutive chunks") {
    val text = (1 to 40).map(i => s"t$i").mkString(" ")
    val ch = Seq(("d", text)).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(1), size(col("ws")), lit(8))).as("start"))
      .select(concat_ws("_", col("doc_id"), col("start")).as("chunk_id"),
        concat_ws(" ", slice(col("ws"), col("start"), lit(12))).as("text"))
    // width 12, stride 8 -> consecutive chunks overlap by 4 tokens
    val out = CorpusPipeline.stitchPairs(ch, k = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // full chunks at starts 1,9,17,25 re-link in order; the start-33
    // tail (8 toks = 2k) links from 25
    assert(out.contains(("d_1", "d_9")) && out.contains(("d_9", "d_17")))
    assert(out.contains(("d_17", "d_25")) && out.contains(("d_25", "d_33")))
    assert(!out.exists { case (a, b) => a == b })
  }

  test("snapshotDiff: added, removed, changed; unchanged suppressed") {
    val prev = Seq((1L, "same text"), (2L, "old text"), (3L, "kept")
      ).toDF("doc_id", "text")
    val curr = Seq((1L, "same  text"), (2L, "new text"), (4L, "fresh")
      ).toDF("doc_id", "text")
    val out = CorpusPipeline.snapshotDiff(prev, curr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: whitespace-only difference -> same normalized fingerprint
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }
}
