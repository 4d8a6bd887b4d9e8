package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("merges: hand-traced BPE on a tiny corpus") {
    // corpus words: "low" x2, "lower", "low" (type counts: low=3, lower=1)
    // chars: l o w (+ e r). Pair counts round 1 (weighted by type count):
    //   (l,o)=4, (o,w)=4, (w,e)=1, (e,r)=1 -> tie (l,o) vs (o,w),
    //   tie-break left asc: (l,o) wins
    // round 2: lo|w x4 -> (lo,w)=4, (w,e)=1, (e,r)=1 -> (lo,w)
    // round 3: low|e|r -> (low,e)=1, (e,r)=1 -> (e,r) by left asc
    val docs = Seq((1L, "low low lower"), (2L, "low"))
      .toDF("doc_id", "text")
    val got = BpeTrainer.merges(docs, nMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "l", "o", 4L),
      (2, "lo", "w", 4L),
      (3, "e", "r", 1L)))
  }

  test("merges: stops early when every word fuses to one symbol") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // round 1 merges (a,b); afterwards no adjacent pair remains
    val got = BpeTrainer.merges(docs, nMerges = 5).collect()
    assert(got.length == 1)
    assert(got.head.getString(1) == "a" && got.head.getString(2) == "b")
  }

  test("overlapping pair merges leftmost-greedy (aaa -> aa|a)") {
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m = BpeTrainer.merges(docs, nMerges = 2).collect()
    // round 1: (a,a) count 4 (two overlapping pairs x 1 word type... the
    // type "aaa" has pairs (a,a) twice, weighted by wc=2 -> 4
    assert(m(0).getString(1) == "a" && m(0).getLong(3) == 4L)
    // after merging: |aa||a| -> round 2 pair (aa, a)
    assert(m(1).getString(1) == "aa" && m(1).getString(2) == "a")
  }

  test("local fast path matches the distributed rounds exactly") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val local = BpeTrainer.merges(docs, nMerges = 5).collect().map(_.toSeq)
    val dist = BpeTrainer.merges(docs, nMerges = 5, localVocabCap = 0)
      .collect().map(_.toSeq)
    assert(local.toSeq == dist.toSeq)
  }

  test("local fast path ties break by code point, not UTF-16 order") {
    // pairs (U+E000, x) and (U+1F600 emoji, x) tie at count 1; UTF-8 /
    // code-point order puts U+E000 first (0xE000 < 0x1F600), while
    // Java's natural String order would pick the emoji (its surrogate
    // units 0xD83D.. sort below 0xE000) — the round-7 ADVICE divergence
    val docs = Seq((1L, "\uE000x \uD83D\uDE00x")).toDF("doc_id", "text")
    val local = BpeTrainer.merges(docs, nMerges = 2).collect().map(_.toSeq)
    val dist = BpeTrainer.merges(docs, nMerges = 2, localVocabCap = 0)
      .collect().map(_.toSeq)
    assert(local.toSeq == dist.toSeq)
    assert(local.head(1) == "\uE000")
  }

  test("segmentCounts: learned merges segment; fertility drops with more merges") {
    val docs = Seq((1L, "low low lower"), (2L, "low wore")).toDF("doc_id", "text")
    val m0 = BpeTrainer.segmentCounts(docs,
      BpeTrainer.merges(docs, 1))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val m3 = BpeTrainer.segmentCounts(docs,
      BpeTrainer.merges(docs, 3))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // more merges never increase subword counts
    assert(m3(1L) <= m0(1L) && m3(2L) <= m0(2L))
    // doc1 after 3 merges (l,o)(lo,w)(e,r): low->1 sym, lower->low|er->2
    val full = BpeTrainer.segmentCounts(docs, BpeTrainer.merges(docs, 3))
      .filter(col("doc_id") === 1L).collect().head
    assert(full.getLong(1) == 3L) // 3 words
    assert(full.getLong(2) == 1L + 1L + 2L)
  }
}
