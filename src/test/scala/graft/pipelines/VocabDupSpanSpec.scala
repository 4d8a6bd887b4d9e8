package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** topTokens and dupSpanFraction on hand-built corpora with
  * closed-form expected answers. */
class VocabDupSpanSpec extends SparkSpec {
  import spark.implicits._

  test("topTokens: counts, deterministic tie-break, coverage sums") {
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "b a d d")).toDF("doc_id", "text")
    // occurrences: a=3 b=2 d=2 c=1, total=8; tie b/d breaks on token
    val got = CorpusPipeline.topTokens(docs, k = 3)
      .orderBy($"rank")
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1, "a", 3L, 3.0 / 8),
      (2, "b", 2L, 2.0 / 8),
      (3, "d", 2L, 2.0 / 8)))
  }

  test("dupSpanFraction: shared windows flagged, short docs score 0") {
    val shared = "w1 w2 w3 w4 w5" // one 5-gram, present in docs 1 and 2
    val docs = Seq(
      (1L, s"$shared u1 u2 u3 u4"), // 5 grams, 1 shared
      (2L, s"v1 v2 v3 v4 $shared"), // 5 grams, 1 shared
      (3L, "x1 x2 x3 x4 x5 x6"),    // 2 grams, 0 shared
      (4L, "too short")             // < 5 tokens -> 0/0
    ).toDF("doc_id", "text")
    val got = CorpusPipeline.dupSpanFraction(docs, n = 5)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 1L, 0.2),
      (2L, 5L, 1L, 0.2),
      (3L, 2L, 0L, 0.0),
      (4L, 0L, 0L, 0.0)))
  }

  test("rarityScores: odds-ratio rarity per occurrence, mean per doc") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // n_docs=2; df: a=2, b=1, c=1 → r(a)=0.5/2.5, r(b)=r(c)=1.5/1.5
    val ra = 0.5 / 2.5
    val got = CorpusPipeline.rarityScores(docs).orderBy($"doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, ((ra + ra) + 1.0) / 3.0), // sorted fold: a, a, then b
      (2L, 2L, (ra + 1.0) / 2.0)))
  }

  test("bpePairStats: histogram-weighted char-pair counts, deterministic " +
      "tie-break, single-char words excluded") {
    val docs = Seq(
      (1L, "ab ab cd x"), // 'x' is sub-pair-width: contributes nothing
      (2L, "abc")
    ).toDF("doc_id", "text")
    // words: ab×2, cd×1, abc×1 → pairs: ab = 2 + 1(from abc), bc = 1, cd = 1
    val got = CorpusPipeline.bpePairStats(docs, k = 10)
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "ab", 3L), (2, "bc", 1L), (3, "cd", 1L)))
  }

  test("removeDupSpans: exactly the cross-doc window tokens are cut, " +
      "survivors keep order, unique and short docs pass untouched") {
    val shared = "w1 w2 w3 w4 w5" // one 5-gram, present in docs 1 and 2
    val docs = Seq(
      (1L, s"$shared u1 u2 u3 u4"), // head span removed, tail kept
      (2L, s"v1 v2 v3 v4 $shared"), // tail span removed, head kept
      (3L, "x1 x2 x3 x4 x5 x6"),    // unique content: untouched
      (4L, "too short"),            // < n tokens: untouched
      (5L, "r r r r r r")           // within-doc repeat only: untouched
    ).toDF("doc_id", "text")
    val got = CorpusPipeline.removeDupSpans(docs, n = 5)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 9L, 5L, "u1 u2 u3 u4"),
      (2L, 9L, 5L, "v1 v2 v3 v4"),
      (3L, 6L, 0L, "x1 x2 x3 x4 x5 x6"),
      (4L, 2L, 0L, "too short"),
      (5L, 6L, 0L, "r r r r r r")))
    // a doc that is ALL duplicated spans empties cleanly (not null)
    val wipe = Seq((1L, shared), (2L, shared)).toDF("doc_id", "text")
    val w = CorpusPipeline.removeDupSpans(wipe, n = 5)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(w == Seq((1L, 5L, 5L, ""), (2L, 5L, 5L, "")))
  }
}
