package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 curation operators: block dedup, Gopher rules, temperature
  * mixture, boilerplate prefixes, OOV rate, collocation lift. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("dedupBlocks: corpus-wide first occurrence survives, doc rebuilt") {
    // 4-token blocks; doc 1 and doc 2 share an identical first block,
    // doc 2 also repeats its own block internally
    val d = docs(
      1L -> "a b c d e f g h",
      2L -> "a b c d x y z w a b c d",
      3L -> "p q r s")
    val out = CorpusPipeline.dedupBlocks(d, blockTokens = 4)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(byId(1L) == ((2L, 0L, "a b c d e f g h")))
    // doc 2: block 0 ("a b c d") lost to doc 1; block 2 (same content)
    // also lost; only "x y z w" survives
    assert(byId(2L) == ((3L, 2L, "x y z w")))
    assert(byId(3L) == ((1L, 0L, "p q r s")))
  }

  test("dedupBlocks: within-doc duplicate keeps the earliest block") {
    val d = docs(7L -> "k l m n k l m n")
    val Array(r) = CorpusPipeline.dedupBlocks(d, blockTokens = 4).collect()
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(r.getString(3) == "k l m n")
  }

  test("gopherRules: each rule trips independently; pass is the conjunction") {
    val d = docs(
      1L -> "the cat and the dog sat on the mat with a hat on it too", // all pass
      2L -> "a b",                                   // too few tokens
      3L -> ("the " + "supercalifragilistic " * 12 + "and of to in is"), // avg len
      4L -> ("the and " + "x1 2 3 4 5 6 7 8 9 10 11 12".replace("x", "")))
    val out = CorpusPipeline.gopherRules(d).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Boolean]("pass"))
    assert(!byId(2L).getAs[Boolean]("r_token_count") &&
      !byId(2L).getAs[Boolean]("pass"))
    assert(!byId(3L).getAs[Boolean]("r_avg_len"))
    // doc 4: mostly digits -> alpha fraction below 0.7
    assert(!byId(4L).getAs[Boolean]("r_alpha"))
  }

  test("temperatureShares: shares sum to 1 and flatten toward small sources") {
    val d = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val out = CorpusPipeline.temperatureShares(d).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val (pBig, wBig) = out("big")
    val (pSmall, wSmall) = out("small")
    assert(math.abs(wBig + wSmall - 1.0) < 1e-12)
    // sqrt flattening: small source's share rises above its raw p,
    // big source's falls below
    assert(wSmall > pSmall && wBig < pBig)
    assert(math.abs(wSmall - math.sqrt(0.1) /
      (math.sqrt(0.1) + math.sqrt(0.9))) < 1e-12)
  }

  test("boilerplatePrefix: df threshold flags template docs per source") {
    val d = Seq(
      (1L, "s1", "terms of service apply to all content here x"),
      (2L, "s1", "terms of service apply to all content here y"),
      (3L, "s1", "terms of service apply to all content here z"),
      (4L, "s1", "completely original text body"),
      // same prefix in ANOTHER source: only 1 occurrence there
      (5L, "s2", "terms of service apply to all content here q"))
      .toDF("doc_id", "source", "text")
    val out = CorpusPipeline.boilerplatePrefix(d, prefixTokens = 8, minDf = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("is_boilerplate"))
      .toMap
    assert(out(1L) && out(2L) && out(3L))
    assert(!out(4L) && !out(5L))
  }

  test("oovRate: tokens outside the top-k head count as OOV") {
    val d = docs(
      1L -> "a a a b b c",   // a,b dominate
      2L -> "a b rare")
    val out = CorpusPipeline.oovRate(d, vocabSize = 2)
      .orderBy("doc_id").collect()
    // vocab = {a, b}; doc 1: c is OOV (1/6); doc 2: rare is OOV (1/3)
    assert(out(0).getLong(2) == 1L &&
      math.abs(out(0).getDouble(3) - 1.0 / 6.0) < 1e-12)
    assert(out(1).getLong(2) == 1L &&
      math.abs(out(1).getDouble(3) - 1.0 / 3.0) < 1e-12)
  }

  test("contentDefinedChunks: chunks tile the doc; boundaries survive a " +
      "front insertion (the CDC property)") {
    val words = (1 to 200).map(i => s"w${i % 37}").mkString(" ")
    val base = docs(1L -> words)
    val chunks = CorpusPipeline.contentDefinedChunks(base)
      .orderBy("chunk_idx").collect()
    assert(chunks.map(_.getLong(2)).sum == 200L, "chunks must tile the doc")
    assert(chunks.length > 3, "200 tokens at 16-token expectation must split")
    // prepend one token: every content window from token 2 on is
    // unchanged, so every boundary shifts by one and every chunk except
    // the FIRST keeps its hash — the re-alignment fixed-stride
    // chunking (q99) cannot do
    val shifted = CorpusPipeline.contentDefinedChunks(docs(2L -> s"zzz $words"))
      .orderBy("chunk_idx").collect()
    assert(shifted.length == chunks.length)
    assert(shifted.map(_.getLong(3)).drop(1).sameElements(
      chunks.map(_.getLong(3)).drop(1)),
      "all chunks after the first must re-align after an insertion")
    assert(shifted.head.getLong(3) != chunks.head.getLong(3))
  }

  test("lengthQuantiles: nearest-rank cutoffs on a known distribution") {
    val d = (1 to 10).map(n => (n.toLong, ("x " * n).trim)).toDF("doc_id", "text")
    val out = CorpusPipeline.lengthQuantiles(d, ps = Seq(0.5, 1.0))
      .orderBy("p").collect()
    assert(out(0).getLong(1) == 5L, "p50 of lengths 1..10 is 5 (rank 5)")
    assert(out(1).getLong(1) == 10L, "p100 is the max")
  }

  test("sourceDivergence: 0 for identical distributions, (N-n_s)/N for " +
      "disjoint vocabularies") {
    val same = Seq((1L, "s1", "a b c"), (2L, "s2", "a b c"))
      .toDF("doc_id", "source", "text")
    val tvSame = CorpusPipeline.sourceDivergence(same).collect()
      .map(_.getDouble(2))
    assert(tvSame.forall(_ == 0.0), "identical distributions must score 0")
    val disjoint = Seq((1L, "s1", "a a b"), (2L, "s2", "x y z"))
      .toDF("doc_id", "source", "text")
    val tvDis = CorpusPipeline.sourceDivergence(disjoint).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // disjoint closed form: (N - n_s) / N = 3/6
    assert(tvDis("s1") == 0.5 && tvDis("s2") == 0.5)
  }

  test("collocationLift: fixed pair dominates and lift exceeds 1") {
    val d = docs(
      1L -> "new york new york new york",
      2L -> "new york and old boston",
      3L -> "boston old and york new")
    val out = CorpusPipeline.collocationLift(d, k = 3)
      .orderBy(col("n_ab").desc, col("tok_a"), col("tok_b")).collect()
    val top = out.head
    assert(top.getString(0) == "new" && top.getString(1) == "york")
    assert(top.getLong(2) == 4L)
    assert(top.getDouble(3) > 1.0, "collocated pair must have lift > 1")
  }
}
