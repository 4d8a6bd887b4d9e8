package graft.pipelines

import graft.SparkSpec
import graft.ops.Retrieval
import org.apache.spark.sql.functions._

/** Chunking, split assignment, cross-source overlap and BM25 retrieval
  * (q99–q102 kernels) on small inline corpora where the expected
  * output is computable by hand. */
class ChunkSplitRetrievalSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text", "source")
  }

  test("chunkTokens: stride windows cover all tokens, overlap is width-stride") {
    import spark.implicits._
    // 10 tokens, width 4, stride 3 -> starts 1,4,7,10; sizes 4,4,4,1
    val d = docs((1L, (1 to 10).map(i => s"t$i").mkString(" "), "a"))
    val got = CorpusPipeline.chunkTokens(d, width = 4, stride = 3)
      .orderBy($"start")
      .select($"start", $"n_chunk_toks").as[(Int, Int)].collect().toSeq
    assert(got == Seq((1, 4), (4, 4), (7, 4), (10, 1)))
  }

  test("chunkTokens: doc shorter than width emits exactly one full-doc chunk") {
    import spark.implicits._
    val d = docs((7L, "a b c", "a"))
    val got = CorpusPipeline.chunkTokens(d, width = 64, stride = 48)
      .select($"start", $"n_chunk_toks").as[(Int, Int)].collect().toSeq
    assert(got == Seq((1, 3)))
  }

  test("chunkTokens: identical windows hash identically across docs") {
    import spark.implicits._
    val d = docs((1L, "x y z", "a"), (2L, "x y z", "b"))
    val hs = CorpusPipeline.chunkTokens(d, width = 8, stride = 8)
      .select($"chunk_hash").as[Long].collect().toSet
    assert(hs.size == 1)
  }

  test("splitAssign: partitions every doc, respects cut monotonicity") {
    import spark.implicits._
    val d = docs((1L to 500L).map(i => (i, s"doc $i", "a")): _*)
    val bysplit = CorpusPipeline.splitAssign(d)
      .groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(bysplit.values.sum == 500)
    assert(bysplit.keySet.subsetOf(Set("train", "val", "test")))
    // 80/10/10 cuts on a uniform hash: train strictly dominates
    assert(bysplit("train") > bysplit.getOrElse("val", 0L))
    assert(bysplit("train") > bysplit.getOrElse("test", 0L))
    // deterministic: re-evaluation yields the same assignment
    val a1 = CorpusPipeline.splitAssign(d).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val a2 = CorpusPipeline.splitAssign(d).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a1 == a2)
  }

  test("splitAssignBy: every member of a group shares one split; " +
      "group draw differs from the row draw; determinism") {
    import spark.implicits._
    // 200 rows in 40 groups of 5
    val d = (1L to 200L).map(i => (i, i % 40)).toDF("doc_id", "grp")
    val got = CorpusPipeline.splitAssignBy(d, "grp", seed = 22)
      .select($"doc_id", $"grp", $"split")
      .as[(Long, Long, String)].collect()
    assert(got.length == 200)
    // co-location: a group never straddles splits — THE property the
    // leakage-safe split exists for
    got.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).distinct.length == 1,
        s"group ${rows.head._2} straddles splits: ${rows.map(_._3).toSet}")
    }
    // the group draw actually differs from a per-row draw
    val perRow = CorpusPipeline.splitAssign(
        d.select($"doc_id", lit("x").as("text")), seed = 22)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(got.exists { case (id, _, s) => perRow(id) != s })
    // deterministic under repartition
    val again = CorpusPipeline.splitAssignBy(d.repartition(7), "grp",
        seed = 22)
      .select($"doc_id", $"grp", $"split")
      .as[(Long, Long, String)].collect()
    assert(got.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("crossSourceOverlap: counts distinct shared fps and grams once per pair") {
    import spark.implicits._
    val span = "one two three four five six" // shares its 5-grams
    val d = docs(
      (1L, "same text", "a"), (2L, "same text", "b"),
      (3L, "same text", "b"), // duplicate within b: still ONE shared fp
      (4L, "other text", "a"), (5L, "other text", "c"),
      (6L, s"prefix $span", "a"), (7L, s"$span suffix", "c"),
      (8L, "only a", "a"))
    val got = CorpusPipeline.crossSourceOverlap(d)
      .as[(String, String, Long, Long)].collect().toSet
    // a<->b: one shared fingerprint, sub-5-token docs -> no grams;
    // a<->c: one shared fp ("other text") plus the two 5-gram windows
    // of `span` common to docs 6 and 7 ("one..five", "two..six")
    assert(got == Set(("a", "b", 1L, 0L), ("a", "c", 1L, 2L)))
  }

  test("weightedSample: caps per stratum at k, deterministic, priority = hash/w") {
    import spark.implicits._
    import graft.functions.{TextFunctions => T}
    val d = docs((1L to 100L).map(i =>
        (i, (1 to (i % 7 + 1).toInt).map(j => s"w$j").mkString(" "),
         if (i % 2 == 0) "even" else "odd")): _*)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val got = CorpusPipeline.weightedSample(d, k = 10,
      weight = col("n_tokens"), seed = 33, stratum = "source")
    val perStratum = got.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    assert(perStratum.values.forall(_ == 10))
    // priority recomputes exactly
    val bad = got.withColumn("expect",
        T.hash60($"doc_id".cast("string"), 33).cast("double") /
          $"n_tokens".cast("double"))
      .filter($"priority" =!= $"expect").count()
    assert(bad == 0)
    // stable across evaluations
    val ids1 = got.select("doc_id").as[Long].collect().toSet
    val ids2 = CorpusPipeline.weightedSample(d, k = 10,
      weight = col("n_tokens"), seed = 33, stratum = "source")
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
  }

  test("bm25TopK: query doc ranks itself first; scores positive and sorted") {
    import spark.implicits._
    val d = docs(
      (42L, "rare unique tokens here", "a"),
      (2L, "rare tokens appear here too", "a"),
      (3L, "completely different content words", "a"),
      (4L, "rare", "a"))
    val got = Retrieval.bm25TopK(d, queryDocId = 42L, k = 10)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toSeq
    assert(got.head._1 == 42L)
    assert(got.map(_._2).forall(_ > 0.0))
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
    // doc 3 shares no term -> absent
    assert(!got.map(_._1).contains(3L))
  }
}
