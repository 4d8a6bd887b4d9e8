package graft.pipelines

import graft.SparkSpec
import graft.ops.EmbeddingStats
import org.apache.spark.sql.functions._

/** Round-6 batch E: Bloom decontamination, class centroid export. */
class BloomCentroidSpec extends SparkSpec {
  import spark.implicits._

  test("bloomDecontaminate: exact overlaps always flagged (no false negatives)") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta unrelated tail"), // shares 4-gram
      (2L, "one two three four five six"),           // disjoint
      (3L, "x beta gamma delta epsilon y")           // shares 4-gram
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.bloomDecontaminate(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(1L) && out.contains(3L),
      s"exact hits must be flagged: $out")
    // m=65536, a handful of grams: the disjoint doc cannot collide on
    // all 3 hash positions of any gram (deterministic here)
    assert(!out.contains(2L), s"unexpected false positive: $out")
    assert(out(1L) >= 1L && out(3L) >= 1L)
  }

  test("bloomDecontaminate: superset of exact decontamination kills") {
    val docs = (1L to 30L).map(i =>
      (i, s"filler a$i b$i c$i d$i e$i f$i g$i h$i")).toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" <= 5)
    val corpus = docs.filter($"doc_id" > 5)
      .union(Seq((99L, "filler a3 b3 c3 d3 e3 f3 g3 h3")).toDF("doc_id", "text"))
    val exactSurvivors = CorpusPipeline.decontaminate(corpus, bench, n = 4)
      .select("doc_id").as[Long].collect().toSet
    val exactKilled = corpus.select("doc_id").as[Long].collect().toSet
      .diff(exactSurvivors)
    val bloomFlagged = CorpusPipeline.bloomDecontaminate(corpus, bench)
      .select("doc_id").as[Long].collect().toSet
    assert(exactKilled.subsetOf(bloomFlagged),
      s"bloom must flag every exact kill: $exactKilled vs $bloomFlagged")
  }

  test("classCentroids: exact means per label and dimension") {
    val emb = Seq(
      (1L, Array.fill(4)(0.2f), 1),
      (2L, Array.fill(4)(0.4f), 1),
      (3L, Array.fill(4)(1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = EmbeddingStats.classCentroids(emb)
      .collect().map(r =>
        (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out.size == 8) // 2 labels x 4 dims
    // label 1: (200 + 400) / 2 / 1000 = 0.3 exactly
    (1 to 4).foreach { d =>
      assert(out((1, d)) == ((2L, 0.3)))
      assert(out((2, d)) == ((1L, 1.0)))
    }
  }
}
