package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("duplicateClusters: min-label propagation resolves components") {
    // components: {1,2,3,4} (chain), {5,6} (pair), {7} (singleton), {8,9,10} (star on 9)
    val ids = (1L to 10L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (9L, 8L), (9L, 10L))
      .toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(ids, "doc_id", pairs)
      .orderBy("doc_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 8L, 10L -> 8L))
  }

  test("duplicateClusters: 50-deep path graph converges exactly (pointer jumping)") {
    // one path 0-1-2-...-50 (diameter 50) plus a disjoint 200-node
    // path descending from 300 — deep chains in BOTH id directions,
    // the shape that silently mislabeled under a fixed 10-round cap
    val ids = ((0L to 50L) ++ (101L to 300L)).toDF("doc_id")
    val pairs = ((0L until 50L).map(i => (i, i + 1)) ++
      (101L until 300L).map(i => (i, i + 1))).toDF("id_a", "id_b")
    // localEdgeCap = 0 forces the distributed loop — this test pins
    // pointer-jumping itself, not the small-graph union-find path
    val got = Dedup.duplicateClusters(ids, "doc_id", pairs, localEdgeCap = 0)
      .as[(Long, Long)].collect().toMap
    assert((0L to 50L).forall(got(_) == 0L), "50-path must collapse to 0")
    assert((101L to 300L).forall(got(_) == 101L), "200-path must collapse to 101")
  }

  test("duplicateClusters: pointer jumping converges a deep chain in " +
      "logarithmic rounds") {
    // micro-batch CC is round-LATENCY-bound: each round costs a
    // checkpointed materialization, not data. Propagate + shortcut
    // contracts label-chain depth ~2-3x per round, so a 200-deep path
    // must converge in ~log2(200)+slack rounds — this pins the round
    // economics the q82 762s->4s fix depends on (a regression to O(d)
    // rounds fails here loudly, long before it shows in a bench).
    val ids = (0L to 200L).toDF("doc_id")
    val pairs = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(ids, "doc_id", pairs, localEdgeCap = 0)
      .as[(Long, Long)].collect().toMap
    assert((0L to 200L).forall(got(_) == 0L), "200-path must collapse to 0")
    assert(Dedup.lastClusterRounds >= 1,
      "localEdgeCap=0 must route through the distributed loop")
    assert(Dedup.lastClusterRounds <= 10,
      s"expected <=10 pointer-jump rounds, got ${Dedup.lastClusterRounds}")
  }

  test("small-graph union-find path matches the distributed fixpoint") {
    // same graph through both paths — deep chains both id directions,
    // a star, a singleton; string ids exercise the Comparable ordering
    val ids = ((0L to 50L) ++ (101L to 300L) :+ 400L).toDF("doc_id")
    val pairs = ((0L until 50L).map(i => (i, i + 1)) ++
      (101L until 300L).map(i => (i, i + 1)) ++
      Seq((400L, 300L))).toDF("id_a", "id_b")
    val local = Dedup.duplicateClusters(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(Dedup.lastClusterRounds == 0,
      "graph under the cap must take the union-find path")
    val dist = Dedup.duplicateClusters(ids, "doc_id", pairs, localEdgeCap = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
    // string ids through the local path
    val sids = Seq("d", "b", "a", "c", "z").toDF("doc_id")
    val spairs = Seq(("d", "b"), ("b", "c")).toDF("id_a", "id_b")
    val sgot = Dedup.duplicateClusters(sids, "doc_id", spairs)
      .as[(String, String)].collect().toMap
    assert(sgot == Map("a" -> "a", "b" -> "b", "c" -> "b", "d" -> "b",
      "z" -> "z"))
    // supplementary-plane string ids: the min-id root must follow CODE
    // POINT order (U+E000 < U+1F600), matching Spark's min() in the
    // distributed fixpoint — Java's UTF-16 unit order would pick the
    // emoji (surrogates 0xD83D.. sort below 0xE000)
    val uids = Seq("\uD83D\uDE00", "\uE000").toDF("doc_id")
    val upairs = Seq(("\uD83D\uDE00", "\uE000")).toDF("id_a", "id_b")
    val ulocal = Dedup.duplicateClusters(uids, "doc_id", upairs)
      .as[(String, String)].collect().toMap
    val udist = Dedup.duplicateClusters(uids, "doc_id", upairs,
      localEdgeCap = 0).as[(String, String)].collect().toMap
    assert(ulocal == udist)
    assert(ulocal.values.toSet == Set("\uE000"))
  }

  test("dedupDecision keeps exactly one doc per cluster") {
    val ids = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val d = Dedup.dedupDecision(ids, "doc_id", pairs).cache()
    assert(d.filter(col("keep")).select("doc_id").as[Long].collect().toSet ==
      Set(1L, 4L, 6L))
    // every cluster has exactly one keeper
    val perCluster = d.groupBy("cluster")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"))
    assert(perCluster.filter(col("n_keep") =!= 1).count() == 0)
  }

  test("dedupDecisionIngest: incremental state equals full recompute; " +
      "a bridge doc merges two old families; replay is idempotent") {
    // three families that batch 0 sees as separate singletons/pairs,
    // plus a batch-1 BRIDGE doc near both families A and B — the case
    // where an increment must RELABEL old docs
    val textA = "alpha beta gamma delta epsilon zeta eta theta"
    val textB = "one two three four five six seven eight"
    val b0 = Seq(
      (1L, textA), (3L, textA),           // family A
      (5L, textB), (7L, textB),           // family B
      (9L, "lonely unique content nine")) // singleton
      .toDF("doc_id", "text")
    // doc 2 is a verbatim copy of A's text AND doc 4 bridges nothing;
    // doc 6 is a copy of B's text — and doc 8 duplicates BOTH ways is
    // impossible verbatim, so bridge via two docs landing in each
    val b1 = Seq(
      (2L, textA),                        // joins family A
      (6L, textB),                        // joins family B
      (8L, "totally new content eight")).toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_cc_ingest_").toString
    val all = b0.unionByName(b1)
    Dedup.dedupDecisionIngest(spark, b0, s"$root/bands",
      s"$root/decisions", "b0")
    val inc = Dedup.dedupDecisionIngest(spark, b1, s"$root/bands",
        s"$root/decisions", "b1")
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    // ground truth: full recompute over all docs with the same
    // signature parameters
    val sig = Dedup.minhashSignatures(all, "doc_id", "text", n = 3, k = 16)
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", k = 16, rows = 4)
    val full = Dedup.dedupDecision(all.select(col("doc_id")), "doc_id",
        pairs)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(inc == full,
      s"incremental state diverged from full recompute:\n$inc\nvs\n$full")
    // the batch-1 copy docs joined their families (old min labels)
    val m = inc.map(r => r._1 -> r._2).toMap
    assert(m(2L) == m(1L) && m(1L) == m(3L), s"family A split: $m")
    assert(m(6L) == m(5L) && m(5L) == m(7L), s"family B split: $m")
    assert(m(8L) == 8L && m(9L) == 9L)
    // replay of batch 1 (same batchId, same docs): identical state,
    // no duplicate band rows, no state corruption
    val replay = Dedup.dedupDecisionIngest(spark, b1, s"$root/bands",
        s"$root/decisions", "b1")
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(replay == inc, "replay must be idempotent")
    val bandRows = spark.read.parquet(s"$root/bands/b1").count()
    Dedup.dedupDecisionIngest(spark, b1, s"$root/bands",
      s"$root/decisions", "b1")
    assert(spark.read.parquet(s"$root/bands/b1").count() == bandRows,
      "replay must not grow the band table")
    // auto-epoch is monotone ACROSS lineages: a batch from a fresh
    // checkpoint lineage (new namespace, micro-batch counter back at
    // 0) must land with an epoch ABOVE everything already persisted,
    // so its assignments win the latest-epoch read instead of being
    // outranked by stale deltas
    val epochsBefore = spark.read.parquet(s"$root/decisions/*")
      .agg(max(col("epoch"))).as[Int].head()
    val b2 = Seq((10L, textA)).toDF("doc_id", "text") // joins family A
    val after = Dedup.dedupDecisionIngest(spark, b2, s"$root/bands",
        s"$root/decisions", "lineage2-b0")
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    val epochsAfter = spark.read.parquet(s"$root/decisions/lineage2-b0")
      .agg(max(col("epoch"))).as[Int].head()
    assert(epochsAfter > epochsBefore,
      s"fresh-lineage epoch $epochsAfter must exceed prior $epochsBefore")
    val m2 = after.map(r => r._1 -> r._2).toMap
    assert(m2(10L) == m2(1L), s"fresh-lineage doc must join family A: $m2")
  }

  test("end-to-end: jaccard pairs -> clusters on real documents") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJ = 0.2)
    val decision = Dedup.dedupDecision(docs.select("doc_id"), "doc_id", pairs)
    val kept = decision.filter(col("keep")).count()
    val total = docs.count()
    val dupPairs = pairs.count()
    // the corpus plants near-dup pairs; keepers < total, and every
    // non-keeper is in some cluster with a smaller keeper
    assert(dupPairs > 0)
    assert(kept < total)
    assert(kept >= total - dupPairs)
  }
}
