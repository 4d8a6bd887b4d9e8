package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.pipelines.CorpusPipeline

/** Round-3 regression: the official bench timed out because
  * `localCheckpoint` blocks (CC frontiers, ingest intermediates)
  * accumulated across iters×queries in the one JVM — CacheTracker's
  * sweep could not release them. This spec reproduces the bench
  * cadence (the q69/q75/q77/q82 family run repeatedly with
  * `CacheTracker.releaseAll()` at each query boundary, exactly like
  * Bench's measured loop) and asserts the block-manager's persistent
  * RDD count returns to its pre-run level every round — i.e. nothing
  * pins storage past a query boundary. */
class CheckpointLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def persistentRddCount: Int = {
    // unpersist is async (blocking = false): poll until the count is
    // stable (session-lifetime caches like the EDW star may keep it
    // legitimately non-zero, so "stable" not "zero" is the target)
    val sc = spark.sparkContext
    val deadline = System.nanoTime() + 5_000_000_000L
    var n = sc.getPersistentRDDs.size
    var stable = 0
    while (stable < 4 && System.nanoTime() < deadline) {
      Thread.sleep(50)
      val m = sc.getPersistentRDDs.size
      if (m == n) stable += 1 else { stable = 0; n = m }
    }
    n
  }

  test("bench cadence releases every checkpoint: RDD count returns to baseline") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    CacheTracker.releaseAll()
    val baseline = persistentRddCount

    (1 to 3).foreach { round =>
      // q77 shape: LSH pairs -> CC clusters
      val sig = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, k = 8)
      val pairs = Dedup.lshCandidatePairs(sig, "doc_id", k = 8, rows = 4)
        .localCheckpoint()
      val ids = pairs.select(col("id_a").as("doc_id"))
        .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
      val decided = Dedup.dedupDecision(ids, "doc_id", pairs)
      CacheTracker.releaseCheckpoint(pairs)
      assert(decided.count() > 0)

      // q75/q82 shape: incremental exact + near-dup ingestion, 2 batches
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_ckpt_life_$round").toString
      val even = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val odd = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      assert(CorpusPipeline.ingestNew(spark, even, s"$dir/seen", "b0").count() > 0)
      assert(CorpusPipeline.ingestNew(spark, odd, s"$dir/seen", "b1").count() > 0)
      assert(CorpusPipeline
        .ingestNewNearDup(spark, even, s"$dir/buckets", "b0").count() > 0)
      assert(CorpusPipeline
        .ingestNewNearDup(spark, odd, s"$dir/buckets", "b1").count() > 0)

      // q69 shape: the full corpus pipeline (near-dup stage does CC)
      assert(CorpusPipeline.dedupNear(
        CorpusPipeline.dedupExact(docs)).count() > 0)

      // the bench's query boundary
      CacheTracker.releaseAll()
      val after = persistentRddCount
      assert(after <= baseline,
        s"round $round leaked persistent RDDs: baseline=$baseline after=$after")
    }
  }

  test("duplicateClusters frees superseded frontiers while iterating") {
    CacheTracker.releaseAll()
    val baseline = persistentRddCount
    // deep path graph: many CC rounds, so a leaked per-round frontier
    // would show up as >> 1 extra persistent RDD even mid-lifecycle
    val ids = (0L to 200L).toDF("doc_id")
    val pairs = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.duplicateClusters(ids, "doc_id", pairs)
    assert(labels.filter(col("cluster") === 0L).count() == 201L)
    // before the sweep: at most the final frontier (+ nothing per-round)
    val live = spark.sparkContext.getPersistentRDDs.size
    assert(live <= baseline + 2,
      s"per-round frontiers leaked: baseline=$baseline live=$live")
    CacheTracker.releaseAll()
    assert(persistentRddCount <= baseline)
  }
}
