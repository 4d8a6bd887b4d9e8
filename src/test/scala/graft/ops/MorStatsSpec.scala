package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Committed skipping stats SURVIVE merge-on-read DML and the
  * maintenance commits (round-13 headline: the MoR paths used to drop
  * `_stats`/`_bloom` until the next optimizeZOrder, leaving the
  * flagship streaming-sink shape unprunable between optimizes).
  * Every appended fragment gets a fresh read-back stats row; carried
  * files keep theirs — stats(v) covers EXACTLY the version's file
  * list at every step, so pruning can never be silently wrong. */
class MorStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = java.nio.file.Files
    .createTempDirectory("graft_morstats_").toString + "/tbl"

  /** stats(v) paths must equal versionFileRefs(v) exactly — a stats
    * row for a dropped file would prune wrongly, a file without a
    * stats row would be silently invisible to the planner. */
  private def statsCoverExactly(root: String, v: Long): Unit = {
    val statPaths = ZTable.stats(spark, root, v)
      .select("path").as[String].collect().toSet
    val refs = ManifestTable.versionFileRefs(spark, root, v)
      .getOrElse(fail(s"v$v is not a file-list version"))
      .toSet
    assert(statPaths == refs,
      s"v$v stats cover $statPaths but the file list is $refs")
  }

  /** y = 0 keeps the z-value monotone in x (the ZTableSpec trick):
    * base files are exact x-slices, so pruning assertions are
    * deterministic. */
  private def seed(root: String): Unit = {
    ManifestTable.commit(
      spark.range(0, 800).select($"id".as("k"), $"id".as("x"),
        lit(0L).as("y"), concat(lit("v"), $"id").as("v")),
      root)                                                        // v1
    ZTable.optimizeZOrder(spark, root, "x", "y", "k",
      nFiles = 8, bloomCol = Some("v")): Unit                      // v2
  }

  test("stats + Bloom survive mergeBatchDV fragments and " +
      "updateWhereDV; pruned scan stays exact with NO re-optimize") {
    val root = freshRoot()
    seed(root)
    // two streaming MoR merges: updates on low keys + inserts past
    // the key space; each appends a fragment that must get stats rows
    ManifestTable.mergeBatchDV(spark, root,
      spark.range(0, 20).select($"id".as("k"), $"id".as("x"),
        lit(99L).as("y"), lit("upd1").as("v")),
      Seq("k"), batchKey = "ms-b0")                                // v3
    ManifestTable.mergeBatchDV(spark, root,
      spark.range(800, 840).select($"id".as("k"), $"id".as("x"),
        lit(7L).as("y"), concat(lit("w"), $"id").as("v")),
      Seq("k"), batchKey = "ms-b1")                                // v4
    ManifestTable.updateWhereDV(spark, root, $"k" === 500L,
      Map("v" -> lit("patched")))                                  // v5
    statsCoverExactly(root, 3L)
    statsCoverExactly(root, 4L)
    statsCoverExactly(root, 5L)
    // pruning still works off the COMMITTED stats — and is exact:
    // a range far from the fragments opens a strict subset of files
    val total = ManifestTable.versionFileRefs(spark, root, 5L).get.size
    val scan = ZTable.scanXRange(spark, root, 300L, 360L)
    assert(scan.inputFiles.length < total,
      s"pruned ${scan.inputFiles.length} of $total: no pruning")
    assert(scan.select("k").as[Long].collect().sorted.toSeq ==
      (300L to 360L))
    // a range covering the INSERTED fragment finds the new rows (the
    // fragment's fresh stats row makes it visible to the planner)
    assert(ZTable.scanXRange(spark, root, 800L, 839L)
      .select("k").as[Long].collect().sorted.toSeq == (800L to 839L))
    // updated rows read post-image through the pruned scan (DV applied)
    assert(ZTable.scanXRange(spark, root, 500L, 500L)
      .select("v").as[String].collect().toSeq == Seq("patched"))
    assert(ZTable.scanXRange(spark, root, 10L, 10L)
      .select("v").as[String].head() == "upd1")
    // Bloom registers extended too: a key in an appended fragment is
    // findable, superset property holds
    val cand = ZTable.bloomCandidateFiles(spark, root, lit("w820"))
    assert(cand.nonEmpty && cand.size < total)
    assert(ZTable.readBloomCandidates(spark, root, lit("w820"))
      .filter($"v" === "w820").count() == 1L)
  }

  test("stats survive optimizeBinPack and reorg; coverage stays exact") {
    val root = freshRoot()
    seed(root)
    (0 until 3).foreach { i =>
      ManifestTable.mergeBatchDV(spark, root,
        spark.range(800 + i * 10L, 810 + i * 10L)
          .select($"id".as("k"), $"id".as("x"), lit(0L).as("y"),
            concat(lit("w"), $"id").as("v")),
        Seq("k"), batchKey = s"bp-b$i")                            // v3..v5
    }
    // every ~100-row x-slice contains a deleted key, so the carried
    // large file is guaranteed surviving vector rows (reorg has work)
    ManifestTable.deleteWhereDV(spark, root, $"k" % 50L === 7L)    // v6
    // binPack folds the three small fragments; stats must survive
    val before = ManifestTable.versionFileRefs(spark, root, 6L).get
    val fsq = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val maxLen = before.map(r => fsq.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$root/$r")).getLen).max
    val v7 = ManifestTable.optimizeBinPack(spark, root,
      minFileBytes = maxLen)
    assert(v7 == 7L)
    statsCoverExactly(root, 7L)
    assert(ManifestTable.versionFileRefs(spark, root, 7L).get.size
      < before.size)
    // reorg purges the vector; stats must survive that too
    val v8 = ManifestTable.reorg(spark, root)
    assert(v8 == 8L)
    statsCoverExactly(root, 8L)
    // the pruned scan agrees with the unpruned read at every step
    val want = ManifestTable.read(spark, root).get
      .filter($"x".between(100L, 220L))
      .select("k").as[Long].collect().sorted.toSeq
    assert(ZTable.scanXRange(spark, root, 100L, 220L)
      .select("k").as[Long].collect().sorted.toSeq == want)
    // content: 830 seeded+inserted minus the deleted keys
    assert(ManifestTable.read(spark, root).get.count() ==
      830L - (0L until 830L).count(_ % 50L == 7L))
  }

  test("deleteWhereDV keeps frames verbatim; a fragment-less update " +
      "carries them; stats(v) still loud when never established") {
    val root = freshRoot()
    seed(root)
    ManifestTable.deleteWhereDV(spark, root, $"k" < 10L)           // v3
    statsCoverExactly(root, 3L)
    // matched-nothing update: zero appended rows — frames carried
    ManifestTable.updateWhereDV(spark, root, $"k" === -1L,
      Map("v" -> lit("never")))                                    // v4
    statsCoverExactly(root, 4L)
    assert(ZTable.scanXRange(spark, root, 0L, 20L)
      .select("k").as[Long].collect().sorted.toSeq == (10L to 20L))
    // a table that never z-ordered still fails loudly on stats()
    val plain = freshRoot()
    ManifestTable.commit(Seq((1L, 1L)).toDF("k", "x"), plain)
    ManifestTable.mergeDV(spark, plain,
      Seq((2L, 2L)).toDF("k", "x"), Seq("k"))
    intercept[IllegalArgumentException] {
      ZTable.stats(spark, plain, 2L)
    }
  }
}
