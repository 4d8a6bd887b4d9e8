package graft.ops

import graft.SparkSpec
import graft.pipelines.CorpusPipeline
import org.apache.spark.sql.functions._

/** Round-6 batch B: z-order layout, train/test leakage, label outliers. */
class LayoutLeakOutlierSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: interleaves bits (x even positions, y odd)") {
    val out = Seq((3L, 1L), (0L, 0L), (5L, 2L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x=3 (bits 0,1 -> z bits 0,2 = 5), y=1 (bit 0 -> z bit 1 = 2) => 7
    // x=5 (bits 0,2 -> z bits 0,4 = 17), y=2 (bit 1 -> z bit 3 = 8) => 25
    assert(out == Seq(7L, 0L, 25L))
  }

  test("zOrderFiles: files partition the rows; both dims get bounded ranges") {
    // 32x32 grid: z-order files of 64 rows should cover ~8x8 tiles,
    // so each dim's per-file range is far below the full 0..31 span
    val grid = (for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong, (x * 32 + y).toLong))
      .toDF("x", "y", "k")
    val files = Layout.zOrderFiles(grid, col("x"), col("y"), col("k"),
        rowsPerFile = 64L, bits = 5)
      .orderBy("file_id").collect()
    assert(files.length == 16)
    assert(files.map(_.getLong(1)).sum == 1024L)
    // z-order locality: every 64-row file spans exactly an 8x8 tile
    files.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) == 7L, "x range must be 8 wide")
      assert(r.getLong(5) - r.getLong(4) == 7L, "y range must be 8 wide")
    }
  }

  test("writeZOrdered + skipScan: the pruned scan OPENS only the " +
      "intersecting files (numFiles metric), result equals full filter") {
    val grid = (for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong, (x * 32 + y).toLong))
      .toDF("x", "y", "k")
    val path = java.nio.file.Files
      .createTempDirectory("graft_zskip_").toString + "/grid_z"
    val stats = Layout.writeZOrdered(grid, col("x"), col("y"), col("k"),
      rowsPerFile = 64L, bits = 5, path = path)
    val st = stats.select("file_id", "min_x", "max_x").collect()
    assert(st.length == 16)
    // predicate x in [0,7]: the 8x8 tiles put exactly 4 of the 16
    // files in that x-slab — 12 files are provably skippable
    val ids = st.filter(r => !(r.getLong(2) < 0L || r.getLong(1) > 7L))
      .map(_.getLong(0)).toSeq
    assert(ids.length == 4, s"expected 4 intersecting files, got $ids")
    val pruned = Layout.skipScan(spark, path, ids)
      .filter(col("x").between(0L, 7L))
    // plan-level proof: the pruned scan's FileSourceScan plans exactly
    // the 4 intersecting parquet files into its input FilePartitions —
    // partition pruning on file_id skipped the other 12 before any row
    // was read. (Counted from inputRDDs' FilePartitions: the scan's
    // SQLMetrics live on AQE's executed clone, not this handle.)
    val prunedRows = pruned.select("k").as[Long].collect()
    assert(prunedRows.length == 8 * 32)
    def filesPlanned(df: org.apache.spark.sql.DataFrame): Int = {
      val p = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      p.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.inputRDDs().head.partitions.map(_.asInstanceOf[
            org.apache.spark.sql.execution.datasources.FilePartition]
            .files.length).sum
      }.get
    }
    assert(filesPlanned(pruned) == 4,
      "the pruned scan must open exactly the 4 intersecting files")
    assert(filesPlanned(spark.read.parquet(path)) == 16)
    // correctness: identical to the unpruned filter over all files
    val full = spark.read.parquet(path).filter(col("x").between(0L, 7L))
    assert(prunedRows.sorted.toSeq ==
      full.select("k").as[Long].collect().sorted.toSeq)
  }

  test("trainTestLeak: a near-dup pair crossing the split boundary is flagged") {
    val base = (1L to 60L).map(i => (i, s"unique tokens only here d$i " +
      s"x$i y$i z$i w$i v$i u$i t$i s$i r$i"))
    val ids = base.toDF("doc_id", "text")
    val splits = CorpusPipeline.splitAssign(ids).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val trainId = splits.collectFirst { case (i, "train") => i }.get
    val testId = splits.collectFirst { case (i, s) if s != "train" => i }.get
    // identical texts: Jaccard 1, every LSH band matches -> guaranteed
    // candidate regardless of the hash family's recall on this input
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = base.map { case (i, t) =>
      if (i == trainId || i == testId) (i, shared) else (i, t)
    }.toDF("doc_id", "text")
    val out = CorpusPipeline.trainTestLeak(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("leak_id") == testId)
    assert(r.getAs[Long]("train_id") == trainId)
    assert(r.getAs[String]("split") == splits(testId))
    assert(r.getAs[Double]("jaccard") >= 0.5)
  }

  test("trainTestLeak: same-split near-dups are NOT leakage") {
    val ids = (1L to 60L).map(i => (i, s"filler a$i b$i c$i d$i e$i f$i g$i"))
    val splits = CorpusPipeline.splitAssign(ids.toDF("doc_id", "text"))
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val Seq(t1, t2) = splits.collect { case (i, "train") => i }.toSeq.sorted
      .take(2)
    val shared = "one two three four five six seven eight nine ten"
    val docs = ids.map { case (i, t) =>
      if (i == t1 || i == t2) (i, shared) else (i, t) }.toDF("doc_id", "text")
    assert(CorpusPipeline.trainTestLeak(docs).count() == 0L)
  }

  test("labelOutliers: the planted far point tops the ratio ranking") {
    val tight = (1L to 9L).map(i =>
      (i, Array.fill(64)(0.5f), 1))
    val far = Seq((10L, Array.fill(64)(-0.9f), 1))
    val other = (11L to 15L).map(i => (i, Array.fill(64)(0.1f), 2))
    val emb = (tight ++ far ++ other).toDF("vec_id", "embedding", "label")
    val out = EmbeddingStats.labelOutliers(emb, topK = 3).collect()
    assert(out.head.getLong(0) == 10L)
    assert(out.head.getAs[Double]("outlier_ratio") > 1.0)
  }

  test("covarianceMatrix: hand-checked 2-vector case; symmetric pairs " +
      "carried once; diagonal = variance") {
    // two 4-dim vectors (quantized: x1000): v1 = (1000, 0, 0, 0),
    // v2 = (0, 1000, 0, 0); per-dim mean 500 for dims 1, 2
    // cov(1,1) = E[x²]−E[x]² = 500000−250000 → /1e6 = 0.25
    // cov(1,2) = E[xy]−E[x]E[y] = 0 − 0.25·1e6 → −0.25
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = EmbeddingStats.covarianceMatrix(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(got.size == 4 * 5 / 2) // upper triangle of 4x4
    assert(got((1, 1)) == 0.25 && got((2, 2)) == 0.25)
    assert(got((1, 2)) == -0.25)
    assert(got((3, 4)) == 0.0 && got((3, 3)) == 0.0)
    assert(!got.contains((2, 1)), "lower triangle must not be emitted")
  }
}
