package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned table layout for silver facts (SURVEY §4 physical
  * notes: "partition silver facts by date"). A fact laid out as
  * `.../fact/order_year=1997/part-*.parquet` lets every
  * last-N-days / year-range gold query prune partitions at plan time —
  * at 100 TB the difference between scanning a week and scanning
  * years.
  */
object Partitioned {

  /** Overwrite `path` partitioned by `cols` (derive partition columns
    * first, e.g. `withColumn("order_year", year($"order_date"))`). */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Dynamic partition overwrite: replace ONLY the partitions present
    * in `df` (the incremental-batch write shape — a day's merge
    * rewrites that day, not the table). The mode is passed as a
    * PER-WRITE DataFrameWriter option, not by mutating the session
    * conf: concurrent driver threads share one SparkSession (Verify's
    * thread pool, ModelRegistry.runParallel), and a set/finally-restore
    * of the global would race — another thread's overwrite could run
    * in the wrong mode or have its setting clobbered by the restore.
    *
    * NOTE: the commit of a multi-partition dynamic overwrite is NOT
    * atomic and the caller must not read the same path in the same
    * job. The streaming sink therefore uses the staged
    * [[swapStagedPartitions]] protocol instead; this remains the
    * one-shot batch form for callers without crash-replay needs. */
  def overwriteDynamic(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(cols: _*).parquet(path)

  /** Staging/backup dirs of the per-partition swap protocol. Dot
    * prefix: Spark's file listing and partition discovery skip paths
    * starting with `.` or `_`, so in-flight state under the table root
    * is invisible to readers. */
  private val StagingDir = ".graft_staging"
  private val BackupDir = ".graft_backup"
  def stagingPath(root: String): String = s"$root/$StagingDir"

  /** Per-partition atomic swap — the partition-scoped analog of
    * [[graft.ops.Upsert.overwriteAtomic]]. The caller first
    * materializes the merged slice under [[stagingPath]] (so nothing
    * live is touched until the full slice is durably written), then
    * this promotes each staged `col=value` dir: live→backup rename,
    * staged→live rename, drop backup. A crash at any point is healed
    * by [[recoverPartitionSwaps]] + the streaming checkpoint's batch
    * replay (the merge is idempotent: last-writer-wins dedupe + upsert
    * re-applied over already-merged rows is a no-op). Partition dirs
    * are discovered from the staged listing, never re-derived from
    * values — sidesteps hive partition-value escaping. */
  def swapStagedPartitions(spark: SparkSession, root: String,
      partitionCol: String): Unit = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(root, StagingDir)
    val bakRoot = new org.apache.hadoop.fs.Path(root, BackupDir)
    fs.mkdirs(bakRoot)
    val parts = fs.listStatus(staging).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith(partitionCol + "="))
    parts.foreach { p =>
      val name = p.getPath.getName
      val live = new org.apache.hadoop.fs.Path(rootP, name)
      val bak = new org.apache.hadoop.fs.Path(bakRoot, name)
      if (fs.exists(bak)) fs.delete(bak, true)
      if (fs.exists(live) && !fs.rename(live, bak))
        throw new java.io.IOException(s"backup rename failed for $live")
      if (!fs.rename(p.getPath, live))
        throw new java.io.IOException(s"promote failed for $name under $root")
      fs.delete(bak, true)
    }
    fs.delete(staging, true)
    fs.delete(bakRoot, true)
  }

  /** Crash recovery for [[swapStagedPartitions]], run before every
    * batch touches the table: restore any backed-up partition whose
    * live dir is missing (crash between the two renames), then discard
    * leftover staging/backup state — the checkpoint replays the
    * interrupted batch against the restored table. */
  def recoverPartitionSwaps(spark: SparkSession, root: String): Unit = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bakRoot = new org.apache.hadoop.fs.Path(root, BackupDir)
    if (fs.exists(bakRoot)) {
      fs.listStatus(bakRoot).foreach { b =>
        val live = new org.apache.hadoop.fs.Path(rootP, b.getPath.getName)
        if (!fs.exists(live) && !fs.rename(b.getPath, live))
          throw new java.io.IOException(s"partition restore failed for $live")
      }
      fs.delete(bakRoot, true)
    }
    val staging = new org.apache.hadoop.fs.Path(root, StagingDir)
    if (fs.exists(staging)) fs.delete(staging, true)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    MetaIO.readParquet(spark, path)

  /** Number of files the plan ACTUALLY scanned after partition pruning
    * (from the scan node's numFiles metric; `df.inputFiles` reports
    * the unpruned file index) — the assertion helper for "this filter
    * prunes". Triggers execution. */
  def scannedFiles(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // execute THIS plan (df.count() would build a separate query
    // execution whose metrics don't reflect this one)
    df.queryExecution.toRdd.count()
    // scans live INSIDE materialized AQE query stages (leaves of the
    // final plan) — recurse through them
    def sum(p: SparkPlan): Long =
      p.collect {
        case s: FileSourceScanExec => s.metrics("numFiles").value
        case q: QueryStageExec => sum(q.plan)
      }.sum
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => sum(a.executedPlan)
      case p => sum(p)
    }
  }
}
