package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.ops.Upsert

/** Streaming-native variant of the reference's incremental loads
  * (SURVEY §2.9). The reference's "stream" is a scheduled micro-batch:
  * timestamped file drops (`shipment_YYYYMMDD_HHMMSS.json`,
  * `dags/2_logistics-shipment-dag.py:33-39`) + high-watermark filter +
  * dedupe + MERGE. Structured Streaming's file source + checkpoint IS
  * that pipeline with exactly-once per file, and `foreachBatch` over
  * the upsert kernel is the faithful MERGE sink.
  *
  * Scale notes: the file source lists+tracks processed files in the
  * checkpoint (no reprocessing); per micro-batch the upsert is one
  * full-outer shuffle join against the target. With
  * `Trigger.AvailableNow` this runs as a catch-up batch job — the
  * exact analog of the reference's manual DAG runs.
  */
object IncrementalStream {

  /** File-drop JSON source (S3 landing dir → stream). */
  def fileDropJson(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    var r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n))
    r.json(dir)
  }

  /** foreachBatch MERGE sink against a DATE-PARTITIONED target — the
    * 100 TB shape: the batch's touched partitions are computed first,
    * ONLY those partitions of the target are read (partition-pruned
    * scan), merged, and dynamically overwritten. A day's late data
    * rewrites that day, never the table. `partition` derives the
    * partition value from batch rows (e.g. `to_date($"created_at")`).
    *
    * CONTRACT: the partition value must be STABLE per key (an
    * immutable event date, as in the reference's created_at) and
    * NON-NULL — a batch row whose derived partition value is null is
    * rejected (isin-based slice pruning can never match NULL, so null
    * partitions would silently escape the merge and duplicate keys).
    * If a key could move between partitions, its old-partition row
    * would escape the pruned slice — use the whole-table
    * [[runUpsertSink]] or key-range bucketing instead.
    *
    * Crash safety: the merged slice is fully materialized to a staging
    * dir under the table root BEFORE any live partition is touched,
    * then promoted one partition at a time by rename
    * ([[graft.ops.Partitioned.swapStagedPartitions]]); every batch
    * first heals interrupted swaps
    * ([[graft.ops.Partitioned.recoverPartitionSwaps]]). A crash at any
    * point leaves each touched partition either pre-batch or
    * post-batch, and the checkpoint replay re-merges idempotently.
    */
  def runPartitionedUpsertSink(
      stream: DataFrame,
      targetPath: String,
      checkpointPath: String,
      keys: Seq[String],
      order: Seq[Column],
      partitionCol: String,
      partition: Column): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.col
        val spark = batch.sparkSession
        val withPart = batch.withColumn(partitionCol, partition)
        val deduped = Upsert.dedupLatest(withPart, keys, order)
        val touched = deduped.select(partitionCol).distinct()
          .collect().map(_.get(0)).toSeq
        require(!touched.contains(null),
          s"runPartitionedUpsertSink: derived $partitionCol is NULL for " +
            "some batch rows — the partition value must be non-null " +
            "(NULL escapes isin slice pruning and would duplicate keys)")
        if (touched.nonEmpty) {
          graft.ops.Partitioned.recoverPartitionSwaps(spark, targetPath)
          val fs = new org.apache.hadoop.fs.Path(targetPath).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(new org.apache.hadoop.fs.Path(targetPath))) {
            graft.ops.Partitioned.writePartitioned(
              deduped, targetPath, Seq(partitionCol))
          } else {
            // partition-pruned slice of the target: only touched dates
            val slice = graft.ops.MetaIO.readParquet(spark, targetPath)
              .filter(col(partitionCol).isin(touched: _*))
            val merged = Upsert.upsert(slice, deduped, keys)
            // materialize the slice off-table first, then promote by
            // per-partition rename — never read-and-overwrite the same
            // live files in one job
            merged.write.mode("overwrite").partitionBy(partitionCol)
              .parquet(graft.ops.Partitioned.stagingPath(targetPath))
            graft.ops.Partitioned.swapStagedPartitions(
              spark, targetPath, partitionCol)
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** foreachBatch MERGE sink: per micro-batch, dedupe the batch to the
    * latest row per key (W1) and upsert into the parquet target
    * (last-writer-wins by `order`, like
    * `dags/2_logistics-shipment-dag.py:149-165`). Blocks until all
    * available data is processed (AvailableNow). */
  def runUpsertSink(
      stream: DataFrame,
      targetPath: String,
      checkpointPath: String,
      keys: Seq[String],
      order: Seq[Column]): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val deduped = Upsert.dedupLatest(batch, keys, order)
        // readRecovered (NOT a bare exists+read): after a crash inside
        // the previous batch's swap the live dir is absent and only the
        // backup exists — an unrecovered check would merge into nothing
        // and lose every row not in the replayed batch.
        val target = Upsert.readRecovered(spark, targetPath)
          .getOrElse(deduped.limit(0))
        val merged = Upsert.upsert(target, deduped, keys)
        Upsert.overwriteAtomic(merged, targetPath)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
