package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-LAYOUT optimization — the write-side half of data skipping.
  * A 100 TB table is pruned at read time by per-file min/max ranges
  * (parquet row-group stats, Delta/Iceberg file stats); those ranges
  * are only tight if the writer CLUSTERED the data. Sorting by one
  * column makes its ranges perfect and every other column's useless;
  * Z-ORDERING by the bit-interleaved key makes ranges on BOTH columns
  * good — the standard multi-dimensional clustering trade
  * (Morton/Z-value curve, as in Delta OPTIMIZE ZORDER BY).
  *
  * [[zOrderFiles]] computes the file assignment AND the resulting
  * per-file min/max stats — the skipping effectiveness is itself the
  * oracle-checkable output (narrow ranges = fewer files touched per
  * predicate).
  *
  * Scale shape: a layout rewrite is inherently one range-shuffle on
  * the clustering key (what a sort-based `repartitionByRange` +
  * sortWithinPartitions write does on a cluster). The file NUMBERING
  * here never runs a data-sized single-partition window: the top 6
  * z-bits form 64 buckets monotone in z, in-bucket row numbers run as
  * partitioned windows, and cross-bucket offsets are a broadcast
  * 64-row prefix sum — the q86 two-level pattern applied to
  * row_number.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of `x` (even bit
    * positions) and `y` (odd positions). Exact int64 bit arithmetic —
    * identical in any engine; inputs must be non-negative and fit in
    * `bits` bits for the curve to be order-faithful. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Row-level z-order file assignment — every input column preserved
    * plus `__x`/`__y` (the cast clustering dims) and `file_id`.
    * Shared by the stats view ([[zOrderFiles]]) and the materializing
    * writer ([[writeZOrdered]]), so the two can never disagree on
    * which file a row lands in. */
  private def assignFiles(df: DataFrame, x: Column, y: Column,
      tie: Column, rowsPerFile: Long, bits: Int): DataFrame = {
    require(rowsPerFile > 0, "rowsPerFile must be positive")
    val t = df.withColumn("__x", x.cast("long"))
      .withColumn("__y", y.cast("long"))
      .withColumn("__t", tie)
      .withColumn("__z", zValue(col("__x"), col("__y"), bits))
      .withColumn("__b", shiftright(col("__z"), math.max(2 * bits - 6, 0)))
    val inBucket = Window.partitionBy(col("__b"))
      .orderBy(col("__z"), col("__t"))
    val numbered = t.withColumn("__rn",
      row_number().over(inBucket).cast("long"))
    // 64 buckets: the single-partition prefix window is bounded
    val acrossBuckets = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .select(col("__b"),
        coalesce(sum(col("__c")).over(acrossBuckets), lit(0L)).as("__off"))
    numbered.join(broadcast(offsets), Seq("__b"))
      .withColumn("file_id",
        expr(s"(__rn - 1L + __off) div ${rowsPerFile}L"))
  }

  /** Row-level z-order file assignment, public surface: every input
    * column plus `file_id`. The substrate for file-grain SECONDARY
    * indexes over the layout — per-file Bloom registers
    * ([[graft.queries.TrainingData]] q221) index a column the z-key
    * does NOT cluster, where min/max ranges are useless (a point key
    * scatters uniformly across files) but set-membership bits prune
    * almost everything. */
  def assignZFiles(df: DataFrame, x: Column, y: Column, tie: Column,
      rowsPerFile: Long, bits: Int = 16): DataFrame = {
    val internal = Seq("__x", "__y", "__t", "__z", "__b", "__rn",
      "__c", "__off")
    assignFiles(df, x, y, tie, rowsPerFile, bits)
      .drop(internal: _*)
  }

  /** Z-order file assignment + per-file min/max skipping stats:
    * rows sort by (z, tie), cut into `rowsPerFile` files; output one
    * row per file with its row count and both dimensions' ranges. */
  def zOrderFiles(df: DataFrame, x: Column, y: Column, tie: Column,
      rowsPerFile: Long, bits: Int = 16): DataFrame =
    assignFiles(df, x, y, tie, rowsPerFile, bits)
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))

  /** MATERIALIZE the z-ordered layout: one subdirectory per file
    * bucket (`file_id=<N>` partitioned parquet — the standalone
    * stand-in for a table format's file manifest) and return the
    * per-file min/max stats table a reader prunes against. This is the
    * write half of the data-skipping loop; [[skipScan]] is the read
    * half. On a cluster the same shape is `repartitionByRange(zv)` +
    * `sortWithinPartitions` + a stats collection — one range shuffle
    * either way. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, tie: Column,
      rowsPerFile: Long, bits: Int, path: String): DataFrame = {
    // pinned: the assignment (two windows + a broadcast join) feeds
    // BOTH the data write and the stats aggregation — without the
    // checkpoint it computes twice, and the stats could even disagree
    // with the written files under a non-deterministic upstream
    val a = graft.CacheTracker.trackCheckpoint(
      assignFiles(df, x, y, tie, rowsPerFile, bits).localCheckpoint())
    a.select((df.columns.map(col) :+ col("file_id")).toIndexedSeq: _*)
      // group each file bucket into one task before the partitioned
      // write: without it every task holding rows of a bucket writes
      // its own fragment — #tasks × #buckets tiny files (and that many
      // footer reads at scan time) instead of ONE file per bucket
      .repartition(col("file_id"))
      .write.mode("overwrite").partitionBy("file_id").parquet(path)
    a.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
  }

  /** Read-side DATA SKIPPING, planning step: the file ids whose
    * [min,max] x-range intersects [lo, hi]. The stats frame is file
    * METADATA — one row per file, bounded by file count, collected on
    * the driver exactly as Delta/Iceberg planning reads its manifest:
    * this is the one collect() whose size is O(files), never O(rows). */
  def filesForXRange(stats: DataFrame, lo: Long, hi: Long): Seq[Long] =
    stats.filter(!(col("max_x") < lo || col("min_x") > hi))
      .select(col("file_id")).collect().map(_.getLong(0)).toSeq

  /** Read-side DATA SKIPPING, scan step: read ONLY the given file
    * buckets. `file_id` is a partition column of the
    * [[writeZOrdered]] layout, so the IN-list lands in the scan's
    * PartitionFilters and Spark never opens a skipped file — the
    * scan's `numFiles` metric (spec-locked) proves files read <
    * files total. */
  def skipScan(spark: org.apache.spark.sql.SparkSession, path: String,
      fileIds: Seq[Long]): DataFrame =
    MetaIO.readParquet(spark, path)
      .filter(col("file_id").isin(fileIds: _*))
}
