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
}
