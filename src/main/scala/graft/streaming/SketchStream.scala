package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{CmsSketch, HllSketch}
import graft.ops.Upsert

/** STREAMING maintenance of the mergeable sketches — the register
  * tables of [[graft.functions.HllSketch]] (distinct count) and
  * [[graft.functions.CmsSketch]] (per-key frequency) kept current over
  * an unbounded stream, the way a 100 TB ingest actually tracks
  * corpus cardinality and token frequencies (never by re-scanning).
  *
  * Design: mergeability IS the exactly-once story. Each micro-batch
  * writes its OWN register table under `root/batch-<id>` via the
  * append-only batch-state layout ([[Upsert.writeBatchState]]) — a
  * replayed batch atomically overwrites only its own subdirectory, so
  * re-delivery cannot double-count; readers union the per-batch
  * registers and re-aggregate (max for HLL, sum for CMS), which is
  * exactly the sketches' merge operation. No read-modify-write on
  * shared state anywhere, so concurrent batch writers never conflict.
  *
  * Scale shape: per batch, one map-side-combined aggregation down to
  * d·w (CMS) or ≤2^p (HLL) rows; the merge reads #batches tiny files
  * (compact by re-writing a consolidated batch offline when #batches
  * grows — same layout, one subdir).
  */
object SketchStream {

  /** foreachBatch body maintaining a CMS register table: sparse
    * per-batch registers (zero cells dropped — the merge identity)
    * under `root/batch-<id>`. Idempotent under replay. */
  def cmsSink(root: String, value: Column, depth: Int = 4,
      width: Int = 32): (DataFrame, Long) => Unit = { (batch, id) =>
    Upsert.writeBatchState(
      CmsSketch.registers(batch, value, depth, width)
        .filter(col("cnt") =!= 0L),
      root, s"batch-$id")
  }

  /** foreachBatch body maintaining an HLL register table. */
  def hllSink(root: String, value: Column, p: Int = 6,
      seed: Int = 0): (DataFrame, Long) => Unit = { (batch, id) =>
    Upsert.writeBatchState(HllSketch.registers(batch, value, p, seed),
      root, s"batch-$id")
  }

  /** Merged CMS registers over every completed batch (sparse; join
    * the dense grid if the zero cells are wanted). */
  def mergedCms(spark: SparkSession, root: String): DataFrame =
    Upsert.readBatchState(spark, root, excludeBatch = "",
        schema = "row INT, col INT, cnt BIGINT")
      .map(_.groupBy(col("row"), col("col")).agg(sum(col("cnt")).as("cnt")))
      .getOrElse(spark.emptyDataFrame
        .select(lit(0).as("row"), lit(0).as("col"), lit(0L).as("cnt"))
        .limit(0))

  /** Merged HLL registers over every completed batch. */
  def mergedHll(spark: SparkSession, root: String): DataFrame =
    Upsert.readBatchState(spark, root, excludeBatch = "",
        schema = "bucket BIGINT, max_rho BIGINT")
      .map(_.groupBy(col("bucket")).agg(max(col("max_rho")).as("max_rho")))
      .getOrElse(spark.emptyDataFrame
        .select(lit(0L).as("bucket"), lit(0L).as("max_rho"))
        .limit(0))
}
