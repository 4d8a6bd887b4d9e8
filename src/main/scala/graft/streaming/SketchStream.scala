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

  /** foreachBatch body maintaining the bigram/unigram COUNT tables of
    * the [[graft.ops.NgramLm]] quality model over a document stream —
    * exact counts are sum-mergeable exactly like CMS cells, so the
    * add-one LM stays queryable mid-ingest without rescans (the
    * streaming leg of the q167/q171 scoring family). Same append-only
    * idempotence as the sketch sinks. Rows: (kind 'bi'|'uni', k, c). */
  def lmCountSink(root: String, text: Column): (DataFrame, Long) => Unit = {
    (batch, id) =>
      import graft.functions.{TextFunctions => T}
      val bi = batch.select(explode(T.shinglesOf(text, 2)).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .select(lit("bi").as("kind"), col("k"), col("c"))
      val uni = batch.select(explode(T.tokens(text)).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .select(lit("uni").as("kind"), col("k"), col("c"))
      Upsert.writeBatchState(bi.unionByName(uni), root, s"batch-$id")
  }

  /** Merged LM count tables over every completed batch: sum per
    * (kind, key) — bit-identical to one-shot counting of the full
    * stream (integer sums commute). */
  def mergedLmCounts(spark: SparkSession, root: String): DataFrame =
    Upsert.readBatchState(spark, root, excludeBatch = "",
        schema = "kind STRING, k STRING, c BIGINT")
      .map(_.groupBy(col("kind"), col("k")).agg(sum(col("c")).as("c")))
      .getOrElse(spark.emptyDataFrame
        .select(lit("").as("kind"), lit("").as("k"), lit(0L).as("c"))
        .limit(0))

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
