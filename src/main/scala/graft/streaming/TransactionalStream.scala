package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ops.{ManifestTable, Upsert}

/** Streaming MERGE into a transactional [[graft.ops.ManifestTable]] —
  * the manifest-commit analog of [[IncrementalStream]]'s swap-based
  * sink: each micro-batch upserts into the versioned table through
  * [[ManifestTable.mergeBatch]], so readers always see a fully
  * committed version (torn tables unrepresentable), every batch
  * becomes a time-travelable version, and replays are EXACTLY-ONCE
  * (the commit marker carries the batch key; a replayed batch whose
  * key is committed is a no-op).
  *
  * Batch keys are namespaced by a digest of the CHECKPOINT path (the
  * round-8 ADVICE pattern, same as [[AnnIndexStream]]): replays under
  * the same checkpoint keep the same key, while a fresh checkpoint
  * pointed at an existing table gets a fresh namespace and can never
  * mistake its first batch for an old run's replay.
  *
  * 100-TB shape: per micro-batch cost is one MERGE (the single
  * full-outer-join kernel) + one version write + one marker rename;
  * history growth is bounded by [[ManifestTable.vacuum]] on a
  * schedule. */
object TransactionalStream {

  /** `dedupOrder`: the MERGE kernel (like SQL MERGE) requires unique
    * source keys, but one micro-batch can carry several rows per key
    * (a burst of CDC updates, a multi-file trigger) — when set, the
    * batch pre-dedups last-writer-wins by these ordering columns
    * ([[Upsert.dedupLatest]], the CDC `updated_at` idiom). Left unset,
    * the caller guarantees per-batch key uniqueness. */
  def runMergeSink(source: DataFrame, root: String, keys: Seq[String],
      checkpoint: String, updateCols: Option[Seq[String]] = None,
      dedupOrder: Option[Seq[Column]] = None): StreamingQuery = {
    val ns = BatchKeys.namespace(checkpoint)
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val src = dedupOrder match {
          case Some(ord) => Upsert.dedupLatest(batch, keys, ord)
          case None => batch
        }
        // retry form: TWO streams (distinct checkpoints -> distinct
        // key namespaces) may merge into ONE root — a lost version
        // race rebases on the winner's version and re-commits, so
        // multi-writer tables serialize instead of one stream dying
        // (hammered in ManifestTableSpec)
        ManifestTable.mergeBatchWithRetry(batch.sparkSession, root, src,
          keys, s"$ns-$bid", updateCols)
        ()
      }
      .start()
  }

  /** [[runMergeSink]] in MERGE-ON-READ form
    * ([[ManifestTable.mergeBatchDVWithRetry]]): each micro-batch
    * commits O(batch) bytes — matched rows' positions join the
    * cumulative deletion vector, post-images append as a small
    * fragment, every unmatched table byte carries by reference —
    * where the copy-on-write sink pays an O(table) version write per
    * batch. The operational pair is a periodic
    * [[ManifestTable.optimizeBinPack]] (folds the accumulated
    * fragments at O(fragments) cost) + [[ManifestTable.reorg]] (purges
    * the vector); both are dataChange-false, so a change-feed consumer
    * downstream never sees them. Same exactly-once batch-key
    * namespacing and multi-writer rebase as [[runMergeSink]]. This is
    * the sink for a LARGE table fed by SMALL batches — the 100 TB
    * streaming shape; for a small hot table the CoW sink's simpler
    * whole-dir versions read faster. */
  def runMorMergeSink(source: DataFrame, root: String,
      keys: Seq[String], checkpoint: String,
      updateCols: Option[Seq[String]] = None,
      dedupOrder: Option[Seq[Column]] = None,
      binPackEvery: Int = 0,
      binPackMinFileBytes: Long = 32L * 1024 * 1024): StreamingQuery = {
    val ns = BatchKeys.namespace(checkpoint)
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val src = dedupOrder match {
          case Some(ord) => Upsert.dedupLatest(batch, keys, ord)
          case None => batch
        }
        ManifestTable.mergeBatchDVWithRetry(batch.sparkSession, root,
          src, keys, s"$ns-$bid", updateCols)
        // in-line maintenance tick: fragment-count hygiene at
        // O(fragments) cost, dataChange-false (replay-safe: a binPack
        // after a replayed no-op batch is itself a no-op when nothing
        // small accumulated). A LOST VERSION RACE here is swallowed,
        // not retried: under the documented multi-writer scenario the
        // batch's own merge already committed (it has its own rebase
        // loop), and the tick is pure hygiene — failing the whole
        // streaming query over a lost hygiene race would be wrong,
        // and the next tick compacts whatever accumulated anyway.
        if (binPackEvery > 0 && bid > 0 && bid % binPackEvery == 0)
          try ManifestTable.optimizeBinPack(batch.sparkSession, root,
            binPackMinFileBytes)
          catch { case _: graft.ops.ConcurrentCommitException => () }
        ()
      }
      .start()
  }
}
