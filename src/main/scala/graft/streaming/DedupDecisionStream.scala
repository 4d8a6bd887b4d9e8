package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ops.Dedup

/** Streaming maintenance of the dedup KEEPER DECISION — the
  * [[graft.ops.Dedup.dedupDecisionIngest]] batch kernel lifted to
  * Structured Streaming (the [[AnnIndexStream]] move applied to the
  * resolution stage): a `foreachBatch` sink over the document stream
  * where each micro-batch appends its LSH bands to the persistent band
  * table, joins them against every prior batch's bands for new
  * candidate pairs, replays prior assignments as diameter-2 star
  * edges, and relabels through one pointer-jumping CC — keeping the
  * (doc → cluster, keep) table current as documents arrive, between
  * scheduled full rebuilds.
  *
  * Exactly-once composes exactly as in [[AnnIndexStream]]: Spark
  * replays a failed micro-batch with the SAME batch id, and
  * `dedupDecisionIngest` reads only OTHER batches' state, so the
  * replay recomputes the identical relabeling and its per-subdir
  * atomic swaps are idempotent. Batch ids carry the checkpoint-derived
  * namespace (round-8 ADVICE pattern): a fresh checkpoint can never
  * collide with a prior run's subdirectories.
  *
  * 100-TB shape: per micro-batch work is one (band, band_key)
  * equi-join of the batch's bands against the band table plus a CC
  * whose edge set is batch pairs + star edges (converges in ~2
  * rounds); decision-delta writes track merge activity, not corpus
  * size. The latest-wins epoch is NOT the micro-batch counter — a
  * fresh checkpoint against the same decisionRoot restarts that
  * counter at 0, which would let stale deltas outrank new ones —
  * it is derived from the persisted state itself
  * ([[graft.ops.Dedup.dedupDecisionIngest]]'s auto-epoch: max over
  * prior deltas + 1), monotone across checkpoint lineages by
  * construction. */
object DedupDecisionStream {

  /** Start the decision-maintenance sink over a document stream with
    * columns (`id`, `text`). */
  def runDecisionSink(docs: DataFrame, bandRoot: String,
      decisionRoot: String, checkpoint: String, id: String = "doc_id",
      text: String = "text", n: Int = 3, k: Int = 16,
      rows: Int = 4): StreamingQuery = {
    val ns = BatchKeys.namespace(checkpoint)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty) {
          val decided = Dedup.dedupDecisionIngest(batch.sparkSession,
            batch, bandRoot, decisionRoot, s"stream-$ns-$bid",
            epoch = -1, id = id, text = text, n = n, k = k, rows = rows)
          // the returned full assignment (O(corpus), localCheckpointed)
          // is dead once the state writes land — release it here or a
          // long-running sink pins O(micro-batches x corpus) blocks
          graft.CacheTracker.releaseCheckpoint(decided)
        }
      }
      .start()
  }
}
