package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ops.ProductQuantizer

/** Streaming maintenance of the IVF-PQ ANN index — the
  * [[graft.ops.ProductQuantizer.ivfPqIngest]] batch kernel lifted to
  * Structured Streaming: a `foreachBatch` sink over the vector stream
  * where each micro-batch encodes against the FROZEN index state
  * (coarse cells + PQ codebooks — trained once, never touched by the
  * stream) and appends ONLY its own subdirectory to the persistent
  * index table.
  *
  * Exactly-once composes from both halves: Spark replays a failed
  * micro-batch with the SAME batch id, and `ivfPqIngest("stream-<id>")`
  * recomputes the identical admitted set against the OTHER batches'
  * claims whether or not its own write landed (the q75/q82 batch-state
  * argument, unchanged). So a crash anywhere between encode and commit
  * re-lands the same rows idempotently.
  *
  * 100-TB shape: per micro-batch work is O(batch) against broadcast
  * centroid state + O(batch) state I/O; the index grows append-only
  * with admitted vectors; retraining (drift) is a scheduled batch job
  * that writes a NEW state + index root, never an in-place mutation of
  * the one the stream is appending to. */
object AnnIndexStream {

  /** Start the index-ingest sink. `coarse`/`cents` are a materialized
    * [[graft.ops.ProductQuantizer.ivfPqState]].
    *
    * Batch-id namespacing (round-8 ADVICE): Spark's micro-batch
    * counter restarts at 0 under a NEW checkpoint dir, so a bare
    * `stream-$bid` id against an EXISTING indexPath would silently
    * overwrite the old run's `stream-0` subdirectory via the atomic
    * per-subdir swap — dropping previously indexed vectors with no
    * error. Batch ids therefore carry a namespace derived from the
    * CHECKPOINT path: replays of the same checkpoint keep the same
    * (namespace, bid) — exactly-once is untouched — while a fresh
    * checkpoint gets a fresh namespace and can never collide with a
    * prior run's subdirs. Corollary: checkpoint and indexPath
    * lifetimes are coupled — resuming an index MUST reuse its
    * checkpoint; pointing a new checkpoint at an old indexPath
    * APPENDS a new namespace (re-delivered vectors are still
    * deduplicated by the left_anti claim check in ivfPqIngest). */
  def runIngestSink(vecs: DataFrame, coarse: DataFrame, cents: DataFrame,
      indexPath: String, checkpoint: String, dim: Int, m: Int,
      id: String = "vec_id", vec: String = "embedding"): StreamingQuery = {
    val ns = BatchKeys.namespace(checkpoint)
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        ProductQuantizer.ivfPqIngest(batch.sparkSession, batch, coarse,
          cents, indexPath, s"stream-$ns-$bid", dim, m, id, vec)
        ()
      }
      .start()
  }
}
