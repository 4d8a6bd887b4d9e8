package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Streaming exact dedup for a continuously-ingested corpus: emit each
  * document the FIRST time its content fingerprint is seen, suppress
  * every later arrival — the streaming-native form of `Dedup
  * .exactDupGroups` for a training-data pipeline that ingests forever
  * (the batch operator dedupes a snapshot; this dedupes an unbounded
  * stream with exactly-once state).
  *
  * State is one (first-seen timestamp) entry per fingerprint, shuffled
  * by fingerprint — the layout that scales horizontally with corpus
  * cardinality. Event-time timeout expires fingerprints `retention`
  * past the watermark, bounding the store for time-windowed dedup;
  * pass an effectively-infinite retention for global dedup (state then
  * grows with DISTINCT fingerprints only, the same footprint the batch
  * groupBy would shuffle).
  */
object StreamingDedup {

  final case class Doc(doc_id: Long, fp: String, ts: java.sql.Timestamp)

  val docSchema: StructType =
    StructType.fromDDL("doc_id BIGINT, fp STRING, ts TIMESTAMP")

  /** First-seen filter per fingerprint group. Within one micro-batch,
    * the earliest (ts, doc_id) row wins — deterministic under replay,
    * so the sink stays exactly-once end-to-end.
    *
    * Expiry = first-seen ts + retention, CLAMPED to just past the
    * current watermark: a key that receives data is invoked with
    * hasTimedOut=false even when its old timeout already lies behind
    * the watermark, and Spark rejects setTimeoutTimestamp values at or
    * before the watermark — without the clamp a duplicate arriving
    * after the watermark overtook the key's expiry (but before the
    * idle eviction pass, which only runs for keys WITHOUT data) would
    * kill the whole stream. */
  def firstSeen(
      retentionMs: Long)(
      fp: String,
      docs: Iterator[Doc],
      state: GroupState[Long]): Iterator[Doc] = {
    def expireAt(firstSeenMs: Long): Long =
      math.max(firstSeenMs + retentionMs, state.getCurrentWatermarkMs() + 1)
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else if (state.exists &&
        state.getCurrentWatermarkMs() < state.get + retentionMs) {
      // live state: suppress, re-arm the first-seen-based expiry
      // (watermark-clamped)
      val _ = docs.size
      state.setTimeoutTimestamp(expireAt(state.get))
      Iterator.empty
    } else {
      // no state, OR state whose retention already elapsed per the
      // watermark (keys WITH data get no idle-eviction call, so the
      // expiry must be applied here too — re-emit semantics would
      // otherwise depend on whether an intervening batch happened to
      // fire the timeout): treat as first-seen
      val first = docs.toSeq.minBy(d => (d.ts.getTime, d.doc_id))
      state.update(first.ts.getTime)
      state.setTimeoutTimestamp(expireAt(first.ts.getTime))
      Iterator.single(first)
    }
  }

  /** Wire the first-seen dedup over a streaming doc source. */
  def dedupStream(
      spark: SparkSession,
      docs: Dataset[Doc],
      retentionMs: Long = 365L * 24 * 3600 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[Doc] = {
    import spark.implicits._
    docs
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.fp)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        firstSeen(retentionMs))
  }

  /** Streaming NEAR-dup dedup: `foreachBatch` over the persistent LSH
    * band-bucket table (`CorpusPipeline.ingestNewNearDup`) — the
    * MinHash/LSH counterpart of [[dedupStream]]'s exact-fingerprint
    * state. Each micro-batch admits only docs that are not near-dups
    * of previously-admitted docs (across batches AND runs: the bucket
    * table is durable state like q75's seen-table), writing admitted
    * docs to `outPath/batch_<id>`.
    *
    * Exactly-once end to end: the bucket update is replay-stable per
    * micro-batch id (see ingestNewNearDup's contract) and the emission
    * OVERWRITES the per-batch directory, so a checkpoint replay of a
    * crashed batch rewrites byte-identical output instead of
    * appending duplicates. */
  def runNearDupSink(
      stream: org.apache.spark.sql.DataFrame,
      bucketPath: String,
      outPath: String,
      checkpointPath: String,
      id: String = "doc_id",
      text: String = "text",
      n: Int = 3,
      k: Int = 16,
      bandRows: Int = 4): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpointPath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val admitted = graft.pipelines.CorpusPipeline.ingestNewNearDup(
          batch.sparkSession, batch, bucketPath, s"stream_b$bid",
          id, text, n, k, bandRows)
        admitted.write.mode("overwrite").parquet(s"$outPath/batch_$bid")
        ()
      }
      .start()
    q.awaitTermination()
  }
}
