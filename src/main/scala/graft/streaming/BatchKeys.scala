package graft.streaming

/** The checkpoint-derived batch-key NAMESPACE every exactly-once
  * `foreachBatch` sink shares (AnnIndexStream, TransactionalStream,
  * DedupDecisionStream, CorpusStream — previously four identical
  * inline copies): Spark's micro-batch counter restarts at 0 under a
  * fresh checkpoint, so bare batch ids from a new lineage would
  * collide with an old run's persisted state; prefixing ids with a
  * digest of the checkpoint path makes every lineage's keys disjoint.
  * One definition so a future change to the scheme cannot leave the
  * sinks disagreeing on replay semantics. */
private[streaming] object BatchKeys {
  def namespace(checkpoint: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
    d.take(4).map(b => f"${b & 0xff}%02x").mkString
  }
}
