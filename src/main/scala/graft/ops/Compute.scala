package graft.ops

import org.apache.spark.sql.Dataset

/** Parallelism repair for CPU-bound narrow transforms.
  *
  * A Spark scan's task count follows the INPUT's byte layout (file
  * splits), which is the right default when cost ∝ bytes. Operators
  * whose per-row cost dwarfs their input bytes — shingling, hashing,
  * signature building, image decode — inherit that layout too, so a
  * small-but-expensive input (one parquet file of short documents)
  * runs its whole CPU burn in ONE task while the rest of the executor
  * sits idle. At 100 TB the scan arrives in thousands of splits and
  * this never triggers; it is precisely the "small input, expensive
  * transform" corner (a rescored sample, a benchmark set, a
  * micro-batch) where the fix matters.
  */
object Compute {

  /** Widen `df` to the session's default parallelism IF it is
    * narrower; already-parallel inputs pass through untouched (never
    * add a shuffle to a plan that is already wide). The explicit
    * numPartitions repartition is deliberately AQE-proof: AQE does
    * not re-coalesce user-specified repartitions, so the downstream
    * per-row work genuinely fans out even though the exchanged bytes
    * are tiny. */
  def spread[T](ds: Dataset[T]): Dataset[T] = {
    val target = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions >= target) ds
    else ds.repartition(target)
  }

  /** The optimizer's byte estimate for `df`'s plan, or None when the
    * estimate is unusable (unknown leaves / join-product blowup) —
    * callers then skip scaling (today's behaviour). */
  def planBytes(df: org.apache.spark.sql.DataFrame): Option[Long] =
    try {
      val b = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (b < 0 || b > BigInt(1L << 50)) None else Some(b.toLong)
    } catch { case _: Throwable => None }

  /** Total on-disk bytes under `path` (0 when absent) — the working-
    * set size of a persistent state root, one FS metadata call. */
  def dirBytes(spark: org.apache.spark.sql.SparkSession,
      path: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    } catch { case _: Throwable => 0L }

  /** Run `body` with `spark.sql.shuffle.partitions` scaled to the
    * working set it processes (guide §2 — partitioning derived from
    * input size, not a constant): target = ceil(mult × bytes /
    * advisoryPartitionSize), clamped to [1, session partitions].
    * `localCheckpoint()` trees compile OUTSIDE AQE, so coalescing
    * never repairs their exchanges — a micro-batch ingest paid
    * 32-task exchanges on 250-row frames (measured, q82). `mult`
    * headrooms the estimate for expansion-heavy transforms
    * (shingling, banding). A working set the caller cannot bound
    * (None) runs unscaled. Scale posture: a GB-scale batch derives
    * the session's full parallelism — the clamp only ever LOWERS
    * partition counts the optimizer can prove small. Conf is
    * restored after; the engine's ingest paths run on the committing
    * thread only. */
  def withScaledShufflePartitions[T](
      spark: org.apache.spark.sql.SparkSession,
      workingSetBytes: Option[Long], mult: Int = 4)(body: => T): T = {
    val sess = spark.sessionState.conf.numShufflePartitions
    val target = workingSetBytes match {
      case Some(b) =>
        val adv = spark.sessionState.conf.getConf(
          org.apache.spark.sql.internal.SQLConf
            .ADVISORY_PARTITION_SIZE_IN_BYTES)
        if (adv <= 0) sess
        else math.max(1L, math.min(sess.toLong,
          (b.toDouble * mult / adv.toDouble).ceil.toLong)).toInt
      case None => sess
    }
    if (target >= sess) body
    else {
      val key = "spark.sql.shuffle.partitions"
      val old = spark.conf.get(key)
      spark.conf.set(key, target.toString)
      try body finally spark.conf.set(key, old)
    }
  }

  /** Materialized byte size of a `localCheckpoint()`ed frame — read
    * from the block manager's storage info for the checkpoint RDD
    * (the blocks exist by definition). None when the plan isn't a
    * checkpoint or the info isn't available. */
  def checkpointBytes(df: org.apache.spark.sql.DataFrame): Option[Long] =
    try {
      df.queryExecution.optimizedPlan match {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          df.sparkSession.sparkContext.getRDDStorageInfo
            .find(_.id == r.rdd.id)
            .map(i => i.memSize + i.diskSize)
        case _ => None
      }
    } catch { case _: Throwable => None }

  /** Right-size an O(delta) append derived from a checkpointed frame
    * (guide §6 — sensible output file sizing): a MoR post-image
    * inherits the SCAN's partitioning, so a 200-row update landed as
    * 10 near-empty fragment files, each taxing every later scan,
    * stats row and footer read. Coalesce (no shuffle — partitions
    * merge map-side) to ceil(materialized checkpoint bytes /
    * advisory partition size): a small delta folds to one file, a
    * TB-scale delta keeps ~advisory-sized output at full parallelism.
    * In-memory rows overestimate parquet bytes, so the file count
    * errs high (never a giant single file). Unknown size = unchanged
    * behaviour. */
  def coalesceToDeltaSize(out: org.apache.spark.sql.DataFrame,
      ckpt: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    checkpointBytes(ckpt) match {
      case Some(b) =>
        val adv = out.sparkSession.sessionState.conf.getConf(
          org.apache.spark.sql.internal.SQLConf
            .ADVISORY_PARTITION_SIZE_IN_BYTES)
        if (adv <= 0) out
        else {
          // NOTE: never probe out.rdd.getNumPartitions here — .rdd on
          // an AQE plan materializes its query stages (an extra
          // execution per commit, measured). coalesce(n) with n ≥ the
          // actual partition count is already a no-op.
          val n = math.max(1L, (b + adv - 1) / adv).toInt
          out.coalesce(n)
        }
      case None => out
    }

  /** Lexicographic string compare by Unicode CODE POINT — identical to
    * UTF-8 binary order, which is what Spark's `min`/`orderBy` and the
    * DuckDB oracle use. Java's natural `String` ordering compares
    * UTF-16 code units instead, which sorts supplementary-plane code
    * points (surrogate pairs, units 0xD800–0xDFFF) BELOW U+E000–U+FFFF
    * — the two orders diverge exactly when a BMP-private-use/CJK-ext
    * symbol ties against an emoji. Every driver-local fast path that
    * must reproduce a distributed/oracle ordering decision (BPE merge
    * tie-break, union-find min-id root) compares through this. */
  def codePointCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** [[codePointCompare]] as an `Ordering` for use in `minBy`/`sorted`. */
  val codePointOrdering: Ordering[String] =
    (x: String, y: String) => codePointCompare(x, y)
}
