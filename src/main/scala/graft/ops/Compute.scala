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
}
