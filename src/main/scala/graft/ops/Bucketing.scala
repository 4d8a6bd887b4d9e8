package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketing for co-located joins (builder brief: "repartition()/
  * bucketing for co-located joins").
  *
  * A fact table bucketed+sorted by its join key joins another table
  * bucketed the same way with NO shuffle exchange on either side —
  * the physical layout satisfies the join's distribution requirement.
  * At 100 TB this is the difference between an all-to-all network
  * shuffle of the fact table per query and zero; the MERGE kernel's
  * full-outer join gets the same benefit when target and source are
  * bucketed by the merge keys (Upsert scaladoc).
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted parquet table in
    * the session catalog. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** True iff the physical plan of `df` contains a shuffle exchange —
    * the assertion helper for "this join is co-located". Unwraps the
    * AQE root (its inner plan is not a child node). */
  def hasShuffle(df: DataFrame): Boolean = {
    val root = df.queryExecution.executedPlan
    val plan = root match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
      case _ => false
    }
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Range-sorted file layout for DATA SKIPPING: repartitionByRange +
    * sortWithinPartitions on the predicate column gives every output
    * file (and every parquet row group inside it) a narrow, disjoint
    * value range, so a pushed range predicate skips whole row groups
    * via footer min/max stats instead of decoding them. At 100 TB this
    * is the second pruning tier after partition pruning — partitions
    * cut the scan to a date slice, range-sorted row groups cut the
    * slice to the selected keys. */
  def writeRangeSorted(df: DataFrame, path: String, col: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, df(col))
      .sortWithinPartitions(col)
      .write.mode("overwrite").parquet(path)

  /** Rows the scan ACTUALLY produced after parquet row-group/page
    * skipping (scan numOutputRows) — the assertion helper for "this
    * layout skips". Triggers execution of this exact plan. */
  def scanOutputRows(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.queryExecution.toRdd.count()
    def sum(p: SparkPlan): Long =
      p.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
        case q: QueryStageExec => sum(q.plan)
      }.sum
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => sum(a.executedPlan)
      case p => sum(p)
    }
  }
}
