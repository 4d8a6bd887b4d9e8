package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned table layout for silver facts (SURVEY §4 physical
  * notes: "partition silver facts by date"). A fact laid out as
  * `.../fact/order_year=1997/part-*.parquet` lets every
  * last-N-days / year-range gold query prune partitions at plan time —
  * at 100 TB the difference between scanning a week and scanning
  * years.
  */
object Partitioned {

  /** Overwrite `path` partitioned by `cols` (derive partition columns
    * first, e.g. `withColumn("order_year", year($"order_date"))`). */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Dynamic partition overwrite: replace ONLY the partitions present
    * in `df` (the incremental-batch write shape — a day's merge
    * rewrites that day, not the table). */
  def overwriteDynamic(df: DataFrame, path: String, cols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Number of files the plan ACTUALLY scanned after partition pruning
    * (from the scan node's numFiles metric; `df.inputFiles` reports
    * the unpruned file index) — the assertion helper for "this filter
    * prunes". Triggers execution. */
  def scannedFiles(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // execute THIS plan (df.count() would build a separate query
    // execution whose metrics don't reflect this one)
    df.queryExecution.toRdd.count()
    // scans live INSIDE materialized AQE query stages (leaves of the
    // final plan) — recurse through them
    def sum(p: SparkPlan): Long =
      p.collect {
        case s: FileSourceScanExec => s.metrics("numFiles").value
        case q: QueryStageExec => sum(q.plan)
      }.sum
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => sum(a.executedPlan)
      case p => sum(p)
    }
  }
}
