package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (see TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet each under /root/testdata/sf*\/.
  *
  * All readers go through `spark.read.parquet`, so Catalyst predicate
  * pushdown / column pruning applies to every query built on top
  * (verify with `.explain("formatted")`: PushedFilters / ReadSchema).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark cannot read
      // natively — read the raw INT64 nanos and floor to microseconds.
      // DuckDB's TIMESTAMP_NS -> TIMESTAMP cast truncates identically,
      // so oracle SQL must CAST(ts AS TIMESTAMP) when it outputs ts.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` queries (the
    * EP1 raw-SQL entry point per SURVEY §3) can reference them by name
    * exactly like the DuckDB oracle does. */
  def views(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
