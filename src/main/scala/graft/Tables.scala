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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // schema from a driver-side footer read, session-memoized — the
    // testdata files are immutable and every query pays one inference
    // JOB per Tables() call otherwise ([[graft.ops.MetaIO]])
    val df = graft.ops.MetaIO.readParquet(spark, s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      // Legacy testdata stored events.ts as parquet TIMESTAMP(NANOS),
      // which Spark only reads via spark.sql.legacy.parquet.nanosAsLong
      // (set in the session builders, NOT here — a loader must not
      // mutate shared session conf) as a raw INT64: floor to micros.
      // DuckDB's TIMESTAMP_NS -> TIMESTAMP cast truncates identically.
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      // Current testdata is TIMESTAMP(MICROS) with isAdjustedToUTC=false
      // → TIMESTAMP_NTZ. Normalize to session-TZ TimestampType (UTC
      // everywhere in this engine) so downstream temporal queries see
      // the exact type the suite was verified against.
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view so `spark.sql` queries (the
    * EP1 raw-SQL entry point per SURVEY §3) can reference them by name
    * exactly like the DuckDB oracle does. */
  def views(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
