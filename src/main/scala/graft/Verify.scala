package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Extra args after (sfDir, outDir) restrict the run to the named
  * queries — builder-side iteration shortcut (check_oracle.py only
  * reads oracle_sql.json, which is filtered the same way), the driver
  * always calls the 2-arg form. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    require(only.isEmpty || only.subsetOf(SparkEntry.queries.keySet),
      s"unknown query names: ${(only -- SparkEntry.queries.keySet).mkString(", ")}")
    def selected(name: String): Boolean = only.isEmpty || only(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // run queries concurrently from the driver (separate output dirs,
    // Spark schedules the jobs in parallel) — halves driver wall-time
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val jobs = SparkEntry.queries.toSeq.filter(kv => selected(kv._1))
      .map { case (name, fn) =>
      Future {
        try {
          val df = fn(spark, sfDir)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          // coalesce(1) only for small results (one tidy file); a big
          // result funnelled through coalesce(1) appends a single-task
          // write to the whole sorted plan — for q51's millions of rows
          // that was a multi-second harness artifact, not query cost.
          // The driver's comparator sorts rows, so multi-file parallel
          // output compares identically. limit+count early-exits the
          // size probe for big results.
          try {
            val big = df.limit(100001).count() > 100000
            (if (big) df else df.coalesce(1))
              .write.mode("overwrite").parquet(s"$outDir/$name")
          } finally df.unpersist() // even on failure: don't starve the
          // other concurrently-running queries of storage memory
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    Await.result(Future.sequence(jobs), Duration.Inf)
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
