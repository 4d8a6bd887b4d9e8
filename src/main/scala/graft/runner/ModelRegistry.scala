package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Upsert

/** EP3 analog (SURVEY §3): the dbt project re-expressed as a thin Scala
  * model registry — each model is a function of its resolved
  * dependencies plus a materialization, executed in topological order,
  * with the dbt `incremental`+`merge` strategy implemented over the
  * graft upsert kernel and the `log_audit_start` pre-hook
  * (`dbt/dbt-project/macros/log_audit_event.sql:1-21`) as an append to
  * an audit table.
  *
  * Scale notes: models materialize as parquet tables via atomic
  * staging-dir swap ([[Upsert.overwriteAtomic]]); the incremental
  * watermark is snapshotted BEFORE the write (SURVEY §7: the
  * reference's self-referential `MAX(extracted_at) FROM {{ this }}`
  * must not observe the in-flight merge).
  */
object ModelRegistry {

  sealed trait Materialization
  /** CREATE OR REPLACE VIEW — session-catalog temp view. */
  case object View extends Materialization
  /** CTAS — full overwrite parquet table. */
  case object Table extends Materialization
  /** dbt incremental+merge: filter source rows to
    * `watermarkCol > max(target.watermarkCol)` (epoch fallback), then
    * MERGE on `keys` (full-row update, insert new keys). */
  final case class IncrementalMerge(keys: Seq[String], watermarkCol: String)
      extends Materialization

  final case class Model(
      name: String,
      deps: Seq[String],
      materialization: Materialization,
      build: (SparkSession, Map[String, DataFrame]) => DataFrame)

  /** Path-addressed parquet warehouse (stands in for the Snowflake
    * DB.SCHEMA namespace; at cluster scale this is the table root on
    * object storage). */
  final class Warehouse(val root: String, spark: SparkSession) {
    private def path(name: String) = s"$root/$name"
    /** Roll an interrupted atomic swap forward, then report liveness.
      * Both `exists` and `read` MUST recover first: during the swap's
      * crash window only the `__old` backup exists, and an unrecovered
      * exists() would make IncrementalMerge treat the table as new and
      * overwrite it with just the current batch. */
    private def recoveredExists(name: String): Boolean = {
      val dst = new org.apache.hadoop.fs.Path(path(name))
      val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Upsert.recoverAtomic(fs, dst,
        new org.apache.hadoop.fs.Path(path(name) + "__old"))
      fs.exists(dst)
    }
    def exists(name: String): Boolean = recoveredExists(name)
    def read(name: String): DataFrame = {
      recoveredExists(name)
      graft.ops.MetaIO.readParquet(spark, path(name))
    }
    def overwrite(name: String, df: DataFrame): Unit =
      Upsert.overwriteAtomic(df, path(name))
    def append(name: String, df: DataFrame): Unit =
      df.write.mode("append").parquet(path(name))
  }

  val EPOCH = "2000-01-01 00:00:00"

  /** Kahn topological order; throws on cycles/missing deps. Models with
    * deps on names not in the registry read them from the warehouse
    * (sources). */
  def topoOrder(models: Seq[Model]): Seq[Model] = {
    val byName = models.map(m => m.name -> m).toMap
    val visited = scala.collection.mutable.LinkedHashSet[String]()
    val visiting = scala.collection.mutable.Set[String]()
    def visit(n: String): Unit = byName.get(n).foreach { m =>
      if (!visited.contains(n)) {
        require(!visiting.contains(n), s"dependency cycle at $n")
        visiting += n
        m.deps.foreach(visit)
        visiting -= n
        visited += n
      }
    }
    models.foreach(m => visit(m.name))
    visited.toSeq.map(byName)
  }

  /** Materialize one model given resolved dep DataFrames; appends the
    * audit row (synchronized: parquet append from concurrent driver
    * threads must not interleave commits on one path). */
  private def materialize(
      spark: SparkSession,
      wh: Warehouse,
      m: Model,
      deps: Map[String, DataFrame],
      runId: String,
      auditTable: Option[String]): DataFrame = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val built = m.build(spark, deps)
    val out = m.materialization match {
      case View =>
        built.createOrReplaceTempView(m.name)
        built
      case Table =>
        wh.overwrite(m.name, built)
        wh.read(m.name)
      case IncrementalMerge(keys, wmCol) =>
        if (!wh.exists(m.name)) {
          wh.overwrite(m.name, built)
        } else {
          val target = wh.read(m.name)
          // snapshot the watermark BEFORE writing anything
          val wm = target.agg(max(col(wmCol))).first().get(0)
          val wmLit = if (wm == null) lit(EPOCH).cast("timestamp")
            else lit(wm)
          val fresh = built.filter(col(wmCol) > wmLit)
          val deduped = Upsert.dedupLatest(fresh, keys, Seq(col(wmCol)))
          val merged = Upsert.upsert(target, deduped, keys)
          wh.overwrite(m.name, merged)
        }
        wh.read(m.name)
    }
    auditTable.foreach { at =>
      val n = out.count()
      val audit = Seq((m.name, runId, "SUCCESS",
          new java.sql.Timestamp(t0),
          new java.sql.Timestamp(System.currentTimeMillis()), n))
        .toDF("job_name", "run_id", "status", "start_time", "end_time",
          "rows_processed")
      wh.synchronized { wh.append(at, audit) }
    }
    out
  }

  /** Run the registry sequentially: resolves deps (registry outputs or
    * warehouse sources), applies materializations, appends one audit
    * row per model (job_name, run_id, status, start/end,
    * rows_processed — the `ETL_AUDIT_LOG` shape). */
  def run(
      spark: SparkSession,
      wh: Warehouse,
      models: Seq[Model],
      runId: String,
      auditTable: Option[String] = Some("etl_audit_log")): Map[String, DataFrame] = {
    var results = Map.empty[String, DataFrame]
    def resolve(n: String): DataFrame = results.getOrElse(n, wh.read(n))
    topoOrder(models).foreach { m =>
      val deps = m.deps.map(d => d -> resolve(d)).toMap
      results += m.name -> materialize(spark, wh, m, deps, runId, auditTable)
    }
    results
  }

  /** Run the registry with level-parallelism — the dbt `threads: 3`
    * analog (`.dbt/profiles.yml`, SURVEY §4 "DAG-level parallelism"):
    * models are grouped into topological waves (all deps in earlier
    * waves) and each wave's models run concurrently from the driver;
    * Spark schedules their jobs in parallel. Same results as [[run]]. */
  def runParallel(
      spark: SparkSession,
      wh: Warehouse,
      models: Seq[Model],
      runId: String,
      auditTable: Option[String] = Some("etl_audit_log"),
      threads: Int = 3): Map[String, DataFrame] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val registered = models.map(_.name).toSet
    // wave index = longest registry-dep chain below the model
    val level = scala.collection.mutable.Map[String, Int]()
    topoOrder(models).foreach { m =>
      level(m.name) = m.deps.filter(registered).map(d => level(d) + 1)
        .foldLeft(0)(math.max)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      var results = Map.empty[String, DataFrame]
      def resolve(n: String): DataFrame = results.getOrElse(n, wh.read(n))
      models.groupBy(m => level(m.name)).toSeq.sortBy(_._1).foreach {
        case (_, wave) =>
          val done = Future.sequence(wave.map { m =>
            val deps = m.deps.map(d => d -> resolve(d)).toMap
            Future(m.name -> materialize(spark, wh, m, deps, runId, auditTable))
          })
          results ++= Await.result(done, Duration.Inf).toMap
      }
      results
    } finally pool.shutdown()
  }
}
