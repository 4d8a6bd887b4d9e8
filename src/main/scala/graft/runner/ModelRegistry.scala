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
    def exists(name: String): Boolean =
      new org.apache.hadoop.fs.Path(path(name)).getFileSystem(
        spark.sparkContext.hadoopConfiguration).exists(
        new org.apache.hadoop.fs.Path(path(name)))
    def read(name: String): DataFrame = spark.read.parquet(path(name))
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

  /** Run the registry: resolves deps (registry outputs or warehouse
    * sources), applies materializations, appends one audit row per
    * model (job_name, run_id, status, start/end, rows_processed —
    * the `ETL_AUDIT_LOG` shape). Returns materialized DataFrames. */
  def run(
      spark: SparkSession,
      wh: Warehouse,
      models: Seq[Model],
      runId: String,
      auditTable: Option[String] = Some("etl_audit_log")): Map[String, DataFrame] = {
    import spark.implicits._
    var results = Map.empty[String, DataFrame]
    def resolve(n: String): DataFrame =
      results.getOrElse(n, wh.read(n))

    topoOrder(models).foreach { m =>
      val t0 = System.currentTimeMillis()
      val deps = m.deps.map(d => d -> resolve(d)).toMap
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
      results += m.name -> out

      auditTable.foreach { at =>
        val n = out.count()
        val audit = Seq((m.name, runId, "SUCCESS",
            new java.sql.Timestamp(t0),
            new java.sql.Timestamp(System.currentTimeMillis()), n))
          .toDF("job_name", "run_id", "status", "start_time", "end_time",
            "rows_processed")
        wh.append(at, audit)
      }
    }
    results
  }
}
