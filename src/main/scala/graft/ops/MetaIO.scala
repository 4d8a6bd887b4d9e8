package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Driver-side parquet schema resolution for the table-format
  * protocol's many tiny reads.
  *
  * Every `spark.read.parquet(dir)` without an explicit schema launches
  * a one-task Spark JOB just to read a footer (schema inference).
  * The protocol's lifecycles pay that job dozens of times per
  * operation — measured: 12 of q234's 32 jobs, ~25 ms each plus the
  * same again in driver-side planning (guide §1.2 "per-task work",
  * §7.3 driver-side work). A committed version dir is IMMUTABLE
  * (unique `d<v>-<uuid>` name, files never rewritten in place), so
  * its physical schema can be resolved ONCE, on the driver, straight
  * from the first footer — exact, never guessed — and memoized for
  * the session. At 100 TB the same move matters more, not less: the
  * footer read is one ranged read of one file vs a scheduled task.
  */
object MetaIO {
  /** (absolute first-file path) → converted Spark schema. Keyed by the
    * FILE path (not the dir), so a dir whose listing changes (never
    * happens for committed dirs; defensive) re-resolves. Weak-keyed
    * per session via [[graft.SessionMemo]] so a stopped session frees
    * its entries. */
  private val schemaMemo = new graft.SessionMemo[StructType]()

  /** The physical Spark schema of the parquet file at `file`,
    * resolved on the driver (no Spark job). Honors the session's
    * nanosAsLong/int96/binary-as-string posture exactly as scan-time
    * inference would (same converter, same conf). */
  def footerSchema(spark: SparkSession, file: Path,
      conf: Configuration): StructType = {
    val sqlConf = spark.sessionState.conf
    val converter =
      new org.apache.spark.sql.execution.datasources.parquet
        .ParquetToSparkSchemaConverter(conf = sqlConf)
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      conf, file,
      org.apache.parquet.format.converter.ParquetMetadataConverter
        .NO_FILTER)
    converter.convert(footer.getFileMetaData.getSchema)
  }

  /** First data file of `dir` (non-underscore, non-dot), if any. */
  private def firstDataFile(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Option[Path] =
    fs.listStatus(dir).iterator
      .map(_.getPath)
      .filter(p => { val n = p.getName
        !n.startsWith("_") && !n.startsWith(".") })
      .toSeq.sortBy(_.getName).headOption

  /** Session-memoized schema of the parquet tree at `path` (a version
    * data dir, a metadata frame dir like `_dv`/`_stats`/`_bloom`, or
    * a single file). Resolution cost: one driver footer read the
    * first time, a map hit after. Returns None when the dir has no
    * data file yet (caller falls back to a plain inferring read). */
  def schemaOf(spark: SparkSession, path: Path): Option[StructType] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = path.getFileSystem(conf)
    val st = try fs.getFileStatus(path) catch {
      case _: java.io.FileNotFoundException => return None
    }
    val file =
      if (st.isFile) Some(path) else firstDataFile(fs, path)
    file.map { f =>
      schemaMemo.getOrElseUpdate(spark, f.toString,
        footerSchema(spark, f, conf))
    }
  }

  /** `spark.read.parquet(path)` with the schema pre-resolved on the
    * driver — behaviourally identical (same converter, same conf),
    * minus the inference job. Falls back to the inferring read when
    * the footer can't be resolved (empty dir). */
  def readParquet(spark: SparkSession, path: String)
      : org.apache.spark.sql.DataFrame =
    schemaOf(spark, new Path(path)) match {
      case Some(s) => spark.read.schema(s).parquet(path)
      case None => spark.read.parquet(path)
    }

  /** Multi-path form: resolves the schema from the FIRST path's
    * footer (the protocol guarantees ref sets share one physical
    * schema unless a version pins `_schema`, in which case callers
    * pass that instead and never reach here). */
  def readParquet(spark: SparkSession, paths: Seq[String])
      : org.apache.spark.sql.DataFrame =
    if (paths.isEmpty) spark.read.parquet(paths: _*)
    else schemaOf(spark, new Path(paths.head)) match {
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
}
