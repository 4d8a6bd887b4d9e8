package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** Scan/source operators of SURVEY §2.1, Spark-first.
  *
  * The reference lands REST/CDC payloads as JSON/CSV files on S3 and
  * bulk-loads them (`COPY INTO`, stage SELECTs with `$1..$9` positional
  * columns and `metadata$...` virtual columns); here the engine starts
  * at the landed files: `spark.read` with option parity, Catalyst does
  * pushdown/pruning from there.
  */
object Readers {

  /** S3: COPY INTO (JSON) analog — schema'd JSON load of a file glob
    * (`dags/2_logistics-shipment-dag.py:82-86`). FAILFAST mirrors
    * ON_ERROR='ABORT_STATEMENT' (the COPY default). */
  def json(spark: SparkSession, glob: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(glob)

  /** S4: COPY INTO ... ON_ERROR='SKIP_FILE'-adjacent — PERMISSIVE read
    * routing unparseable records to a corrupt column; returns
    * (valid, corrupt) like the valid/error split P5
    * (`dags/4_logistics_ticket_classifier_full_dag.py:173-178`).
    * One cached scan feeds both branches (SURVEY §4). */
  def jsonWithErrors(spark: SparkSession, glob: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(glob)
      .cache()
    (raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      raw.filter(col("_corrupt_record").isNotNull))
  }

  /** S5/S7: CSV with the Snowpark reader's option surface
    * (`dags/snowspark-dataframe-ETL.py:26-35`): field_delimiter → sep,
    * skip_header → header, field_optionally_enclosed_by → quote,
    * null_if → nullValue, trim_space → ignore*WhiteSpace; plus
    * pathGlobFilter for COPY's PATTERN. */
  def csv(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      sep: String = ",",
      header: Boolean = true,
      quote: String = "\"",
      nullValue: String = "",
      trimSpace: Boolean = true,
      pattern: Option[String] = None): DataFrame = {
    var r = spark.read
      .option("sep", sep)
      .option("header", header)
      .option("quote", quote)
      .option("nullValue", nullValue)
      .option("ignoreLeadingWhiteSpace", trimSpace)
      .option("ignoreTrailingWhiteSpace", trimSpace)
    r = schema.map(r.schema).getOrElse(r.option("inferSchema", true))
    pattern.foreach(p => r = r.option("pathGlobFilter", p))
    r.csv(path)
  }

  /** S6: direct stage SELECT — headerless positional columns `$1..$n`
    * (as c1..cn) plus the metadata virtual columns of
    * `dags/snowflake-EDW-ETL-dag.py:74-96`:
    * metadata$FILENAME → file_name, metadata$FILE_LAST_MODIFIED →
    * file_last_modified, metadata$FILE_ROW_NUMBER → file_row_number,
    * metadata$FILE_CONTENT_KEY → file_content_key — GENUINELY
    * content-derived (md5 of the file bytes via a binaryFile side-scan,
    * broadcast-joined per file): same bytes ⇒ same key, any byte change
    * ⇒ new key, matching Snowflake's content-key semantics even for
    * same-size in-place overwrites within mtime granularity. The extra
    * read is one pass over the stage files — stage drops are KB–MB
    * landing files (the reference's are KB), not warehouse tables.
    * Dropping the column does NOT eliminate the side-scan (Spark has
    * no left-join elimination); a deployment that cannot afford it
    * should derive keys at upload time, as Snowflake itself does.
    *
    * file_row_number: 1-based position within the source file, from a
    * window over (file, monotonically_increasing_id). Row order within
    * a split is the file order and ids are ascending per split, but a
    * file big enough to be SPLIT across partitions interleaves — so
    * callers loading huge single files should raise
    * `spark.sql.files.maxPartitionBytes` (the reference's stage files
    * are KB-sized; at 100 TB you have many files, not one giant file). */
  def stageSelect(spark: SparkSession, path: String, nCols: Int,
      sep: String = ","): DataFrame = {
    val contentKeys = spark.read.format("binaryFile").load(path)
      .select(col("path").as("file_name"),
        md5(col("content")).as("file_content_key"))
    val raw = spark.read
      .option("sep", sep).option("header", false)
      .csv(path)
      .select((0 until nCols).map(i => col(s"_c$i").as(s"c${i + 1}")) ++ Seq(
        col("_metadata.file_path").as("file_name"),
        col("_metadata.file_modification_time").as("file_last_modified")): _*)
    raw
      .join(broadcast(contentKeys), Seq("file_name"), "left")
      .withColumn("file_row_number",
        row_number().over(Window.partitionBy(col("file_name"))
          .orderBy(monotonically_increasing_id())))
      .select((0 until nCols).map(i => col(s"c${i + 1}")) ++ Seq(
        col("file_name"), col("file_last_modified"),
        col("file_content_key"), col("file_row_number")): _*)
  }

  /** S10: dbt seed — header CSV, all-string schema unless given
    * (`dbt/dbt-project/seeds/control_table.csv`). */
  def seed(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, header = true)

  /** S17: stage file-presence short-circuit
    * (`dags/utils/check_files.py:19-45`): any files matching the glob? */
  def stageHasFiles(spark: SparkSession, glob: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(glob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.globStatus(p)
    st != null && st.nonEmpty
  }

  /** S16: archive-and-clean (`dags/utils/aws_utils.py:41-73`): move
    * every file under `srcDir` matching `suffix` to
    * `archiveDir/<stamp>/`, removing the originals. */
  def archiveFiles(spark: SparkSession, srcDir: String, archiveDir: String,
      stamp: String, suffix: String = ""): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val fs = src.getFileSystem(conf)
    if (!fs.exists(src)) return 0
    val dst = new org.apache.hadoop.fs.Path(s"$archiveDir/$stamp")
    fs.mkdirs(dst)
    val files = fs.listStatus(src).filter(s =>
      s.isFile && s.getPath.getName.endsWith(suffix))
    files.foreach { s =>
      fs.rename(s.getPath,
        new org.apache.hadoop.fs.Path(dst, s.getPath.getName))
    }
    files.length
  }
}
