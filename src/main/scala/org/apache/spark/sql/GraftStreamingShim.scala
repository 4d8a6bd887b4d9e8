package org.apache.spark.sql

/** The ONE compatibility shim this engine keeps inside Spark's
  * namespace, and why it must live here: a DSv1 streaming `Source`'s
  * `getBatch` result must carry `isStreaming = true` on its logical
  * plan — `MicroBatchExecution` asserts exactly that ("DataFrame
  * returned by getBatch … did not have isStreaming=true") — and the
  * only way to mint such a frame is
  * `SparkSession.internalCreateDataFrame(rdd, schema,
  * isStreaming = true)`, which is `private[sql]`. Spark's own v1
  * sources (FileStreamSource, the old Kafka source) call it from
  * inside the package; every out-of-tree v1 source uses this same
  * package-placement pattern. Nothing else of Spark's internals is
  * touched: the input is a fully planned batch DataFrame (the change
  * feed's distributed join), and the output is the same plan behind a
  * streaming-tagged `LogicalRDD`.
  *
  * Why DSv1 at all: the graft change feed is a DISTRIBUTED two-sided
  * diff ([[graft.ops.ManifestTable.changes]]) — v1's
  * `getBatch: DataFrame` lets the source return that plan as-is,
  * executors and all. DSv2's `PartitionReader` contract would force
  * either a driver-side collect of the feed (the anti-pattern this
  * engine bans) or re-materializing every batch to scratch files;
  * Delta's streaming source made the same v1 choice for years for the
  * same reason. */
object GraftStreamingShim {

  /** Re-tag a fully planned batch DataFrame as a streaming batch
    * result: same rows, same schema, `isStreaming = true`. */
  def asStreaming(df: DataFrame): DataFrame = {
    val cd = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cd.sparkSession.internalCreateDataFrame(
      cd.queryExecution.toRdd, cd.schema, isStreaming = true)
  }
}
