// Phase-level timing of ONE mergeBatchDV against an existing
// endurance table (args: tableRoot) — isolates whether the streaming
// sink's per-batch wall is the merge itself or the wrapper. Run:
//   SPARK_GRAFT_SF_DIR=target/scale100 \
//     sbt -batch "runMain graft.tools.MorBatchProbe /tmp/.../tbl"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object MorBatchProbe {
  def main(args: Array[String]): Unit = {
    val root = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.ops.FastLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.ManifestTable
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime - t0) / 1e9}%8.3f s")
      r
    }
    val cur = ManifestTable.currentVersion(spark, root).get
    val refs = ManifestTable.versionFileRefs(spark, root, cur)
    println(s"PROBE version=$cur files=${refs.map(_.size).getOrElse(1)}")
    // a static 2000-row batch: 80% real-key updates, 20% inserts
    val table = ManifestTable.read(spark, root).get
    val keys = table.select("o_orderkey").orderBy("o_orderkey")
      .limit(2000).localCheckpoint()
    val batch = keys
      .withColumn("o_custkey", col("o_orderkey") % 100000L)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", lit(1.0))
      .localCheckpoint()
    time("read_table_count")(table.count())
    time("mergeBatchDV_cold")(
      ManifestTable.mergeBatchDV(spark, root, batch,
        Seq("o_orderkey"), s"probe-${System.nanoTime()}"))
    time("mergeBatchDV_warm")(
      ManifestTable.mergeBatchDV(spark, root,
        batch.withColumn("o_totalprice", lit(2.0)),
        Seq("o_orderkey"), s"probe-${System.nanoTime()}"))
    time("mergeBatchDV_warm2")(
      ManifestTable.mergeBatchDV(spark, root,
        batch.withColumn("o_totalprice", lit(3.0)),
        Seq("o_orderkey"), s"probe-${System.nanoTime()}"))
    spark.stop()
  }
}
