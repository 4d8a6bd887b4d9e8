// Phase-level timing for mergeDV at scale: which term dominates —
// the find-positions scan, the checkpoint, the kernel, or the writes?
// Run: SPARK_GRAFT_SF_DIR=target/scale100 \
//   sbt -batch "runMain graft.tools.DvMergeProbe"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DvMergeProbe {
  def main(args: Array[String]): Unit = {
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime - t0) / 1e9}%8.3f s")
      r
    }
    val base = java.nio.file.Files
      .createTempDirectory("graft_dvprobe_").toString
    val target = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    val root = s"$base/t"
    time("commit")(ManifestTable.commit(target, root))
    def slice(p: Long) = target
      .filter(col("o_custkey") % p === 0L)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    // phase probes against the committed files directly
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val d1 = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).find(_.startsWith("d1-")).get
    val src = slice(101L)
    time("src_distinct_keys_count")(
      src.select("o_orderkey").distinct().count())
    val tagged = spark.read.parquet(s"$root/$d1")
      .withColumn("__path",
        substring_index(col("_metadata.file_path"), "/", -2))
      .withColumn("__ri", col("_metadata.row_index"))
    time("plain_scan_count")(
      spark.read.parquet(s"$root/$d1").count())
    time("tagged_scan_count")(tagged.count())
    val matched0 = tagged.join(
      src.select("o_orderkey").distinct(), Seq("o_orderkey"),
      "left_semi")
    time("semi_join_count")(matched0.count())
    val matchedB = tagged.join(
      broadcast(src.select("o_orderkey").distinct()),
      Seq("o_orderkey"), "left_semi")
    val matchedBC = time("checkpoint_bcast_hint")(
      matchedB.localCheckpoint())
    time("bcast_checkpointed_count")(matchedBC.count())
    val matched = time("checkpoint")(matched0.localCheckpoint())
    val post = graft.ops.Upsert.upsert(
      matched.drop("__path", "__ri"), src, Seq("o_orderkey"))
    time("kernel_write")(post.write.parquet(s"$base/post"))
    time("dv_write")(matched
      .select(col("__path").as("path"), col("__ri").as("row_index"))
      .repartition(1).write.parquet(s"$base/dv"))
    // and the end-to-end op for reference
    time("mergeDV_e2e")(
      ManifestTable.mergeDV(spark, root, slice(103L),
        Seq("o_orderkey")))
    time("merge_cow_e2e")(
      ManifestTable.merge(spark, root, slice(107L),
        Seq("o_orderkey")))
    spark.stop()
  }
}
