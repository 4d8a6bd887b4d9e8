// Round-13 scale probes:
//  (a) MoR writes WITH committed-stats extension vs on a stats-less
//      base — the extendStats overhead is O(appended bytes), so the
//      delta must stay ~flat as the TABLE grows 100×;
//  (b) the partitioned manifest store — commit (O(n) + O(files)
//      renames), pruned one-partition read (O(one-partition)), append
//      (O(batch)), partition drop (O(metadata)), scoped delete
//      (O(one-partition)).
// Run:
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.tools.R13Probe 16"
//   SPARK_GRAFT_SF_DIR=target/scale100     sbt -batch "runMain graft.tools.R13Probe 1600"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object R13Probe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.ops.FastLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{ManifestTable, PartitionedTable, ZTable}
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROBE $name%-30s ${(System.nanoTime - t0) / 1e9}%8.3f s")
      r
    }
    val base = java.nio.file.Files
      .createTempDirectory("graft_r13probe_").toString
    val orders = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
    val cut = lit("1995-09-01").cast("timestamp")
    val batch = graft.Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= cut &&
        col("o_orderdate") < lit("1995-10-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), date_format(col("o_orderdate"), "yyyy-MM")
          .as("o_month"))
      .localCheckpoint() // pre-materialized: probe the WRITE, not the scan

    // ---- (a) MoR merge with stats extension vs stats-less base ----
    val zroot = s"$base/ztbl"
    time("setup_commit_O(n)")(ManifestTable.commit(
      orders.drop("o_month"), zroot))
    time("setup_zorder_O(n)")(ZTable.optimizeZOrder(spark, zroot,
      "o_orderkey", "o_custkey", "o_orderkey", nFiles = nFiles,
      bloomCol = Some("o_orderstatus")))
    val plainRoot = s"$base/ptbl_nostats"
    time("setup_plain_commit")(ManifestTable.commit(
      orders.drop("o_month"), plainRoot))
    val b4 = batch.drop("o_month")
    time("mergeBatchDV_no_stats")(
      ManifestTable.mergeBatchDV(spark, plainRoot, b4,
        Seq("o_orderkey"), "r13-b0"))
    time("mergeBatchDV_with_stats")(
      ManifestTable.mergeBatchDV(spark, zroot, b4,
        Seq("o_orderkey"), "r13-b0"))
    time("mergeBatchDV_with_stats_2")(
      ManifestTable.mergeBatchDV(spark, zroot,
        b4.withColumn("o_totalprice", col("o_totalprice") * 2),
        Seq("o_orderkey"), "r13-b1"))
    // the payoff: the pruned scan after MoR commits, no re-optimize
    val scan = time("scanXRange_post_MoR")(
      ZTable.scanXRange(spark, zroot, 0L, 5000L))
    println(s"PROBE   scan files opened/total    " +
      s"${scan.inputFiles.length}/" +
      s"${ManifestTable.versionFileRefs(spark, zroot,
        ManifestTable.currentVersion(spark, zroot).get).get.size}")
    time("scanXRange_count")(scan.count())

    // ---- (b) the partitioned store ----
    val proot = s"$base/ptbl"
    time("partitioned_commit_O(n)")(
      PartitionedTable.commitPartitioned(spark, proot, orders, "o_month"))
    val total = PartitionedTable.parts(spark, proot, 1L).count()
    val one = time("read_one_partition")(
      PartitionedTable.readPartitions(spark, proot, Seq("1996-03")))
    println(s"PROBE   partition files opened/total  " +
      s"${one.inputFiles.length}/$total")
    time("read_one_partition_count")(one.count())
    time("append_partitioned_O(batch)")(
      PartitionedTable.appendPartitioned(spark, proot,
        batch.withColumn("o_orderkey", col("o_orderkey") + 100000000L)))
    time("drop_partitions_O(meta)")(
      PartitionedTable.dropPartitions(spark, proot,
        Seq("1995-01", "1995-02")))
    time("scoped_delete_one_partition")(
      PartitionedTable.deleteWhereInPartitions(spark, proot,
        Seq("1996-05"), col("o_custkey") % 3 === 0))
    time("full_read_after_dml")(
      ManifestTable.read(spark, proot).get.count())
    spark.stop()
  }
}
