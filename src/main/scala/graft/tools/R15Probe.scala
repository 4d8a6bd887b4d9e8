// Round-15 scale probes:
//  (a) ROW-COUNT-SCALED BLOOM REGISTERS: the round-14 geometry (fixed
//      8192 bits/file) saturated at ~2.3k keys/file — 627/640 files
//      opened on a point probe at 100×. Scaled registers
//      (m = max(8192, 8·n_rows)) must keep the point probe at a few
//      percent of files at ANY file size; the probe itself is an
//      O(register rows) metadata scan (the Delta bloom-sidecar grain).
//  (b) RUNTIME WATERMARK PRUNING: `o_month > (SELECT MAX(…) FROM wm)`
//      as plain SQL text must open O(matching) files at 1× and 100× —
//      the subquery is evaluated once at plan time and pinned.
//  (c) DPP ANALOG: a broadcast-small dim filtered join on the
//      partition column must open only the dim's partitions' files.
//  (d) WIDENED PREDICATES: OR-of-partition-equalities and a 40-key
//      Bloom IN (one register pass) prune too.
// Run:
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.tools.R15Probe"
//   SPARK_GRAFT_SF_DIR=target/scale100     sbt -batch "runMain graft.tools.R15Probe"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object R15Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.ops.FastLocalFileSystem].getName)
      .withExtensions(new graft.expressions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ops.PartitionedTable
    import graft.plans.GraftPruneScans.scannedFiles
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROBE $name%-34s ${(System.nanoTime - t0) / 1e9}%8.3f s")
      r
    }
    val base = java.nio.file.Files
      .createTempDirectory("graft_r15probe_").toString
    val orders = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month"),
        col("o_orderkey").cast("string").as("o_okey"))
      .repartitionByRange(8, col("o_custkey"))
    val root = s"$base/fact"
    time("setup_commit+stats+scaled_bloom")(
      PartitionedTable.commitPartitioned(spark, root, orders,
        "o_month", statsCols =
          Some(("o_custkey", "o_orderkey", Some("o_okey")))))
    val total = PartitionedTable.parts(spark, root, 1L).count()
    val rowsPerFile = graft.ops.ZTable.stats(spark, root, 1L)
      .agg(max(col("n_rows"))).as[Long].head()
    println(s"PROBE   files=$total max_rows/file=$rowsPerFile")
    def sql(where: String) = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$root') WHERE $where")

    // ---- (a) scaled Bloom point probes ----
    val b1 = time("bloom_point_cold")(sql("o_okey = '777'"))
    println(s"PROBE   bloom point files            " +
      s"${scannedFiles(b1)}/$total")
    time("bloom_point_cold_count")(b1.count())
    val b2 = time("bloom_point_warm")(sql("o_okey = '424242'"))
    println(s"PROBE   bloom point files 2          " +
      s"${scannedFiles(b2)}/$total")
    time("bloom_point_warm_count")(b2.count())
    // 40-key IN: ONE register pass for the whole list
    val inKeys = (1 to 40).map(i => s"'${i * 101}'").mkString(", ")
    val bIn = time("bloom_in40")(sql(s"o_okey IN ($inKeys)"))
    println(s"PROBE   bloom IN-40 files            " +
      s"${scannedFiles(bIn)}/$total")
    time("bloom_in40_count")(bIn.count())

    // ---- (b) runtime watermark subquery ----
    // testdata orders span 1995-01..2001-08 — a late watermark makes
    // the incremental cut selective (the daily-load shape)
    Seq("2001-03").toDF("wm").createOrReplaceTempView("r15_wm")
    val wm = time("watermark_subquery_cut")(
      sql("o_month > (SELECT max(wm) FROM r15_wm)"))
    println(s"PROBE   watermark files              " +
      s"${scannedFiles(wm)}/$total")
    time("watermark_subquery_count")(wm.count())

    // ---- (c) DPP analog: dim-filtered join on the partition col ----
    Seq(("1995-03", "hot"), ("1995-07", "hot"), ("1995-11", "cold"))
      .toDF("mth", "tier").createOrReplaceTempView("r15_dim")
    val dpp = time("dpp_dim_join_cut")(spark.sql(
      s"""SELECT count(*) AS n FROM graft_table('$root') f
         |JOIN r15_dim d ON f.o_month = d.mth
         |WHERE d.tier = 'hot'""".stripMargin))
    println(s"PROBE   dpp join files               " +
      s"${scannedFiles(dpp)}/$total")
    time("dpp_dim_join_count")(dpp.count())

    // ---- (d) OR of partition equalities ----
    val or = time("or_partition_cut")(
      sql("o_month = '1995-06' OR o_month = '1996-01'"))
    println(s"PROBE   OR cut files                 " +
      s"${scannedFiles(or)}/$total")
    time("or_partition_count")(or.count())
    spark.stop()
  }
}
