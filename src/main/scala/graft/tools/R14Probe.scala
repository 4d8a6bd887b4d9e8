// Round-14 scale probes:
//  (a) PREDICATE-DRIVEN PRUNING from SQL text (GraftPruneScans): on a
//      partitioned + stats + Bloom table, the SAME spark.sql statement
//      must open O(matching) files at 1× and 100× — planning is one
//      cached O(files) metadata load + set intersection, never data;
//  (b) PARTITIONED MoR DML: a MERGE/UPDATE into a date-partitioned
//      fact keeps `_parts` alive (fragments partition-pure), so the
//      one-partition read stays O(one-partition) AFTER the DML — the
//      reference's daily-silver shape at 100 TB;
//  (c) SQL INSERT INTO (ManifestTable.append): O(batch) — base files
//      carried by reference, wall must stay ~flat as the table grows.
// Run:
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.tools.R14Probe"
//   SPARK_GRAFT_SF_DIR=target/scale100     sbt -batch "runMain graft.tools.R14Probe"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object R14Probe {
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
    import graft.ops.{ManifestTable, PartitionedTable}
    import graft.plans.GraftPruneScans.scannedFiles
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROBE $name%-34s ${(System.nanoTime - t0) / 1e9}%8.3f s")
      r
    }
    val base = java.nio.file.Files
      .createTempDirectory("graft_r14probe_").toString
    val orders = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month"),
        col("o_orderkey").cast("string").as("o_okey"))
      .repartitionByRange(8, col("o_custkey"))
    val batch = graft.Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-09-01").cast("timestamp")
        && col("o_orderdate") < lit("1995-10-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month"),
        col("o_orderkey").cast("string").as("o_okey"))
      .localCheckpoint() // pre-materialized: probe the WRITE, not the scan

    // ---- (a) predicate-driven pruning from SQL text ----
    val root = s"$base/fact"
    time("setup_commit_partitioned+stats")(
      PartitionedTable.commitPartitioned(spark, root, orders,
        "o_month", statsCols =
          Some(("o_custkey", "o_orderkey", Some("o_okey")))))
    val total = PartitionedTable.parts(spark, root, 1L).count()
    def sql(where: String) = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$root') WHERE $where")
    // first query pays the one-time O(files) metadata load (cached)
    val part1 = time("sql_partition_cut_cold")(
      sql("o_month = '1996-03'"))
    println(s"PROBE   partition cut files          " +
      s"${scannedFiles(part1)}/$total")
    time("sql_partition_cut_count")(part1.count())
    val part2 = time("sql_partition_cut_warm")(
      sql("o_month = '1996-04'"))
    time("sql_partition_cut_warm_count")(part2.count())
    val range = time("sql_range_cut")(
      sql("o_custkey BETWEEN 100 AND 220"))
    println(s"PROBE   range cut files              " +
      s"${scannedFiles(range)}/$total")
    time("sql_range_cut_count")(range.count())
    val combo = time("sql_combo_cut")(
      sql("o_month = '1996-03' AND o_custkey BETWEEN 100 AND 220"))
    println(s"PROBE   combo cut files              " +
      s"${scannedFiles(combo)}/$total")
    time("sql_combo_cut_count")(combo.count())
    val bloom = time("sql_bloom_point_key")(
      sql("o_okey = '777'"))
    println(s"PROBE   bloom point-key files        " +
      s"${scannedFiles(bloom)}/$total")
    time("sql_bloom_point_key_count")(bloom.count())
    // the reference's gold date-cut shapes: partition RANGE (string
    // order, exact) and LIKE prefix — both prune off `_parts` alone
    val pr = time("sql_partition_range_cut")(
      sql("o_month >= '1995-07' AND o_month < '1996-04'"))
    println(s"PROBE   partition range files        " +
      s"${scannedFiles(pr)}/$total")
    time("sql_partition_range_count")(pr.count())
    val lk = time("sql_partition_like_cut")(
      sql("o_month LIKE '1996-%'"))
    println(s"PROBE   partition LIKE files         " +
      s"${scannedFiles(lk)}/$total")
    time("sql_partition_like_count")(lk.count())

    // ---- (b) partitioned MoR DML keeps pruning ----
    time("mergeDV_into_partitioned")(ManifestTable.mergeDV(spark, root,
      batch.withColumn("o_totalprice", col("o_totalprice") * 2),
      Seq("o_orderkey")))
    time("updateWhereDV_partitioned")(ManifestTable.updateWhereDV(
      spark, root, col("o_month") === "1995-03",
      Map("o_totalprice" -> (col("o_totalprice") + 1))))
    val v = ManifestTable.currentVersion(spark, root).get
    val totalAfter = PartitionedTable.parts(spark, root, v).count()
    val one = time("read_one_partition_post_DML")(
      PartitionedTable.readPartitions(spark, root, Seq("1995-09")))
    println(s"PROBE   post-DML partition files     " +
      s"${one.inputFiles.count(!_.contains("/_"))}/$totalAfter")
    time("read_one_partition_count")(one.count())
    // the SQL cut prunes the post-DML version too (fresh file set,
    // fresh registration, fresh metadata)
    val postSql = time("sql_partition_cut_post_DML")(
      sql("o_month = '1995-09'"))
    println(s"PROBE   post-DML sql cut files       " +
      s"${scannedFiles(postSql)}/$totalAfter")
    time("sql_partition_cut_post_count")(postSql.count())

    // ---- (c) SQL INSERT INTO = O(batch) append ----
    batch.createOrReplaceTempView("r14_batch")
    time("sql_insert_into_O(batch)")(spark.sql(
      s"""INSERT INTO graft.`$root`
         |SELECT o_orderkey + 900000000, o_custkey, o_totalprice,
         |       o_month, o_okey FROM r14_batch""".stripMargin))
    time("full_read_after_all")(
      ManifestTable.read(spark, root).get.count())
    spark.stop()
  }
}
