// Scale probe for the O(metadata) table-management ops: cloneShallow,
// convertInPlace, history, versionAsOf. The claim under test is that
// their wall time tracks FILE/VERSION count, never row count — so at
// 100× data (same file size, 100× files) they grow ≲100× on pure
// metadata terms, and at 100× data with the SAME file count they are
// flat. Run:
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
//     sbt -batch "runMain graft.tools.MetaProbe 16"
//   SPARK_GRAFT_SF_DIR=target/scale100 \
//     sbt -batch "runMain graft.tools.MetaProbe 1600"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object MetaProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(16)
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
    import graft.ops.{ManifestTable, ZTable}
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime - t0) / 1e9}%8.3f s")
      r
    }
    val base = java.nio.file.Files
      .createTempDirectory("graft_metaprobe_").toString
    val target = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        (datediff(col("o_orderdate").cast("date"), lit("1995-01-01")) % 32)
          .cast("long").as("o_day_slot"))
    val src = s"$base/src"
    // setup (row-scaled, untimed for the headline): commit + layout
    time("setup_commit_O(n)")(ManifestTable.commit(target, src))
    time("setup_zorder_O(n)")(ZTable.optimizeZOrder(spark, src,
      "o_custkey", "o_day_slot", "o_orderkey", nFiles = nFiles))
    // the O(metadata) ops under test
    time("clone_shallow")(
      ManifestTable.cloneShallow(spark, src, s"$base/cl"))
    // convert probes the REAL landing-dir cost (an O(files) listing +
    // one manifest write): hard-link the z-ordered version's files
    // into a fresh root (setup, untimed) and convert THAT
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val zdir = fs.listStatus(new org.apache.hadoop.fs.Path(src))
      .map(_.getPath.getName).find(_.startsWith("d2-")).get
    val convRoot = s"$base/conv2"
    fs.mkdirs(new org.apache.hadoop.fs.Path(convRoot))
    // hard-link the z-files into the convert root (setup, not timed)
    val rawDir = new org.apache.hadoop.fs.Path(convRoot, "raw")
    fs.mkdirs(rawDir)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$src/$zdir"))
      .filter(st => !st.getPath.getName.startsWith("_"))
      .foreach { st =>
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(rawDir.toUri.getPath,
            st.getPath.getName),
          java.nio.file.Paths.get(st.getPath.toUri.getPath))
      }
    time("convert_in_place")(
      ManifestTable.convertInPlace(spark, convRoot, "raw"))
    // merge-on-read vs copy-on-write DELETE, same predicate shape:
    // the DV commits O(deleted) positions, the CoW rewrites the table
    time("delete_dv_O(deleted)")(
      ManifestTable.deleteWhereDV(spark, src,
        col("o_custkey") % 97L === 0L))
    time("delete_cow_O(n)")(
      ManifestTable.deleteWhere(spark, src,
        col("o_custkey") % 89L === 0L))
    // merge-on-read vs copy-on-write MERGE, same ~1% source slice
    // (half updates, half inserts): the DV merge pays one
    // find-positions scan + an O(delta) append; the CoW merge
    // rewrites the whole version
    val delta = target
      .filter(col("o_custkey") % 101L === 0L)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderkey",
        when(col("o_custkey") % 202L === 0L,
          col("o_orderkey") + 4000000000L)
          .otherwise(col("o_orderkey")))
    def slice(p: Long) = target
      .filter(col("o_custkey") % p === 0L)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderkey",
        when(col("o_custkey") % (2 * p) === 0L,
          col("o_orderkey") + 4000000000L)
          .otherwise(col("o_orderkey")))
    time("merge_dv_O(delta)")(
      ManifestTable.mergeDV(spark, src, delta, Seq("o_orderkey")))
    time("merge_cow_O(n)")(
      ManifestTable.merge(spark, src, delta, Seq("o_orderkey")))
    // warm second iterations (distinct slices): the first DV merge
    // pays the upsert kernel's whole-stage codegen compile — the warm
    // rows are the steady-state costs a long-lived session sees
    time("merge_dv_warm")(
      ManifestTable.mergeDV(spark, src, slice(103L), Seq("o_orderkey")))
    time("merge_cow_warm")(
      ManifestTable.merge(spark, src, slice(107L), Seq("o_orderkey")))
    // REORG APPLY PURGE after a fresh range-scoped DV delete: dirty
    // files only — the clean carry is the flat term
    ManifestTable.deleteWhereDV(spark, src,
      col("o_orderkey") % 997L === 0L)
    time("reorg_purge")(ManifestTable.reorg(spark, src))
    // column mapping: metadata-only — flat at any scale
    time("rename_column_O(meta)")(
      ManifestTable.renameColumn(spark, src, "o_totalprice", "price"))
    time("drop_column_O(meta)")(
      ManifestTable.dropColumn(spark, src, "o_day_slot"))
    // a few more versions so history has something to walk
    ManifestTable.deleteWhere(spark, src, col("o_custkey") === -1L)
    ManifestTable.optimize(spark, src, targetFiles = nFiles)
    time("history")(ManifestTable.history(spark, src).count())
    time("version_as_of")(ManifestTable.versionAsOf(spark, src,
      System.currentTimeMillis()))
    spark.stop()
  }
}
