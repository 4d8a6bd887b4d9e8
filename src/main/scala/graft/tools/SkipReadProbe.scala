// Read-half scaling probe for committed data skipping (round-11
// VERDICT ask #7): materialize the z-ordered layout + committed stats
// ONCE (untimed — the write half's scaling story lives with the
// optimize lifecycle), then time ONLY the read path — resolve the
// version, collect the O(files) stats, prune, scan the surviving
// files, aggregate. Pruning effectiveness should IMPROVE with scale
// (file count grows, the predicate's intersecting fraction shrinks),
// so the read half is expected SUB-linear.
//
// Run:
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
//     sbt -batch "runMain graft.tools.SkipReadProbe"
//   SPARK_GRAFT_SF_DIR=/root/repo/target/scale100 SPARK_GRAFT_NFILES=1600 \
//     sbt -batch "runMain graft.tools.SkipReadProbe"
// (nFiles scales with data so FILE SIZE stays constant — the real
// knob at 100 TB; default 16 matches q224's registered shape.)
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object SkipReadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.ops.FastLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_NFILES", "16").toInt
    val root = java.nio.file.Files
      .createTempDirectory("graft_skipread_").toString + "/tbl"
    val cut = lit("1999-01-01").cast("timestamp")
    val target = graft.Tables(spark, dir, "orders")
      .filter($"o_orderdate" < cut)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_totalprice",
        (datediff($"o_orderdate".cast("date"), lit("1995-01-01")) % 32)
          .cast("long").as("o_day_slot"))
    // ---- untimed write half: the one-off layout+stats commit ----
    graft.ops.ManifestTable.commit(target, root)
    graft.ops.ZTable.optimizeZOrder(spark, root, "o_custkey",
      "o_day_slot", "o_orderkey", nFiles = nFiles)
    val total = graft.ops.ZTable.stats(spark, root, 2L).count()
    // custkey window sized to a CONSTANT fraction of the key domain
    // (~0.33%), so the probe measures the same selectivity per scale
    val hiKey = target.agg(max($"o_custkey")).head().getLong(0)
    val (lo, hi) = (hiKey / 3, hiKey / 3 + math.max(hiKey / 300, 1L))
    // ---- timed read half ----
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val scan = graft.ops.ZTable.scanXRange(spark, root, lo, hi)
      val read = scan.inputFiles.length
      val r = scan.agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,6)")).cast("double"))
        .head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE skip_read iter=$i $dt%8.2f s  files=$read/$total" +
        f"  rows=${r.getLong(0)}")
    }
    spark.stop()
  }
}
