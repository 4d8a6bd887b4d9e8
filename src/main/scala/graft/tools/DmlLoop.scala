// Loop MoR updates on one table so driver hotspots can be sampled
// (jstack) and the per-op wall measured in isolation.
// Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.tools.DmlLoop 30"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DmlLoop {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.ops.FastLocalFileSystem].getName)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions)
    // A/B knob: SPARK_GRAFT_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import spark.implicits._
    import graft.ops.{ManifestTable, ZTable}
    val orders = graft.Tables(spark, dir, "orders")
    val target = orders.limit(200000)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_totalprice")
    val root = java.nio.file.Files
      .createTempDirectory("graft_dml_").toString + "/t"
    ManifestTable.commit(target.coalesce(4), root)
    ZTable.optimizeZOrder(spark, root, "o_orderkey", "o_custkey",
      "o_orderkey", nFiles = 8)
    // warm
    ManifestTable.updateWhereDV(spark, root, $"o_custkey" % 997 === 0,
      Map("o_totalprice" -> $"o_totalprice" * 2))
    val t0 = System.nanoTime()
    (1 to n).foreach { i =>
      ManifestTable.updateWhereDV(spark, root,
        $"o_custkey" % 997 === i,
        Map("o_totalprice" -> $"o_totalprice" * 2))
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"DMLLOOP $n updates in ${dt}%.2f s = ${dt / n * 1000}%.0f ms/op")
    spark.stop()
  }
}
