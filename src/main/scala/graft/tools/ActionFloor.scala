// Fixed per-action driver cost: time batches of trivial actions so the
// planning floor (Catalyst + AQE + injected rules) is measurable.
// SPARK_GRAFT_NO_EXT=1 skips the Graft extensions for an A/B.
// Run: sbt -batch "runMain graft.tools.ActionFloor"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ActionFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.ops.FastLocalFileSystem].getName)
    val spark = (if (sys.env.contains("SPARK_GRAFT_NO_EXT")) b
      else b.withExtensions(new graft.expressions.GraftExtensions))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_af_").toString
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$tmp/t")
    def bench(name: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"FLOOR $name%-34s ${dt / n * 1000}%8.2f ms/action")
    }
    bench("local_count", 20)(
      spark.range(100).count(): Unit)
    bench("parquet_count", 20)(
      spark.read.parquet(s"$tmp/t").count(): Unit)
    bench("parquet_schema_read_count", 20) {
      val df = graft.ops.MetaIO.readParquet(spark, s"$tmp/t")
      df.count(): Unit
    }
    bench("parquet_filter_agg", 20) {
      val df = graft.ops.MetaIO.readParquet(spark, s"$tmp/t")
      df.filter($"k" > 10).agg(sum($"k")).head(): Unit
    }
    bench("groupby_agg_count", 20) {
      val df = graft.ops.MetaIO.readParquet(spark, s"$tmp/t")
      df.groupBy($"v").agg(count(lit(1))).count(): Unit
    }
    bench("tiny_write", 20) {
      val d = java.nio.file.Files.createTempDirectory("graft_afw_")
      (1 to 10).map(i => (i, s"x$i")).toDF("a", "b")
        .coalesce(1).write.parquet(s"$d/out")
    }
    spark.stop()
  }
}
