// Ad-hoc timing probe: time named queries (or expressions) one by one.
// Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.tools.Probe q63 q64"
package graft.tools

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.ops.FastLocalFileSystem].getName)
      // q241 drives table-format DML through spark.sql text
      .withExtensions(new graft.expressions.GraftExtensions)
    // extra confs for A/B plan experiments, e.g.
    // SPARK_GRAFT_CONF="spark.sql.codegen.wholeStage=false;spark.sql.adaptive.enabled=false"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"PROBE $name%-32s ${(System.nanoTime - t0) / 1e9}%8.2f s  rows=$n")
    }
    // one warm-up pass over the fact build so page cache/codegen are hot
    time("warmup_fact")(graft.queries.EdwQueries.factSales(spark, dir).count())
    args.foreach { a =>
      graft.SparkEntry.queries.filter(_._1.startsWith(a)).toSeq.sortBy(_._1)
        .foreach { case (name, fn) =>
          time(name)(fn(spark, dir).count())
          // mirror Bench's per-iteration sweep so probe numbers are
          // comparable to bench minima (operator-internal caches are
          // rebuilt per iteration there too)
          graft.CacheTracker.releaseAll()
        }
    }
    spark.stop()
  }
}
