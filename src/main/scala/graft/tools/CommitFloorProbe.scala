// Step-grain decomposition of the q240 MoR lifecycle: time each
// protocol operation (commit, z-order, merge, update, stats proofs,
// pruned scan) separately, plus a per-step Spark-job count, so the
// commit floor's composition is measurable instead of guessed.
// Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.tools.CommitFloorProbe"
package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CommitFloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.ops.FastLocalFileSystem].getName)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        { jobCount.incrementAndGet(); () }
    })
    def step[T](name: String)(f: => T): T = {
      val j0 = jobCount.get()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STEP $name%-28s ${dt}%7.3f s  jobs=${jobCount.get() - j0}")
      r
    }

    import spark.implicits._
    import graft.ops.{ManifestTable, ZTable}
    import graft.Tables

    // warm-up: one full q240 to absorb startup
    graft.SparkEntry.queries("q240_mor_skipping")(spark, dir).count()
    graft.CacheTracker.releaseAll()

    (1 to 2).foreach { round =>
      println(s"-- round $round --")
      val orders = Tables(spark, dir, "orders")
      val cut = lit("1995-04-01").cast("timestamp")
      val hi = lit("1995-06-01").cast("timestamp")
      def slice(df: org.apache.spark.sql.DataFrame) =
        df.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice", $"o_orderkey".cast("string").as("o_key_s"))
      val target = slice(orders.filter($"o_orderdate" < cut))
      val root = java.nio.file.Files
        .createTempDirectory("graft_cfp_").toString + "/orders_tbl"
      step("commit_v1")(ManifestTable.commit(target.coalesce(1), root))
      step("zorder_v2")(ZTable.optimizeZOrder(spark, root, "o_orderkey",
        "o_custkey", "o_orderkey", nFiles = 8, bloomCol = Some("o_key_s")))
      (0 until 2).foreach { i =>
        val batch = slice(orders.filter(
          $"o_orderdate" >= cut && $"o_orderdate" < hi &&
            $"o_custkey" % 2 === i))
        step(s"mergeBatchDV_v${3 + i}")(
          ManifestTable.mergeBatchDV(spark, root, batch,
            Seq("o_orderkey"), batchKey = s"run1-b$i"))
      }
      step("updateWhereDV_v5")(ManifestTable.updateWhereDV(spark, root,
        $"o_custkey" % 7 === 0,
        Map("o_totalprice" -> $"o_totalprice" * 2)))
      def statsCover(v: Long): Boolean =
        ZTable.stats(spark, root, v).select($"path").as[String]
          .collect().toSet ==
          ManifestTable.versionFileRefs(spark, root, v).get.toSet
      step("statsCover_4_5")((4L to 5L).forall(statsCover))
      val refs5 = step("versionFileRefs_5")(
        ManifestTable.versionFileRefs(spark, root, 5L).get)
      val maxKey = step("maxKey_agg")(ManifestTable.read(spark, root).get
        .agg(max($"o_orderkey")).head.getLong(0))
      step("scanXRange_inputFiles")(
        ZTable.scanXRange(spark, root, 0L, maxKey / 4).inputFiles.length)
      val ck = step("maxCk_agg")(ManifestTable.read(spark, root).get
        .agg(max($"o_key_s")).head.getString(0))
      step("bloomCandidates")(
        ZTable.bloomCandidateFiles(spark, root, lit(ck)).size)
      val fsq = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val maxLen = refs5.map(r => fsq.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$root/$r")).getLen).max
      step("binPack_v6")(ManifestTable.optimizeBinPack(spark, root,
        minFileBytes = maxLen))
      step("statsCover_6")(statsCover(6L))
      step("final_agg")(ZTable.scanXRange(spark, root, 0L, maxKey / 4)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows")).count())
      graft.CacheTracker.releaseAll()
    }
    spark.stop()
  }
}
