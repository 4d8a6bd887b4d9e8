package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q240Phase {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ops.{ManifestTable, ZTable}
    val dir = "/root/testdata/sf0.1"
    def time[A](n: String)(f: => A): A = { val t0=System.nanoTime; val r=f
      println(f"PROBE $n%-28s ${(System.nanoTime-t0)/1e9}%8.3f s"); r }
    val orders = graft.Tables(spark, dir, "orders")
    // warm
    orders.count()
    val cut = lit("1995-04-01").cast("timestamp")
    val hi = lit("1995-06-01").cast("timestamp")
    def slice(df: org.apache.spark.sql.DataFrame) =
      df.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_totalprice", $"o_orderkey".cast("string").as("o_key_s"))
    val target = slice(orders.filter($"o_orderdate" < cut))
    val root = java.nio.file.Files.createTempDirectory("q240p_").toString + "/t"
    time("commit")(ManifestTable.commit(target.coalesce(1), root))
    time("zorder+bloom")(ZTable.optimizeZOrder(spark, root, "o_orderkey",
      "o_custkey", "o_orderkey", nFiles = 8, bloomCol = Some("o_key_s")))
    (0 until 2).foreach { i =>
      val b = slice(orders.filter($"o_orderdate" >= cut &&
        $"o_orderdate" < hi && $"o_custkey" % 2 === i))
      time(s"mergeBatchDV_$i")(ManifestTable.mergeBatchDV(spark, root, b,
        Seq("o_orderkey"), s"b$i"))
    }
    time("updateWhereDV")(ManifestTable.updateWhereDV(spark, root,
      $"o_custkey" % 7 === 0, Map("o_totalprice" -> ($"o_totalprice"*2))))
    time("statsCover x3")((4L to 6L).map(v => try ZTable.stats(spark, root, v).count() catch { case _: Throwable => -1L }))
    time("maxKey")(ManifestTable.read(spark, root).get.agg(max($"o_orderkey")).head.getLong(0))
    time("scanXRange_plan+files")(ZTable.scanXRange(spark, root, 0, 10000).inputFiles.length)
    time("bloomCands")(ZTable.bloomCandidateFiles(spark, root, lit("12345")).size)
    val refs = ManifestTable.versionFileRefs(spark, root, 5L).get
    val fsq = new org.apache.hadoop.fs.Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val maxLen = refs.map(r => fsq.getFileStatus(new org.apache.hadoop.fs.Path(s"$root/$r")).getLen).max
    time("binPack")(ManifestTable.optimizeBinPack(spark, root, minFileBytes = maxLen))
    time("final_agg")(ManifestTable.read(spark, root).get.groupBy($"o_orderstatus").agg(count(lit(1))).collect())
    spark.stop()
  }
}
