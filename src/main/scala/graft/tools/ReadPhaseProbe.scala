// Which term makes a MoR version's read slow? args: tableRoot.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ReadPhaseProbe {
  def main(args: Array[String]): Unit = {
    val root = args.head
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
    import graft.ops.ManifestTable
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROBE $name%-30s ${(System.nanoTime - t0) / 1e9}%8.3f s")
      r
    }
    val cur = ManifestTable.currentVersion(spark, root).get
    val refs: Seq[String] =
      ManifestTable.versionFileRefs(spark, root, cur).get
    // the version dir: any ref's directory component of the NEWEST
    // commit — resolve via the _dv parent (refs are dir/file)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName)
      .filter(_.startsWith(s"d$cur-"))
      .head
    val (big, small) = refs.partition(_.startsWith("d1-"))
    println(s"PROBE files big=${big.size} small=${small.size}")
    def paths(rs: Seq[String]) = rs.map(r => s"$root/$r")
    time("plain_scan_big")(
      spark.read.parquet(paths(big): _*).count())
    time("plain_scan_all")(
      spark.read.parquet(paths(refs): _*).count())
    val tagged = spark.read.parquet(paths(refs): _*)
      .withColumn("__p",
        regexp_extract(col("_metadata.file_path"), "([^/]+/[^/]+)$", 1))
      .withColumn("__ri", col("_metadata.row_index"))
    time("tagged_scan_all")(tagged.count())
    val dv = spark.read.parquet(s"$root/$dir/_dv")
    println(s"PROBE dv_rows ${dv.count()}")
    time("dv_anti_join_aqe")(
      tagged.join(dv.select(col("path").as("__p"),
          col("row_index").as("__ri")),
        Seq("__p", "__ri"), "left_anti").count())
    time("dv_anti_join_bcast")(
      tagged.join(broadcast(dv.select(col("path").as("__p"),
          col("row_index").as("__ri"))),
        Seq("__p", "__ri"), "left_anti").count())
    time("read_via_manifest")(
      ManifestTable.read(spark, root).get.count())
    // which term: the per-row regexp, the file_path string, or the
    // join? force-materialize the keys without a join:
    time("force_regexp_keys")(
      tagged.select(xxhash64(col("__p"), col("__ri")).as("h"))
        .agg(expr("bit_xor(h)")).collect())
    val tagged2 = spark.read.parquet(paths(refs): _*)
      .withColumn("__p",
        substring_index(col("_metadata.file_path"), "/", -2))
      .withColumn("__ri", col("_metadata.row_index"))
    time("force_substr_keys")(
      tagged2.select(xxhash64(col("__p"), col("__ri")).as("h"))
        .agg(expr("bit_xor(h)")).collect())
    time("dv_anti_join_substr")(
      tagged2.join(broadcast(dv.select(col("path").as("__p"),
          col("row_index").as("__ri"))),
        Seq("__p", "__ri"), "left_anti").count())
    // raw file_path join key (no per-row string surgery at all): map
    // the dv's dir/file keys to absolute paths on the DRIVER
    val dvAbs = dv.select(col("path"), col("row_index"))
      .withColumn("abs", concat(lit("file://" + root + "/"),
        col("path")))
    val tagged3 = spark.read.parquet(paths(refs): _*)
      .withColumn("__fp", col("_metadata.file_path"))
      .withColumn("__ri", col("_metadata.row_index"))
    println("PROBE sample_fp " +
      tagged3.select("__fp").head.getString(0))
    time("force_raw_fp_keys")(
      tagged3.select(xxhash64(col("__fp"), col("__ri")).as("h"))
        .agg(expr("bit_xor(h)")).collect())
    time("dv_anti_join_rawfp")(
      tagged3.join(broadcast(dvAbs.select(col("abs").as("__fp"),
          col("row_index").as("__ri"))),
        Seq("__fp", "__ri"), "left_anti").count())
    spark.stop()
  }
}
