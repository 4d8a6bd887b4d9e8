package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off phase-level timer for q82's two ingest cycles — where do
  * the ~3.5 s go (signatures / prior semi-join / pair self-join / CC
  * rounds / state write)? Run:
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.Q82Probe"
  */
object Q82Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.ops.FastLocalFileSystem].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = graft.Tables(spark, sfDir, "documents")
    // warm-up: page cache + codegen
    docs.count()
    (0 until 2).foreach { rep =>
      println(s"== rep $rep ==")
      val bucket = java.nio.file.Files
        .createTempDirectory("graft_q82p_").toString + "/buckets"
      Seq(0, 1).foreach { b =>
        t(s"batch$b total") {
          import graft.pipelines.CorpusPipeline
          import graft.ops.Dedup
          val newDocs = docs.filter(pmod(col("doc_id"), lit(2)) === b)
          val sig = t(s"batch$b sig+bands") {
            val s0 = Dedup.minhashSignatures(newDocs, "doc_id", "text", 3, 16)
            Dedup.bandKeys(s0, "doc_id", 16, 4).localCheckpoint()
          }
          val prior = CorpusPipeline.readBucketState(spark, bucket, s"b$b")
          val suppressed = t(s"batch$b prior-semi") {
            prior.map(p =>
              sig.sparkSession.emptyDataFrame) // placeholder, cost below
            prior.map(p =>
              t(s"batch$b prior-semi-inner") {
                val s = sig.join(p.select(col("band"), col("band_key")),
                  Seq("band", "band_key"), "left_semi")
                  .select(col("doc_id")).distinct().localCheckpoint()
                s
              })
          }
          val live = suppressed.map(s =>
            sig.join(s, Seq("doc_id"), "left_anti")).getOrElse(sig)
          val pairs = t(s"batch$b pair-join") {
            val l = live.select(col("doc_id").as("id_a"), col("band"),
              col("band_key"))
            val r = live.select(col("doc_id").as("id_b"), col("band"),
              col("band_key"))
            l.join(r, Seq("band", "band_key"))
              .filter(col("id_a") < col("id_b"))
              .select(col("id_a"), col("id_b")).distinct().localCheckpoint()
          }
          println(s"PROBE batch$b n_pairs=${pairs.count()}")
          val nodes = pairs.select(col("id_a").as("doc_id"))
            .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
          val losers = t(s"batch$b CC") {
            val lo = Dedup.duplicateClusters(nodes, "doc_id", pairs)
              .filter(col("doc_id") =!= col("cluster")).select(col("doc_id"))
              .localCheckpoint()
            println(s"PROBE batch$b cc_rounds=${Dedup.lastClusterRounds}")
            lo
          }
          val dropIds = suppressed match {
            case Some(s) => s.unionByName(losers)
            case None => losers
          }
          val admitted = t(s"batch$b admit-mat") {
            newDocs.join(dropIds, Seq("doc_id"), "left_anti").localCheckpoint()
          }
          t(s"batch$b state-write") {
            val nb = sig.join(admitted.select(col("doc_id")), Seq("doc_id"),
                "left_semi")
              .select(col("band"), col("band_key"))
              .withColumn("batch_id", lit(s"b$b")).distinct()
            graft.ops.Upsert.writeBatchState(nb, bucket, s"b$b")
          }
        }
      }
    }
    spark.stop()
  }
}
