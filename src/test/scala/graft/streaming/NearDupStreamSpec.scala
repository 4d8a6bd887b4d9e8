package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipelines.CorpusPipeline

/** Incremental NEAR-dup dedup over the persistent LSH bucket table:
  * admission semantics within and across batches, exactly-once under
  * replay, and the streaming foreachBatch wiring end to end.
  *
  * Identical texts give identical MinHash signatures (all bands
  * collide), so admission decisions on them are fully deterministic —
  * no reliance on probabilistic band luck. */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog today"
  private val textB = "completely different content about spark shuffles here"
  private val textC = "another unique document concerning parquet row groups"

  test("ingestNewNearDup: first-seen across batches, min-id keeper in-batch") {
    val bucket = Files.createTempDirectory("graft_ndup_").toString + "/buckets"
    // batch 1: 1 and 2 are identical (near-dup cluster -> keeper 1); 3 unique
    val b1 = Seq((1L, textA), (2L, textA), (3L, textB)).toDF("doc_id", "text")
    val r1 = CorpusPipeline.ingestNewNearDup(spark, b1, bucket, "b1")
    assert(r1.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))

    // batch 2: 4 duplicates batch 1's admitted content (suppressed by
    // the bucket table), 5 is new, 6 is too short to shingle (admitted)
    val b2 = Seq((4L, textA), (5L, textC), (6L, "hi")).toDF("doc_id", "text")
    val r2 = CorpusPipeline.ingestNewNearDup(spark, b2, bucket, "b2")
    assert(r2.select("doc_id").as[Long].collect().sorted.toSeq == Seq(5L, 6L))

    // bucket table: one batch_id per (band, band_key), only admitted docs
    // (read through the state API — the layout is per-batch subdirs)
    val bt = CorpusPipeline.readBucketState(spark, bucket, "").get
    assert(bt.groupBy("band", "band_key")
      .agg(countDistinct("batch_id").as("n"))
      .filter(col("n") > 1).count() == 0)
    assert(bt.select("batch_id").distinct().as[String].collect().toSet ==
      Set("b1", "b2"))
  }

  test("ingestNewNearDup: replaying a completed batch re-emits the same rows") {
    val bucket = Files.createTempDirectory("graft_ndup_rp_").toString + "/buckets"
    val b1 = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    val b2 = Seq((3L, textB), (4L, textC)).toDF("doc_id", "text")

    CorpusPipeline.ingestNewNearDup(spark, b1, bucket, "b1").count()
    val first = CorpusPipeline.ingestNewNearDup(spark, b2, bucket, "b2")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(first == Seq(4L))
    val tableAfter = CorpusPipeline.readBucketState(spark, bucket, "").get
      .orderBy("band", "band_key", "batch_id").collect().toSeq

    // crash-replay of b2: same admitted rows, bucket table unchanged
    val replay = CorpusPipeline.ingestNewNearDup(spark, b2, bucket, "b2")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(replay == first)
    val tableReplay = CorpusPipeline.readBucketState(spark, bucket, "").get
      .orderBy("band", "band_key", "batch_id").collect().toSeq
    assert(tableReplay == tableAfter)
  }

  test("ingestNewNearDup: a batch with no bands lands an empty state " +
      "dir that later batches read through cleanly") {
    val bucket = Files.createTempDirectory("graft_ndup_eb_").toString + "/b"
    // every doc too short to shingle: all admitted, zero bucket rows
    val b1 = Seq((1L, "hi"), (2L, "yo")).toDF("doc_id", "text")
    assert(CorpusPipeline.ingestNewNearDup(spark, b1, bucket, "b1")
      .count() == 2)
    // the next batch must union the footerless b1 dir without error
    val b2 = Seq((3L, textA), (4L, textA)).toDF("doc_id", "text")
    assert(CorpusPipeline.ingestNewNearDup(spark, b2, bucket, "b2")
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(3L))
  }

  test("readBucketState rolls an interrupted per-batch swap forward") {
    val bucket = Files.createTempDirectory("graft_ndup_cr_").toString + "/b"
    val b1 = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    CorpusPipeline.ingestNewNearDup(spark, b1, bucket, "b1").count()
    // simulate the crash window: b1 renamed away, never promoted back
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(bucket)
    val fs = root.getFileSystem(conf)
    assert(fs.rename(new org.apache.hadoop.fs.Path(root, "b1"),
      new org.apache.hadoop.fs.Path(root, "b1__old")))
    // a state read recovers it; the suppressed re-ingest proves content
    val st = CorpusPipeline.readBucketState(spark, bucket, "").get
    assert(st.select("batch_id").distinct().as[String].collect().toSeq ==
      Seq("b1"))
    val b2 = Seq((9L, textA)).toDF("doc_id", "text")
    assert(CorpusPipeline.ingestNewNearDup(spark, b2, bucket, "b2")
      .count() == 0)
  }

  test("runNearDupSink: streaming file drops, exactly-once across runs") {
    val landing = Files.createTempDirectory("graft_ndup_land_")
    val work = Files.createTempDirectory("graft_ndup_work_")
    val bucket = s"$work/buckets"
    val out = s"$work/out"
    val ckpt = s"$work/ckpt"
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("doc_id BIGINT, text STRING")

    def runOnce(): Unit = StreamingDedup.runNearDupSink(
      spark.readStream.schema(schema).json(landing.toString),
      bucket, out, ckpt)

    Files.writeString(landing.resolve("f1.json"),
      s"""{"doc_id":1,"text":"$textA"}
         |{"doc_id":2,"text":"$textA"}
         |{"doc_id":3,"text":"$textB"}""".stripMargin)
    def emitted(): Seq[Long] = spark.read
      .option("recursiveFileLookup", "true").parquet(out)
      .select("doc_id").as[Long].collect().sorted.toSeq

    runOnce()
    assert(emitted() == Seq(1L, 3L))

    // a NEW run (fresh query, same checkpoint + bucket table): dup of
    // admitted content suppressed, new content admitted
    Files.writeString(landing.resolve("f2.json"),
      s"""{"doc_id":4,"text":"$textB"}
         |{"doc_id":5,"text":"$textC"}""".stripMargin)
    runOnce()
    assert(emitted() == Seq(1L, 3L, 5L))
  }
}
