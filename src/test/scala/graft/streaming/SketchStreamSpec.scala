package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.SparkSpec
import graft.functions.{CmsSketch, HllSketch}

/** Streaming sketch maintenance: per-batch register tables, merge =
  * the sketch's own merge op, replay-idempotent by layout. */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("cmsSink: merged registers equal the one-shot batch sketch") {
    val root = Files.createTempDirectory("graft_cms_").toString + "/state"
    val sink = SketchStream.cmsSink(root, col("tok"), depth = 4, width = 16)
    val b0 = Seq.fill(20)("alpha").toDF("tok")
    val b1 = (Seq.fill(10)("alpha") ++ Seq.fill(7)("beta")).toDF("tok")
    sink(b0, 0L); sink(b1, 1L)
    val merged = SketchStream.mergedCms(spark, root)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val oneShot = CmsSketch.registers(b0.union(b1), col("tok"),
        depth = 4, width = 16)
      .filter(col("cnt") =!= 0L)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == oneShot)
  }

  test("cmsSink: replaying a batch does not double-count") {
    val root = Files.createTempDirectory("graft_cms_").toString + "/state"
    val sink = SketchStream.cmsSink(root, col("tok"), depth = 4, width = 16)
    val b0 = Seq.fill(9)("gamma").toDF("tok")
    sink(b0, 0L); sink(b0, 0L) // redelivery of the same micro-batch
    val total = SketchStream.mergedCms(spark, root)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(total == 4L * 9L) // depth x occurrences, counted once
  }

  test("lmCountSink: merged counts equal one-shot counting; replay safe") {
    val root = Files.createTempDirectory("graft_lm_").toString + "/state"
    val sink = SketchStream.lmCountSink(root, col("text"))
    val b0 = Seq("a b a b", "a b").toDF("text")
    val b1 = Seq("b a c").toDF("text")
    sink(b0, 0L); sink(b1, 1L); sink(b1, 1L) // batch 1 redelivered
    val merged = SketchStream.mergedLmCounts(spark, root)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // bigrams: "a b" x4 (2 in doc1, 1 in doc2, ... doc1 "a b a b" has
    // a b, b a, a b = 2; doc2 1; doc3 "b a c" has b a, a c)
    assert(merged(("bi", "a b")) == 3L)
    assert(merged(("bi", "b a")) == 2L)
    assert(merged(("bi", "a c")) == 1L)
    assert(merged(("uni", "a")) == 4L && merged(("uni", "b")) == 4L &&
      merged(("uni", "c")) == 1L)
    // exactly the one-shot counts of the full stream
    val oneShotBi = Seq("a b a b", "a b", "b a c").toDF("text")
      .select(explode(graft.functions.TextFunctions
        .shinglesOf(col("text"), 2)).as("k"))
      .groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.collect { case (("bi", k), c) => k -> c }.toMap ==
      oneShotBi)
  }

  test("hllSink: merged registers equal the one-shot sketch; estimate sane") {
    val root = Files.createTempDirectory("graft_hll_").toString + "/state"
    val sink = SketchStream.hllSink(root, col("v"), p = 6)
    val b0 = (1 to 300).map(i => s"u$i").toDF("v")
    val b1 = (200 to 500).map(i => s"u$i").toDF("v") // overlaps b0
    sink(b0, 0L); sink(b1, 1L)
    val merged = SketchStream.mergedHll(spark, root)
    val oneShot = HllSketch.registers(b0.union(b1), col("v"), p = 6)
    val m = merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val o = oneShot.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == o)
    val est = HllSketch.estimate(merged, p = 6)
    assert(est > 350 && est < 650, s"estimate $est for 500 distinct")
  }

  test("end-to-end: file-drop stream maintains LM counts across two runs") {
    val landing = Files.createTempDirectory("graft_lm_landing_")
    val work = Files.createTempDirectory("graft_lm_work_")
    val root = s"$work/lm"
    val schema = StructType.fromDDL("text STRING")
    def runOnce(): Unit = {
      val q = IncrementalStream.fileDropJson(spark, landing.toString, schema)
        .writeStream
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch(SketchStream.lmCountSink(root, col("text")))
        .start()
      q.awaitTermination()
    }
    Files.writeString(landing.resolve("a.json"),
      """{"text":"a b a b"}""" + "\n" + """{"text":"a b"}""")
    runOnce()
    Files.writeString(landing.resolve("b.json"), """{"text":"b a c"}""")
    runOnce() // checkpoint: a.json must not re-count
    val merged = SketchStream.mergedLmCounts(spark, root)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(merged(("bi", "a b")) == 3L && merged(("bi", "b a")) == 2L)
    assert(merged(("uni", "c")) == 1L)
  }

  test("end-to-end: file-drop stream maintains the CMS across two runs") {
    val landing = Files.createTempDirectory("graft_sk_landing_")
    val work = Files.createTempDirectory("graft_sk_work_")
    val root = s"$work/cms"
    val schema = StructType.fromDDL("tok STRING")
    def runOnce(): Unit = {
      val q = IncrementalStream.fileDropJson(spark, landing.toString, schema)
        .writeStream
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch(SketchStream.cmsSink(root, col("tok"),
          depth = 4, width = 16))
        .start()
      q.awaitTermination()
    }
    Files.writeString(landing.resolve("a.json"),
      Seq.fill(5)("""{"tok":"x"}""").mkString("\n"))
    runOnce()
    Files.writeString(landing.resolve("b.json"),
      Seq.fill(3)("""{"tok":"x"}""").mkString("\n"))
    runOnce() // checkpoint: a.json must not re-count
    val total = SketchStream.mergedCms(spark, root)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(total == 4L * 8L)
  }
}
