package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming CDF consumer ([[graft.streaming.CdfStream]]): a live
  * poller maintains the downstream aggregate from change feeds while
  * the source keeps committing, equals the full recompute at every
  * observed watermark, and survives losing its ENTIRE checkpoint
  * (exactly-once rides the sink's own batch keys, not Spark state). */
class CdfStreamSpec extends SparkSpec {
  import spark.implicits._

  private val D = "decimal(18,6)"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cdfstream_").toString

  private def recompute(root: String) =
    ManifestTable.read(spark, root).get
      .groupBy($"g").agg(count(lit(1)).as("n_rows"),
        sum($"v".cast(D)).as("sum_v"))
      .select($"g", $"n_rows", $"sum_v".cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq

  private def sinkState(root: String) =
    ManifestTable.read(spark, root).get
      .select($"g", $"n_rows", $"sum_v".cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq

  private def awaitApplied(sinkRoot: String, v: Long): Unit = {
    val deadline = System.currentTimeMillis() + 60000
    while (!ChangeFeed.lastApplied(spark, sinkRoot).exists(_ >= v)) {
      assert(System.currentTimeMillis() < deadline,
        s"sink never reached source version $v")
      Thread.sleep(100)
    }
  }

  test("live poller: bootstraps, then applies each MERGE's feed as it " +
      "lands; state equals the full recompute at every watermark") {
    val base = tmp()
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    ManifestTable.commit(Seq(
      (1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "v"), src)
    val q = graft.streaming.CdfStream.runSyncSink(spark, src, sink,
      keys = Seq("k"), groupCols = Seq("g"), value = $"v".cast(D),
      valueAlias = "sum_v", checkpoint = ckpt,
      tick = Trigger.ProcessingTime("50 milliseconds"))
    try {
      awaitApplied(sink, 1L) // bootstrap
      assert(sinkState(sink) == recompute(src))
      // source keeps moving while the poller runs: an update + insert…
      ManifestTable.merge(spark, src,
        Seq((1L, "a", 15.0), (3L, "c", 7.0)).toDF("k", "g", "v"),
        Seq("k"))
      awaitApplied(sink, 2L)
      assert(sinkState(sink) == recompute(src))
      // …and a full-replace commit that deletes a key and moves one
      ManifestTable.commit(Seq(
        (1L, "b", 15.0), (3L, "c", 7.0)).toDF("k", "g", "v"), src)
      awaitApplied(sink, 3L)
      assert(sinkState(sink) == recompute(src))
    } finally q.stop()
  }

  test("checkpoint loss is harmless: a restarted poller with a FRESH " +
      "checkpoint never double-applies (watermark rides the sink's " +
      "own batch keys) and catches a multi-version gap in one step") {
    val base = tmp()
    val (src, sink) = (s"$base/src", s"$base/sink")
    ManifestTable.commit(Seq(
      (1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "v"), src)
    val q1 = graft.streaming.CdfStream.runSyncSink(spark, src, sink,
      Seq("k"), Seq("g"), $"v".cast(D), "sum_v",
      checkpoint = s"$base/ckpt1",
      tick = Trigger.ProcessingTime("50 milliseconds"))
    try awaitApplied(sink, 1L) finally q1.stop()
    val applied1 = ManifestTable.currentVersion(spark, sink).get
    // while the poller is DOWN the source advances twice
    ManifestTable.merge(spark, src,
      Seq((2L, "b", 25.0)).toDF("k", "g", "v"), Seq("k"))
    ManifestTable.merge(spark, src,
      Seq((4L, "a", 3.0)).toDF("k", "g", "v"), Seq("k"))
    // restart with a brand-new checkpoint (total checkpoint loss)
    val q2 = graft.streaming.CdfStream.runSyncSink(spark, src, sink,
      Seq("k"), Seq("g"), $"v".cast(D), "sum_v",
      checkpoint = s"$base/ckpt2",
      tick = Trigger.ProcessingTime("50 milliseconds"))
    try {
      awaitApplied(sink, 3L)
      assert(sinkState(sink) == recompute(src))
      // the two-version gap was ONE sink commit (net diff), and the
      // already-applied bootstrap was not re-applied
      val keys = ManifestTable.appliedBatchKeys(spark, sink)
      assert(keys == Set("cdfv-1", "cdfv-3"), s"keys: $keys")
      assert(ManifestTable.currentVersion(spark, sink).get
        == applied1 + 1)
    } finally q2.stop()
  }
}
