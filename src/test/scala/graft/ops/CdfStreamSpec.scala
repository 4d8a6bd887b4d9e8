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

  test("SQL surface: GRAFT STREAM SYNC drives the chained consumer " +
      "as statement text over a PARTITIONED source; STOP by id; a " +
      "second STOP is loud") {
    val base = tmp()
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    PartitionedTable.commitPartitioned(spark, src,
      Seq((1L, "d1", 10.0), (2L, "d1", 20.0), (3L, "d2", 5.0))
        .toDF("k", "day", "v"), "day")                          // v1
    val id = spark.sql(
      s"GRAFT STREAM SYNC graft.`$src` TO graft.`$sink` KEYS (k) " +
        "GROUP BY (day) PARTITIONED BY (day) " +
        "VALUE CAST(v AS DECIMAL(18,6)) AS sum_v " +
        s"CHECKPOINT '$ckpt' TICK 50 MILLISECONDS")
      .collect().head.getString(0)
    def state() = ManifestTable.read(spark, sink).get
      .select($"day", $"n_rows", $"sum_v".cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    def expect() = ManifestTable.read(spark, src).get
      .groupBy($"day").agg(count(lit(1)).as("n"),
        sum($"v".cast(D)).as("s"))
      .select($"day", $"n", $"s".cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    def sinkParts() = PartitionedTable.parts(spark, sink,
      ManifestTable.currentVersion(spark, sink).get)
      .select($"path", $"value").as[(String, String)].collect().toSeq
    try {
      awaitApplied(sink, 1L)
      assert(state() == expect())
      // the sink bootstrapped PARTITIONED by day
      val p1 = sinkParts()
      assert(p1.map(_._2).toSet == Set("d1", "d2"))
      // the live source takes a partitioned append + a MoR merge —
      // neither touches d2, so d2's sink state files must carry by
      // PATH REFERENCE through every fold
      PartitionedTable.appendPartitioned(spark, src,
        Seq((4L, "d3", 7.0)).toDF("k", "day", "v"))             // v2
      ManifestTable.mergeDV(spark, src,
        Seq((1L, "d1", 11.0)).toDF("k", "day", "v"), Seq("k")) // v3
      awaitApplied(sink, 3L)
      assert(state() == expect())
      assert(sinkParts().filter(_._2 == "d2").toSet ==
        p1.filter(_._2 == "d2").toSet,
        "untouched partition must carry by path reference")
    } finally spark.sql(s"GRAFT STREAM STOP '$id'")
    // a second STOP of the same id is a loud error, not a silent no-op
    intercept[Exception] { spark.sql(s"GRAFT STREAM STOP '$id'") }
  }

  test("native graft-cdf source over a PARTITIONED root: the " +
      "partition column survives the net-diff schema through append " +
      "and MoR merge; per-partition state equals the recompute") {
    val base = tmp()
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    PartitionedTable.commitPartitioned(spark, src,
      Seq((1L, "d1", 10.0), (2L, "d1", 20.0), (3L, "d2", 5.0))
        .toDF("k", "day", "v"), "day")                          // v1
    // the source's declared schema carries the partition column
    val sourceSchema = graft.streaming.CdfSource
      .schemaFor(spark, src).fieldNames.toSeq
    assert(sourceSchema.take(3) == Seq("k", "day", "v"))
    val q = spark.readStream.format("graft-cdf")
      .option("root", src).option("keys", "k")
      .load()
      .filter($"_change_type" =!= "delete")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointPath", ckpt)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    def awaitVersion(v: Long): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      def maxSeen(): Long =
        try spark.read.parquet(out)
          .agg(max($"_commit_version")).as[Long].head()
        catch { case _: Throwable => -1L }
      while (maxSeen() < v) {
        assert(System.currentTimeMillis() < deadline,
          s"stream never surfaced source version $v")
        Thread.sleep(100)
      }
    }
    try {
      awaitVersion(1L) // bootstrap batch
      // a partitioned APPEND (new day) and a MoR MERGE (fragments in
      // an existing day) both flow through with their day values
      PartitionedTable.appendPartitioned(spark, src,
        Seq((4L, "d3", 7.0)).toDF("k", "day", "v"))             // v2
      ManifestTable.mergeDV(spark, src,
        Seq((1L, "d1", 11.0)).toDF("k", "day", "v"), Seq("k")) // v3
      awaitVersion(3L)
      val rows = spark.read.parquet(out)
      // every change row carries its partition value, none null
      assert(rows.filter($"day".isNull).count() == 0L)
      // the upserts landed with their days: k=4 in d3, k=1's new
      // image in d1
      assert(rows.filter($"k" === 4L && $"day" === "d3" &&
        $"_change_type" === "insert").count() == 1L)
      assert(rows.filter($"k" === 1L && $"day" === "d1" &&
        $"v" === 11.0).count() == 1L)
      // and the source table itself still prunes by partition
      assert(PartitionedTable.readPartitions(spark, src, Seq("d1"))
        .count() == 2L)
    } finally q.stop()
  }
}
