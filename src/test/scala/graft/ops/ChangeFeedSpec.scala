package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The CDF consumer's core claim: a grouped aggregate maintained
  * purely from [[ManifestTable.changes]] deltas equals the full
  * recompute at every version — including across DELETES and group
  * MIGRATIONS, which the q219 oracle cannot produce (upsert never
  * deletes). Versions here are direct commits, so the feed exercises
  * all four change types. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private val D = "decimal(18,6)"

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy($"g").agg(count(lit(1)).as("n_rows"),
      sum($"v".cast(D)).as("sum_v"))

  private def collectAgg(df: org.apache.spark.sql.DataFrame) =
    df.select($"g", $"n_rows", $"sum_v".cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq

  test("incremental state from changes() deltas equals the full " +
      "recompute across inserts, updates, deletes, and a group move") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cdf_").toString + "/tbl"
    // v1
    ManifestTable.commit(Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 5.0))
      .toDF("k", "g", "v"), root)
    // v2: update k=1 (value), DELETE k=4, insert k=5, MOVE k=3 from
    // group b to group a (an update whose pre/post land in different
    // groups — the signed deltas must migrate it atomically)
    ManifestTable.commit(Seq(
      (1L, "a", 11.0), (2L, "a", 20.0), (3L, "a", 30.0), (5L, "c", 7.0))
      .toDF("k", "g", "v"), root)
    // v3: delete the whole group c (its state row must DISAPPEAR, not
    // linger at n_rows = 0), plus one more insert
    ManifestTable.commit(Seq(
      (1L, "a", 11.0), (2L, "a", 20.0), (3L, "a", 30.0), (6L, "b", 1.0))
      .toDF("k", "g", "v"), root)

    var state = aggOf(ManifestTable.readVersion(spark, root, 1L))
    (1L to 2L).foreach { ver =>
      val feed = ManifestTable.changes(spark, root, ver, ver + 1, Seq("k"))
      state = ChangeFeed.applyDelta(state,
        ChangeFeed.deltaAgg(feed, Seq("g"), col("v").cast(D), "sum_v"),
        Seq("g"), "sum_v")
        .withColumn("sum_v", col("sum_v").cast("decimal(30,6)"))
      val expect = collectAgg(
        aggOf(ManifestTable.readVersion(spark, root, ver + 1)))
      assert(collectAgg(state) == expect,
        s"after applying v$ver->v${ver + 1}: ${collectAgg(state)} vs $expect")
    }
    // group c died with its last row: no zero-count residue
    assert(!collectAgg(state).exists(_._1 == "c"))
  }

  test("sync: a maintained sink bootstraps, follows version-by-version," +
      " catches a multi-version gap in ONE step, and replays as no-ops") {
    val base = java.nio.file.Files.createTempDirectory("graft_sync_")
    val src = base.toString + "/src"
    val sink = base.toString + "/sink"
    def step() = ChangeFeed.sync(spark, src, sink,
      keys = Seq("k"), groupCols = Seq("g"), col("v").cast(D), "sum_v")
    def expectAt(ver: Long) =
      collectAgg(aggOf(ManifestTable.readVersion(spark, src, ver)))
    def sinkNow() =
      collectAgg(ManifestTable.read(spark, sink).get)

    assert(step().isEmpty, "no source yet: sync must no-op")
    // v1 + bootstrap
    ManifestTable.commit(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "g", "v"), src)
    assert(step().contains(1L))
    assert(sinkNow() == expectAt(1L))
    // caught up: replay (crash-after-commit) is a no-op, no new version
    assert(step().isEmpty)
    assert(ManifestTable.currentVersion(spark, sink).contains(1L))
    // v2: one incremental step
    ManifestTable.merge(spark, src,
      Seq((1L, "a", 11.0), (3L, "a", 5.0)).toDF("k", "g", "v"), Seq("k"))
    assert(step().contains(2L))
    assert(sinkNow() == expectAt(2L))
    // v3 AND v4 land before the consumer wakes: ONE step catches up
    ManifestTable.merge(spark, src,
      Seq((2L, "b", 25.0)).toDF("k", "g", "v"), Seq("k"))
    ManifestTable.merge(spark, src,
      Seq((4L, "c", 1.0)).toDF("k", "g", "v"), Seq("k"))
    assert(step().contains(4L))
    assert(sinkNow() == expectAt(4L))
    assert(ChangeFeed.lastApplied(spark, sink).contains(4L))
    // crash BEFORE the sink marker: orphan state data, watermark
    // unchanged — the replayed step recomputes and lands cleanly
    ManifestTable.merge(spark, src,
      Seq((5L, "c", 2.0)).toDF("k", "g", "v"), Seq("k"))
    ManifestTable.writeVersionData(
      sinkNow().toDF("g", "n_rows", "sum_v"), sink, 4L) // torn attempt
    assert(ChangeFeed.lastApplied(spark, sink).contains(4L))
    assert(step().contains(5L))
    assert(sinkNow() == expectAt(5L))
  }

  test("syncPartitioned: a day's delta rewrites ONE sink partition's " +
      "files (others carry by path reference, proof by file identity); " +
      "an empty net diff advances the watermark with zero data bytes") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_cdfpart_").toString
    val (src, sink) = (s"$base/src", s"$base/sink")
    ManifestTable.commit(Seq(
      (1L, "d1", 10.0), (2L, "d1", 20.0), (3L, "d2", 5.0),
      (4L, "d3", 8.0)).toDF("k", "day", "v"), src)            // src v1
    def run() = ChangeFeed.syncPartitioned(spark, src, sink,
      keys = Seq("k"), groupCols = Seq("day"),
      value = $"v".cast(D), valueAlias = "sum_v", pcol = "day")
    def sinkParts(v: Long) = PartitionedTable.parts(spark, sink, v)
      .select($"path", $"value").as[(String, String)].collect().toSeq
    def recompute() = ManifestTable.read(spark, src).get
      .groupBy($"day").agg(count(lit(1)).as("n_rows"),
        sum($"v".cast(D)).as("sum_v"))
      .select($"day", $"n_rows", $"sum_v".cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    def state() = ManifestTable.read(spark, sink).get
      .select($"day", $"n_rows", $"sum_v".cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    // bootstrap: the full aggregate lands PARTITIONED by day
    assert(run().contains(1L))
    assert(state() == recompute())
    val p1 = sinkParts(1L)
    assert(p1.map(_._2).toSet == Set("d1", "d2", "d3"))
    // a MERGE touching ONLY d1 (reprice k=1, insert k=5)
    ManifestTable.merge(spark, src, Seq(
      (1L, "d1", 15.0), (5L, "d1", 2.0)).toDF("k", "day", "v"),
      Seq("k"))                                               // src v2
    assert(run().contains(2L))
    assert(state() == recompute())
    // FILE IDENTITY proof: d2/d3 state files carried VERBATIM (same
    // paths as v1 — zero bytes rewritten); only d1's files are new
    val p2 = sinkParts(2L)
    val untouched = Set("d2", "d3")
    assert(p2.filter(r => untouched(r._2)).toSet ==
      p1.filter(r => untouched(r._2)).toSet,
      "untouched partitions must carry by path reference")
    assert(p2.filter(_._2 == "d1").toSet
      .intersect(p1.filter(_._2 == "d1").toSet).isEmpty,
      "the touched partition must be rewritten")
    // replay is a no-op; already-caught-up returns None
    assert(run().isEmpty)
    // a NEW day's first delta lands fresh, existing days carry
    ManifestTable.merge(spark, src,
      Seq((6L, "d9", 4.0)).toDF("k", "day", "v"), Seq("k"))   // src v3
    assert(run().contains(3L))
    assert(state() == recompute())
    val p3 = sinkParts(3L)
    assert(p3.filter(r => r._2 != "d9").toSet ==
      p2.toSet, "pre-existing partitions must all carry")
    assert(p3.exists(_._2 == "d9"))
    // an EMPTY net diff (dataChange-false z-order commit on the
    // source): watermark advances, every sink file carries
    ZTable.optimizeZOrder(spark, src, "k", "k", "k", nFiles = 2) // v4
    assert(run().contains(4L))
    assert(sinkParts(4L).toSet == p3.toSet,
      "an empty diff must carry every file by reference")
    assert(state() == recompute())
    assert(ChangeFeed.lastApplied(spark, sink).contains(4L))
    // a group deleting to ZERO leaves the sink: delete all of d2
    ManifestTable.deleteWhere(spark, src, $"day" === "d2")     // src v5
    assert(run().contains(5L))
    assert(state() == recompute())
    assert(!sinkParts(5L).exists(_._2 == "d2"),
      "an emptied partition's files must drop")
  }

  test("sync fails LOUDLY when the watermark version was vacuumed " +
      "(retention must exceed consumer lag — never silent corruption)") {
    val base = java.nio.file.Files.createTempDirectory("graft_syncv_")
    val src = base.toString + "/src"
    val sink = base.toString + "/sink"
    ManifestTable.commit(Seq((1L, "a", 10.0)).toDF("k", "g", "v"), src)
    assert(ChangeFeed.sync(spark, src, sink, Seq("k"), Seq("g"),
      col("v").cast(D), "sum_v").contains(1L))
    // the source advances 3 versions and vacuums down to the last 1
    (2 to 4).foreach(i => ManifestTable.merge(spark, src,
      Seq((i.toLong, "a", i.toDouble)).toDF("k", "g", "v"), Seq("k")))
    ManifestTable.vacuum(spark, src, keepLast = 1)
    val e = intercept[IllegalArgumentException] {
      ChangeFeed.sync(spark, src, sink, Seq("k"), Seq("g"),
        col("v").cast(D), "sum_v")
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("an empty feed (no changes between versions) is an identity " +
      "apply") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cdf_id_").toString + "/tbl"
    val rows = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "v")
    ManifestTable.commit(rows, root)
    ManifestTable.commit(rows, root) // identical content, new version
    val state = aggOf(ManifestTable.readVersion(spark, root, 1L))
    val feed = ManifestTable.changes(spark, root, 1L, 2L, Seq("k"))
    assert(feed.count() == 0L)
    val applied = ChangeFeed.applyDelta(state,
      ChangeFeed.deltaAgg(feed, Seq("g"), col("v").cast(D), "sum_v"),
      Seq("g"), "sum_v")
    assert(collectAgg(applied) == collectAgg(state))
  }
}
