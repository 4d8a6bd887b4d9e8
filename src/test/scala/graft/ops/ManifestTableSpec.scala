package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit, upper}

/** The manifest-commit transactional table: readers must NEVER see a
  * torn table — the marker rename is the single atomic commit point,
  * so a crash anywhere before it leaves the previous version live. */
class ManifestTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = java.nio.file.Files
    .createTempDirectory("graft_manifest_").toString + "/tbl"

  test("commit/read roundtrip and version increments") {
    val root = freshRoot()
    assert(ManifestTable.read(spark, root).isEmpty)
    val v1 = ManifestTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    assert(v1 == 1L)
    val v2 = ManifestTable.commit(
      Seq((1L, "a2"), (3L, "c")).toDF("k", "v"), root)
    assert(v2 == 2L)
    val cur = ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().sortBy(_._1)
    assert(cur.toSeq == Seq((1L, "a2"), (3L, "c")))
    // time travel: version 1 is still intact and byte-identical
    val old = ManifestTable.readVersion(spark, root, 1L)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(old.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("merge applies Upsert.upsert semantics transactionally") {
    val root = freshRoot()
    ManifestTable.commit(
      Seq((1L, "old", 10), (2L, "keep", 20)).toDF("k", "s", "n"), root)
    val merged = ManifestTable.merge(spark, root,
      Seq((1L, "new", 11), (3L, "ins", 30)).toDF("k", "s", "n"),
      keys = Seq("k"))
    val got = merged.as[(Long, String, Int)].collect().sortBy(_._1)
    assert(got.toSeq ==
      Seq((1L, "new", 11), (2L, "keep", 20), (3L, "ins", 30)))
    assert(ManifestTable.currentVersion(spark, root).contains(2L))
  }

  test("merge with no prior version inserts the source as v1") {
    val root = freshRoot()
    val r = ManifestTable.merge(spark, root,
      Seq((7L, "x")).toDF("k", "v"), keys = Seq("k"))
    assert(r.as[(Long, String)].collect().toSeq == Seq((7L, "x")))
    assert(ManifestTable.currentVersion(spark, root).contains(1L))
  }

  test("mid-commit crash: data written, marker absent — readers see " +
      "the previous version; the next commit absorbs the orphan") {
    val root = freshRoot()
    ManifestTable.commit(Seq((1L, "v1")).toDF("k", "v"), root)
    // simulate a crash between step 1 (data) and step 2 (marker)
    ManifestTable.writeVersionData(Seq((1L, "TORN")).toDF("k", "v"),
      root, 2L)
    // the torn version is INVISIBLE: current is still v1
    assert(ManifestTable.currentVersion(spark, root).contains(1L))
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().toSeq == Seq((1L, "v1")))
    intercept[IllegalArgumentException] {
      ManifestTable.readVersion(spark, root, 2L)
    }
    // the next commit claims version 2 in its own fresh dir; the
    // orphan stays unreferenced debris until vacuum(dropOrphans)
    val v = ManifestTable.commit(Seq((1L, "v2")).toDF("k", "v"), root)
    assert(v == 2L)
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().toSeq == Seq((1L, "v2")))
    ManifestTable.vacuum(spark, root, keepLast = 10, dropOrphans = true)
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().toSeq == Seq((1L, "v2")))
  }

  test("lost race cannot corrupt the winner's committed data: unique " +
      "data dirs make version paths uncontended") {
    val root = freshRoot()
    ManifestTable.commit(Seq((1L, "v1")).toDF("k", "v"), root)
    // writer A: data for version 2 written, marker not yet attempted
    val dirA = ManifestTable.writeVersionData(
      Seq((1L, "A")).toDF("k", "v"), root, 2L)
    // writer B wins version 2 outright
    ManifestTable.commit(Seq((1L, "B")).toDF("k", "v"), root)
    // A's marker attempt loses LOUDLY — and B's committed v2 data is
    // untouched (the old shared-v2-dir staging let A overwrite it)
    intercept[java.io.IOException] {
      ManifestTable.writeMarker(spark, root, 2L, dataDir = dirA)
    }
    assert(ManifestTable.readVersion(spark, root, 2L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "B")))
    // the loser's orphan dir was cleaned up by the failed marker
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, dirA)))
  }

  test("mergeWithRetry: a losing MERGE rebases onto the winner and " +
      "re-commits — no committed row lost") {
    val root = freshRoot()
    ManifestTable.commit(Seq((1L, "base")).toDF("k", "v"), root)
    // winner B commits version 2 between A's read and A's commit:
    // simulate by pre-claiming v2's marker the way a racing committer
    // would (data + marker)
    val dirB = ManifestTable.writeVersionData(
      Seq((1L, "base"), (2L, "B")).toDF("k", "v"), root, 2L)
    ManifestTable.writeMarker(spark, root, 2L, dataDir = dirB)
    // plain merge computed against v1 would now throw; mergeWithRetry
    // rebases on v2 (which has B's row) and lands as v3
    val merged = ManifestTable.mergeWithRetry(spark, root,
      Seq((3L, "A")).toDF("k", "v"), keys = Seq("k"))
    assert(merged.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "base"), (2L, "B"), (3L, "A")))
    assert(ManifestTable.currentVersion(spark, root).contains(3L))
  }

  test("two concurrent writers: both MERGEs land serialized, " +
      "no lost rows") {
    val root = freshRoot()
    ManifestTable.commit(Seq((0L, "base")).toDF("k", "v"), root)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val gate = new java.util.concurrent.CountDownLatch(1)
    def writer(idBase: Long): java.util.concurrent.Future[Unit] =
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          gate.await()
          (0 until 4).foreach { i =>
            ManifestTable.mergeWithRetry(spark, root,
              Seq((idBase + i, s"w$idBase-$i")).toDF("k", "v"),
              keys = Seq("k"))
          }
        }
      })
    val fa = writer(100L); val fb = writer(200L)
    gate.countDown()
    fa.get(); fb.get(); pool.shutdown()
    val rows = ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().map(_._1).sorted.toSeq
    assert(rows == Seq(0L, 100L, 101L, 102L, 103L,
      200L, 201L, 202L, 203L), s"lost rows: $rows")
    // serialized: exactly 1 base + 8 merge commits
    assert(ManifestTable.currentVersion(spark, root).contains(9L))
  }

  test("concurrent commit of the same version fails loudly") {
    val root = freshRoot()
    ManifestTable.commit(Seq((1L, "v1")).toDF("k", "v"), root)
    // another writer raced us to version 2's marker
    ManifestTable.writeMarker(spark, root, 2L)
    intercept[java.io.IOException] {
      ManifestTable.writeMarker(spark, root, 2L)
    }
  }

  test("mergeBatch: exactly-once under replay — a committed batch key " +
      "is a no-op; distinct keys advance versions") {
    val root = freshRoot()
    ManifestTable.mergeBatch(spark, root,
      Seq((1L, "a")).toDF("k", "v"), Seq("k"), "ns-0")
    assert(ManifestTable.currentVersion(spark, root).contains(1L))
    // replay of the SAME batch (crash after marker): no new version,
    // no data change
    ManifestTable.mergeBatch(spark, root,
      Seq((1L, "REPLAYED-DIFFERENTLY")).toDF("k", "v"), Seq("k"), "ns-0")
    assert(ManifestTable.currentVersion(spark, root).contains(1L))
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    // the next batch merges and commits v2
    ManifestTable.mergeBatch(spark, root,
      Seq((1L, "a2"), (2L, "b")).toDF("k", "v"), Seq("k"), "ns-1")
    assert(ManifestTable.currentVersion(spark, root).contains(2L))
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a2"), (2L, "b")))
    assert(ManifestTable.batchApplied(spark, root, "ns-0"))
    assert(ManifestTable.batchApplied(spark, root, "ns-1"))
    assert(!ManifestTable.batchApplied(spark, root, "other-0"))
  }

  test("mergeBatch: crash between data write and marker — the replay " +
      "re-lands the same batch, readers never torn") {
    val root = freshRoot()
    ManifestTable.mergeBatch(spark, root,
      Seq((1L, "v1")).toDF("k", "v"), Seq("k"), "ns-0")
    // crash mid-commit of batch 1: orphan v2 data, no marker
    ManifestTable.writeVersionData(Seq((1L, "TORN")).toDF("k", "v"),
      root, 2L)
    assert(!ManifestTable.batchApplied(spark, root, "ns-1"))
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().toSeq == Seq((1L, "v1")))
    // Spark replays batch 1 with the same key: absorbs the orphan
    ManifestTable.mergeBatch(spark, root,
      Seq((1L, "v2"), (2L, "n")).toDF("k", "v"), Seq("k"), "ns-1")
    assert(ManifestTable.currentVersion(spark, root).contains(2L))
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "v2"), (2L, "n")))
  }

  test("vacuum keeps the newest versions, drops the rest") {
    val root = freshRoot()
    (1 to 4).foreach(i =>
      ManifestTable.commit(Seq((i.toLong, s"v$i")).toDF("k", "v"), root))
    ManifestTable.vacuum(spark, root, keepLast = 2)
    intercept[IllegalArgumentException] {
      ManifestTable.readVersion(spark, root, 2L)
    }
    assert(ManifestTable.readVersion(spark, root, 3L).count() == 1L)
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().toSeq == Seq((4L, "v4")))
  }

  test("vacuum-vs-reader retention contract: a reader holding any of " +
      "the newest keepLast versions survives the vacuum; older " +
      "versions fail loudly, their commit records retained") {
    val root = freshRoot()
    (1 to 5).foreach(i =>
      ManifestTable.commit(Seq((i.toLong, s"v$i")).toDF("k", "v"), root))
    // reader R resolved v4 (within keepLast=2 of current v5) BEFORE
    // the vacuum; its frame must stay fully readable afterward
    val resolved = ManifestTable.readVersion(spark, root, 4L)
    ManifestTable.vacuum(spark, root, keepLast = 2)
    assert(resolved.as[(Long, String)].collect().toSeq == Seq((4L, "v4")))
    assert(ManifestTable.readVersion(spark, root, 4L)
      .as[(Long, String)].collect().toSeq == Seq((4L, "v4")))
    // v3 is outside retention: loud, specific error — not a silent
    // empty read, not a missing-file mystery
    val e = intercept[IllegalArgumentException] {
      ManifestTable.readVersion(spark, root, 3L)
    }
    assert(e.getMessage.contains("vacuumed"))
    // and the commit RECORD is retained: version history still knows 3
    assert(ManifestTable.currentVersion(spark, root).contains(5L))
  }

  test("compaction bounds marker resolution: 1000 streaming commits " +
      "fold into one compact file; batch keys stay exact forever") {
    val root = freshRoot()
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // 1000 committed batches (markers only — resolution cost is about
    // the _commits listing, not the data)
    (1 to 1000).foreach(i =>
      ManifestTable.writeMarker(spark, root, i.toLong, s"ns-$i",
        dataDir = s"d$i-test"))
    val commits = new org.apache.hadoop.fs.Path(root, "_commits")
    assert(fs.listStatus(commits).length == 1000)
    ManifestTable.compact(spark, root)
    // one compact file + the current version's live marker
    val after = fs.listStatus(commits).map(_.getPath.getName).sorted
    assert(after.length == 2, s"listing not bounded: ${after.length}")
    assert(after.contains("_compact-999") && after.contains("v1000"))
    // nothing forgotten: version resolution and EVERY batch key exact
    assert(ManifestTable.currentVersion(spark, root).contains(1000L))
    (1 to 1000).foreach(i =>
      assert(ManifestTable.batchApplied(spark, root, s"ns-$i"), s"b$i"))
    assert(!ManifestTable.batchApplied(spark, root, "ns-1001"))
    // compaction is idempotent and keeps covering new commits
    ManifestTable.writeMarker(spark, root, 1001L, "ns-1001",
      dataDir = "d1001-test")
    ManifestTable.compact(spark, root)
    val after2 = fs.listStatus(commits).map(_.getPath.getName).sorted
    assert(after2.length == 2 && after2.contains("_compact-1000"))
    assert(ManifestTable.batchApplied(spark, root, "ns-1"))
    assert(ManifestTable.batchApplied(spark, root, "ns-1001"))
  }

  test("auto-compaction under a streaming-sized commit run keeps the " +
      "live listing bounded with real data + reads intact") {
    val root = freshRoot()
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    (1 to ManifestTable.autoCompactThreshold + 8).foreach(i =>
      ManifestTable.mergeBatch(spark, root,
        Seq((i.toLong, s"b$i")).toDF("k", "v"), Seq("k"), s"ns-$i"))
    val commits = new org.apache.hadoop.fs.Path(root, "_commits")
    val live = fs.listStatus(commits).map(_.getPath.getName)
      .count(_.startsWith("v"))
    assert(live <= ManifestTable.autoCompactThreshold + 1,
      s"auto-compaction did not bound the listing: $live live markers")
    // the table itself is complete and the full history replay-exact
    assert(ManifestTable.read(spark, root).get.count() ==
      (ManifestTable.autoCompactThreshold + 8).toLong)
    (1 to ManifestTable.autoCompactThreshold + 8).foreach(i =>
      assert(ManifestTable.batchApplied(spark, root, s"ns-$i")))
  }

  test("mergeEvolve: new source columns widen the table (old rows " +
      "null); missing source columns survive (inserted rows null); " +
      "type changes fail loudly") {
    val root = freshRoot()
    ManifestTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    // source adds column `extra` and updates key 1
    val widened = ManifestTable.mergeEvolve(spark, root,
      Seq((1L, "a2", 10), (3L, "c", 30)).toDF("k", "v", "extra"),
      keys = Seq("k"))
    assert(widened.columns.toSeq == Seq("k", "v", "extra"))
    val got = widened.as[(Long, String, Option[Int])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a2", Some(10)), (2L, "b", None),
      (3L, "c", Some(30))), s"widened: $got")
    // a later source MISSING `extra`: matched rows PRESERVE their
    // existing value (UPDATE SET * only writes the source's columns),
    // inserted rows read null there
    val narrowed = ManifestTable.mergeEvolve(spark, root,
      Seq((3L, "c2"), (4L, "d")).toDF("k", "v"), keys = Seq("k"))
    val got2 = narrowed.as[(Long, String, Option[Int])]
      .collect().sortBy(_._1).toSeq
    assert(got2 == Seq((1L, "a2", Some(10)), (2L, "b", None),
      (3L, "c2", Some(30)), (4L, "d", None)), s"narrowed: $got2")
    // a TYPE change on an existing column is refused, loudly
    val e = intercept[IllegalArgumentException] {
      ManifestTable.mergeEvolve(spark, root,
        Seq((5L, 99)).toDF("k", "v"), keys = Seq("k")) // v: int, was string
    }
    assert(e.getMessage.contains("type changes"))
  }

  test("version-only commit point: two writers racing ONE version " +
      "under different batch keys — exactly one commits (hammered)") {
    // the pre-round-11 format carried the batch key in the marker
    // NAME, so two writers of one version contended on DIFFERENT
    // rename targets and could BOTH succeed (cross-name TOCTOU, one
    // writer's rows silently lost). Version-only names make every
    // committer of version v race the same `v<N>` rename; hammer the
    // race and assert exactly one winner every round.
    (1 to 6).foreach { round =>
      val root = freshRoot()
      ManifestTable.commit(Seq((0L, "base")).toDF("k", "v"), root)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val gate = new java.util.concurrent.CountDownLatch(1)
      def racer(key: String, row: Long)
          : java.util.concurrent.Future[Boolean] =
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            gate.await()
            val dir = ManifestTable.writeVersionData(
              Seq((row, key)).toDF("k", "v"), root, 2L)
            try { ManifestTable.writeMarker(spark, root, 2L, key, dir); true }
            catch { case _: ConcurrentCommitException => false }
          }
        })
      val fa = racer("keyA", 1L); val fb = racer("keyB", 2L)
      gate.countDown()
      val (okA, okB) = (fa.get(), fb.get()); pool.shutdown()
      assert(okA ^ okB, s"round $round: expected exactly one winner, " +
        s"got A=$okA B=$okB")
      // exactly one v2 marker; its data is the winner's; the loser's
      // batch key is NOT applied and its data dir was deleted
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val v2Markers = fs.listStatus(
        new org.apache.hadoop.fs.Path(root, "_commits"))
        .map(_.getPath.getName).filter(_.startsWith("v2"))
      assert(v2Markers.toSeq == Seq("v2"), s"round $round: $v2Markers")
      val (winKey, loseKey) = if (okA) ("keyA", "keyB") else ("keyB", "keyA")
      assert(ManifestTable.batchApplied(spark, root, winKey))
      assert(!ManifestTable.batchApplied(spark, root, loseKey))
      val got = ManifestTable.readVersion(spark, root, 2L)
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((if (okA) 1L else 2L, winKey)), s"round $round: $got")
    }
  }

  test("legacy same-version duplicate markers (old name format) " +
      "resolve deterministically and compact drops the loser") {
    val root = freshRoot()
    ManifestTable.commit(Seq((1L, "v1")).toDF("k", "v"), root)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // fabricate the torn legacy state a pre-round-11 cross-name race
    // could leave: TWO markers for version 2 — the version-only name
    // (the winner under the smallest-name rule) and a legacy batch-
    // keyed name pointing at different data
    val dirWin = ManifestTable.writeVersionData(
      Seq((1L, "WINNER")).toDF("k", "v"), root, 2L)
    val dirLose = ManifestTable.writeVersionData(
      Seq((1L, "LOSER")).toDF("k", "v"), root, 2L)
    def rawMarker(name: String, content: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, "_commits"), name)
      val out = fs.create(p, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    rawMarker("v2", dirWin)
    rawMarker("v2-bK", dirLose)
    // every reader resolves the WINNER (smallest name), deterministically
    assert(ManifestTable.readVersion(spark, root, 2L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "WINNER")))
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().toSeq == Seq((1L, "WINNER")))
    // the loser's batch key never committed
    assert(!ManifestTable.batchApplied(spark, root, "K"))
    // compaction folds only the winner and deletes the loser's marker
    ManifestTable.commit(Seq((1L, "v3")).toDF("k", "v"), root)
    ManifestTable.compact(spark, root)
    val names = fs.listStatus(
      new org.apache.hadoop.fs.Path(root, "_commits"))
      .map(_.getPath.getName).toSet
    assert(!names.contains("v2-bK"), s"loser marker survived: $names")
    assert(ManifestTable.readVersion(spark, root, 2L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "WINNER")))
    assert(!ManifestTable.batchApplied(spark, root, "K"))
  }

  test("changes(): insert/delete/update/null-key classification " +
      "(direct, not via the q218 oracle)") {
    val root = freshRoot()
    ManifestTable.commit(
      Seq((Option(1L), "a"), (Option(2L), "b"), (Option(3L), "c"),
        (Option.empty[Long], "n1")).toDF("k", "v"), root)
    ManifestTable.commit(
      Seq((Option(1L), "a"), (Option(2L), "B2"), (Option(4L), "d"),
        (Option.empty[Long], "n2")).toDF("k", "v"), root)
    val got = ManifestTable.changes(spark, root, 1L, 2L, Seq("k"))
      .as[(Option[Long], String, String)].collect().toSeq
      .sortBy(r => (r._1.getOrElse(Long.MinValue), r._3))
    assert(got == Seq(
      // NULL key: side-presence flags (not key-nullness) classify it
      // as an UPDATE pair, never as a spurious insert+delete
      // ("update_postimage" < "update_preimage" in the sort)
      (None, "n2", "update_postimage"),
      (None, "n1", "update_preimage"),
      // k=1 unchanged: zero rows; k=2 updated; k=3 deleted; k=4 inserted
      (Some(2L), "B2", "update_postimage"),
      (Some(2L), "b", "update_preimage"),
      (Some(3L), "c", "delete"),
      (Some(4L), "d", "insert")), s"got: $got")
  }

  test("changes() composes with schema evolution: a feed across a " +
      "mergeEvolve commit null-fills the narrower side (Delta CDF " +
      "semantic) — pure widening emits zero change rows") {
    val root = freshRoot()
    ManifestTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)         // v1: (k,v)
    ManifestTable.mergeEvolve(spark, root,                    // v2: widen
      Seq((2L, "B2", 20), (3L, "c", 30)).toDF("k", "v", "extra"),
      keys = Seq("k"))
    val feed = ManifestTable.changes(spark, root, 1L, 2L, Seq("k"))
    // the feed reads in the CURRENT (widened) schema
    assert(feed.columns.toSeq == Seq("k", "v", "extra", "_change_type"))
    val got = feed.as[(Long, String, Option[Int], String)]
      .collect().toSeq.sortBy(r => (r._1, r._4))
    assert(got == Seq(
      // k=1 untouched by the evolve: NO change rows (null <=> null on
      // the new column) — widening alone is not a data change
      (2L, "B2", Some(20), "update_postimage"),
      (2L, "b", None, "update_preimage"),
      (3L, "c", Some(30), "insert")), s"got: $got")
    // an incremental consumer applying the feed to v1 reaches v2
    val v2 = ManifestTable.readVersion(spark, root, 2L)
      .as[(Long, String, Option[Int])].collect().toSeq.sortBy(_._1)
    assert(v2 == Seq((1L, "a", None), (2L, "B2", Some(20)),
      (3L, "c", Some(30))))
  }

  test("deleteWhere / updateWhere: committed DML versions with SQL " +
      "NULL-predicate semantics (NULL = no match) and loud unknown-" +
      "column rejection; time travel intact") {
    val root = freshRoot()
    ManifestTable.commit(Seq(
      (1L, Option(10), "a"), (2L, Option(3), "b"),
      (3L, Option.empty[Int], "c")).toDF("k", "n", "v"), root)
    // DELETE WHERE n > 5: k=3's NULL predicate must KEEP the row
    val v2 = ManifestTable.deleteWhere(spark, root, col("n") > 5)
    assert(v2 == 2L)
    assert(ManifestTable.read(spark, root).get
      .as[(Long, Option[Int], String)].collect().sortBy(_._1).toSeq ==
      Seq((2L, Some(3), "b"), (3L, None, "c")))
    // UPDATE WHERE n < 5 SET v: NULL predicate row untouched
    val v3 = ManifestTable.updateWhere(spark, root, col("n") < 5,
      Map("v" -> upper(col("v"))))
    assert(v3 == 3L)
    assert(ManifestTable.read(spark, root).get
      .as[(Long, Option[Int], String)].collect().sortBy(_._1).toSeq ==
      Seq((2L, Some(3), "B"), (3L, None, "c")))
    // the delete shows as exact retraction rows in the feed
    val del = ManifestTable.changes(spark, root, 1L, 2L, Seq("k"))
      .as[(Long, Option[Int], String, String)].collect().toSeq
    assert(del == Seq((1L, Some(10), "a", "delete")))
    // unknown SET column fails loudly, nothing committed
    intercept[IllegalArgumentException] {
      ManifestTable.updateWhere(spark, root, lit(true),
        Map("nope" -> lit(1)))
    }
    assert(ManifestTable.currentVersion(spark, root).contains(3L))
    // time travel across the DML history intact
    assert(ManifestTable.readVersion(spark, root, 1L).count() == 3L)
  }

  test("two concurrent streaming writers into ONE root serialize " +
      "through mergeBatchWithRetry: every version lands, every batch " +
      "key exactly-once, no committed row ever lost (hammered)") {
    val root = freshRoot()
    val perWriter = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val gate = new java.util.concurrent.CountDownLatch(1)
    def writer(ns: String, base: Long)
        : java.util.concurrent.Future[Unit] =
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          gate.await()
          (1 to perWriter).foreach { i =>
            ManifestTable.mergeBatchWithRetry(spark, root,
              Seq((base + i, s"$ns-$i")).toDF("k", "v"), Seq("k"),
              batchKey = s"$ns-$i", maxAttempts = 50)
          }
        }
      })
    val fa = writer("A", 0L); val fb = writer("B", 100L)
    gate.countDown()
    fa.get(); fb.get(); pool.shutdown()
    // versions serialize: 12 batch commits -> exactly 12 versions
    assert(ManifestTable.currentVersion(spark, root)
      .contains(2L * perWriter))
    // no lost rows: every writer's every batch is in the final table
    val expect = ((1 to perWriter).map(i => (i.toLong, s"A-$i")) ++
      (1 to perWriter).map(i => (100L + i, s"B-$i"))).sortBy(_._1)
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().sortBy(_._1).toSeq == expect)
    // exactly-once: every key applied; replaying one is a no-op even
    // through the retry wrapper
    (1 to perWriter).foreach { i =>
      assert(ManifestTable.batchApplied(spark, root, s"A-$i"))
      assert(ManifestTable.batchApplied(spark, root, s"B-$i"))
    }
    ManifestTable.mergeBatchWithRetry(spark, root,
      Seq((999L, "REPLAY")).toDF("k", "v"), Seq("k"), batchKey = "A-3")
    assert(ManifestTable.currentVersion(spark, root)
      .contains(2L * perWriter), "a replayed key must not commit")
    assert(ManifestTable.read(spark, root).get
      .filter($"k" === 999L).count() == 0L)
  }

  test("updateWhere: all SET right-hand sides and the WHERE predicate " +
      "evaluate against the PRE-update row (SQL UPDATE semantics — " +
      "SET a = b, b = a swaps)") {
    val root = freshRoot()
    ManifestTable.commit(
      Seq((1L, 10, 100), (2L, 20, 200)).toDF("k", "a", "b"), root)
    // the swap: with sequential withColumn application this would
    // yield a = b = original b (and depend on Map iteration order)
    ManifestTable.updateWhere(spark, root, col("k") === 1L,
      Map("a" -> col("b"), "b" -> col("a")))
    assert(ManifestTable.read(spark, root).get
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq ==
      Seq((1L, 100, 10), (2L, 20, 200)))
    // the WHERE itself references a SET column: must see pre-update a
    ManifestTable.updateWhere(spark, root, col("a") === 100,
      Map("a" -> lit(0), "b" -> (col("a") + 1)))
    assert(ManifestTable.read(spark, root).get
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq ==
      Seq((1L, 0, 101), (2L, 20, 200)))
  }

  test("batch keys with newlines are rejected at the commit entry " +
      "points (they would corrupt the compact-file parse); tabs in " +
      "keys survive the round-trip (first-tab parsing)") {
    val root = freshRoot()
    intercept[IllegalArgumentException] {
      ManifestTable.mergeBatch(spark, root,
        Seq((1L, "a")).toDF("k", "v"), Seq("k"), "bad\nkey")
    }
    assert(ManifestTable.currentVersion(spark, root).isEmpty,
      "nothing may commit under a rejected key")
    // tab-in-key: legal, exactly-once, and survives compaction
    val tk = "ns\tsub-1"
    ManifestTable.mergeBatch(spark, root,
      Seq((1L, "a")).toDF("k", "v"), Seq("k"), tk)
    ManifestTable.merge(spark, root,
      Seq((2L, "b")).toDF("k", "v"), Seq("k"))
    ManifestTable.compact(spark, root)
    assert(ManifestTable.batchApplied(spark, root, tk))
    ManifestTable.mergeBatch(spark, root,
      Seq((1L, "REPLAY")).toDF("k", "v"), Seq("k"), tk)
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b")), "tab-keyed replay must be a no-op")
  }

  test("changesPerVersion: one tagged diff per commit — a twice-touched " +
      "key appears at EACH touching version; composes across an evolve " +
      "step (pre-evolve steps null-fill the new column)") {
    val root = freshRoot()
    ManifestTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    ManifestTable.commit(Seq((1L, "A2"), (2L, "b")).toDF("k", "v"), root)
    ManifestTable.mergeEvolve(spark, root,
      Seq((1L, "A3", 7)).toDF("k", "v", "extra"), keys = Seq("k"))
    val feed = ManifestTable.changesPerVersion(spark, root, 1L, 3L,
      Seq("k"))
    val got = feed
      .select($"k", $"v", $"extra", $"_change_type", $"_commit_version")
      .as[(Long, String, Option[Int], String, Long)]
      .collect().toSeq.sortBy(r => (r._5, r._1, r._4))
    assert(got == Seq(
      // the NET feed (changes(1,3)) would collapse k=1 to ONE pair;
      // the history form shows both touches in commit order
      (1L, "A2", None, "update_postimage", 2L),
      (1L, "a", None, "update_preimage", 2L),
      (1L, "A3", Some(7), "update_postimage", 3L),
      (1L, "A2", None, "update_preimage", 3L)), s"got: $got")
  }

  test("compact batch-key retention: keys older than the horizon are " +
      "forgotten, version history and recent exactly-once intact") {
    val root = freshRoot()
    (1 to 10).foreach(i =>
      ManifestTable.mergeBatch(spark, root,
        Seq((i.toLong, s"b$i")).toDF("k", "v"), Seq("k"), s"ns-$i"))
    // horizon 3: keys at versions < 10 - 3 = 7 are forgotten
    ManifestTable.compact(spark, root, batchKeyRetention = 3L)
    (1 to 6).foreach(i =>
      assert(!ManifestTable.batchApplied(spark, root, s"ns-$i"),
        s"key ns-$i should be past the horizon"))
    (7 to 10).foreach(i =>
      assert(ManifestTable.batchApplied(spark, root, s"ns-$i"),
        s"key ns-$i inside the horizon must stay exact"))
    // replay INSIDE the horizon is still exactly-once
    ManifestTable.mergeBatch(spark, root,
      Seq((8L, "REPLAYED")).toDF("k", "v"), Seq("k"), "ns-8")
    assert(ManifestTable.currentVersion(spark, root).contains(10L))
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().sortBy(_._1).map(_._2).toSeq ==
      (1 to 10).map(i => s"b$i"))
    // the version→dir record survives key retention: time travel works
    assert(ManifestTable.readVersion(spark, root, 2L).count() == 2L)
  }

  test("vacuum orphan collection is age-floored: a live writer's " +
      "in-flight dir survives, stale crash debris is collected") {
    val root = freshRoot()
    ManifestTable.commit(Seq((1L, "v1")).toDF("k", "v"), root)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // an in-flight commit: data written, marker not yet landed
    val inFlight = ManifestTable.writeVersionData(
      Seq((2L, "writing")).toDF("k", "v"), root, 2L)
    ManifestTable.vacuum(spark, root, keepLast = 10, dropOrphans = true)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, inFlight)),
      "a fresh unreferenced dir (concurrent writer) must survive")
    // object-store shape: the DIRECTORY mtime is synthetic (0) but the
    // inner files are fresh — age must derive from the files, so the
    // live writer's dir still survives (round-11 ADVICE: a dir-mtime
    // floor collected in-flight commits on stores with mtime-0 dirs)
    fs.setTimes(new org.apache.hadoop.fs.Path(root, inFlight), 0L, -1)
    ManifestTable.vacuum(spark, root, keepLast = 10, dropOrphans = true)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, inFlight)),
      "fresh inner files must protect a dir whose own mtime is synthetic")
    // the same dir with its FILES aged past the floor = crash debris:
    // collected
    val old = System.currentTimeMillis() - 11 * 60 * 1000L
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(root, inFlight),
      true)
    while (it.hasNext) fs.setTimes(it.next().getPath, old, -1)
    ManifestTable.vacuum(spark, root, keepLast = 10, dropOrphans = true)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, inFlight)),
      "stale crash debris past the age floor must be collected")
    // committed data untouched throughout
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().toSeq == Seq((1L, "v1")))
  }

  test("optimize: small files compact into targetFiles with ZERO " +
      "logical change — the change feed across the optimize commit is " +
      "empty, content and history intact") {
    val root = freshRoot()
    // a fragmented version: 8 shuffle partitions -> 8 small files
    ManifestTable.commit(
      spark.range(0, 64).selectExpr("id AS k", "CAST(id * 2 AS STRING) AS v")
        .repartition(8), root)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def filesOf(v: Long): Int = {
      val dir = ManifestTable.readVersion(spark, root, v).inputFiles
      dir.length
    }
    assert(filesOf(1L) == 8)
    val v2 = ManifestTable.optimize(spark, root, targetFiles = 1)
    assert(v2 == 2L && filesOf(2L) == 1)
    // logically a no-op: Delta's dataChange=false, pinned as an EMPTY
    // change feed — an incremental consumer applies zero rows
    assert(ManifestTable.changes(spark, root, 1L, 2L, Seq("k"))
      .count() == 0L)
    // content identical; the pre-optimize version still time-travels
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      ManifestTable.readVersion(spark, root, 1L)
        .as[(Long, String)].collect().sortBy(_._1).toSeq)
  }

  test("streaming-path retention: mergeBatch auto-compaction applies " +
      "the caller's batchKeyRetention — compact file stays O(recent), " +
      "recent replay still exactly-once") {
    val root = freshRoot()
    val n = ManifestTable.autoCompactThreshold + 8 // 72 batches
    (1 to n).foreach(i =>
      ManifestTable.mergeBatch(spark, root,
        Seq((i.toLong, s"b$i")).toDF("k", "v"), Seq("k"), s"ns-$i",
        batchKeyRetention = 5L))
    // auto-compaction ran (past the threshold) WITH the horizon: keys
    // far below it are forgotten, keys at/above the horizon (and all
    // still-live markers) stay exact
    assert(!ManifestTable.batchApplied(spark, root, "ns-1"))
    assert(!ManifestTable.batchApplied(spark, root, "ns-30"))
    assert(ManifestTable.batchApplied(spark, root, s"ns-${n - 1}"))
    assert(ManifestTable.batchApplied(spark, root, s"ns-$n"))
    // a replay INSIDE the horizon is still a no-op
    ManifestTable.mergeBatch(spark, root,
      Seq((n.toLong, "REPLAYED")).toDF("k", "v"), Seq("k"), s"ns-$n",
      batchKeyRetention = 5L)
    assert(ManifestTable.read(spark, root).get.count() == n.toLong)
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().toMap.apply(n.toLong) == s"b$n")
    // version history intact despite forgotten keys
    assert(ManifestTable.readVersion(spark, root, 2L).count() == 2L)
  }

  test("mergeBatchFold: the fold reads the SAME pinned base snapshot " +
      "the merge commits against; a replayed key never runs the fold") {
    val root = freshRoot()
    def addBatch(key: String, inc: Long): Unit =
      ManifestTable.mergeBatchFold(spark, root, Seq("k"), key, {
        case None => Seq((1L, inc)).toDF("k", "n")
        case Some(base) =>
          // accumulate against the pinned base version
          val prev = base.as[(Long, Long)].collect().head._2
          Seq((1L, prev + inc)).toDF("k", "n")
      })
    addBatch("b0", 5L); addBatch("b1", 7L); addBatch("b2", 1L)
    assert(ManifestTable.read(spark, root).get
      .as[(Long, Long)].collect().toSeq == Seq((1L, 13L)))
    // replay: the fold must not even be evaluated
    var folded = false
    ManifestTable.mergeBatchFold(spark, root, Seq("k"), "b1",
      { _ => folded = true; Seq((1L, 999L)).toDF("k", "n") })
    assert(!folded, "replayed batch evaluated its fold")
    assert(ManifestTable.read(spark, root).get
      .as[(Long, Long)].collect().toSeq == Seq((1L, 13L)))
  }
}
