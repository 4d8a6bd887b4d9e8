package graft.ops

import graft.SparkSpec

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
    // the next commit claims version 2, overwriting the orphan dir
    val v = ManifestTable.commit(Seq((1L, "v2")).toDF("k", "v"), root)
    assert(v == 2L)
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String)].collect().toSeq == Seq((1L, "v2")))
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
}
