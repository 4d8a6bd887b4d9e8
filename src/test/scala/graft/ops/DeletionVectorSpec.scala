package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

/** Merge-on-read DELETE via deletion vectors: the version carries the
  * base's files unchanged plus a position vector; readers anti-join,
  * rewriters materialize. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = java.nio.file.Files
    .createTempDirectory("graft_dv_").toString + "/tbl"

  private def kv(rows: (Long, Long)*) = rows.toSeq.toDF("k", "n")

  test("DV delete rewrites nothing and readers see post-delete truth") {
    val root = freshRoot()
    ManifestTable.commit(kv((1L to 10L).map(i => i -> i * 10L): _*), root)
    val v1Files = ManifestTable.versionDataDir(spark, root, 1L)
    ManifestTable.deleteWhereDV(spark, root, col("k") % 3L === 0L)
    // zero-copy: v2 references exactly v1's files
    val refs = ManifestTable.versionFileRefs(spark, root, 2L).get
    assert(refs.nonEmpty && refs.forall(_.startsWith(s"$v1Files/")))
    // merge-on-read: deleted keys are gone, others intact
    assert(ManifestTable.read(spark, root).get.as[(Long, Long)]
      .collect().map(_._1).sorted.toSeq ==
      Seq(1L, 2L, 4L, 5L, 7L, 8L, 10L))
    // time travel: v1 is untouched
    assert(ManifestTable.readVersion(spark, root, 1L).count() == 10L)
    // NULL predicate = not matched = kept
    val root2 = freshRoot()
    ManifestTable.commit(
      Seq((1L, Some(1L)), (2L, None: Option[Long])).toDF("k", "n"), root2)
    ManifestTable.deleteWhereDV(spark, root2, col("n") > 0L)
    assert(ManifestTable.read(spark, root2).get
      .as[(Long, Option[Long])].collect().toSeq == Seq((2L, None)))
  }

  test("DV deletes are cumulative and compose with the change feed") {
    val root = freshRoot()
    ManifestTable.commit(kv((1L to 8L).map(i => i -> i): _*), root)
    ManifestTable.deleteWhereDV(spark, root, col("k") <= 2L)  // v2
    ManifestTable.deleteWhereDV(spark, root, col("k") === 5L) // v3
    assert(ManifestTable.read(spark, root).get.as[(Long, Long)]
      .collect().map(_._1).sorted.toSeq == Seq(3L, 4L, 6L, 7L, 8L))
    // the feed across each DV commit is exactly its delete set
    val f12 = ManifestTable.changes(spark, root, 1L, 2L, Seq("k"))
    assert(f12.filter($"_change_type" === "delete").count() == 2L)
    assert(f12.count() == 2L)
    val f23 = ManifestTable.changes(spark, root, 2L, 3L, Seq("k"))
    assert(f23.filter($"_change_type" === "delete")
      .select($"k").as[Long].collect().toSeq == Seq(5L))
    // deleting an already-DV-deleted row is a no-op, not a double
    ManifestTable.deleteWhereDV(spark, root, col("k") <= 5L)    // v4
    assert(ManifestTable.changes(spark, root, 3L, 4L, Seq("k"))
      .count() == 2L) // only 3 and 4 newly disappear
  }

  test("rewriting commits MATERIALIZE the vector (optimize, merge)") {
    val root = freshRoot()
    ManifestTable.commit(kv((1L to 10L).map(i => i -> i): _*), root)
    ManifestTable.deleteWhereDV(spark, root, col("k") > 8L)   // v2
    ManifestTable.optimize(spark, root)                        // v3
    // v3 is a plain dir with no vector and no file list
    val d3 = ManifestTable.versionDataDir(spark, root, 3L)
    assert(ManifestTable.fileList(spark, root, d3).isEmpty)
    assert(ManifestTable.dvOf(spark, root, d3).isEmpty)
    assert(ManifestTable.readVersion(spark, root, 3L).count() == 8L)
    // a MERGE on top of a DV version sees post-delete base truth
    val root2 = freshRoot()
    ManifestTable.commit(kv(1L -> 1L, 2L -> 2L, 3L -> 3L), root2)
    ManifestTable.deleteWhereDV(spark, root2, col("k") === 2L)
    ManifestTable.merge(spark, root2, kv(4L -> 4L), Seq("k"))
    assert(ManifestTable.read(spark, root2).get.as[(Long, Long)]
      .collect().map(_._1).sorted.toSeq == Seq(1L, 3L, 4L))
  }

  test("scoped DML on a DV version: touched materialize, rest carried") {
    val root = freshRoot()
    val df = spark.range(1, 201)
      .select(col("id").as("x"), (col("id") % 8).as("y"),
        col("id").as("k"), col("id").as("n"))
    ManifestTable.commit(df, root)
    ZTable.optimizeZOrder(spark, root, "x", "y", "k", nFiles = 8) // v2
    ManifestTable.deleteWhereDV(spark, root, col("x") % 10L === 0L) // v3
    assert(ManifestTable.read(spark, root).get.count() == 180L)
    // scoped delete of [1,50]: touched files drop their DV'd rows AND
    // the scoped range; untouched files keep their carried DV rows
    ZTable.deleteWhereScoped(spark, root, 1L, 50L)                  // v4
    // expected: x in 51..200 minus multiples of 10 => 150 - 15 = 135
    assert(ManifestTable.read(spark, root).get.count() == 135L)
    // and the pruned committed-stats scan agrees with a full filter
    val scan = ZTable.scanXRange(spark, root, 60L, 120L)
    assert(scan.count() ==
      (60L to 120L).count(x => x % 10L != 0L).toLong)
  }

  test("DV update appends post-images and rewrites nothing") {
    val root = freshRoot()
    ManifestTable.commit(kv((1L to 10L).map(i => i -> i): _*), root)
    val v1Dir = ManifestTable.versionDataDir(spark, root, 1L)
    val v1Files = ManifestTable.readVersion(spark, root, 1L)
      .inputFiles.length
    ManifestTable.updateWhereDV(spark, root, col("k") % 3L === 0L,
      Map("n" -> (col("n") * 100L)))                            // v2
    val refs = ManifestTable.versionFileRefs(spark, root, 2L).get
    // every v1 file carried by reference, plus small appended files
    assert(refs.count(_.startsWith(s"$v1Dir/")) == v1Files)
    assert(refs.exists(r => !r.startsWith(s"$v1Dir/")))
    assert(ManifestTable.read(spark, root).get.as[(Long, Long)]
      .collect().sorted.toSeq ==
      (1L to 10L).map(i => i -> (if (i % 3 == 0) i * 100L else i)))
    // CDF across the merge-on-read update: exact pre/post pairs
    val f = ManifestTable.changes(spark, root, 1L, 2L, Seq("k"))
    assert(f.filter($"_change_type" === "update_preimage").count() == 3L)
    assert(f.filter($"_change_type" === "update_postimage").count() == 3L)
    assert(f.count() == 6L)
    // filter-then-assign: SET a=b, b=a SWAPS against pre-update rows
    val root2 = freshRoot()
    ManifestTable.commit(Seq((1L, 10L, 20L)).toDF("k", "a", "b"), root2)
    ManifestTable.updateWhereDV(spark, root2, col("a") < col("b"),
      Map("a" -> col("b"), "b" -> col("a")))
    assert(ManifestTable.read(spark, root2).get
      .as[(Long, Long, Long)].collect().toSeq == Seq((1L, 20L, 10L)))
  }

  test("DV update enforces checks on the post-image; stats drop loud") {
    val root = freshRoot()
    val df = spark.range(1, 101)
      .select(col("id").as("x"), (col("id") % 8).as("y"),
        col("id").as("k"), lit(5L).as("n"))
    ManifestTable.commit(df, root)
    ZTable.optimizeZOrder(spark, root, "x", "y", "k", nFiles = 4)
    Checks.setCheck(spark, root, "n_pos", "n > 0")
    intercept[CheckViolationException] {
      ManifestTable.updateWhereDV(spark, root, col("x") <= 10L,
        Map("n" -> lit(-1L)))
    }
    assert(ManifestTable.currentVersion(spark, root).contains(2L))
    ManifestTable.updateWhereDV(spark, root, col("x") <= 10L,
      Map("n" -> lit(9L)))                                       // v3
    assert(ManifestTable.read(spark, root).get
      .filter(col("n") === 9L).count() == 10L)
    // the appended file has no stats row: committed-stats scans fail
    // LOUDLY instead of silently missing it
    intercept[IllegalArgumentException] {
      ZTable.scanXRange(spark, root, 1L, 50L)
    }
    // ...until the next optimize re-establishes the layout
    ZTable.optimizeZOrder(spark, root, "x", "y", "k", nFiles = 4)
    assert(ZTable.scanXRange(spark, root, 1L, 10L).count() == 10L)
  }

  test("bloom candidate reads apply the vector; detail reports it") {
    val root = freshRoot()
    val df = spark.range(1, 201)
      .select(col("id").as("x"), (col("id") % 8).as("y"),
        col("id").as("k"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("w"),
          col("id")).as("word"))
    ManifestTable.commit(df, root)
    ZTable.optimizeZOrder(spark, root, "x", "y", "k", nFiles = 4,
      bloomCol = Some("word"))
    ManifestTable.deleteWhereDV(spark, root, col("k") === 42L)
    // the raw candidate files still CONTAIN the deleted row; the safe
    // read does not
    val safe = ZTable.readBloomCandidates(spark, root, lit("w42"))
    assert(safe.filter(col("word") === "w42").count() == 0L)
    val other = ZTable.readBloomCandidates(spark, root, lit("w43"))
    assert(other.filter(col("word") === "w43").count() == 1L)
    val d = ManifestTable.detail(spark, root).collect().head
    assert(d.getAs[Boolean]("has_dv") && d.getAs[Boolean]("has_bloom"))
  }

  test("restore and shallow clone carry the vector") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_dv_").toString
    val (src, cl) = (s"$base/src", s"$base/cl")
    ManifestTable.commit(kv((1L to 6L).map(i => i -> i): _*), src)
    ManifestTable.deleteWhereDV(spark, src, col("k") > 4L)  // v2: {1..4}
    ManifestTable.cloneShallow(spark, src, cl)
    assert(ManifestTable.read(spark, cl).get.count() == 4L)
    ManifestTable.deleteWhere(spark, src, col("k") === 1L)  // src v3
    ManifestTable.restore(spark, src, 2L)                   // src v4
    assert(ManifestTable.read(spark, src).get.as[(Long, Long)]
      .collect().map(_._1).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // history records the merge-on-read deletes as DELETE versions
    val ops = ManifestTable.history(spark, src)
      .orderBy(col("version")).select("operation")
      .as[String].collect().toSeq
    assert(ops == Seq("WRITE", "DELETE", "DELETE", "RESTORE"))
  }
}
