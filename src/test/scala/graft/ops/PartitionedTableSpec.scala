package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** First-class partition columns in the manifest store
  * ([[PartitionedTable]]): partition values ride the version's
  * `_parts` metadata, pruned reads open only matching partitions'
  * files, a partition DROP is zero-copy, and partition-scoped DML
  * carries every other partition by path reference. */
class PartitionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = java.nio.file.Files
    .createTempDirectory("graft_ptable_").toString + "/tbl"

  private def fact(lo: Long, hi: Long) =
    spark.range(lo, hi).select($"id".as("k"),
      concat(lit("g"), $"id" % 3).as("g"),
      ($"id" % 5).cast("string").as("day"),
      ($"id" * 10).cast("double").as("v"))

  test("commitPartitioned: one partition value per file, pruned read " +
      "opens exactly that partition, NULL partition values refused") {
    val root = freshRoot()
    PartitionedTable.commitPartitioned(spark, root,
      fact(0, 500), "day")                                     // v1
    // partition metadata covers every file, one value per file
    val rows = PartitionedTable.parts(spark, root, 1L)
      .select($"path", $"value").as[(String, String)].collect()
    assert(rows.map(_._2).distinct.sorted.toSeq ==
      (0 to 4).map(_.toString))
    // plain read through the normal manifest path sees everything
    assert(ManifestTable.read(spark, root).get.count() == 500L)
    // pruned read: exactly the partition's files, exact rows
    val day2 = PartitionedTable.readPartitions(spark, root, Seq("2"))
    val day2Paths = rows.filter(_._2 == "2").map(_._1).toSet
    assert(day2.inputFiles.map(f =>
      ManifestTable.fileKeyOf(f)).toSet ==
      day2Paths.map(ManifestTable.fileKeyOf))
    assert(day2.count() == 100L &&
      day2.filter($"day" =!= "2").count() == 0L)
    // nothing-matches: empty frame, correct schema
    assert(PartitionedTable.readPartitions(spark, root, Seq("9"))
      .count() == 0L)
    // null partition values are rejected loudly
    intercept[IllegalArgumentException] {
      PartitionedTable.commitPartitioned(spark, freshRoot(),
        Seq((1L, null: String)).toDF("k", "day"), "day")
    }
  }

  test("appendPartitioned: O(batch) — every base file carried by " +
      "reference, only the batch's partitions gain files") {
    val root = freshRoot()
    PartitionedTable.commitPartitioned(spark, root,
      fact(0, 300), "day")                                     // v1
    val v1Paths = PartitionedTable.parts(spark, root, 1L)
      .select("path").as[String].collect().toSet
    PartitionedTable.appendPartitioned(spark, root,
      fact(300, 400))                                          // v2
    val v2 = PartitionedTable.parts(spark, root, 2L)
      .select($"path", $"value").as[(String, String)].collect()
    // base paths carried verbatim
    assert(v1Paths.subsetOf(v2.map(_._1).toSet))
    assert(ManifestTable.read(spark, root).get.count() == 400L)
    // the pruned read sees old + new rows of the partition
    assert(PartitionedTable.readPartitions(spark, root, Seq("1"))
      .count() == 80L)
  }

  test("dropPartitions is ZERO-COPY; guards refuse empty/total drops; " +
      "vacuum keeps carried dirs alive while referenced") {
    val root = freshRoot()
    PartitionedTable.commitPartitioned(spark, root,
      fact(0, 500), "day")                                     // v1
    val v1Paths = PartitionedTable.parts(spark, root, 1L)
      .select("path").as[String].collect().toSet
    PartitionedTable.dropPartitions(spark, root, Seq("0", "3")) // v2
    val refs = ManifestTable.versionFileRefs(spark, root, 2L).get
    // zero-copy: every surviving file IS a v1 file, no new bytes
    assert(refs.toSet.subsetOf(v1Paths))
    val got = ManifestTable.read(spark, root).get
    assert(got.count() == 300L &&
      got.filter($"day".isin("0", "3")).count() == 0L)
    intercept[IllegalArgumentException] {
      PartitionedTable.dropPartitions(spark, root, Seq("9"))
    }
    intercept[IllegalArgumentException] {
      PartitionedTable.dropPartitions(spark, root,
        Seq("1", "2", "4"))
    }
    // vacuum: v2 references v1's dir — it must survive keepLast=1
    ManifestTable.vacuum(spark, root, keepLast = 1)
    assert(ManifestTable.read(spark, root).get.count() == 300L)
  }

  test("deleteWhereInPartitions rewrites ONLY the named partitions; " +
      "every other partition rides by PATH IDENTITY") {
    val root = freshRoot()
    PartitionedTable.commitPartitioned(spark, root,
      fact(0, 500), "day")                                     // v1
    val v1 = PartitionedTable.parts(spark, root, 1L)
      .select($"path", $"value").as[(String, String)].collect()
    PartitionedTable.deleteWhereInPartitions(spark, root,
      Seq("1"), $"k" % 2 === 0)                                // v2
    val v2 = PartitionedTable.parts(spark, root, 2L)
      .select($"path", $"value").as[(String, String)].collect()
    // untouched partitions: the SAME paths, verbatim
    val untouched1 = v1.filter(_._2 != "1").map(_._1).toSet
    assert(untouched1.subsetOf(v2.map(_._1).toSet))
    // the touched partition's files are all NEW
    assert(v2.filter(_._2 == "1").forall(r =>
      !v1.map(_._1).contains(r._1)))
    val got = ManifestTable.read(spark, root).get
    // day=1: keys k%5==1; deleted the even ones
    assert(got.filter($"day" === "1").count() == 50L)
    assert(got.filter($"day" === "1" && $"k" % 2 === 0).count() == 0L)
    assert(got.count() == 450L)
    // pruned read of the touched partition agrees
    assert(PartitionedTable.readPartitions(spark, root, Seq("1"))
      .count() == 50L)
    // a DV delete on the partitioned table: _parts carried, pruned
    // read applies the vector
    ManifestTable.deleteWhereDV(spark, root, $"k" === 7L)      // v3
    assert(PartitionedTable.readPartitions(spark, root, Seq("2"))
      .filter($"k" === 7L).count() == 0L)
    assert(PartitionedTable.readPartitions(spark, root, Seq("2"))
      .count() == 99L)
  }
}
