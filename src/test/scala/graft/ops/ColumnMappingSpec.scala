package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

/** Column mapping (Delta's column-mapping mode): RENAME/DROP COLUMN
  * as metadata-only commits — the version carries the base's files
  * and vector verbatim, only the logical→physical `_colmap` changes;
  * full rewrites materialize the mapping, file-list commits translate
  * appended files to physical names. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = java.nio.file.Files
    .createTempDirectory("graft_cm_").toString + "/tbl"

  private def kv(rows: (Long, Long)*) = rows.toSeq.toDF("k", "n")

  test("RENAME COLUMN is metadata-only; readers see the new name") {
    val root = freshRoot()
    ManifestTable.commit(kv((1L to 5L).map(i => i -> i * 10L): _*), root)
    val v1Refs = ManifestTable.readVersion(spark, root, 1L).inputFiles
    ManifestTable.renameColumn(spark, root, "n", "amount")    // v2
    // zero-copy: v2 references exactly v1's files
    val refs = ManifestTable.versionFileRefs(spark, root, 2L).get
    assert(refs.size == v1Refs.length &&
      refs.forall(_.startsWith("d1-")))
    // logical view: new name, same values
    val df = ManifestTable.read(spark, root).get
    assert(df.columns.toSeq == Seq("k", "amount"))
    assert(df.as[(Long, Long)].collect().sorted.toSeq ==
      (1L to 5L).map(i => i -> i * 10L))
    // time travel: v1 still reads the OLD name
    assert(ManifestTable.readVersion(spark, root, 1L)
      .columns.toSeq == Seq("k", "n"))
    // guards: unknown source, colliding target
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "n", "x")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "amount", "k")
    }
    // history records the op
    assert(ManifestTable.history(spark, root)
      .filter($"version" === 2L).select("operation")
      .as[String].head() == "RENAME COLUMN")
  }

  test("DROP COLUMN hides the column; physical data survives") {
    val root = freshRoot()
    ManifestTable.commit(
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "n", "t"), root)
    ManifestTable.dropColumn(spark, root, "t")                // v2
    val df = ManifestTable.read(spark, root).get
    assert(df.columns.toSeq == Seq("k", "n"))
    // the physical column is still IN the carried files (zero-copy
    // drop — invisible behind the mapping, not rewritten away)
    val refs = ManifestTable.versionFileRefs(spark, root, 2L).get
    val raw = spark.read.parquet(
      refs.map(r => s"$root/$r"): _*)
    assert(raw.columns.contains("t"))
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, root, "t") // already gone
    }
  }

  test("feed across RENAME and DROP is EMPTY; real changes still show") {
    val root = freshRoot()
    ManifestTable.commit(
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "n", "t"), root)
    ManifestTable.renameColumn(spark, root, "n", "amount")    // v2
    assert(ManifestTable.changes(spark, root, 1L, 2L, Seq("k"))
      .count() == 0L)
    ManifestTable.dropColumn(spark, root, "t")                // v3
    assert(ManifestTable.changes(spark, root, 2L, 3L, Seq("k"))
      .count() == 0L)
    // and across BOTH metadata commits at once
    assert(ManifestTable.changes(spark, root, 1L, 3L, Seq("k"))
      .count() == 0L)
    // a DV delete on the mapped table: predicate on the NEW name,
    // feed shows the exact delete in the CURRENT schema
    ManifestTable.deleteWhereDV(spark, root, col("amount") === 20L) // v4
    val f = ManifestTable.changes(spark, root, 3L, 4L, Seq("k"))
    assert(f.filter($"_change_type" === "delete")
      .select($"k").as[Long].collect().toSeq == Seq(2L))
    assert(f.columns.toSet == Set("k", "amount", "_change_type"))
  }

  test("DV update and merge on a mapped table write PHYSICAL appends") {
    val root = freshRoot()
    ManifestTable.commit(kv((1L to 6L).map(i => i -> i): _*), root)
    ManifestTable.renameColumn(spark, root, "n", "amount")    // v2
    ManifestTable.updateWhereDV(spark, root, col("k") === 3L,
      Map("amount" -> lit(333L)))                             // v3
    // appended post-image files share the carried files' physical
    // schema — one mixed read must not tear
    assert(ManifestTable.read(spark, root).get
      .filter($"k" === 3L).select($"amount").as[Long].head() == 333L)
    ManifestTable.mergeDV(spark, root,
      Seq((6L, 60L), (7L, 70L)).toDF("k", "amount"), Seq("k")) // v4
    val got = ManifestTable.read(spark, root).get
    assert(got.columns.toSeq == Seq("k", "amount"))
    assert(got.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 333L, 4L -> 4L, 5L -> 5L,
        6L -> 60L, 7L -> 70L))
    // the mapping rides every file-list commit
    val d4 = ManifestTable.versionDataDir(spark, root, 4L)
    assert(ManifestTable.colmapOf(spark, root, d4).isDefined)
  }

  test("a full rewrite MATERIALIZES the mapping") {
    val root = freshRoot()
    ManifestTable.commit(kv((1L to 4L).map(i => i -> i): _*), root)
    ManifestTable.renameColumn(spark, root, "n", "amount")    // v2
    ManifestTable.merge(spark, root,
      Seq((1L, 100L)).toDF("k", "amount"), Seq("k"))          // v3
    val d3 = ManifestTable.versionDataDir(spark, root, 3L)
    assert(ManifestTable.colmapOf(spark, root, d3).isEmpty)
    // files now carry the logical name physically
    val raw = spark.read.parquet(s"$root/$d3")
    assert(raw.columns.toSeq == Seq("k", "amount"))
    assert(ManifestTable.read(spark, root).get.as[(Long, Long)]
      .collect().toMap ==
      Map(1L -> 100L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("restore and shallow clone carry the mapping") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_cm_").toString
    val (src, cl) = (s"$base/src", s"$base/cl")
    ManifestTable.commit(kv((1L to 4L).map(i => i -> i): _*), src)
    ManifestTable.renameColumn(spark, src, "n", "amount")     // v2
    ManifestTable.cloneShallow(spark, src, cl)
    assert(ManifestTable.read(spark, cl).get
      .columns.toSeq == Seq("k", "amount"))
    ManifestTable.merge(spark, src,
      Seq((1L, 9L)).toDF("k", "amount"), Seq("k"))            // v3
    ManifestTable.restore(spark, src, 2L)                     // v4
    val restored = ManifestTable.read(spark, src).get
    assert(restored.columns.toSeq == Seq("k", "amount"))
    assert(restored.as[(Long, Long)].collect().toMap ==
      (1L to 4L).map(i => i -> i).toMap)
  }

  test("optimizeZOrder on a mapped table materializes and re-arms " +
      "committed skipping on the NEW logical names") {
    val root = freshRoot()
    ManifestTable.commit(
      spark.range(1, 201).select(col("id").as("x"), (col("id") % 8)
        .as("y"), col("id").as("k")), root)
    ManifestTable.renameColumn(spark, root, "x", "xid")        // v2
    // stats were dropped by the mapping commit; re-establish on the
    // new logical schema — the rewrite also materializes the mapping
    ZTable.optimizeZOrder(spark, root, "xid", "y", "k", nFiles = 4) // v3
    val d3 = ManifestTable.versionDataDir(spark, root, 3L)
    assert(ManifestTable.colmapOf(spark, root, d3).isEmpty)
    val scan = ZTable.scanXRange(spark, root, 50L, 120L)
    assert(scan.columns.contains("xid"))
    assert(scan.count() == 71L)
    // feed across the materializing layout commit is still EMPTY
    assert(ManifestTable.changes(spark, root, 2L, 3L, Seq("k"))
      .count() == 0L)
  }

  test("change-feed consumer stays exact across DV merges; a rename " +
      "of an unconsumed column is an empty step") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_cm_").toString
    val (src, sink) = (s"$base/src", s"$base/sink")
    def rows(xs: (Long, String, Double)*) =
      xs.toSeq.toDF("k", "g", "v")
    ManifestTable.commit(
      rows((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 5.0)), src)
    def step() = ChangeFeed.sync(spark, src, sink,
      keys = Seq("k"), groupCols = Seq("g"),
      col("v").cast("decimal(18,6)"), "sum_v")
    step() // bootstrap at v1
    // merge-on-read commits feed the consumer exactly
    ManifestTable.mergeDV(spark, src,
      rows((2L, "b", 25.0), (4L, "c", 1.0)), Seq("k"))         // v2
    ManifestTable.deleteWhereDV(spark, src, col("k") === 3L)   // v3
    step()
    // a rename of a column the consumer never references: the feed
    // across it is EMPTY, the sync applies an identity step
    ManifestTable.renameColumn(spark, src, "k", "id")          // v4
    ChangeFeed.sync(spark, src, sink, keys = Seq("id"),
      groupCols = Seq("g"), col("v").cast("decimal(18,6)"), "sum_v")
    val got = ManifestTable.read(spark, sink).get
      .select(col("g"), col("sum_v").cast("double"))
      .as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 10.0, "b" -> 25.0, "c" -> 1.0),
      s"got $got")
  }

  test("ADD COLUMN is metadata-only: typed null until a full rewrite " +
      "materializes; a CoW merge lands real values") {
    val root = freshRoot()
    ManifestTable.commit(kv((1L to 4L).map(i => i -> i): _*), root)
    ManifestTable.addColumn(spark, root, "w", "double")        // v2
    // zero-copy + typed-null reads
    assert(ManifestTable.versionFileRefs(spark, root, 2L).get
      .forall(_.startsWith("d1-")))
    val df = ManifestTable.read(spark, root).get
    assert(df.columns.toSeq == Seq("k", "n", "w"))
    assert(df.schema("w").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(df.filter(col("w").isNull).count() == 4L)
    // feed across the add is EMPTY (widening)
    assert(ManifestTable.changes(spark, root, 1L, 2L, Seq("k"))
      .count() == 0L)
    // DV DELETE writes no data files — always available
    ManifestTable.deleteWhereDV(spark, root, col("k") === 4L)  // v3
    // a CoW merge MATERIALIZES: values land, mapping gone
    ManifestTable.merge(spark, root,
      Seq((1L, 1L, 9.5), (5L, 5L, 1.5)).toDF("k", "n", "w"),
      Seq("k"))                                                // v4
    val d4 = ManifestTable.versionDataDir(spark, root, 4L)
    assert(ManifestTable.colmapOf(spark, root, d4).isEmpty)
    assert(ManifestTable.read(spark, root).get
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t._3).toMap ==
      Map(1L -> Some(9.5), 2L -> None, 3L -> None, 5L -> Some(1.5)))
    // and MoR writers keep working after materialization
    ManifestTable.mergeDV(spark, root,
      Seq((6L, 6L, 3.5)).toDF("k", "n", "w"), Seq("k"))        // v5
    assert(ManifestTable.read(spark, root).get.count() == 5L)
    // invalid DDL fails at ADD time, not first read
    intercept[Exception] {
      ManifestTable.addColumn(spark, root, "bad", "not a type")
    }
  }

  test("MoR writers survive a metadata-only ADD COLUMN: appended " +
      "fragments back the column, carried files null-fill, no tear") {
    val root = freshRoot()
    ManifestTable.commit(kv((1L to 6L).map(i => i -> i): _*), root)
    ManifestTable.addColumn(spark, root, "w", "double")        // v2
    // a MoR merge whose SOURCE PREDATES the column (the streaming
    // sink keeps running across the DDL): null-filled on inserts
    ManifestTable.mergeDV(spark, root,
      Seq((7L, 70L)).toDF("k", "n"), Seq("k"))                 // v3
    val got3 = ManifestTable.read(spark, root).get
    assert(got3.columns.toSeq == Seq("k", "n", "w"))
    assert(got3.count() == 7L &&
      got3.filter(col("w").isNull).count() == 7L)
    // a MoR merge whose source PROVIDES the column: inserts get
    // values, every carried row still reads null — one mixed read
    ManifestTable.mergeDV(spark, root,
      Seq((8L, 80L, 8.5), (1L, 10L, 1.5)).toDF("k", "n", "w"),
      Seq("k"))                                                // v4
    val got4 = ManifestTable.read(spark, root).get
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got4 == Map(
      1L -> ((10L, Some(1.5))), 2L -> ((2L, None)), 3L -> ((3L, None)),
      4L -> ((4L, None)), 5L -> ((5L, None)), 6L -> ((6L, None)),
      7L -> ((70L, None)), 8L -> ((80L, Some(8.5)))))
    // a MoR UPDATE BACKFILLS the column for matched rows
    ManifestTable.updateWhereDV(spark, root, col("k") === 2L,
      Map("w" -> lit(2.5)))                                    // v5
    assert(ManifestTable.read(spark, root).get
      .filter(col("k") === 2L).select(col("w"))
      .as[Double].head() == 2.5)
    // describeColumns: the column is now backed
    assert(ManifestTable.describeColumns(spark, root)
      .filter($"column" === "w").select($"backed")
      .as[Boolean].head())
    // feeds across the whole chain stay exact
    val f = ManifestTable.changes(spark, root, 2L, 5L, Seq("k"))
    assert(f.filter($"_change_type" === "insert")
      .select($"k").as[Long].collect().toSet == Set(7L, 8L))
    // binPack folds the mixed fragments; reads stay exact
    val fsq = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val refs = ManifestTable.versionFileRefs(spark, root, 5L).get
    val maxLen = refs.map(r => fsq.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$root/$r")).getLen).max
    ManifestTable.optimizeBinPack(spark, root,
      minFileBytes = maxLen + 1)                               // v6
    val got6 = ManifestTable.read(spark, root).get
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t._3).toMap
    assert(got6(1L) == Some(1.5) && got6(2L) == Some(2.5) &&
      got6(8L) == Some(8.5) && got6(3L).isEmpty)
    // CoW merge still materializes everything away
    ManifestTable.merge(spark, root,
      Seq((9L, 90L, 9.9)).toDF("k", "n", "w"), Seq("k"))       // v7
    val d7 = ManifestTable.versionDataDir(spark, root, 7L)
    assert(ManifestTable.colmapOf(spark, root, d7).isEmpty)
    assert(ManifestTable.read(spark, root).get.count() == 9L)
  }

  test("describeColumns reports logical schema, physical names and " +
      "pending (unbacked) adds") {
    val root = freshRoot()
    ManifestTable.commit(kv(1L -> 1L), root)
    ManifestTable.renameColumn(spark, root, "n", "amount")     // v2
    ManifestTable.addColumn(spark, root, "w", "double")        // v3
    val d = ManifestTable.describeColumns(spark, root)
      .as[(String, String, String, Boolean)].collect().toSeq
    assert(d == Seq(
      ("k", "k", null, true),
      ("amount", "n", null, true),
      ("w", null, "double", false)))
    // after a materializing rewrite: identity mapping, all backed
    ManifestTable.merge(spark, root,
      Seq((1L, 2L, 0.5)).toDF("k", "amount", "w"), Seq("k"))   // v4
    assert(ManifestTable.describeColumns(spark, root)
      .as[(String, String, String, Boolean)].collect().toSeq ==
      Seq(("k", "k", null, true), ("amount", "amount", null, true),
        ("w", "w", null, true)))
  }

  test("changes() across a rename + a later materializing rewrite " +
      "threads column identity (no spurious full-table feed)") {
    val root = freshRoot()
    ManifestTable.commit(kv((1L to 5L).map(i => i -> i * 10L): _*), root)
    ManifestTable.renameColumn(spark, root, "n", "amount")     // v2
    // materializing rewrite: physical names re-keyed to logical —
    // the ENDPOINT match fails for this window (physical differs,
    // logical renamed); the mapping-thread walk must still link
    // amount(v3) -> n(v1) so the feed is exactly the ONE real change
    ManifestTable.merge(spark, root,
      Seq((1L, 100L)).toDF("k", "amount"), Seq("k"))           // v3
    val f = ManifestTable.changes(spark, root, 1L, 3L, Seq("k"))
      .collect()
    assert(f.length == 2, s"expected one update pair, got ${f.toSeq}")
    assert(f.map(_.getAs[String]("_change_type")).sorted.toSeq ==
      Seq("update_postimage", "update_preimage"))
    assert(f.forall(_.getAs[Long]("k") == 1L))
    // and each sub-window stays empty/exact as before
    assert(ManifestTable.changes(spark, root, 1L, 2L, Seq("k"))
      .count() == 0L)
  }

  test("logical names with tab/newline/NUL are rejected at the entry " +
      "points (they would corrupt the _colmap format)") {
    val root = freshRoot()
    ManifestTable.commit(kv(1L -> 1L), root)
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "n", "a\tb")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "n", "a\nb")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.addColumn(spark, root, " w", "double")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.addColumn(spark, root, "w\rv", "double")
    }
    // the table is untouched by the rejected DDL
    assert(ManifestTable.currentVersion(spark, root).contains(1L))
  }

  test("two unbacked ADD COLUMNs of one DDL type keep distinct " +
      "physical identities") {
    val root = freshRoot()
    ManifestTable.commit(kv(1L -> 1L), root)
    ManifestTable.addColumn(spark, root, "a", "double")        // v2
    ManifestTable.addColumn(spark, root, "b", "double")        // v3
    val cm = ManifestTable.colmapOf(spark, root,
      ManifestTable.versionDataDir(spark, root, 3L)).get
    // the sentinel "physical" values must be unique per column — a
    // shared value would collide the swapped physical-identity map
    // and let changes() cross-link the two columns
    assert(cm.map(_._2).distinct.size == cm.size)
    assert(ManifestTable.changes(spark, root, 1L, 3L, Seq("k"))
      .count() == 0L)
    val d = ManifestTable.describeColumns(spark, root)
      .as[(String, String, String, Boolean)].collect().toSeq
    assert(d.map(_._1) == Seq("k", "n", "a", "b"))
    assert(d.filter(!_._4).map(_._3) == Seq("double", "double"))
  }

  test("reorg on a mapped table keeps the logical schema") {
    val root = freshRoot()
    ManifestTable.commit(
      spark.range(1, 101).select(col("id").as("k"), col("id").as("n"))
        .repartitionByRange(4, col("id")), root)
    ManifestTable.renameColumn(spark, root, "n", "amount")    // v2
    ManifestTable.deleteWhereDV(spark, root, col("k") <= 10L) // v3
    ManifestTable.reorg(spark, root)                          // v4
    val df = ManifestTable.read(spark, root).get
    assert(df.columns.toSeq == Seq("k", "amount"))
    assert(df.count() == 90L)
    assert(ManifestTable.changes(spark, root, 3L, 4L, Seq("k"))
      .count() == 0L)
  }
}
