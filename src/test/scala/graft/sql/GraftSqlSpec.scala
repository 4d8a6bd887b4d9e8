package graft.sql

import graft.SparkSpec
import graft.ops.{ManifestTable, ZTable}
import org.apache.spark.sql.functions._

/** SQL TEXT front-end (EP1 parity): the reference's MERGE/UPDATE/
  * DELETE statement shapes, pasted as text at spark.sql(...), land on
  * the manifest store and produce exactly what the Scala API would;
  * management statements (OPTIMIZE/VACUUM/RESTORE/DESCRIBE) route
  * too; everything else still goes to Spark's parser. */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = java.nio.file.Files
    .createTempDirectory("graft_sql_").toString + "/tbl"

  test("MERGE INTO in the reference's exact shape: subquery USING, " +
      "aliases, multi-key ON, SET list, INSERT (cols) VALUES (...)") {
    val root = freshRoot()
    ManifestTable.commit(
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
        .toDF("k", "g", "v"), root)
    Seq((2L, "a", 25.0), (4L, "c", 40.0), (9L, "z", 0.5))
      .toDF("k", "g", "v").createOrReplaceTempView("gs_merge_src")
    // the dags/logistics-airbyte-sql.py shape: comments, a
    // parenthesized USING subquery (with a WHERE that must not fool
    // the top-level splitter), per-column SET and INSERT lists, a
    // trailing semicolon
    spark.sql(s"""
      -- upsert the CDC slice (reference statement shape)
      MERGE INTO graft.`$root` AS tgt
      USING (
          SELECT k, g, v FROM gs_merge_src WHERE v > 0.6
      ) AS src
      ON tgt.k = src.k
      WHEN MATCHED THEN UPDATE SET
          g = src.g,
          v = src.v
      WHEN NOT MATCHED THEN INSERT (
          k, g, v
      ) VALUES (
          src.k, src.g, src.v
      );
    """)
    assert(ManifestTable.read(spark, root).get
      .as[(Long, String, Double)].collect()
      .map(t => t._1 -> t._3).toMap ==
      Map(1L -> 10.0, 2L -> 25.0, 3L -> 30.0, 4L -> 40.0))
    // the command reports the committed version
    assert(spark.sql(s"""MERGE INTO graft.`$root` USING gs_merge_src
      ON k = k WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
      .as[Long].head() == 3L)
  }

  test("UPDATE text: single-projection pre-update-row SET (swap), " +
      "WHERE optional; DELETE text: NULL predicate = kept") {
    val root = freshRoot()
    ManifestTable.commit(Seq((1L, 10L, 20L), (2L, 5L, 1L))
      .toDF("k", "a", "b"), root)
    // SET a=b, b=a must SWAP (both RHS see the pre-update row)
    spark.sql(s"UPDATE graft.`$root` SET a = b, b = a WHERE a < b")
    assert(ManifestTable.read(spark, root).get
      .as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 20L, 10L), (2L, 5L, 1L)))
    spark.sql(s"DELETE FROM graft.`$root` WHERE b >= 10")
    assert(ManifestTable.read(spark, root).get
      .select("k").as[Long].collect().toSeq == Seq(2L))
    // no WHERE = all rows (SQL DELETE semantics)
    spark.sql(s"DELETE FROM graft.`$root`")
    assert(ManifestTable.read(spark, root).get.count() == 0L)
  }

  test("OPTIMIZE, OPTIMIZE ZORDER BY, VACUUM RETAIN, RESTORE, and " +
      "DESCRIBE HISTORY/DETAIL route to the table format") {
    val root = freshRoot()
    ManifestTable.commit(
      spark.range(0, 400).select($"id".as("k"), $"id".as("x"),
        lit(0L).as("y")), root)                                  // v1
    spark.sql(s"UPDATE graft.`$root` SET x = x + 1000 WHERE k < 10") // v2
    // z-order through text; committed stats arm scanXRange
    spark.sql(s"OPTIMIZE graft.`$root` ZORDER BY (x, y) FILES 4") // v3
    assert(ZTable.scanXRange(spark, root, 100L, 150L)
      .select("k").as[Long].collect().sorted.toSeq == (100L to 150L))
    // plain OPTIMIZE compacts to one file
    spark.sql(s"OPTIMIZE graft.`$root`")                         // v4
    assert(ManifestTable.read(spark, root).get.inputFiles.length == 1)
    // RESTORE to v1 undoes the update (as a NEW version)
    spark.sql(s"RESTORE TABLE graft.`$root` TO VERSION AS OF 1") // v5
    assert(ManifestTable.read(spark, root).get
      .filter($"x" >= 1000L).count() == 0L)
    val hist = spark.sql(s"DESCRIBE HISTORY graft.`$root`")
    assert(hist.select("operation").as[String].collect().toSeq ==
      Seq("WRITE", "UPDATE", "OPTIMIZE", "OPTIMIZE", "RESTORE"))
    val detail = spark.sql(s"DESCRIBE DETAIL graft.`$root`")
    assert(detail.select("version").as[Long].head() == 5L)
    // VACUUM through text: drops old version dirs, keeps records
    val dropped = spark.sql(s"VACUUM graft.`$root` RETAIN 2 VERSIONS")
      .as[Long].head()
    assert(dropped >= 1L)
    assert(ManifestTable.read(spark, root).get.count() == 400L)
    assert(spark.sql(s"DESCRIBE HISTORY graft.`$root`").count() == 5L)
  }

  test("non-graft statements delegate verbatim; malformed graft DML " +
      "fails loudly instead of merging wrongly") {
    assert(spark.sql("SELECT 1 + 1 AS two").as[Int].head() == 2)
    val root = freshRoot()
    ManifestTable.commit(Seq((1L, 2L)).toDF("k", "n"), root)
    // differing ON names: the kernel matches by name — refuse
    intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO graft.`$root` USING x
        ON tgt.k = src.other WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
    }
    // matched-only merge: not the upsert kernel's shape — refuse
    intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO graft.`$root` USING x ON k = k
        WHEN MATCHED THEN UPDATE SET *""")
    }
    // table untouched by the refused statements
    assert(ManifestTable.currentVersion(spark, root).contains(1L))
    // a statement that merely MENTIONS a graft ref in a subquery is
    // NOT hijacked — it delegates (and fails as whatever Spark makes
    // of it, not as a graft parse error)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE sometable SET x = " +
        s"(SELECT max(k) FROM graft.`$root`)")
    }
    assert(!e.getMessage.contains("graft SQL"),
      s"delegation expected, got: ${e.getMessage.take(100)}")
  }

  test("table-valued READ functions: graft_table / graft_version / " +
      "graft_as_of / graft_changes splice the Scala API's plans") {
    val root = freshRoot()
    ManifestTable.commit(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "g", "v"), root)                               // v1
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(5)
    ManifestTable.merge(spark, root,
      Seq((2L, "b", 5.0), (3L, "c", 3.0)).toDF("k", "g", "v"),
      Seq("k"))                                                 // v2
    assert(spark.sql(s"SELECT sum(v) AS s FROM graft_table('$root')")
      .as[Double].head() == 9.0)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_version('$root', 1)")
      .as[Long].head() == 2L)
    val ts = java.time.Instant.ofEpochMilli(afterV1)
      .atOffset(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_as_of('$root', '$ts')")
      .as[Long].head() == 2L)
    // the CDF read: one insert (k=3) + one update pair (k=2)
    val ch = spark.sql(s"SELECT _change_type, k FROM " +
        s"graft_changes('$root', 1, 2, 'k') ORDER BY k, _change_type")
      .as[(String, Long)].collect().toSeq
    assert(ch == Seq(("update_postimage", 2L), ("update_preimage", 2L),
      ("insert", 3L)))
    // TVFs compose inside larger queries (joins, filters)
    assert(spark.sql(
      s"""SELECT count(*) AS n FROM graft_table('$root') a
          JOIN graft_version('$root', 1) b ON a.k = b.k""")
      .as[Long].head() == 2L)
    // non-literal args refuse loudly
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_version('$root', 1 + 1)")
        .collect()
    }
  }

  test("ALTER TABLE RENAME/DROP/ADD COLUMN and DESCRIBE COLUMNS as " +
      "statement text; graft_partition prunes via the _parts frame") {
    val root = freshRoot()
    ManifestTable.commit(Seq((1L, 2L, "x")).toDF("k", "n", "t"), root)
    spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN n TO amount")
    spark.sql(s"ALTER TABLE graft.`$root` DROP COLUMN t")
    spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMN w double")
    val cols = spark.sql(s"DESCRIBE COLUMNS graft.`$root`")
      .as[(String, String, String, Boolean)].collect().toSeq
    assert(cols == Seq(("k", "k", null, true),
      ("amount", "n", null, true), ("w", null, "double", false)))
    assert(ManifestTable.read(spark, root).get.columns.toSeq ==
      Seq("k", "amount", "w"))
    // the partition-pruned TVF
    val proot = freshRoot()
    graft.ops.PartitionedTable.commitPartitioned(spark, proot,
      spark.range(0, 100).selectExpr("id as k",
        "cast(id % 4 as string) as day"), "day")
    val got = spark.sql(
      s"SELECT count(*) AS n FROM graft_partition('$proot', '1,2')")
      .as[Long].head()
    assert(got == 50L)
  }

  test("scanner handles backslash-escaped quotes; ADD COLUMN takes " +
      "parameterized DDL types (decimal/varchar), both paren forms") {
    val root = freshRoot()
    ManifestTable.commit(
      Seq((1L, "x"), (2L, "it's")).toDF("k", "t"), root)
    // a backslash-escaped quote inside the WHERE literal: the quote
    // state must not mis-toggle (it would push WHERE-splitting off)
    spark.sql(s"DELETE FROM graft.`$root` WHERE t = 'it\\'s'")
    assert(ManifestTable.read(spark, root).get
      .select("t").as[String].collect().toSeq == Seq("x"))
    // escaped quote inside a USING subquery literal: paren matching
    // survives an apostrophe'd string with a ')' after the escape
    Seq((1L, "keep)")).toDF("k", "t")
      .createOrReplaceTempView("gs_esc_src")
    spark.sql(s"""MERGE INTO graft.`$root`
      USING (SELECT k, t FROM gs_esc_src WHERE t != 'n\\')o') AS s
      ON k = k WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(ManifestTable.read(spark, root).get
      .select("t").as[String].collect().toSeq == Seq("keep)"))
    // parameterized types, bare and wrapped forms
    spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMN price decimal(10,2)")
    spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMNS (note varchar(20))")
    val cols = spark.sql(s"DESCRIBE COLUMNS graft.`$root`")
      .as[(String, String, String, Boolean)].collect().toSeq
    assert(cols.exists(c => c._1 == "price" &&
      c._3 == "decimal(10,2)" && !c._4))
    assert(cols.exists(c => c._1 == "note" &&
      c._3 == "varchar(20)" && !c._4))
    // a malformed type still fails loudly (DataType.fromDDL validates)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMN bad nope(1")
    }
  }

  test("CREATE TABLE AS SELECT + INSERT INTO as statement text: " +
      "O(batch) append, column lists positional, guards loud") {
    val root = freshRoot()
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "v")
      .createOrReplaceTempView("gs_ins_src")
    spark.sql(s"CREATE TABLE graft.`$root` AS " +
      "SELECT k, g, v FROM gs_ins_src")
    assert(ManifestTable.read(spark, root).get.count() == 2L)
    // re-create refuses loudly (no silent replace)
    intercept[IllegalArgumentException] {
      spark.sql(s"CREATE TABLE graft.`$root` AS SELECT 1 AS x")
    }
    // plain INSERT: O(batch) — v1's files carried by reference
    spark.sql(s"INSERT INTO graft.`$root` VALUES (3, 'c', 30.0)")
    val refs2 = ManifestTable.versionFileRefs(spark, root, 2L).get
    assert(refs2.exists(_.startsWith("d1-"))) // carried, not rewritten
    assert(ManifestTable.read(spark, root).get.count() == 3L)
    // column list maps positionally, any order, must cover the target
    spark.sql(s"INSERT INTO graft.`$root` (v, k, g) " +
      "SELECT 40.0, 4, 'd'")
    val got = ManifestTable.read(spark, root).get
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", 10.0), (2L, "b", 20.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
    intercept[IllegalArgumentException] { // partial list refused
      spark.sql(s"INSERT INTO graft.`$root` (k, g) SELECT 5, 'e'")
    }
    // append composes with the metadata surface: DV + pending ADD
    // COLUMN both survive an INSERT
    ManifestTable.deleteWhereDV(spark, root, $"k" === 2L)       // v4
    spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMN w double") // v5
    spark.sql(s"INSERT INTO graft.`$root` VALUES (9, 'z', 90.0, 9.9)")
    val after = ManifestTable.read(spark, root).get
    assert(after.count() == 4L) // k=2 stays deleted (vector carried)
    assert(after.filter($"k" === 2L).count() == 0L)
    assert(after.filter($"k" === 9L).select("w").as[Double]
      .head() == 9.9)
    // pre-DDL rows null-fill the backed column
    assert(after.filter($"k" === 1L).select("w")
      .as[Option[Double]].head().isEmpty)
  }

  test("name catalog: the reference's dotted-name statements route " +
      "once registered; unregistered names stay Spark's") {
    import graft.sql.GraftCatalog
    val base = java.nio.file.Files
      .createTempDirectory("graft_sqlcat_").toString
    GraftCatalog.setBase(base)
    try {
      spark.sql("CREATE TABLE demo.silver.fact PARTITIONED BY (day) " +
        "AS SELECT id AS k, CAST(id % 3 AS STRING) AS day " +
        "FROM range(30)")
      val root = s"$base/demo/silver/fact"
      assert(ManifestTable.currentVersion(spark, root).contains(1L))
      spark.sql("INSERT INTO demo.silver.fact " +
        "SELECT id AS k, '9' AS day FROM range(100, 105)")
      // the partitioned base kept `_parts` through the named INSERT
      assert(graft.ops.PartitionedTable
        .readPartitions(spark, root, Seq("9")).count() == 5L)
      spark.sql(
        "DELETE FROM demo.silver.fact WHERE day = '1'")
      assert(spark.sql(
        "SELECT count(*) AS n FROM graft_table('demo.silver.fact')")
        .as[Long].head() == 25L)
      // an UNREGISTERED dotted name is not claimed: Spark's own
      // error surface (catalog/table not found), not a graft one
      val e = intercept[Exception] {
        spark.sql("DELETE FROM nosuch.name.here WHERE 1=1")
      }
      assert(!e.getMessage.contains("graft SQL"))
    } finally GraftCatalog.clearBase()
    // with no base and no registration, even the same statements
    // delegate verbatim
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO demo.silver.fact SELECT 1, '1'")
    }
    assert(!e2.getMessage.contains("graft SQL"))
  }

  test("INSERT INTO a PARTITIONED table coerces the batch to the " +
      "target schema BY NAME before the partitioned append (no mixed " +
      "parquet physical types across base and fragment files)") {
    val root = freshRoot()
    spark.sql(s"CREATE TABLE graft.`$root` PARTITIONED BY (day) AS " +
      "SELECT CAST(id AS BIGINT) AS k, CAST(id * 1.5 AS DOUBLE) AS v," +
      " CAST(id % 2 AS STRING) AS day FROM range(10)")
    // an int literal into the bigint column, a DECIMAL literal into
    // the double column — narrower physical types that used to land
    // verbatim in the fragment files and mis-decode on read
    spark.sql(s"INSERT INTO graft.`$root` VALUES (100, 30.5, '0')")
    val after = ManifestTable.read(spark, root).get
    assert(after.schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(after.schema("v").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(after.count() == 11L)
    assert(after.filter($"k" === 100L).select("v").as[Double]
      .head() == 30.5)
    // the coerced fragment still lands partition-pure with its
    // `_parts` row
    assert(graft.ops.PartitionedTable.readPartitions(spark, root,
      Seq("0")).filter($"k" === 100L).count() == 1L)
    // column-list reorder + coercion compose on the partitioned path
    spark.sql(s"INSERT INTO graft.`$root` (day, v, k) " +
      "VALUES ('1', 7.5, 101)")
    assert(ManifestTable.read(spark, root).get.filter($"k" === 101L)
      .select("v").as[Double].head() == 7.5)
  }

  test("CREATE TABLE claim discipline under SET BASE: only the " +
      "[PARTITIONED BY] AS <query> shape is claimed for bare names; " +
      "a plain Spark DDL CREATE delegates untouched") {
    import graft.sql.GraftCatalog
    val base = java.nio.file.Files
      .createTempDirectory("graft_sqlct_").toString
    GraftCatalog.setBase(base)
    try {
      // a legitimate Spark statement a graft catalog must not hijack
      spark.sql("DROP TABLE IF EXISTS default.gs_plain_ct")
      spark.sql(
        "CREATE TABLE default.gs_plain_ct (id INT) USING parquet")
      assert(spark.catalog.tableExists("default.gs_plain_ct"))
      assert(ManifestTable.currentVersion(spark,
        s"$base/default/gs_plain_ct").isEmpty)
      spark.sql("DROP TABLE default.gs_plain_ct")
      // while the CTAS shape IS still claimed for the same name style
      spark.sql("CREATE TABLE demo2.ctas AS SELECT 1 AS x")
      assert(ManifestTable.currentVersion(spark,
        s"$base/demo2/ctas").contains(1L))
    } finally GraftCatalog.clearBase()
  }

  test("catalog durability + conflict: registrations persist under " +
      "the base across a JVM 'restart'; re-pointing a live name is " +
      "refused until UNREGISTER") {
    import graft.sql.GraftCatalog
    val base = java.nio.file.Files
      .createTempDirectory("graft_cat2_").toString
    GraftCatalog.setBase(base)
    try {
      // pin a name to a root OUTSIDE its base-derived path
      val pinned = java.nio.file.Files
        .createTempDirectory("graft_cat2_pin_").toString + "/t"
      spark.sql("GRAFT CATALOG UNREGISTER cat2.pinned")
      spark.sql(s"GRAFT CATALOG REGISTER cat2.pinned AT '$pinned'")
      // re-pointing to a different root: loud conflict, no overwrite
      intercept[IllegalStateException] {
        GraftCatalog.register("cat2.pinned", "/divergent/root")
      }
      assert(GraftCatalog.resolve("cat2.pinned").contains(pinned))
      // same-root re-register stays a no-op
      spark.sql(s"GRAFT CATALOG REGISTER cat2.pinned AT '$pinned'")
      // a JVM restart: memory dropped → base fallback; re-setting the
      // base loads the PERSISTED registration back
      GraftCatalog.unloadForTest()
      assert(GraftCatalog.resolve("cat2.pinned")
        .contains(s"$base/cat2/pinned"))
      GraftCatalog.setBase(base)
      assert(GraftCatalog.resolve("cat2.pinned").contains(pinned))
      // the conflict check sees the PERSISTED entry even with memory
      // cold — divergence across restarts is loud too
      GraftCatalog.unloadForTest()
      intercept[IllegalStateException] {
        GraftCatalog.register("cat2.pinned", "/divergent/root")
      }
      // UNREGISTER clears disk as well: after a restart the name is
      // back to the base-derived mapping
      spark.sql("GRAFT CATALOG UNREGISTER cat2.pinned")
      GraftCatalog.unloadForTest()
      GraftCatalog.setBase(base)
      assert(GraftCatalog.resolve("cat2.pinned")
        .contains(s"$base/cat2/pinned"))
    } finally {
      GraftCatalog.unregister("cat2.pinned")
      GraftCatalog.clearBase()
    }
  }

  test("RESTORE TO TIMESTAMP AS OF parses a UTC literal") {
    val root = freshRoot()
    ManifestTable.commit(Seq((1L, 1L)).toDF("k", "n"), root)    // v1
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(5)
    ManifestTable.deleteWhere(spark, root, $"k" === 1L)         // v2
    val ts = java.time.Instant.ofEpochMilli(afterV1)
      .atOffset(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    spark.sql(
      s"RESTORE graft.`$root` TO TIMESTAMP AS OF '$ts'")        // v3
    assert(ManifestTable.read(spark, root).get.count() == 1L)
  }
}
