package graft.plans

import graft.SparkSpec
import graft.ops.{GraftPruning, ManifestTable, PartitionedTable, ZTable}
import org.apache.spark.sql.functions._

/** Predicate-driven file pruning ([[GraftPruneScans]], injected via
  * `injectOptimizerRule`): plain `spark.sql` text over
  * `graft_table('/p')` prunes files from the WHERE clause against the
  * committed `_parts`/`_stats`/`_bloom` frames — partition equality/
  * IN, weak min/max ranges, Bloom point keys — with conservative
  * keep-on-unknown soundness, an off knob, and idempotent rewrites. */
class GraftPruneScansSpec extends SparkSpec {
  import spark.implicits._
  import GraftPruneScans.scannedFiles

  private def freshRoot(): String = java.nio.file.Files
    .createTempDirectory("graft_prune_").toString + "/tbl"

  /** 400 rows, 4 partitions (day), custkey-tight files within each
    * partition (range tasks × flatten), Bloom over the string key. */
  private def buildTable(): (String, Long) = {
    val root = freshRoot()
    val df = spark.range(0, 400).select(
      $"id".as("k"),
      $"id".cast("string").as("ks"),
      ($"id" % 4).cast("string").as("day"),
      ($"id" * 2).as("m"))
      .repartitionByRange(4, $"k")
    PartitionedTable.commitPartitioned(spark, root, df, "day",
      statsCols = Some(("k", "m", Some("ks"))))
    val total = PartitionedTable.parts(spark, root, 1L).count()
    (root, total)
  }

  test("partition equality and IN prune from SQL text; OR and " +
      "unknown columns never mis-prune; knob off restores full scan") {
    val (root, total) = buildTable()
    val parts = PartitionedTable.parts(spark, root, 1L)
      .select($"path", $"value").as[(String, String)].collect()
    val eq = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$root') WHERE day = '2'")
    assert(scannedFiles(eq) == parts.count(_._2 == "2").toLong)
    assert(scannedFiles(eq) < total)
    assert(eq.as[Long].head() == 100L)
    val in = spark.sql(s"SELECT count(*) AS n FROM graft_table('$root')" +
      " WHERE day IN ('1', '3')")
    assert(scannedFiles(in) ==
      parts.count(r => r._2 == "1" || r._2 == "3").toLong)
    assert(in.as[Long].head() == 200L)
    // OR at top level: NOT a conjunct — no pruning, full scan, exact
    val or = spark.sql(s"SELECT count(*) AS n FROM graft_table('$root')" +
      " WHERE day = '2' OR k < 10")
    assert(scannedFiles(or) == total)
    assert(or.as[Long].head() == 108L) // 100 + 10 - 2 overlap (k=2,6... k<10&&k%4==2: k=2,6)
    // a NON-ATOMIC left side (abs(k) — survives constant folding) is
    // not a supported shape: no pruning, full scan, exact rows —
    // conservative by construction
    val um = spark.sql(s"SELECT count(*) AS n FROM graft_table('$root')" +
      " WHERE abs(k) = -1")
    assert(scannedFiles(um) == total)
    assert(um.as[Long].head() == 0L)
    // the off knob restores the full scan with identical rows
    spark.sql(s"SET ${GraftPruning.enabledKey}=false")
    try {
      val off = spark.sql(
        s"SELECT count(*) AS n FROM graft_table('$root') WHERE day = '2'")
      assert(scannedFiles(off) == total)
      assert(off.as[Long].head() == 100L)
    } finally spark.sql(s"SET ${GraftPruning.enabledKey}=true")
  }

  test("range cuts prune against committed min/max with WEAK bounds; " +
      "results identical to the unpruned scan") {
    val (root, total) = buildTable()
    val st = ZTable.stats(spark, root, 1L)
      .select($"path", $"min_x", $"max_x").collect()
    def expect(lo: Long, hi: Long) = st.count(r =>
      r.isNullAt(1) || r.isNullAt(2) ||
        !(r.getLong(2) < lo || r.getLong(1) > hi)).toLong
    val between = spark.sql(s"SELECT count(*) AS n FROM " +
      s"graft_table('$root') WHERE k BETWEEN 50 AND 120")
    assert(scannedFiles(between) == expect(50, 120))
    assert(scannedFiles(between) < total)
    assert(between.as[Long].head() == 71L)
    // strict > / < weaken to >= / <= (sound for truncated stats):
    // boundary files stay in
    val strict = spark.sql(s"SELECT count(*) AS n FROM " +
      s"graft_table('$root') WHERE k > 350")
    assert(scannedFiles(strict) == expect(350, Long.MaxValue))
    assert(strict.as[Long].head() == 49L)
    // equality on the x dim = a [v, v] range
    val eq = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$root') WHERE k = 200")
    assert(scannedFiles(eq) == expect(200, 200))
    assert(eq.as[Long].head() == 1L)
    // y dim prunes too
    val y = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$root') WHERE m >= 700")
    assert(scannedFiles(y) < total)
    assert(y.as[Long].head() == 50L)
  }

  test("Bloom point keys prune to candidate files; composition with " +
      "partition + range stacks all three frames on one statement") {
    val (root, total) = buildTable()
    val b = spark.sql(s"SELECT k FROM graft_table('$root') " +
      "WHERE ks = '123'")
    assert(scannedFiles(b) < total)
    assert(b.as[Long].collect().toSeq == Seq(123L))
    // all three frames on one WHERE: files = intersection
    val combo = spark.sql(s"SELECT k FROM graft_table('$root') " +
      "WHERE day = '3' AND k BETWEEN 120 AND 130 AND ks = '123'")
    assert(scannedFiles(combo) <= scannedFiles(b))
    assert(combo.as[Long].collect().toSeq == Seq(123L))
    // a key matching nothing: scan may even be empty — still exact
    val none = spark.sql(s"SELECT k FROM graft_table('$root') " +
      "WHERE ks = 'no-such-key'")
    assert(none.count() == 0L)
  }

  test("partition RANGE and PREFIX cuts prune (string pcol only — " +
      "the reference's gold date-cut shape); Bloom IN unions keys") {
    val (root, total) = buildTable()
    val parts = PartitionedTable.parts(spark, root, 1L)
      .select($"path", $"value").as[(String, String)].collect()
    // day >= '2': exact string-order pruning on the partition frame
    val ge = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$root') WHERE day >= '2'")
    assert(scannedFiles(ge) == parts.count(_._2 >= "2").toLong)
    assert(ge.as[Long].head() == 200L)
    // strict < and the reversed literal-side form
    val lt = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$root') WHERE '1' > day")
    assert(scannedFiles(lt) == parts.count(_._2 < "1").toLong)
    assert(lt.as[Long].head() == 100L)
    // BETWEEN on the partition column = two exact conjuncts
    val bt = spark.sql(s"SELECT count(*) AS n FROM graft_table('$root')" +
      " WHERE day BETWEEN '1' AND '2'")
    assert(scannedFiles(bt) ==
      parts.count(r => r._2 >= "1" && r._2 <= "2").toLong)
    assert(bt.as[Long].head() == 200L)
    // LIKE 'prefix%' optimizes to StartsWith and prunes
    val lk = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$root') WHERE day LIKE '3%'")
    assert(scannedFiles(lk) == parts.count(_._2.startsWith("3")).toLong)
    assert(lk.as[Long].head() == 100L)
    // a NUMERIC comparison on the string pcol does NOT use the string
    // order (casts change semantics): conservative, but still exact
    val num = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$root') WHERE day > 1")
    assert(num.as[Long].head() == 200L)
    // Bloom IN: union of the keys' candidate files, exact rows
    val in = spark.sql(s"SELECT k FROM graft_table('$root') " +
      "WHERE ks IN ('5', '250')")
    assert(scannedFiles(in) < total)
    assert(in.as[Long].collect().sorted.toSeq == Seq(5L, 250L))
  }

  test("pruning composes with merge-on-read: DV deletes apply on the " +
      "pruned scan, fragments of MoR DML are seen and pruned") {
    val (root, _) = buildTable()
    ManifestTable.deleteWhereDV(spark, root, $"k" === 101L)     // v2
    val d = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$root') WHERE day = '1'")
    val total2 = PartitionedTable.parts(spark, root, 2L).count()
    assert(scannedFiles(d) < total2)
    assert(d.as[Long].head() == 99L) // the DV row held on the pruned scan
    // MoR UPDATE appends partition-pure fragments; the pruned scan
    // includes them (an updated row found via its partition cut)
    ManifestTable.updateWhereDV(spark, root, $"k" === 102L,
      Map("m" -> lit(-5L)))                                     // v3
    val u = spark.sql(s"SELECT m FROM graft_table('$root') " +
      "WHERE day = '2' AND k = 102")
    val total3 = PartitionedTable.parts(spark, root, 3L).count()
    assert(scannedFiles(u) < total3)
    assert(u.as[Long].collect().toSeq == Seq(-5L))
    // time travel to v1 still prunes (its own registered file set)
    val v1 = spark.sql(
      s"SELECT count(*) AS n FROM graft_version('$root', 1) " +
        "WHERE day = '1'")
    assert(v1.as[Long].head() == 100L)
  }

  test("widened predicates: OR of partition equalities, null-safe " +
      "equality, NUMERIC partition ranges, Bloom IN past the old " +
      "16-key cap (one register pass)") {
    val (root, total) = buildTable()
    val parts = PartitionedTable.parts(spark, root, 1L)
      .select($"path", $"value").as[(String, String)].collect()
    // OR of equalities — the longhand IN the gold pack writes
    val or = spark.sql(s"SELECT count(*) AS n FROM graft_table('$root')" +
      " WHERE day = '1' OR day = '3'")
    assert(scannedFiles(or) ==
      parts.count(r => r._2 == "1" || r._2 == "3").toLong)
    assert(scannedFiles(or) < total)
    assert(or.as[Long].head() == 200L)
    // one disjunct off the partition column voids the verdict — full
    // scan, exact rows (conservative by construction)
    val orBad = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$root')" +
        " WHERE day = '1' OR k < 5")
    assert(scannedFiles(orBad) == total)
    assert(orBad.as[Long].head() == 104L) // 100 + {0,2,3,4}
    // null-safe equality prunes like equality for non-null literals
    val ns = spark.sql(s"SELECT count(*) AS n FROM graft_table('$root')" +
      " WHERE day <=> '2'")
    assert(scannedFiles(ns) == parts.count(_._2 == "2").toLong)
    assert(ns.as[Long].head() == 100L)
    // a LONG partition column: range cuts compare parse-back longs
    val root2 = freshRoot()
    PartitionedTable.commitPartitioned(spark, root2,
      spark.range(0, 300).select($"id".as("k"), ($"id" % 3).as("g")),
      "g")
    val parts2 = PartitionedTable.parts(spark, root2, 1L)
      .select($"path", $"value").as[(String, String)].collect()
    val nr = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$root2') WHERE g >= 2")
    assert(scannedFiles(nr) == parts2.count(_._2.toLong >= 2L).toLong)
    assert(scannedFiles(nr) < parts2.length.toLong)
    assert(nr.as[Long].head() == 100L)
    // Bloom IN with 40 keys (InSet territory): strict subset, exact
    val keys = (0 until 40).map(i => s"'${i * 7}'").mkString(", ")
    val in = spark.sql(
      s"SELECT k FROM graft_table('$root') WHERE ks IN ($keys)")
    assert(scannedFiles(in) < total)
    assert(in.as[Long].collect().sorted.toSeq ==
      (0 until 40).map(_ * 7L))
  }

  test("RUNTIME predicates prune: a watermark scalar subquery is " +
      "pinned at plan time; a broadcast-small dim join prunes via " +
      "_parts (DPP analog); outer-join fact sides never DPP-prune") {
    val (root, total) = buildTable()
    val parts = PartitionedTable.parts(spark, root, 1L)
      .select($"path", $"value").as[(String, String)].collect()
    // (1) the reference's incremental spine as SQL text:
    // `day > (SELECT MAX(...) FROM target)` — evaluated at plan time,
    // pinned into the filter, pruned like a literal
    Seq("1").toDF("wm").createOrReplaceTempView("gps_wm")
    val wm = spark.sql(s"SELECT count(*) AS n FROM graft_table('$root')" +
      " WHERE day > (SELECT max(wm) FROM gps_wm)")
    assert(scannedFiles(wm) == parts.count(_._2 > "1").toLong)
    assert(scannedFiles(wm) < total)
    assert(wm.as[Long].head() == 200L) // days 2 and 3
    // (2) the star-join shape: dim filter reaches the fact through an
    // equi-join on the partition column
    Seq(("0", true), ("3", true), ("2", false)).toDF("d", "keep")
      .createOrReplaceTempView("gps_dim")
    val dpp = spark.sql("SELECT count(*) AS n FROM " +
      s"graft_table('$root') f JOIN gps_dim d ON f.day = d.d " +
      "WHERE d.keep")
    assert(scannedFiles(dpp) ==
      parts.count(r => r._2 == "0" || r._2 == "3").toLong)
    assert(scannedFiles(dpp) < total)
    assert(dpp.as[Long].head() == 200L)
    // (3) LEFT OUTER keeps unmatched fact rows — pruning them would
    // lose rows, so the fact side must scan in full and stay exact
    val lo = spark.sql("SELECT count(*) AS n FROM (" +
      s"SELECT f.k FROM graft_table('$root') f LEFT JOIN " +
      "(SELECT * FROM gps_dim WHERE keep) d ON f.day = d.d)")
    assert(scannedFiles(lo) == total)
    assert(lo.as[Long].head() == 400L)
    // (4) equi-join on the BLOOM column: the dim's keys probe the
    // committed registers in one pass; files admitting none drop
    Seq(("123", 1), ("250", 2)).toDF("ks2", "w")
      .createOrReplaceTempView("gps_dimb")
    val bj = spark.sql("SELECT count(*) AS n FROM " +
      s"graft_table('$root') f JOIN gps_dimb d ON f.ks = d.ks2")
    assert(scannedFiles(bj) < total)
    assert(bj.as[Long].head() == 2L)
    // (5) equi-join on the x DIM: files whose committed [min,max]
    // contains NO dim key drop (exact-typed long containment)
    Seq(50L, 350L).toDF("kk").createOrReplaceTempView("gps_dimx")
    val xj = spark.sql("SELECT count(*) AS n FROM " +
      s"graft_table('$root') f JOIN gps_dimx d ON f.k = d.kk")
    assert(scannedFiles(xj) < total)
    assert(xj.as[Long].head() == 2L)
  }

  test("soundness gates: a STRING dim gets no range verdict (stats " +
      "cover only parseable rows); a TIMESTAMP partition column never " +
      "partition-prunes across a session-timezone change") {
    // string x dim: SQL compares in UTF8 order, the committed stats
    // in cast-to-long order — they diverge even on fully-parseable
    // values ('9' >= '11' is TRUE in UTF8, 9 >= 11 false in long), so
    // a range verdict would wrongly drop both files. The gate
    // refuses: full scan, exact rows.
    val root = freshRoot()
    PartitionedTable.commitPartitioned(spark, root,
      Seq(("9", 1L, "a"), ("2", 2L, "b")).toDF("xs", "m", "day"),
      "day", statsCols = Some(("xs", "m", None)))
    val q = spark.sql(s"SELECT count(*) AS n FROM graft_table('$root')" +
      " WHERE xs >= '11'")
    assert(q.as[Long].head() == 2L) // BOTH '9' and '2' in UTF8 order
    // timestamp pcol: `_parts` strings were rendered under the
    // WRITER's session tz; a reader in another tz comparing the SAME
    // INSTANT would string-mismatch and drop every satisfying file —
    // the gate skips partition pruning for TimestampType entirely
    val root2 = freshRoot()
    val tzKey = "spark.sql.session.timeZone"
    val oldTz = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "UTC")
      PartitionedTable.commitPartitioned(spark, root2, spark.sql(
        "SELECT id AS k, TIMESTAMP'2020-01-01 00:00:00' AS ts " +
          "FROM range(4) UNION ALL SELECT id + 10, " +
          "TIMESTAMP'2020-06-01 00:00:00' FROM range(4)"), "ts")
      spark.conf.set(tzKey, "America/Los_Angeles")
      // the same instant as 2020-01-01 00:00 UTC, written LA-local
      val r = spark.sql(
        s"SELECT count(*) AS n FROM graft_table('$root2') " +
          "WHERE ts = TIMESTAMP'2019-12-31 16:00:00'")
      assert(r.as[Long].head() == 4L)
    } finally spark.conf.set(tzKey, oldTz)
  }

  test("Scala-API reads prune too (readDataDir registers every " +
      "committed read); non-graft parquet scans are untouched") {
    val (root, total) = buildTable()
    val df = ManifestTable.read(spark, root).get
      .filter($"day" === "0")
      .groupBy($"day").agg(count(lit(1)).as("n"))
    assert(scannedFiles(df) < total)
    assert(df.select($"n").as[Long].head() == 100L)
    // a plain parquet table with a filter: rule no-ops (registry miss)
    val plain = freshRoot()
    spark.range(0, 50).select($"id".as("k"),
        ($"id" % 2).cast("string").as("g"))
      .write.parquet(plain)
    val p = spark.read.parquet(plain).filter($"g" === "1")
    assert(p.count() == 25L)
  }
}
