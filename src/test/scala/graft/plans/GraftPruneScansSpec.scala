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
