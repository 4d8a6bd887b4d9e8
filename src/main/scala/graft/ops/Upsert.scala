package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's signature operator family (SURVEY §2.8): MERGE
  * upsert (11 occurrences, e.g. `dags/logistics-airbyte-sql.py:25-49`,
  * `dags/2_logistics-shipment-dag.py:95-205`), dedupe-before-merge
  * (`dags/2_logistics-shipment-dag.py:149-160`) and the SCD2 snapshot
  * (`dbt/dbt-project/snapshots/customers/scd_customers.sql:1-27`) —
  * re-expressed as pure DataFrame transforms.
  *
  * Scale notes: `upsert` is three equi-joins on the same key set; with
  * AQE on, Catalyst plans shuffled hash joins keyed identically, and
  * the exchanges of target/source are reused across the branches. At
  * 100 TB the right physical layout is both tables bucketed by the
  * merge keys so all three joins are shuffle-free; the kernel itself
  * is layout-agnostic.
  */
object Upsert {

  /** W1: keep the latest row per key — row_number over (partition by
    * keys order by orderCols desc) = 1. Callers pass tie-breaking
    * order columns to make the survivor deterministic. */
  def dedupLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** MERGE semantics: MATCHED -> UPDATE SET updateCols from source
    * (default: every non-key column), NOT MATCHED -> INSERT full row.
    * Requires source keys unique (pre-dedup with [[dedupLatest]], as
    * the reference does before every MERGE).
    *
    * Column set of the result == column set of `target`; `source` must
    * contain at least target's columns (extras dropped), mirroring the
    * reference's explicit MERGE column lists.
    */
  def upsert(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      updateCols: Option[Seq[String]] = None): DataFrame = {
    val cols = target.columns.toSeq
    val ucols = updateCols.getOrElse(cols.filterNot(keys.contains))
    // Single full-outer join: its three match cases ARE the three MERGE
    // branches (t-only = untouched, both = update, s-only = insert).
    // One shuffle of each side, vs three joins (anti/inner/anti) that
    // scan and shuffle both inputs multiple times.
    val t = target.withColumn("__t_present", lit(true)).alias("t")
    val s = source.select(cols.map(col): _*)
      .withColumn("__s_present", lit(true)).alias("s")
    val onKeys = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    t.join(s, onKeys, "full_outer").select(cols.map { c =>
      val out =
        if (keys.contains(c)) coalesce(col(s"t.$c"), col(s"s.$c"))
        else if (ucols.contains(c))
          when(col("s.__s_present").isNotNull, col(s"s.$c"))
            .otherwise(col(s"t.$c"))
        else
          when(col("t.__t_present").isNotNull, col(s"t.$c"))
            .otherwise(col(s"s.$c"))
      out.as(c)
    }: _*)
  }

  /** [[upsert]] with SCHEMA EVOLUTION (the Delta `mergeSchema`
    * semantic): the output carries the target's columns followed by
    * any source-only columns. A column the source does not have is
    * PRESERVED on matched rows (Delta's UPDATE SET * touches only the
    * source's columns) and reads as typed NULL on inserted rows; a
    * new source-only column reads as typed NULL on pre-existing rows.
    * A column present on BOTH sides with different types fails
    * loudly — silent coercion is how a pipeline corrupts a decimal
    * channel; the operator casts explicitly or fixes the source. Plan
    * shape identical to [[upsert]] (the padding is pure projection). */
  def upsertEvolve(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      updateCols: Option[Seq[String]] = None): DataFrame = {
    val tTypes = target.schema.map(f => f.name -> f.dataType).toMap
    val sTypes = source.schema.map(f => f.name -> f.dataType).toMap
    val conflicts = tTypes.keySet.intersect(sTypes.keySet)
      .filter(c => tTypes(c) != sTypes(c))
    require(conflicts.isEmpty,
      s"schema evolution cannot reconcile type changes: " +
        conflicts.map(c => s"$c (${tTypes(c)} vs ${sTypes(c)})")
          .mkString(", "))
    require(keys.forall(k => tTypes.contains(k) && sTypes.contains(k)),
      s"merge keys must exist on both sides: ${keys.mkString(", ")}")
    val all = tTypes ++ sTypes
    val outCols = target.columns.toSeq ++
      source.columns.filterNot(tTypes.contains)
    def pad(df: DataFrame, have: Map[String, org.apache.spark.sql.types.DataType]) =
      df.select(outCols.map(c =>
        if (have.contains(c)) col(c)
        else lit(null).cast(all(c)).as(c)): _*)
    // default update set = the source's ORIGINAL non-key columns, so a
    // padded target-only column falls into upsert's preserve-target
    // branch on matched rows instead of being overwritten by its NULL
    // pad (the UPDATE SET * contract: only columns the source actually
    // carries are written)
    val ucols = updateCols.getOrElse(
      source.columns.toSeq.filterNot(keys.contains))
    upsert(pad(target, tTypes), pad(source, sTypes), keys, Some(ucols))
  }

  /** SCD Type-2 history from a changelog (the dbt snapshot, timestamp
    * strategy): one output row per (key, consecutive run of identical
    * tracked values), with dbt_valid_from = first ts of the run,
    * dbt_valid_to = next run's dbt_valid_from (null while current) —
    * the dbt snapshot's column names
    * (`dbt/dbt-project/snapshots/customers/scd_customers.sql:1-27`),
    * so a dbt user's downstream models drop in unchanged; is_current
    * (= dbt_valid_to IS NULL) kept as a convenience.
    *
    * @param order  deterministic ordering inside a key (ts + tie-break)
    * @param tracked columns whose changes open a new version
    */
  def scd2FromChangelog(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[Column],
      tracked: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.asc): _*)
    val changed = tracked
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val versioned = df
      .withColumn("__new_version", when(changed, 1).otherwise(0))
      .withColumn("__version", sum(col("__new_version")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val firstTs = order.head
    versioned
      .groupBy((keys :+ "__version").map(col): _*)
      .agg(
        min(firstTs).as("dbt_valid_from"),
        (tracked.map(c => first(col(c)).as(c))): _*)
      .withColumn("dbt_valid_to", lead(col("dbt_valid_from"), 1).over(
        Window.partitionBy(keys.map(col): _*).orderBy(col("__version"))))
      .withColumn("is_current", col("dbt_valid_to").isNull)
      .drop("__version")
  }

  /** One dbt snapshot RUN (check strategy) applied incrementally: given
    * the previous snapshot table and the source's CURRENT state (one
    * row per key, with its change timestamp in `tsCol`), produce the
    * next snapshot — the reference's repeated `dbt snapshot` invocation
    * (`dbt/dbt-project/snapshots/customers/scd_customers.sql:1-27`)
    * rather than the full-changelog rebuild of [[scd2FromChangelog]]:
    *  - key absent from state, or tracked values unchanged → snapshot
    *    row passes through untouched;
    *  - tracked values changed → the current row is CLOSED
    *    (dbt_valid_to = state ts) and a new current row OPENS
    *    (dbt_valid_from = state ts) — dbt_valid_to chains exactly to
    *    the successor's dbt_valid_from;
    *  - new key → new current row.
    *
    * Scale: closed rows (history) never join — only the current rows
    * (≤ one per key) meet the state in a single full-outer equi-join on
    * the keys, so a run costs one shuffle of current ∪ state no matter
    * how deep the history grows. Snapshot schema:
    * keys ++ tracked ++ (dbt_valid_from, dbt_valid_to, is_current). */
  def scd2Merge(
      snapshot: Option[DataFrame],
      state: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tracked: Seq[String]): DataFrame = {
    val tsType = state.schema(tsCol).dataType
    val opened0 = state.select(
      (keys ++ tracked).map(col) :+ col(tsCol).as("dbt_valid_from"): _*)
      .withColumn("dbt_valid_to", lit(null).cast(tsType))
      .withColumn("is_current", lit(true))
    snapshot match {
      case None => opened0
      case Some(snap) =>
        val hist = snap.filter(col("dbt_valid_to").isNotNull)
        val cur = snap.filter(col("dbt_valid_to").isNull)
          .withColumn("__c", lit(true)).alias("c")
        val st = state.withColumn("__s", lit(true)).alias("s")
        val on = keys.map(k => col(s"c.$k") === col(s"s.$k")).reduce(_ && _)
        val j = cur.join(st, on, "full_outer")
        val both = col("c.__c").isNotNull && col("s.__s").isNotNull
        val changed = both &&
          tracked.map(c => !(col(s"c.$c") <=> col(s"s.$c"))).reduce(_ || _)
        val keptOrClosed = j.filter(col("c.__c").isNotNull).select(
          keys.map(k => col(s"c.$k").as(k)) ++
            tracked.map(c => col(s"c.$c").as(c)) ++ Seq(
              col("c.dbt_valid_from").as("dbt_valid_from"),
              when(changed, col(s"s.$tsCol"))
                .otherwise(col("c.dbt_valid_to")).as("dbt_valid_to")): _*)
          .withColumn("is_current", col("dbt_valid_to").isNull)
        val opened = j.filter(
            col("s.__s").isNotNull && (col("c.__c").isNull || changed))
          .select(
            keys.map(k => col(s"s.$k").as(k)) ++
              tracked.map(c => col(s"s.$c").as(c)) :+
              col(s"s.$tsCol").as("dbt_valid_from"): _*)
          .withColumn("dbt_valid_to", lit(null).cast(tsType))
          .withColumn("is_current", lit(true))
        hist.select(keptOrClosed.columns.map(col): _*)
          .unionByName(keptOrClosed).unionByName(opened)
    }
  }

  /** Atomic overwrite of a parquet table directory: write to a staging
    * dir, then swap via FileSystem rename — the crash-safe half of
    * MERGE-without-Delta (SURVEY §7 risk list). */
  def overwriteAtomic(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hadoopConf)
    val tmp = new org.apache.hadoop.fs.Path(path + "__staging")
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + "__old")
    recoverAtomic(fs, dst, bak)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(dst)) fs.rename(dst, bak)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"atomic swap failed for $path")
    fs.delete(bak, true)
  }

  /** Crash recovery for the swap protocol: a crash between
    * `dst → bak` and `tmp → dst` leaves no live table but an intact
    * backup — roll the backup forward so readers (and the next write,
    * whose MERGE reads the target) see the pre-crash state. Called at
    * the start of every [[overwriteAtomic]]; also safe to call from
    * readers. */
  def recoverAtomic(fs: org.apache.hadoop.fs.FileSystem,
      dst: org.apache.hadoop.fs.Path,
      bak: org.apache.hadoop.fs.Path): Unit =
    if (!fs.exists(dst) && fs.exists(bak)) {
      if (!fs.rename(bak, dst))
        throw new java.io.IOException(s"backup restore failed for $dst")
    }

  /** APPEND-ONLY batch-state tables: for state whose batches are
    * provably disjoint (a dedup seen-table or LSH bucket table — an
    * admitted key can never equal a prior batch's key, it would have
    * been suppressed), the state lives as one subdirectory per batch
    * under `root`, each written once by [[overwriteAtomic]] (so a
    * replay overwrites only ITS OWN subdir, idempotently) and never
    * touched again. A batch therefore costs O(batch) state I/O, not
    * the O(total state) a whole-table rewrite costs — the difference
    * between an ingest loop that stays flat at 100 TB and one whose
    * every batch rewrites the accumulated state. Readers union the
    * live subdirectories, rolling any interrupted per-subdir swap
    * forward first (same crash contract as [[readRecovered]], applied
    * per batch). */
  def writeBatchState(df: DataFrame, root: String, batchId: String): Unit = {
    // nonEmpty: "" would collide with readBatchState's read-all sentinel
    // AND make overwriteAtomic target "$root/" — the state root itself —
    // turning the root into a parquet dir and corrupting the layout
    require(batchId.nonEmpty && !batchId.contains("__") && !batchId.contains("/"),
      s"batch id must be a non-empty plain directory name: '$batchId'")
    overwriteAtomic(df, s"$root/$batchId")
  }

  /** Union of every completed batch subdirectory under `root` except
    * `excludeBatch` (pass "" to read all). `schema` (DDL) makes empty
    * batch subdirs — zero rows, no parquet footers — read cleanly.
    * None when no other batch has landed. */
  def readBatchState(spark: org.apache.spark.sql.SparkSession,
      root: String, excludeBatch: String, schema: String): Option[DataFrame] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) None
    else {
      // fail LOUDLY on a pre-subdirectory state layout (parquet
      // part-files directly under root, written when the state was one
      // swap-managed table): silently treating it as empty would
      // re-admit every previously-seen fingerprint — an exactly-once
      // violation with no error. The operator must migrate (move the
      // files into one named batch subdir) or start a fresh root.
      val legacyFiles = fs.listStatus(rootPath).filter(_.isFile)
        .map(_.getPath.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
      require(legacyFiles.isEmpty,
        s"$root holds a legacy single-table state layout " +
          s"(data files directly under the root: ${legacyFiles.take(3).mkString(", ")}…); " +
          "migrate them into a batch subdirectory (e.g. mv the part-files " +
          s"into $root/<batchId>/) before reading — refusing to silently " +
          "treat prior state as empty")
      def dirs = fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
      dirs.map(_.getName).filter(_.endsWith("__old"))
        .map(_.stripSuffix("__old")).foreach { b =>
          recoverAtomic(fs,
            new org.apache.hadoop.fs.Path(rootPath, b),
            new org.apache.hadoop.fs.Path(rootPath, b + "__old"))
        }
      val live = dirs.map(_.getName)
        .filter(n => !n.contains("__") && n != excludeBatch)
      if (live.isEmpty) None
      else Some(spark.read.schema(schema).parquet(live.map(n =>
        new org.apache.hadoop.fs.Path(rootPath, n).toString).toIndexedSeq: _*))
    }
  }

  /** Crash-recovering read of a swap-managed table: roll any
    * interrupted swap forward FIRST, then read; None if the table was
    * never written. Every reader of an [[overwriteAtomic]] target MUST
    * come through here (not a bare `fs.exists` + `spark.read`): during
    * the crash window the live dir is absent and only the backup
    * exists, so an unrecovered existence check misreads the table as
    * empty — and a MERGE built on that emptiness permanently drops
    * every row not present in the replayed batch. */
  def readRecovered(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAtomic(fs, dst, new org.apache.hadoop.fs.Path(path + "__old"))
    if (fs.exists(dst)) Some(MetaIO.readParquet(spark, path)) else None
  }
}
