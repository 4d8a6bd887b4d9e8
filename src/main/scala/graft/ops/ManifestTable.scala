package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal log-based transactional table — the Delta-style
  * manifest-commit MERGE (SURVEY §7's preferred MERGE form; no Delta
  * jars in the sandbox, so the commit protocol is implemented directly
  * on the FileSystem API).
  *
  * Layout:
  * {{{
  *   root/_commits/v<N>[-b<key>]  — commit marker (atomic rename); its
  *                                  CONTENT names the version's data
  *                                  directory (empty = legacy `v<N>`)
  *   root/_commits/_compact-<N>   — compaction file: every marker with
  *                                  version ≤ N as one `name\tdir`
  *                                  line (bounded marker listing)
  *   root/d<N>-<token>/part-*.parquet — write-once data directories,
  *                                  one UNIQUE dir per commit ATTEMPT
  * }}}
  *
  * Protocol (optimistic concurrency, many writers, many readers):
  *  1. the committer writes the FULL next version's data to a fresh
  *     uniquely-named directory `d<N>-<token>` — unique per ATTEMPT,
  *     so no two writers ever touch the same data path. (The previous
  *     revision staged into a shared `v<N>` dir, which let a LOSING
  *     writer overwrite the winner's already-committed data files
  *     between the winner's marker rename and the loser's failed one —
  *     a torn table through the back door. Unique dirs close that
  *     window structurally: data paths are never contended.)
  *  2. only then does it create the marker `_commits/v<N>`, by writing
  *     a temp file (whose content names the data dir) and RENAMING it
  *     into place — the rename IS the commit point: one atomic
  *     filesystem metadata operation. A losing rename deletes its own
  *     orphan data dir and throws.
  *
  * Readers resolve the current version as the highest marker and read
  * only the directory that marker names. Committed data directories
  * are immutable and never contended, so a reader that resolved v<N>
  * keeps a consistent view even while v<N+1> commits — and a crash
  * ANYWHERE before the marker rename leaves the table exactly at its
  * previous version: a torn table is unrepresentable, not merely
  * unlikely (spec-pinned in `ManifestTableSpec`).
  *
  * Commit-count scale: a long-lived streaming sink commits thousands
  * of micro-batches, and listing `_commits` forever costs O(#commits)
  * per read. [[compact]] folds all markers below the current version
  * into ONE `_compact-<N>` file (the Delta checkpoint move) and
  * deletes the individual marker files; readers then list O(markers
  * since last compaction) and read one immutable, cached compact file.
  * [[commit]]/[[mergeBatch]] auto-compact past
  * [[autoCompactThreshold]] live markers, so resolution cost stays
  * bounded no matter how many batches a sink commits. Compaction
  * preserves every (version, batch-key) entry — exactly-once replay
  * detection never forgets a committed batch.
  *
  * Retention: [[vacuum]] drops DATA directories older than the newest
  * `keepLast` versions but keeps their commit entries, so
  * [[batchApplied]] stays exact and a time-travel read of a vacuumed
  * version fails with a clear error instead of a mystery missing-file.
  * The reader contract is count-based: any reader holding one of the
  * newest `keepLast` versions at vacuum time is safe (spec-pinned).
  *
  * 100-TB shape: a commit writes one new version directory (the MERGE
  * output) + one tiny marker; readers list a bounded `_commits` dir
  * and scan exactly one version. Old versions remain readable (time
  * travel via [[readVersion]]) until [[vacuum]] drops them.
  */
object ManifestTable {

  private type Path = org.apache.hadoop.fs.Path

  /** Live markers above this count trigger auto-compaction inside
    * [[commit]]/[[mergeBatch]] — the bound on per-read listing cost
    * under a streaming sink. */
  val autoCompactThreshold = 64

  private def fsOf(spark: SparkSession, root: String)
      : org.apache.hadoop.fs.FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Compact files are immutable once renamed into place — parse each
    * at most once per JVM. Values are small (one short line per
    * commit). The cache key carries the file's (path, length, mtime):
    * a table DROPPED and RECREATED at the same path can reuse a
    * compact file name, and a bare-path key would serve the dead
    * incarnation's versions and batch keys to the new table —
    * batchApplied would report never-run batches as committed and a
    * stream would silently skip them. */
  private val compactCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  private def readSmallFile(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val b = new Array[Byte](4096)
      var n = in.read(b)
      while (n > 0) { buf.write(b, 0, n); n = in.read(b) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  private def parseCompact(fs: org.apache.hadoop.fs.FileSystem,
      st: org.apache.hadoop.fs.FileStatus): Map[String, String] =
    compactCache.computeIfAbsent(
      s"${st.getPath}|${st.getLen}|${st.getModificationTime}", _ => {
        val txt = readSmallFile(fs, st.getPath)
        txt.split("\n").iterator.filter(_.nonEmpty).map { line =>
          val i = line.indexOf('\t')
          if (i < 0) line -> "" else line.take(i) -> line.drop(i + 1)
        }.toMap
      })

  /** (live marker names, newest compact file's name→dir map). Rolls
    * the union — a marker present in both (compactor crashed between
    * compact write and marker delete) dedups by name. Retries the
    * listing when a concurrent compaction deletes the superseded
    * compact file between our listStatus and our open (same race
    * [[dirOf]] handles for marker files) — a bounded retry, since
    * each round needs another full compaction to land mid-read. */
  private def commitState(spark: SparkSession, root: String)
      : (Seq[String], Map[String, String]) = {
    val fs = fsOf(spark, root)
    val commits = new Path(root, "_commits")
    var attempt = 0
    while (true) {
      if (!fs.exists(commits)) return (Seq.empty, Map.empty)
      val statuses = fs.listStatus(commits)
      val live = statuses.map(_.getPath.getName).toSeq
        .filter(_.matches("v\\d+(-b.+)?"))
      val compacts = statuses
        .filter(_.getPath.getName.matches("_compact-\\d+"))
      try {
        val compacted =
          if (compacts.isEmpty) Map.empty[String, String]
          else parseCompact(fs,
            compacts.maxBy(_.getPath.getName.drop(9).toLong))
        return (live, compacted)
      } catch {
        case e: java.io.FileNotFoundException =>
          attempt += 1
          if (attempt >= 5) throw e
      }
    }
    sys.error("unreachable")
  }

  /** All commit-marker names (`v<N>` or `v<N>-b<batchKey>`), live ∪
    * compacted. */
  private def markerNames(spark: SparkSession, root: String): Seq[String] = {
    val (live, compacted) = commitState(spark, root)
    (live ++ compacted.keys).distinct
  }

  private def versionOf(marker: String): Long =
    marker.drop(1).takeWhile(_.isDigit).toLong

  /** Data directory name for a committed marker: the marker's content
    * (compact map, else one file read), empty = legacy `v<N>`.
    * Compaction-race-safe: a marker listed as live can be DELETED by a
    * concurrent [[compact]] before this reader opens it — its entry
    * has then moved into a newer compact file, so on
    * FileNotFoundException re-resolve through a fresh [[commitState]]
    * (which reads that newer file) instead of failing a read of a
    * fully-committed version. */
  private def dirOf(spark: SparkSession, root: String, marker: String,
      compacted: Map[String, String]): String = {
    val content = compacted.getOrElse(marker,
      try readSmallFile(fsOf(spark, root),
        new Path(new Path(root, "_commits"), marker))
      catch {
        case e: java.io.FileNotFoundException =>
          commitState(spark, root)._2.getOrElse(marker, throw e)
      })
    if (content.isEmpty) s"v${versionOf(marker)}" else content
  }

  /** Highest committed version, None if never committed. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val vs = markerNames(spark, root).map(versionOf)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Read the current committed version; None if never committed. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentVersion(spark, root).map(v => readVersion(spark, root, v))

  /** Resolve a committed version's data-directory NAME (for payloads
    * that are not a single parquet table — e.g. [[IndexStore]]'s
    * multi-table index versions, which reuse this commit protocol with
    * their own directory layout). Fails loudly if the version was
    * never committed or its data was vacuumed. */
  private[ops] def versionDataDir(spark: SparkSession, root: String,
      v: Long): String = {
    val (live, compacted) = commitState(spark, root)
    val marker = (live ++ compacted.keys).find(versionOf(_) == v)
    require(marker.isDefined, s"version $v of $root was never committed")
    val dir = dirOf(spark, root, marker.get, compacted)
    require(fsOf(spark, root).exists(new Path(root, dir)),
      s"version $v of $root was vacuumed (commit record retained, " +
        "data directory dropped)")
    dir
  }

  /** Time travel: read a specific committed version. Fails loudly if
    * the version was never committed OR its data was vacuumed. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame =
    spark.read.parquet(s"$root/${versionDataDir(spark, root, v)}")

  /** [[readVersion]] against an already-taken commit-state snapshot —
    * the merge paths read the base version right after resolving it
    * and must not pay a second `_commits` listing for the same state
    * (on an object store the listing IS the cost). */
  private def readVersionWith(spark: SparkSession, root: String,
      v: Long, markers: Seq[String],
      compacted: Map[String, String]): DataFrame = {
    val marker = markers.find(versionOf(_) == v)
    require(marker.isDefined, s"version $v of $root was never committed")
    spark.read.parquet(s"$root/${dirOf(spark, root, marker.get, compacted)}")
  }

  /** Commit `df` as the next version; returns the new version number.
    * Crash-safe per the protocol above; fails loudly on a concurrent
    * commit of the same version (see [[mergeWithRetry]] for the
    * rebase-and-retry loop). */
  def commit(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val next = currentVersion(spark, root).getOrElse(0L) + 1
    val dir = writeVersionData(df, root, next)
    writeMarker(spark, root, next, dataDir = dir)
    maybeAutoCompact(spark, root)
    next
  }

  /** Step 1 of [[commit]] — returns the fresh unique data-dir name.
    * Package-private so the crash spec can stop exactly between data
    * write and marker rename. */
  private[graft] def writeVersionData(df: DataFrame, root: String,
      v: Long): String = {
    val dir = newDataDirName(v)
    df.write.parquet(s"$root/$dir") // ErrorIfExists: the dir is unique
    dir
  }

  /** Unique per-attempt data-dir name — the ONE naming convention
    * vacuum's orphan regex and every committer (incl. [[IndexStore]])
    * must share. */
  private[ops] def newDataDirName(v: Long): String =
    s"d$v-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Step 2 of [[commit]] — the atomic commit point. `suffix` carries
    * the streaming batch key (`-b<key>`) for [[mergeBatch]]'s replay
    * detection; a plain commit writes the bare `v<N>` marker. The
    * rename stays the single atomic operation either way, and two
    * markers of the same VERSION still conflict (the concurrent-commit
    * guard checks version, not full name). On a lost race the caller's
    * orphan data dir is deleted before the throw. */
  private[graft] def writeMarker(spark: SparkSession, root: String,
      v: Long, suffix: String = "", dataDir: String = ""): Unit = {
    val fs = fsOf(spark, root)
    val commits = new Path(root, "_commits")
    fs.mkdirs(commits)
    def lostRace(): Nothing = {
      if (dataDir.nonEmpty) fs.delete(new Path(root, dataDir), true)
      throw new java.io.IOException(
        s"concurrent commit detected: $root version $v already exists")
    }
    if (markerNames(spark, root).exists(versionOf(_) == v)) lostRace()
    // the temp name must be unique PER ATTEMPT: two writers racing the
    // same version with a shared `.v<N>.tmp` let the winner rename a
    // temp the loser had just overwritten — committing a marker that
    // points at the loser's (about-to-be-deleted) data dir. Caught by
    // the two-writer spec; unique temps make each rename self-owned.
    val tmp = new Path(commits,
      s".v$v$suffix.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(dataDir.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(commits, s"v$v$suffix"))) {
      fs.delete(tmp, false)
      lostRace()
    }
  }

  /** Fold every marker STRICTLY below the current version (plus any
    * previous compact file's entries) into one `_compact-<curr-1>`
    * file, then delete the covered marker files and older compact
    * files. The current version's marker stays live so concurrent
    * committers race against a real file, never a compact entry.
    * Idempotent and crash-safe: the compact file lands by atomic
    * rename; a crash before marker deletion leaves a name in both
    * places, which readers dedup. Concurrent compactions: the second
    * rename fails and is swallowed (the first already did the work).
    * Entries are never dropped — exactly-once batch keys survive
    * compaction AND vacuum forever. */
  def compact(spark: SparkSession, root: String): Unit = {
    val cur = currentVersion(spark, root).getOrElse(return)
    val coverMax = cur - 1
    if (coverMax < 1) return
    val fs = fsOf(spark, root)
    val commits = new Path(root, "_commits")
    val (live, compacted) = commitState(spark, root)
    val toCover = live.filter(versionOf(_) <= coverMax)
    val entries = compacted ++
      toCover.map(m => m -> {
        val c = dirOf(spark, root, m, compacted)
        if (c == s"v${versionOf(m)}") "" else c // keep legacy marker empty
      })
    if (entries.isEmpty) return
    val name = s"_compact-$coverMax"
    val target = new Path(commits, name)
    if (!fs.exists(target)) {
      // tmp name unique PER ATTEMPT — a shared tmp lets a racing
      // compactor truncate the winner's bytes mid-write and a torn
      // compact file land (the same defect class the marker temps had)
      val tmp = new Path(commits,
        s".$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = fs.create(tmp, true)
      try out.write(entries.toSeq.sortBy(e => versionOf(e._1))
        .map { case (m, d) => s"$m\t$d" }.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      if (!fs.rename(tmp, target)) {
        fs.delete(tmp, false) // a concurrent compaction won; fine
        return
      }
    }
    // covered markers and superseded compact files are now redundant
    toCover.foreach(m => fs.delete(new Path(commits, m), false))
    fs.listStatus(commits).map(_.getPath).filter { p =>
      val n = p.getName
      n.matches("_compact-\\d+") && n.drop(9).toLong < coverMax
    }.foreach(fs.delete(_, false))
  }

  /** `liveCount` lets a committer that just took a snapshot pass the
    * (pre-commit live count + 1) instead of paying another listing;
    * -1 = unknown, list. */
  private[ops] def maybeAutoCompact(spark: SparkSession, root: String,
      liveCount: Int = -1): Unit = {
    val n =
      if (liveCount >= 0) liveCount
      else commitState(spark, root)._1.size
    if (n > autoCompactThreshold) compact(spark, root)
  }

  /** Transactional MERGE behind the [[Upsert.upsert]] signature: read
    * the current version as the target, apply the upsert kernel
    * (UNCHANGED — `UpsertPropertySpec` covers it), commit the result
    * as the next version, and return the committed table. First
    * commit (no prior version) inserts the source as version 1.
    * Throws on a concurrent commit of the same version — use
    * [[mergeWithRetry]] when multiple writers may collide. */
  def merge(spark: SparkSession, root: String, source: DataFrame,
      keys: Seq[String], updateCols: Option[Seq[String]] = None)
      : DataFrame = {
    // OCC correctness: the committed version number is PINNED to
    // (version read) + 1, not re-derived at commit time. Re-deriving
    // let a concurrent commit land BETWEEN our read and our marker
    // and be silently overwritten by a result computed without its
    // rows — a lost update with no conflict signal (caught by the
    // two-writer spec: one writer's row vanished ~1 run in 6). With
    // the pin, any interleaved commit makes OUR marker collide and
    // throw, which is exactly the signal mergeWithRetry rebases on.
    // ONE commit-state snapshot resolves the base version AND reads
    // it; only writeMarker re-lists (its CAS guard must be fresh)
    val (live, compacted) = commitState(spark, root)
    val markers = (live ++ compacted.keys).distinct
    val base = if (markers.isEmpty) None else Some(markers.map(versionOf).max)
    val result = base match {
      case Some(v) =>
        Upsert.upsert(readVersionWith(spark, root, v, markers, compacted),
          source, keys, updateCols)
      case None => source
    }
    val next = base.getOrElse(0L) + 1
    val dir = writeVersionData(result, root, next)
    writeMarker(spark, root, next, dataDir = dir)
    maybeAutoCompact(spark, root, live.size + 1)
    readVersion(spark, root, next)
  }

  /** [[merge]] with SCHEMA EVOLUTION ([[Upsert.upsertEvolve]] — the
    * Delta `mergeSchema` semantic): a source with new columns widens
    * the committed table (old rows read NULL there); a source missing
    * columns preserves them (inserted rows read NULL). Same pinned
    * OCC version and commit protocol as [[merge]]. Type CHANGES on an
    * existing column still fail loudly. */
  def mergeEvolve(spark: SparkSession, root: String, source: DataFrame,
      keys: Seq[String], updateCols: Option[Seq[String]] = None)
      : DataFrame = {
    val (live, compacted) = commitState(spark, root)
    val markers = (live ++ compacted.keys).distinct
    val base = if (markers.isEmpty) None else Some(markers.map(versionOf).max)
    val result = base match {
      case Some(v) =>
        Upsert.upsertEvolve(
          readVersionWith(spark, root, v, markers, compacted),
          source, keys, updateCols)
      case None => source
    }
    val next = base.getOrElse(0L) + 1
    val dir = writeVersionData(result, root, next)
    writeMarker(spark, root, next, dataDir = dir)
    maybeAutoCompact(spark, root, live.size + 1)
    readVersion(spark, root, next)
  }

  /** [[merge]] with the Delta-style rebase-and-retry loop: a losing
    * committer re-reads the NEW current version (which includes the
    * winner's rows), re-applies its upsert on top, and re-commits —
    * so concurrent MERGEs serialize instead of one of them dying, and
    * no committed row is ever lost (spec-pinned by the two-writer
    * race). Bounded attempts: pathological contention still surfaces
    * as the underlying conflict error rather than spinning forever. */
  def mergeWithRetry(spark: SparkSession, root: String,
      source: DataFrame, keys: Seq[String],
      updateCols: Option[Seq[String]] = None,
      maxAttempts: Int = 10): DataFrame = {
    var attempt = 1
    while (true) {
      try return merge(spark, root, source, keys, updateCols)
      catch {
        case e: java.io.IOException
            if e.getMessage != null &&
              e.getMessage.startsWith("concurrent commit detected") =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** Has a [[mergeBatch]] with this batch key already committed?
    * Exact forever: batch-key entries survive compaction and vacuum. */
  def batchApplied(spark: SparkSession, root: String,
      batchKey: String): Boolean =
    markerNames(spark, root).exists(_.endsWith(s"-b$batchKey"))

  /** [[merge]] for streaming `foreachBatch`: EXACTLY-ONCE under
    * micro-batch replay. The commit marker carries the batch key
    * (`v<N>-b<key>`), so a replayed batch whose key is already
    * committed is a no-op — whether the original attempt crashed
    * before the data write (nothing exists), between data write and
    * marker (the orphan data dir is unreferenced and invisible), or
    * after the marker (replay skips). The marker rename remains the
    * single atomic commit point.
    *
    * Batch keys must be namespaced per stream run (the
    * [[graft.streaming.TransactionalStream]] caller derives the
    * namespace from the checkpoint path) — Spark's micro-batch counter
    * restarts at 0 under a new checkpoint, and a bare id would make a
    * NEW stream's first batch look like a replay of the old one. */
  def mergeBatch(spark: SparkSession, root: String, source: DataFrame,
      keys: Seq[String], batchKey: String,
      updateCols: Option[Seq[String]] = None): Unit = {
    // ONE snapshot serves replay detection, base-version resolution
    // AND the base read — a streaming sink commits thousands of
    // batches and per-commit listing count is the cost that matters
    // on an object store; only writeMarker re-lists (fresh CAS guard)
    val (live, compacted) = commitState(spark, root)
    val markers = (live ++ compacted.keys).distinct
    if (markers.exists(_.endsWith(s"-b$batchKey"))) return
    // same read-version pin as [[merge]]: a stream is normally this
    // table's only writer, but if anything else ever commits between
    // our read and our marker the batch must conflict loudly, never
    // silently drop the interloper's rows
    val base = if (markers.isEmpty) None else Some(markers.map(versionOf).max)
    val result = base match {
      case Some(v) =>
        Upsert.upsert(readVersionWith(spark, root, v, markers, compacted),
          source, keys, updateCols)
      case None => source
    }
    val next = base.getOrElse(0L) + 1
    val dir = writeVersionData(result, root, next)
    writeMarker(spark, root, next, s"-b$batchKey", dir)
    maybeAutoCompact(spark, root, live.size + 1)
  }

  /** Change-data-feed between two committed versions — the NET diff,
    * keyed by `keys`, in Delta CDF vocabulary: one `insert` row per
    * key only in `toV`, one `delete` row (with the FROM-side values)
    * per key only in `fromV`, and an `update_preimage` +
    * `update_postimage` pair per key present in both whose non-key
    * columns differ (null-safe). Output schema = the table's columns
    * plus `_change_type`. This is the incremental-consumer contract:
    * a downstream job that processed version `fromV` applies exactly
    * these rows to catch up to `toV` instead of rescanning the table
    * — at 100 TB the difference between a feed and a re-read. ONE
    * full-outer hash join on the keys; change classification and the
    * 0/1/2-row fan-out run codegen'd in the same stage (a NULL array
    * explodes to zero rows — unchanged keys cost no output). */
  def changes(spark: SparkSession, root: String, fromV: Long, toV: Long,
      keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val from = readVersion(spark, root, fromV)
    val to = readVersion(spark, root, toV)
    val cols = to.columns.toSeq
    require(from.columns.toSeq == cols,
      s"schema changed between v$fromV and v$toV: " +
        s"${from.columns.mkString(",")} vs ${cols.mkString(",")}")
    require(keys.nonEmpty && keys.forall(cols.contains),
      s"keys ${keys.mkString(",")} must be columns of the table")
    val vcols = cols.filterNot(keys.contains)
    // side-presence FLAGS, not key-nullness: a legitimately-NULL key
    // value would read as "absent" and misclassify its row (the same
    // reason Upsert.upsert carries __t_present/__s_present)
    val f = from.select((cols.map(c => col(c).as(s"__f_$c")) :+
      lit(true).as("__f_present")): _*)
    val t = to.select((cols.map(c => col(c).as(s"__t_$c")) :+
      lit(true).as("__t_present")): _*)
    val joinCond = keys.map(k => col(s"__f_$k") <=> col(s"__t_$k"))
      .reduce(_ && _)
    val isIns = col("__f_present").isNull
    val isDel = col("__t_present").isNull
    val unchanged = vcols.map(c => col(s"__f_$c") <=> col(s"__t_$c"))
      .foldLeft(lit(true))(_ && _)
    def img(side: String, kind: String) = struct(
      (cols.map(c => col(s"__${side}_$c").as(c)) :+
        lit(kind).as("_change_type")): _*)
    f.join(t, joinCond, "full_outer")
      .select(explode(
        when(isIns, array(img("t", "insert")))
          .when(isDel, array(img("f", "delete")))
          .when(!unchanged, array(img("f", "update_preimage"),
            img("t", "update_postimage")))).as("__c"))
      .select(col("__c.*"))
  }

  /** Drop the DATA of all versions older than the newest `keepLast`
    * (never the current version; never any commit RECORD — time-travel
    * reads of vacuumed versions fail loudly and [[batchApplied]] stays
    * exact). Reader contract: count-based retention — any reader that
    * resolved one of the newest `keepLast` versions before the vacuum
    * still reads it safely afterward; readers holding older versions
    * must re-resolve (the Delta retention-window semantic, with
    * commits as the clock).
    *
    * `dropOrphans`: also delete data directories referenced by NO
    * marker — debris from crashed commit attempts. Off by default
    * because an IN-FLIGHT commit's directory is unreferenced until its
    * marker lands; only pass true when no writer is running. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int,
      dropOrphans: Boolean = false): Unit = {
    require(keepLast >= 1, "must keep at least the current version")
    val fs = fsOf(spark, root)
    // ONE commit-state snapshot for the whole pass: per-marker
    // re-listing would cost O(markers) listStatus RPCs — exactly the
    // listing growth compaction exists to bound
    val (live, compacted) = commitState(spark, root)
    val markers = (live ++ compacted.keys).distinct
    if (markers.nonEmpty) {
      val cur = markers.map(versionOf).max
      val cutoff = cur - keepLast + 1
      markers.filter(versionOf(_) < cutoff).foreach { m =>
        fs.delete(new Path(root, dirOf(spark, root, m, compacted)), true)
      }
      if (dropOrphans) {
        val referenced =
          markers.map(dirOf(spark, root, _, compacted)).toSet
        fs.listStatus(new Path(root)).map(_.getPath)
          .filter(p => p.getName.matches("(d\\d+-.+|v\\d+)") &&
            !referenced.contains(p.getName))
          .foreach(fs.delete(_, true))
      }
    }
  }
}
