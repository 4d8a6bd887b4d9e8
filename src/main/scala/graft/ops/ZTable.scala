package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ordered layout COMMITTED INTO the transactional manifest — the
  * missing half of the round-11 layout work ([[Layout]] computed
  * z-order file assignments and min/max stats, but the stats lived
  * only in the returning DataFrame: a restarted session had to
  * rebuild them, and the layout could drift from the table version).
  * Here [[optimizeZOrder]] rewrites the CURRENT version z-clustered
  * and commits the per-file min/max ranges (and optional per-file
  * Bloom registers) as version payload — the [[IndexStore]]
  * multi-frame precedent applied to table metadata, and the native
  * analog of Delta's per-file stats / Iceberg manifests / Snowflake's
  * micro-partition metadata (the machinery every reference gold query
  * silently relied on, cf. `dags/logistics-gold-metrics-sql.py:24-197`
  * — Snowflake prunes micro-partitions by exactly these ranges).
  *
  * Version-dir layout (on [[ManifestTable]]'s protocol, unchanged):
  * {{{
  *   root/d<N>-<tok>/part-*.parquet — z-clustered data (plain parquet,
  *                                    schema UNCHANGED — the commit is
  *                                    dataChange-false: changes()
  *                                    across it is EMPTY, spec-pinned)
  *   root/d<N>-<tok>/_stats/        — one row per data file: path,
  *                                    n_rows, min/max of both cluster
  *                                    dims, the dim column names, the
  *                                    bloom column name (nullable)
  *   root/d<N>-<tok>/_bloom/        — (path, word, bits) Bloom
  *                                    registers, when requested
  *   root/d<N>-<tok>/_files         — (scoped-DML versions only) the
  *                                    version's file list, untouched
  *                                    files carried BY REFERENCE
  * }}}
  * Underscore-prefixed names are invisible to Spark's file index, so
  * a plain `readVersion` of an optimized dir still reads exactly the
  * data files; [[ManifestTable.readDataDir]] resolves `_files`
  * versions. Stats are SELF-CONTAINED per version (each version's dir
  * holds the stats for its full file list, including referenced
  * files), so the read path is restart-safe and time-travelable: a
  * fresh session prunes off the committed stats of whatever version
  * it resolves, no session state involved.
  *
  * Scoped DML ([[deleteWhereScoped]]/[[updateWhereScoped]]): the
  * predicate's range conjunct is evaluated against the committed
  * per-file ranges, ONLY intersecting files are rewritten (into the
  * new version's dir), and every other file is carried forward by
  * path — at 100 TB a DELETE that touches 0.1% of the key space
  * rewrites 0.1% of the files, not the table. Pruning is sound by
  * construction: the range is PART of the predicate
  * (`x BETWEEN lo AND hi AND extra`), so a non-intersecting file
  * cannot contain a matching row. [[ManifestTable.vacuum]] is
  * reference-aware (a dir survives while any retained version
  * references files inside it).
  *
  * 100-TB shape: the layout rewrite is ONE range shuffle on the
  * z-value (`repartitionByRange` — the sampled range partitioner is
  * exactly how a sort lands on a 1000-executor cluster) + one stats
  * aggregation at file grain; planning a pruned scan collects one row
  * per FILE (the Delta manifest-planning pattern — O(files), never
  * O(rows)); the pruned scan itself opens only intersecting files.
  */
object ZTable {

  private val M = 8192L // Bloom bits FLOOR per file (legacy fixed size)

  /** Scaled-register geometry: bits per distinct key. A fixed 8192-bit
    * register saturates at ~2.3k keys (measured 627/640 files opened
    * on a point probe at 100× — sound, useless); sizing each file's
    * register from its OWN committed row count — m = max(8192,
    * 8·n_rows), k = 2 hashes → ~5% per-file FPR at any scale — keeps
    * the point probe opening a few percent of files forever. The
    * `(path, word, bits)` frame shape is unchanged (registers just
    * carry more words); a `_bloom/_GEOM` side file records the factor
    * so the probe derives each file's m from the `_stats` row counts.
    * Frames WITHOUT the marker are legacy fixed-M and keep probing at
    * 8192 — old commits stay sound, new commits scale. */
  private[ops] val bloomBitsPerKey = 8L

  private def geomPath(root: String, dir: String) =
    new org.apache.hadoop.fs.Path(s"$root/$dir/_bloom/_GEOM")

  /** The register geometry of a committed frame: Some(bitsPerKey) for
    * scaled frames, None for legacy fixed-M. */
  private[ops] def geomOf(spark: SparkSession, root: String,
      dir: String): Option[Long] = {
    val f = fs(spark, root)
    val p = geomPath(root, dir)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 64, false)
        Some(buf.toString("UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  private def writeGeom(f: org.apache.hadoop.fs.FileSystem,
      root: String, dir: String, bpk: Long): Unit = {
    val p = geomPath(root, dir)
    if (f.exists(p)) return
    val out = f.create(p, true)
    try out.write(bpk.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Per-file register size for the frame at `dir`: max(8192,
    * bpk·n_rows) off the committed `_stats` row counts for scaled
    * frames; the flat legacy M otherwise. */
  private def mByPath(spark: SparkSession, root: String, dir: String,
      bl: DataFrame): DataFrame = geomOf(spark, root, dir) match {
    case Some(bpk) =>
      MetaIO.readParquet(spark, s"$root/$dir/_stats")
        .select(col("path"),
          greatest(lit(M), col("n_rows") * bpk).as("m"))
    case None =>
      bl.select(col("path")).distinct().withColumn("m", lit(M))
  }

  /** ONE shared Bloom probe over a committed frame: the paths whose
    * registers admit `key` under BOTH hash seeds — a provable superset
    * (no false negatives; a path with no surviving register row has
    * bit 0 and is excluded). O(register rows) metadata scan, never
    * data. Serves [[bloomCandidateFiles]] and the planner's
    * [[graft.ops.GraftPruning.bloomCandidates]]. */
  private[ops] def bloomProbePaths(spark: SparkSession, root: String,
      dir: String, key: Column): Seq[String] =
    bloomProbePathsAny(spark, root, dir, array(key))

  /** Multi-key form: the paths whose registers admit ANY of the keys
    * in `keys` (an array column of same-typed literals) — the IN-list
    * probe as ONE metadata pass instead of one join per key.
    *
    * Driver fast path (round-15 VERDICT ask #6): when the committed
    * register frame is planning-sized (on-disk bytes ≤
    * `spark.graft.bloom.localProbeMaxBytes`, default 4 MiB) and every
    * key is a string/integer literal, the probe runs ENTIRELY on the
    * driver — one parquet-mr frame read + the same two-seed
    * md5-prefix check ([[graft.expressions.Md5Prefix60.hash60]], the
    * identical hash the registers were built with) — zero Spark jobs
    * where the join probe paid a collect + two broadcast builds. Past
    * the cap, or for exotic key types, the distributed register join
    * runs unchanged (the 100 TB path: O(files × words) rows, never
    * data). Both paths compute the same superset by construction. */
  private[ops] def bloomProbePathsAny(spark: SparkSession, root: String,
      dir: String, keys: Column): Seq[String] =
    localBloomProbe(spark, root, dir, keys).getOrElse(
      joinBloomProbe(spark, root, dir, keys))

  private def localBloomProbe(spark: SparkSession, root: String,
      dir: String, keys: Column): Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
    import org.apache.spark.sql.types._
    // literal keys only, rendered exactly as concat_ws's cast-to-string
    val lits: Seq[String] =
      org.apache.spark.sql.graft.Bridge.expression(keys) match {
        case CreateArray(children, _)
            if children.forall(_.isInstanceOf[Literal]) =>
          children.map(_.asInstanceOf[Literal]).map { l =>
            (l.value, l.dataType) match {
              case (v, StringType) if v != null => v.toString
              case (v, LongType | IntegerType | ShortType | ByteType)
                  if v != null => v.toString
              case _ => return None
            }
          }
        case _ => return None
      }
    val f = fs(spark, root)
    val bp = new org.apache.hadoop.fs.Path(s"$root/$dir/_bloom")
    if (!f.exists(bp)) return None
    val cap = spark.conf.get("spark.graft.bloom.localProbeMaxBytes",
      (4L * 1024 * 1024).toString).toLong
    if (f.listStatus(bp).filter(_.isFile).map(_.getLen).sum > cap)
      return None
    val rows = MetaIO.frameRows(spark, bp.toString)
    if (rows.isEmpty) return Some(Seq.empty)
    // (path, word) → OR of register words; row order is the committed
    // frame order, so the result order is deterministic
    val bits = new java.util.HashMap[(String, Long), java.lang.Long]()
    val paths = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { m =>
      (m.get("path"), m.get("word"), m.get("bits")) match {
        case (Some(p: String), Some(w: java.lang.Number),
            Some(b: java.lang.Number)) =>
          paths += p
          val k = (p, w.longValue)
          bits.put(k, bits.getOrDefault(k, 0L) | b.longValue)
        case _ => return None // unexpected shape: sound fallback
      }
    }
    // per-path register size, same derivation as [[mByPath]]
    val mByP: Map[String, Long] = geomOf(spark, root, dir) match {
      case Some(bpk) =>
        val st = MetaIO.frameRows(spark, s"$root/$dir/_stats")
        val mm = st.map { r =>
          (r.get("path"), r.get("n_rows")) match {
            case (Some(p: String), Some(n: java.lang.Number)) =>
              p -> math.max(M, n.longValue * bpk)
            case _ => return None
          }
        }.toMap
        if (!paths.forall(mm.contains)) return None
        mm
      case None => paths.iterator.map(_ -> M).toMap
    }
    Some(paths.iterator.filter { p =>
      val m = mByP(p)
      lits.exists(ks => Seq(501, 502).forall { seed =>
        val h = graft.expressions.Md5Prefix60.hash60(
          org.apache.spark.unsafe.types.UTF8String
            .fromString(s"$seed|$ks")) % m
        val word = h >> 5
        val bit = 1L << (h & 31).toInt
        (bits.getOrDefault((p, word), 0L) & bit) != 0L
      })
    }.toSeq)
  }

  private def joinBloomProbe(spark: SparkSession, root: String,
      dir: String, keys: Column): Seq[String] = {
    val bl = MetaIO.readParquet(spark, s"$root/$dir/_bloom")
    val keyRows = spark.range(1).select(explode(keys).as("key"))
    val probes = Seq(501, 502).map(seed =>
      keyRows.select(col("key"), lit(seed).as("j"),
        graft.functions.TextFunctions.hash60(col("key"), seed)
          .as("h0")))
      .reduce(_ unionByName _)
    bl.join(broadcast(mByPath(spark, root, dir, bl)), Seq("path"))
      .crossJoin(broadcast(probes))
      .select(col("path"), col("key"), col("j"), col("word"),
        col("bits"), (col("h0") % col("m")).as("h"))
      .filter(shiftright(col("h"), 5) === col("word") &&
        (col("bits").bitwiseAND(
          expr("shiftleft(CAST(1 AS BIGINT), CAST(h & 31 AS INT))")))
          =!= 0L)
      .groupBy(col("path"), col("key"))
      .agg(countDistinct(col("j")).as("nj"))
      .filter(col("nj") === 2)
      .select(col("path")).distinct()
      .collect().map(_.getString(0)).toSeq // O(files)
  }

  private def fs(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Rewrite the current version z-clustered by (`xCol`,`yCol`) into
    * `nFiles` files and commit it WITH its skipping stats (+ Bloom
    * registers over `bloomCol`, if given) as the next version.
    * Logically a no-op (dataChange-false): the change feed across the
    * commit is empty. Returns the committed version.
    *
    * `nFiles` is the explicit file-count knob (a production OPTIMIZE
    * sizes by target bytes; at file grain the two are the same dial).
    * Stats are computed by reading BACK the files as written — they
    * can never disagree with the layout, whatever the range
    * partitioner sampled. */
  def optimizeZOrder(spark: SparkSession, root: String, xCol: String,
      yCol: String, tieCol: String, nFiles: Int,
      bloomCol: Option[String] = None, bits: Int = 16): Long = {
    require(nFiles >= 1, "nFiles must be >= 1")
    val base = ManifestTable.currentVersion(spark, root)
      .getOrElse(sys.error(s"nothing to optimize at $root"))
    val df = ManifestTable.readVersion(spark, root, base)
    val cols = df.columns.toSet
    (Seq(xCol, yCol, tieCol) ++ bloomCol).foreach(c =>
      require(cols.contains(c), s"no column $c in $root (has $cols)"))
    val next = base + 1
    val dir = ManifestTable.newDataDirName(next)
    // NORMALIZE each dim to the curve's bit width from its ACTUAL
    // bounds (one metadata-sized agg): interleaving raw values breaks
    // down whenever a dim outgrows `bits` (low-bit aliasing scrambles
    // the curve — surrogate keys at 10^10 are the norm at 100 TB) or
    // when one dim's constant high bits starve the other's. The
    // curve sees [0, 2^bits) per dim; the committed STATS keep raw
    // values, so pruning and DML scoping are exact regardless.
    // Bounds from the FOOTERS when that is provably bit-identical to
    // the aggregation: both dims plain ints (exact stats) AND no
    // deletion vector (footer bounds are pre-delete). The z-values,
    // layout and committed stats come out byte-identical — this only
    // removes the bounds job, never changes the curve. Any other
    // shape keeps the read-back aggregation.
    val baseDir = ManifestTable.versionDataDir(spark, root, base)
    val footerB: Option[(Any, Any, Any, Any)] =
      if (ManifestTable.dvOf(spark, root, baseDir).nonEmpty ||
          ManifestTable.colmapOf(spark, root, baseDir).nonEmpty) None
      else {
        val refs = ManifestTable.versionFileRefs(spark, root, base)
          .getOrElse(dataPaths(spark, root, baseDir))
        MetaIO.footerIntStats(spark,
            refs.map(r => ManifestTable.resolveRef(root, r)),
            xCol, yCol)
          .map { rows =>
            def comb(sel: ((String, Long, Any, Any, Any, Any)) => Any,
                f: (Long, Long) => Long): Any = {
              val vs = rows.map(sel).collect { case l: java.lang.Long => l.longValue }
              if (vs.isEmpty) null else vs.reduce(f)
            }
            (comb(_._3, math.min), comb(_._4, math.max),
              comb(_._5, math.min), comb(_._6, math.max))
          }
      }
    val b: org.apache.spark.sql.Row = footerB match {
      case Some((a1, a2, a3, a4)) => org.apache.spark.sql.Row(a1, a2, a3, a4)
      case None => df.agg(min(col(xCol).cast("long")),
        max(col(xCol).cast("long")), min(col(yCol).cast("long")),
        max(col(yCol).cast("long"))).head()
    }
    val top = (1L << bits) - 1
    def scaled(c: org.apache.spark.sql.Column, loI: Int, hiI: Int) =
      if (b.isNullAt(loI) || b.getLong(hiI) <= b.getLong(loI)) lit(0L)
      else ((c.cast("long") - b.getLong(loI)) * top /
        (b.getLong(hiI) - b.getLong(loI))).cast("long")
    // ONE range shuffle on the z-value: each output file covers a
    // contiguous z-range, so BOTH dims' per-file min/max are tight —
    // the multi-dimensional clustering trade (Delta OPTIMIZE ZORDER)
    df.withColumn("__z", Layout.zValue(scaled(col(xCol), 0, 1),
        scaled(col(yCol), 2, 3), bits))
      .repartitionByRange(nFiles, col("__z"), col(tieCol))
      .sortWithinPartitions(col("__z"), col(tieCol))
      .drop("__z")
      .write.parquet(s"$root/$dir")
    writeStats(spark, root, dir, dataPaths(spark, root, dir),
      xCol, yCol, bloomCol, carriedStats = None, carriedBloom = None)
    ManifestTable.writeOpMeta(spark, root, dir, "OPTIMIZE")
    ManifestTable.writeMarker(spark, root, next, dataDir = dir)
    ManifestTable.maybeAutoCompact(spark, root)
    next
  }

  /** PARTITION-SCOPED OPTIMIZE ZORDER — Delta's `OPTIMIZE tbl WHERE
    * <partition predicate> ZORDER BY (x, y)` on the partitioned
    * manifest store: z-cluster ONLY the named partitions' files
    * (their deletion-vector slice materializes in the rewrite — the
    * files are being rewritten anyway), carry every other partition
    * BY REFERENCE with its `_parts` row, vector rows, and stats/Bloom
    * rows intact. Output files are partition-pure AND z-contiguous
    * (one range shuffle on (partition value, z), then the same
    * flatten every partitioned write uses), so SURVEY §4's two knobs
    * stack with TIGHT in-partition ranges: partition pruning plans
    * off `_parts`, the z-range/Bloom skipping within a partition off
    * the per-file stats this commit establishes or extends.
    * dataChange-false (content identical; the feed across it is
    * empty). At 100 TB this is the nightly layout pass on HOT
    * partitions only — the cold ones are never touched.
    *
    * Stats: when the base already carries `_stats`, untouched files
    * keep their rows and the rewrites get fresh read-back rows (the
    * [[extendStats]] carry). When it carries none, stats are
    * ESTABLISHED — for the WHOLE version (rewrites read back,
    * untouched files scanned once for their rows): a partial frame
    * would make un-covered files invisible to the planner, which is
    * unsound. Returns the committed version. */
  def optimizeZOrderPartitions(spark: SparkSession, root: String,
      values: Seq[String], xCol: String, yCol: String, tieCol: String,
      filesPerPartition: Int = 1, bloomCol: Option[String] = None,
      bits: Int = 16, expectPcol: Option[String] = None): Long = {
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val base = ManifestTable.currentVersion(spark, root)
      .getOrElse(sys.error(s"nothing to optimize at $root"))
    val baseDir = ManifestTable.versionDataDir(spark, root, base)
    require(ManifestTable.colmapOf(spark, root, baseDir).isEmpty,
      s"partition-scoped OPTIMIZE does not compose with column " +
        "mapping (a rename already drops `_parts`)")
    val (pcol, baseRows) = PartitionedTable
      .partsRowsIfAny(spark, root, baseDir)
      .getOrElse(sys.error(s"version $base of $root carries no " +
        "partition metadata — use optimizeZOrder (whole-table) or " +
        "commit through PartitionedTable first"))
    // the SQL form's WHERE column must BE the partition column — a
    // predicate on any other column is not a partition scope and
    // must refuse, not silently optimize the wrong slice
    expectPcol.foreach(e => require(e.equalsIgnoreCase(pcol),
      s"OPTIMIZE … WHERE names column $e but $root is partitioned " +
        s"by $pcol"))
    val want = values.toSet
    val (touched, untouched) = baseRows.partition(r => want.contains(r._2))
    require(touched.nonEmpty,
      s"no partition of $root matches ${values.mkString(",")}")
    val touchedPaths = touched.map(_._1)
    val dv = ManifestTable.dvOf(spark, root, baseDir)
    val raw = ManifestTable.readRefsRaw(spark, root, baseDir,
      touchedPaths)
    val cur = dv.fold(raw)(ManifestTable.applyDv(raw, _))
    val cols = cur.columns.toSet
    (Seq(xCol, yCol, tieCol, pcol) ++ bloomCol).foreach(c =>
      require(cols.contains(c), s"no column $c in $root (has $cols)"))
    val next = base + 1
    val dir = ManifestTable.newDataDirName(next)
    // normalize dims from the TOUCHED slice's bounds (the curve is
    // local to the rewrite; committed stats keep raw values, so
    // pruning stays exact regardless — see [[optimizeZOrder]])
    val b = cur.agg(min(col(xCol).cast("long")),
      max(col(xCol).cast("long")), min(col(yCol).cast("long")),
      max(col(yCol).cast("long"))).head()
    val top = (1L << bits) - 1
    def scaled(c: Column, loI: Int, hiI: Int) =
      if (b.isNullAt(loI) || b.getLong(hiI) <= b.getLong(loI)) lit(0L)
      else ((c.cast("long") - b.getLong(loI)) * top /
        (b.getLong(hiI) - b.getLong(loI))).cast("long")
    // ONE range shuffle on (partition value, z): each task holds one
    // partition's contiguous z-segment, so the flatten's output files
    // are partition-pure AND z-contiguous — both dims' per-file
    // min/max tight within the partition
    val clustered = cur
      .withColumn("__z", Layout.zValue(scaled(col(xCol), 0, 1),
        scaled(col(yCol), 2, 3), bits))
      .repartitionByRange(
        math.max(1, want.size * filesPerPartition),
        col(pcol), col("__z"), col(tieCol))
      .sortWithinPartitions(col(pcol), col("__z"), col(tieCol))
      .drop("__z")
    val fresh = PartitionedTable.writeFlattened(spark, root, dir,
      clustered, pcol)
    val f = fs(spark, root)
    val untouchedPaths = untouched.map(_._1)
    val manifest = (untouchedPaths ++ fresh.map(_._1)).mkString("\n")
    val out = f.create(
      new org.apache.hadoop.fs.Path(s"$root/$dir/_files"), true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    PartitionedTable.writeParts(spark, root, dir,
      untouched ++ fresh, pcol)
    // vector rows of untouched files survive; the touched files'
    // slice materialized in the rewrite
    if (dv.nonEmpty)
      ManifestTable.carryDvFiltered(spark, root, baseDir, dir,
        untouchedPaths.map(ManifestTable.fileKeyOf).toSet)
    // stats: extend when the base has them; otherwise ESTABLISH for
    // the whole version (partial coverage would be unsound)
    val extended = extendStats(spark, root, baseDir, dir,
      fresh.map(_._1), carriedPaths = Some(untouchedPaths))
    if (!extended)
      establishStats(spark, root, dir,
        untouchedPaths ++ fresh.map(_._1), xCol, yCol, bloomCol)
    ManifestTable.writeOpMeta(spark, root, dir, "OPTIMIZE")
    ManifestTable.writeMarker(spark, root, next, dataDir = dir)
    ManifestTable.maybeAutoCompact(spark, root)
    next
  }

  /** The committed skipping stats of version `v` — one row per data
    * file: `path` (relative to root), `n_rows`, `min_x`/`max_x`/
    * `min_y`/`max_y` (the cluster dims cast to long), `x_col`/`y_col`
    * (the dim column names), `bloom_col` (null when no Bloom index).
    * Fails loudly when the version has no committed stats. */
  def stats(spark: SparkSession, root: String, v: Long): DataFrame = {
    val dir = ManifestTable.versionDataDir(spark, root, v)
    val p = new org.apache.hadoop.fs.Path(s"$root/$dir/_stats")
    require(fs(spark, root).exists(p),
      s"version $v of $root has no committed skipping stats — run " +
        "optimizeZOrder first")
    MetaIO.readParquet(spark, p.toString)
  }

  /** Committed per-file Bloom registers of version `v` (rows of
    * (path, word, bits)), None when the version carries none. */
  def bloom(spark: SparkSession, root: String, v: Long)
      : Option[DataFrame] = {
    val dir = ManifestTable.versionDataDir(spark, root, v)
    val p = new org.apache.hadoop.fs.Path(s"$root/$dir/_bloom")
    if (fs(spark, root).exists(p))
      Some(MetaIO.readParquet(spark, p.toString))
    else None
  }

  /** Data-skipping read of the CURRENT version: open ONLY the files
    * whose committed [min_x, max_x] intersects [lo, hi], then apply
    * the row filter. Planning is one O(files) driver-side collect of
    * the committed stats (the Delta manifest-planning pattern);
    * `df.inputFiles.length` on the result proves the pruning
    * (spec-locked). Restart-safe by construction — everything read
    * here is committed version payload. */
  def scanXRange(spark: SparkSession, root: String, lo: Long, hi: Long)
      : DataFrame = {
    val v = ManifestTable.currentVersion(spark, root)
      .getOrElse(sys.error(s"no committed version at $root"))
    // O(files) planning metadata, read on the DRIVER via parquet-mr
    // (the collect() paid a Spark job per pruned scan plan)
    val sDir = ManifestTable.versionDataDir(spark, root, v)
    val sP = new org.apache.hadoop.fs.Path(s"$root/$sDir/_stats")
    require(fs(spark, root).exists(sP),
      s"version $v of $root has no committed skipping stats — run " +
        "optimizeZOrder first")
    val rows = MetaIO.frameRows(spark, sP.toString)
    require(rows.nonEmpty, s"empty stats at $root v$v")
    val xCol = rows.head("x_col").asInstanceOf[String]
    def bound(m: Map[String, Any], c: String): Option[Long] =
      m.get(c).flatMap(Option(_)).collect {
        case n: java.lang.Number => n.longValue }
    // NULL bounds (an all-null-x file) = unknown range: never skipped
    val keep = rows.filter { m =>
      val mn = bound(m, "min_x"); val mx = bound(m, "max_x")
      mn.isEmpty || mx.isEmpty || !(mx.get < lo || mn.get > hi)
    }.map(_("path").asInstanceOf[String]).toIndexedSeq
    val pruned =
      if (keep.isEmpty)
        ManifestTable.readVersion(spark, root, v).filter(lit(false))
      else {
        val raw = MetaIO.readParquet(spark,
          keep.map(p => ManifestTable.resolveRef(root, p)))
        // a merge-on-read version's deletions apply to the pruned
        // read too (stats keep pre-delete bounds — still a sound
        // SUPERSET, deletion only shrinks file content)
        ManifestTable.dvOf(spark, root,
          ManifestTable.versionDataDir(spark, root, v))
          .fold(raw)(ManifestTable.applyDv(raw, _))
      }
    pruned.filter(col(xCol).cast("long").between(lo, hi))
  }

  /** Scoped DELETE: remove rows matching
    * `xCol BETWEEN lo AND hi AND extra` by rewriting ONLY the files
    * whose committed x-range intersects [lo, hi]; every other file is
    * carried into the new version BY REFERENCE (its path, its stats
    * row, its Bloom rows — all unchanged). The range conjunct makes
    * the pruning provably sound; `extra` narrows further (NULL = no
    * match, SQL DELETE semantics). The new version's stats/bloom/
    * file-list are committed with it — skipping keeps working across
    * DML. Returns the new version.
    *
    * Deleting EVERY file's rows is refused (use
    * [[ManifestTable.deleteWhere]] — a scoped rewrite that touches
    * everything has no scope to exploit). */
  def deleteWhereScoped(spark: SparkSession, root: String, lo: Long,
      hi: Long, extra: Column = lit(true)): Long =
    rewriteScoped(spark, root, lo, hi, "DELETE") { (df, xCol) =>
      val cond = col(xCol).cast("long").between(lo, hi) && extra
      df.filter(!coalesce(cond, lit(false)))
    }

  /** Scoped UPDATE: apply `set` to rows matching
    * `xCol BETWEEN lo AND hi AND extra`, rewriting only intersecting
    * files — same single-projection pre-update-row semantics as
    * [[ManifestTable.updateWhere]], same carry-by-reference as
    * [[deleteWhereScoped]]. Returns the new version. */
  def updateWhereScoped(spark: SparkSession, root: String, lo: Long,
      hi: Long, set: Map[String, Column],
      extra: Column = lit(true)): Long =
    rewriteScoped(spark, root, lo, hi, "UPDATE") { (df, xCol) =>
      require(set.keySet.subsetOf(df.columns.toSet),
        s"unknown columns in SET: ${set.keySet -- df.columns}")
      val cond =
        coalesce(col(xCol).cast("long").between(lo, hi) && extra,
          lit(false))
      // CHECK constraints on the post-image of matched rows only —
      // filter-then-assign so the WHERE sees pre-update values (same
      // shape as [[ManifestTable.updateWhere]]'s enforcement)
      Checks.enforce(spark, root,
        df.filter(cond).select(df.columns.toIndexedSeq.map { c =>
          set.get(c).map(_.as(c)).getOrElse(col(c))
        }: _*), "update post-image")
      df.select(df.columns.toIndexedSeq.map { c =>
        set.get(c) match {
          case Some(e) => when(cond, e).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }: _*)
    }

  /** Shared scoped-rewrite skeleton: partition the current version's
    * files by committed-range intersection with [lo, hi], rewrite the
    * intersecting ones through `transform`, carry the rest by
    * reference, recompute stats/Bloom for the rewritten files only,
    * and commit file-list + stats + bloom as the next version. */
  private def rewriteScoped(spark: SparkSession, root: String, lo: Long,
      hi: Long, op: String)(
      transform: (DataFrame, String) => DataFrame): Long = {
    val base = ManifestTable.currentVersion(spark, root)
      .getOrElse(sys.error(s"no committed version at $root"))
    // O(files) planning metadata read on the DRIVER (no Spark job) —
    // the round-15 frameRows move applied to the scoped-DML planner
    val stBaseDir = ManifestTable.versionDataDir(spark, root, base)
    val stFrame = s"$root/$stBaseDir/_stats"
    require(fs(spark, root).exists(
      new org.apache.hadoop.fs.Path(stFrame)),
      s"version $base of $root has no committed skipping stats — run " +
        "optimizeZOrder first")
    val stSchema = MetaIO.schemaOf(spark,
      new org.apache.hadoop.fs.Path(stFrame)).getOrElse(
      sys.error(s"empty stats frame at $root v$base"))
    val st = MetaIO.frameRowsAs(spark, stFrame, stSchema)
      .getOrElse(stats(spark, root, base).collect().toSeq).toArray
    require(st.nonEmpty, s"empty stats at $root v$base")
    def s(r: org.apache.spark.sql.Row, c: String) =
      r.getString(r.fieldIndex(c))
    val xCol = s(st.head, "x_col")
    val yCol = s(st.head, "y_col")
    val bloomCol = Option(st.head.get(st.head.fieldIndex("bloom_col")))
      .map(_.toString)
    val (touched, untouched) = st.partition { r =>
      val (iLo, iHi) = (r.fieldIndex("min_x"), r.fieldIndex("max_x"))
      // NULL bounds = unknown range: conservatively touched
      r.isNullAt(iLo) || r.isNullAt(iHi) ||
        !(r.getLong(iHi) < lo || r.getLong(iLo) > hi)
    }
    require(touched.nonEmpty,
      s"no file of $root v$base intersects [$lo,$hi] — nothing to do")
    require(untouched.nonEmpty,
      s"every file of $root v$base intersects [$lo,$hi] — use the " +
        "unscoped DML (a full rewrite has no scope to exploit)")
    val next = base + 1
    val dir = ManifestTable.newDataDirName(next)
    val touchedPaths = touched.map(r => s(r, "path")).toIndexedSeq
    val baseDir = ManifestTable.versionDataDir(spark, root, base)
    val dv = ManifestTable.dvOf(spark, root, baseDir)
    val touchedRaw = MetaIO.readParquet(spark,
      touchedPaths.map(p => ManifestTable.resolveRef(root, p)))
    // a merge-on-read version's deletions MATERIALIZE for the files
    // this rewrite touches (they are being rewritten anyway) and are
    // CARRIED for the untouched rest
    val touchedCur = dv.fold(touchedRaw)(
      ManifestTable.applyDv(touchedRaw, _))
    transform(touchedCur, xCol)
      .write.parquet(s"$root/$dir")
    val newPaths = dataPaths(spark, root, dir)
    val untouchedPaths = untouched.map(r => s(r, "path")).toIndexedSeq
    // self-contained version metadata: carried stats/bloom rows ride
    // into the NEW dir, so stats(v) never chases old dirs. Built from
    // the rows ALREADY collected above (O(files) driver memory) — no
    // second read of the stats parquet per DML
    val carriedBloom = bloom(spark, root, base)
      .map(_.filter(col("path").isin(untouchedPaths: _*)))
    writeStats(spark, root, dir, newPaths, xCol, yCol, bloomCol,
      Some((stSchema, untouched.toSeq)), carriedBloom,
      bloomBpk = geomOf(spark, root, baseDir))
    if (dv.nonEmpty)
      ManifestTable.carryDvFiltered(spark, root, baseDir, dir,
        untouchedPaths.map(ManifestTable.fileKeyOf).toSet)
    val manifest = (untouchedPaths ++ newPaths).mkString("\n")
    val f = fs(spark, root)
    val mp = new org.apache.hadoop.fs.Path(s"$root/$dir/_files")
    val out = f.create(mp, true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    ManifestTable.writeOpMeta(spark, root, dir, op)
    ManifestTable.writeMarker(spark, root, next, dataDir = dir)
    ManifestTable.maybeAutoCompact(spark, root)
    next
  }

  /** ESTABLISH committed skipping stats for a freshly-written version
    * dir, without the z-order rewrite ([[optimizeZOrder]]'s stats
    * tail alone): per-file min/max over (`xCol`,`yCol`) + optional
    * Bloom registers, computed by reading the files back as written.
    * The partitioned store uses this to stack SURVEY §4's two pruning
    * knobs — partition pruning from `_parts`, z/Bloom skipping within
    * a partition from `_stats`/`_bloom` — on one commit. The files
    * are not z-clustered, so ranges are as tight as the layout
    * happens to be (partition-major layouts are usually
    * time-correlated); pruning stays SOUND regardless (read-back
    * min/max are exact). */
  private[ops] def establishStats(spark: SparkSession, root: String,
      dir: String, paths: Seq[String], xCol: String, yCol: String,
      bloomCol: Option[String]): Unit =
    writeStats(spark, root, dir, paths, xCol, yCol, bloomCol,
      carriedStats = None, carriedBloom = None)

  /** Extend a base version's COMMITTED skipping stats across a
    * file-list commit (the round-12 gap closed: MoR-appended
    * fragments used to DROP the `_stats`/`_bloom` frames until the
    * next [[optimizeZOrder]], leaving the flagship streaming-sink
    * shape unprunable between optimizes — where Snowflake stamps
    * micro-partition metadata on EVERY write and Delta/Iceberg write
    * per-file stats in each commit). Fresh per-file stats (and Bloom
    * registers, when the base carries them) are computed for
    * `appendedPaths` by reading them back as written — O(appended
    * bytes), the merge-on-read grain — and the base's rows are
    * CARRIED (filtered to `carriedPaths` when given; all when None).
    * Appended fragments are not z-clustered, so their ranges may be
    * wide — pruning stays SOUND (read-back min/max are exact), just
    * less selective on fragments until the next re-cluster. No-op
    * when the base version has no committed stats. Returns true iff
    * frames were written. */
  private[ops] def extendStats(spark: SparkSession, root: String,
      baseDir: String, newDir: String, appendedPaths: Seq[String],
      carriedPaths: Option[Seq[String]] = None): Boolean = {
    val f = fs(spark, root)
    val stPath = new org.apache.hadoop.fs.Path(s"$root/$baseDir/_stats")
    if (!f.exists(stPath)) return false
    // frame HEAD (x_col/y_col/bloom_col) from a driver-side parquet
    // read, memoized per immutable dir — no Spark job per DML commit
    val head = MetaIO.frameHead(spark, stPath.toString)
      .getOrElse(return false)
    def s(c: String) = head(c).asInstanceOf[String]
    val xCol = s("x_col")
    val yCol = s("y_col")
    val bloomCol = Option(head("bloom_col")).map(_.toString)
    val bloomPath = new org.apache.hadoop.fs.Path(s"$root/$baseDir/_bloom")
    val hasBloom = f.exists(bloomPath)
    carriedPaths match {
      case None =>
        // carry-ALL fast path (every MoR DML commit): the carried
        // frames are copied at FILE grain — driver IO on tiny
        // metadata parquet, no Spark job — and the fresh rows APPEND
        // as new part files into the same frame dirs. The round-12
        // union-rewrite re-shuffled O(files × 256) Bloom rows through
        // a Spark job on EVERY commit — measured ~3 s of the 100×
        // mergeBatchDV wall; the copy is milliseconds at any scale.
        copyFrame(f, s"$root/$baseDir/_stats", s"$root/$newDir/_stats")
        if (hasBloom)
          copyFrame(f, bloomPath.toString, s"$root/$newDir/_bloom")
        if (appendedPaths.nonEmpty)
          // fresh fragment registers MUST follow the BASE frame's
          // geometry (the copied rows' word/bits were computed under
          // it and cannot be re-derived) — scaled iff the base is
          writeStats(spark, root, newDir, appendedPaths, xCol, yCol,
            bloomCol.filter(_ => hasBloom), carriedStats = None,
            carriedBloom = None, append = true,
            bloomBpk = geomOf(spark, root, baseDir))
      case Some(ps) =>
        // filtered carry (binPack/reorg drop rewritten files' rows):
        // `_stats` is O(files) planning metadata — read, filter and
        // merge it on the DRIVER (the Spark semi-join + write cost a
        // broadcast job + an action per commit); the Spark collect
        // stays as the fallback for an unreadable legacy shape
        import spark.implicits._
        val keep = ps.toSet
        val (cSchema, cRows) = MetaIO.schemaOf(spark, stPath)
          .filter(MetaIO.frameWritable)
          .flatMap(s =>
            MetaIO.frameRowsAs(spark, stPath.toString, s).map((s, _)))
          match {
          case Some((s, rows)) =>
            val pi = s.fieldIndex("path")
            (s, rows.filter(r =>
              !r.isNullAt(pi) && keep.contains(r.getString(pi))))
          case None =>
            val df = MetaIO.readParquet(spark, stPath.toString)
              .join(broadcast(ps.toDF("path")), Seq("path"), "left_semi")
            (df.schema, MetaIO.withMetaActionConf(spark)(
              df.collect().toSeq))
        }
        if (appendedPaths.isEmpty) {
          MetaIO.writeFrame(spark, s"$root/$newDir/_stats",
            cSchema, cRows)
          if (hasBloom) {
            // bloom registers are O(files × words) — driver carry
            // under the same cap as DV frames, semi-join past it
            if (!MetaIO.carryFrameFiltered(spark, bloomPath.toString,
                s"$root/$newDir/_bloom", "path", keep,
                ManifestTable.dvLocalCarryCap, writeEmpty = true))
              MetaIO.withMetaActionConf(spark)(
                MetaIO.readParquet(spark, bloomPath.toString)
                  .join(broadcast(ps.toDF("path")), Seq("path"),
                    "left_semi")
                  .coalesce(1).write.parquet(s"$root/$newDir/_bloom"))
            geomOf(spark, root, baseDir).foreach(bpk =>
              writeGeom(f, root, newDir, bpk))
          }
        } else {
          val carriedBloom =
            if (hasBloom) Some(MetaIO.readParquet(spark,
                bloomPath.toString)
              .join(broadcast(ps.toDF("path")), Seq("path"), "left_semi"))
            else None
          writeStats(spark, root, newDir, appendedPaths, xCol, yCol,
            bloomCol, Some((cSchema, cRows)), carriedBloom,
            bloomBpk = geomOf(spark, root, baseDir))
        }
    }
    true
  }

  /** File-grain copy of a tiny metadata frame dir (stats/Bloom/DV/
    * parts) — driver IO, no Spark job. Shared with the verbatim-carry
    * commit paths in [[ManifestTable]] (a Spark read+repartition+write
    * of a 1-file frame costs ~3 jobs; this is milliseconds of driver
    * IO with identical bytes-level content). Two-filesystem form for
    * cross-root clones. */
  private[ops] def copyFrame(f: org.apache.hadoop.fs.FileSystem,
      src: String, dst: String,
      fDst: org.apache.hadoop.fs.FileSystem = null): Unit = {
    val fd = if (fDst == null) f else fDst
    val s = new org.apache.hadoop.fs.Path(src)
    val d = new org.apache.hadoop.fs.Path(dst)
    // locality from the FileSystem INSTANCES, not string sniffing
    // (ADVICE r15: a scheme-less path resolves against fs.defaultFS —
    // on a non-local defaultFS the nio branch would read the wrong
    // store and silently write an empty frame)
    def isLocal(fsys: org.apache.hadoop.fs.FileSystem) =
      fsys.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
        fsys.getScheme == "file"
    if (isLocal(f) && isLocal(fd)) {
      // pure-nio byte copy, .crc sidecars included VERBATIM (bytes
      // identical → checksums stay valid): the Hadoop FileUtil route
      // re-created every file through ChecksumFileSystem.create,
      // paying a chmod (a process FORK without the native lib) and a
      // checksum recompute per file
      def local(p: String) =
        new java.io.File(if (p.startsWith("file:"))
          new java.net.URI(p).getPath else p)
      val sd = local(src)
      val dd = local(dst)
      val srcFiles = Option(sd.listFiles()).getOrElse(Array.empty)
      // the caller asserts the source frame exists — an empty listing
      // here means a resolution bug; fail loudly instead of silently
      // committing an empty frame
      require(srcFiles.nonEmpty,
        s"copyFrame: source frame dir $src lists no files")
      java.nio.file.Files.createDirectories(dd.toPath)
      srcFiles.foreach { sf =>
        if (sf.isFile)
          java.nio.file.Files.copy(sf.toPath,
            new java.io.File(dd, sf.getName).toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } else {
      fd.mkdirs(d)
      f.listStatus(s).filter(st => !st.getPath.getName.startsWith("."))
        .foreach(st => org.apache.hadoop.fs.FileUtil.copy(f, st.getPath,
          fd, new org.apache.hadoop.fs.Path(d, st.getPath.getName),
          false, f.getConf))
    }
  }

  /** The data files of a freshly-written dir, as root-relative paths
    * (`<dir>/<file>`). */
  private def dataPaths(spark: SparkSession, root: String,
      dir: String): IndexedSeq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$dir")
    fs(spark, root).listStatus(p).toIndexedSeq
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .map(n => s"$dir/$n")
  }

  /** Compute per-file stats (and Bloom registers) for `paths` by
    * reading the files as written, union carried rows, and write the
    * frames under the version dir. The read-back costs one extra scan
    * of the REWRITTEN bytes only — the price of stats that can never
    * disagree with the files. */
  private def writeStats(spark: SparkSession, root: String, dir: String,
      paths: Seq[String], xCol: String, yCol: String,
      bloomCol: Option[String],
      carriedStats: Option[(org.apache.spark.sql.types.StructType,
        Seq[org.apache.spark.sql.Row])],
      carriedBloom: Option[DataFrame], append: Boolean = false,
      bloomBpk: Option[Long] = Some(bloomBitsPerKey)): Unit = {
    val mode = if (append) "append" else "errorifexists"
    // working set of this stats/register pass = the appended bytes —
    // sizes the metadata-action reduce width (1 task for a fragment
    // commit, full width for a 100× establish)
    val appendedBytes: Option[Long] = try {
      val f0 = fs(spark, root)
      Some(paths.map(p => f0.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$root/$p")).getLen).sum)
    } catch { case _: Throwable => None }
    val df = MetaIO.readParquet(spark, paths.map(p => s"$root/$p"))
    val withPath = df.withColumn("__path",
      substring_index(input_file_name(), "/", -2))
    val fresh0 = withPath.groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol).cast("long")).as("min_x"),
        max(col(xCol).cast("long")).as("max_x"),
        min(col(yCol).cast("long")).as("min_y"),
        max(col(yCol).cast("long")).as("max_y"))
      .withColumn("x_col", lit(xCol))
      .withColumn("y_col", lit(yCol))
      .withColumn("bloom_col",
        bloomCol.map(lit(_)).getOrElse(lit(null).cast("string")))
    // Per-file rows from the parquet FOOTERS when both dims are
    // plain int physical types (exact by construction — int column
    // statistics are never truncated, row counts always exact): zero
    // Spark jobs for the stats themselves. Any other shape falls back
    // to ONE action materializing the read-back aggregation to the
    // driver (O(files) — the planning grain). The pre-round-15 shape
    // collected only the KEY SET, then re-ran the same aggregation
    // inside the frame write, then re-read the written frame for the
    // Bloom sizes: three scans of the appended bytes plus a
    // read-back where one footer pass (or one scan) carries
    // everything (guide §1.2 — don't compute things twice).
    val freshRows: Seq[org.apache.spark.sql.Row] =
      MetaIO.footerIntStats(spark, paths.map(p => s"$root/$p"),
          xCol, yCol) match {
        case Some(rows) => rows.map { case (k, n, mnx, mxx, mny, mxy) =>
          org.apache.spark.sql.Row(k, n, mnx, mxx, mny, mxy,
            xCol, yCol, bloomCol.orNull) }
        // fallback aggregation (non-int dims): the exchange carries
        // O(files) rows after map-side partial agg — metadata-action
        // conf (AQE off, working-set-sized reduce) collapses the AQE
        // stage choreography into one job at any scale
        case None => MetaIO.withMetaActionConf(spark, appendedBytes)(
          fresh0.collect().toSeq)
      }
    // EMPTY files yield no read-back group — synthesize their rows
    // (0 rows, NULL bounds) so stats(v) covers EXACTLY the version's
    // file list at all times: a listed file with no stats row would
    // be silently invisible to the planner, breaking the coverage
    // invariant the DML scoping leans on. (Zero-row part files come
    // from empty shuffle partitions in a small post-image write or an
    // over-provisioned repartitionByRange.) O(files) driver set-diff
    // — the planning grain.
    val freshKeys = freshRows.map(_.getString(0)).toSet
    val missing = paths.map(p =>
      p.split('/').takeRight(2).mkString("/"))
      .filterNot(freshKeys.contains)
    val allLocal = freshRows ++ missing.map(p =>
      org.apache.spark.sql.Row(p, 0L, null, null, null, null,
        xCol, yCol, bloomCol.orNull))
    // EVERY `_stats` write is now a DRIVER write: the fresh rows are
    // already local (footer stats or one collected agg) and carried
    // rows arrive local from the caller (collected stats frame /
    // driver frame read) — the union and the one-file write need no
    // Spark action at all. The merged schema replicates unionByName:
    // carried column order, per-column nullability OR, fresh rows
    // re-ordered by name; a name mismatch throws exactly like
    // unionByName would.
    val (outSchema, outRows) = carriedStats match {
      case None => (fresh0.schema, allLocal)
      case Some((cs, crows)) =>
        val idx = cs.fieldNames.map(fresh0.schema.fieldIndex)
        val merged = org.apache.spark.sql.types.StructType(
          cs.fields.map { f =>
            f.copy(nullable =
              f.nullable || fresh0.schema(f.name).nullable) })
        (merged, crows ++ allLocal.map(r =>
          org.apache.spark.sql.Row(idx.map(r.get).toIndexedSeq: _*)))
    }
    MetaIO.writeFrame(spark, s"$root/$dir/_stats", outSchema, outRows,
      append = append)
    bloomCol.foreach { bc =>
      // q221's register shape at committed grain: (path, word, bits)
      // rows built by ONE bit_or agg; 32-bit blocks keep the shifted
      // bit far from the sign bit. Register size per file: scaled
      // frames (`bloomBpk` Some) use m = max(8192, bpk·n_rows) off
      // the SAME collected rows the `_stats` frame was written from
      // (no read-back — byte-identical inputs), so registers grow
      // with the file instead of saturating; legacy frames stay at
      // the fixed M. The per-path m MUST match what
      // [[bloomProbePaths]] derives at read time — both sides compute
      // it from the same committed n_rows.
      val mOf: Long => Long = bloomBpk match {
        case Some(bpk) => n => math.max(M, n * bpk)
        case None => _ => M
      }
      import spark.implicits._
      val sizePairs = allLocal
        .map(r => (r.getString(0), mOf(r.getLong(1))))
      // per-path register size as a LITERAL MAP when the commit's file
      // list is SMALL (every MoR fragment commit) — the broadcast join
      // cost a dedicated broadcast-build job per commit; element_at
      // over a map literal is pure codegen. Threshold is LOW on
      // purpose: element_at on an ArrayBasedMapData literal is a
      // LINEAR scan per row (a 640-entry map over a 100× establish's
      // 33M rows cost seconds — measured), so wide establishes keep
      // the O(1)-per-row broadcast hash join.
      val mCol: DataFrame => DataFrame =
        if (sizePairs.sizeIs <= 64) { w =>
          w.withColumn("m", element_at(
            typedLit(sizePairs.toMap), col("path")))
        } else { w =>
          w.join(broadcast(sizePairs.toDF("path", "m")), Seq("path"))
        }
      val words = mCol(Seq(501, 502).map(seed =>
        withPath.select(col("__path").as("path"),
          graft.functions.TextFunctions.hash60(col(bc), seed)
            .as("h0")))
        .reduce(_ unionByName _))
        .select(col("path"), (col("h0") % col("m")).as("h"))
        .select(col("path"), shiftright(col("h"), 5).as("word"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(h & 31 AS INT))")
            .as("bit"))
      val freshBloom = words.groupBy(col("path"), col("word"))
        .agg(expr("bit_or(bit)").as("bits"))
      val allBloom = carriedBloom.fold(freshBloom)(_ unionByName freshBloom)
      // register build: the exchange carries O(files × register words)
      // rows after map-side partial agg — metadata-action conf (AQE
      // off, working-set-sized reduce) turns the 3-job AQE
      // choreography into ONE job; the data-sized map side keeps its
      // input parallelism and a 100× establish keeps its reduce width
      MetaIO.withMetaActionConf(spark, appendedBytes)(
        allBloom.coalesce(1).write.mode(mode)
          .parquet(s"$root/$dir/_bloom"))
      bloomBpk.foreach(bpk => writeGeom(fs(spark, root), root, dir, bpk))
    }
  }

  /** Bloom point-lookup planning off the COMMITTED registers: the
    * files of the current version that may contain `key` in the
    * indexed column (a provable superset — Bloom has no false
    * negatives). O(files) planning, same as [[scanXRange]]. */
  def bloomCandidateFiles(spark: SparkSession, root: String,
      key: Column): Seq[String] = {
    val v = ManifestTable.currentVersion(spark, root)
      .getOrElse(sys.error(s"no committed version at $root"))
    bloom(spark, root, v).getOrElse(
      sys.error(s"version $v of $root has no committed Bloom index"))
    bloomProbePaths(spark, root,
      ManifestTable.versionDataDir(spark, root, v), key)
  }

  /** Read the Bloom candidate files for `key` WITH the current
    * version's deletion vector applied — the safe composition of
    * [[bloomCandidateFiles]] with merge-on-read DML (reading the
    * candidate paths as plain parquet on a DV version would
    * resurrect deleted rows). Returns an empty (correctly-schemed)
    * frame when no file can contain the key. */
  def readBloomCandidates(spark: SparkSession, root: String,
      key: Column): DataFrame = {
    val v = ManifestTable.currentVersion(spark, root)
      .getOrElse(sys.error(s"no committed version at $root"))
    val cands = bloomCandidateFiles(spark, root, key)
    if (cands.isEmpty)
      return ManifestTable.readVersion(spark, root, v).filter(lit(false))
    val raw = MetaIO.readParquet(spark,
      cands.map(p => ManifestTable.resolveRef(root, p)))
    ManifestTable.dvOf(spark, root,
      ManifestTable.versionDataDir(spark, root, v))
      .fold(raw)(ManifestTable.applyDv(raw, _))
  }
}
