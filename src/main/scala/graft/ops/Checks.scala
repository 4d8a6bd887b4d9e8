package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, expr, lit, struct}

/** A committed write would have violated a table CHECK constraint —
  * nothing was committed (enforcement runs before the data write, so
  * the table is untouched, not a torn version). */
final class CheckViolationException(val check: String,
    val checkExpr: String, val scope: String, val sample: String)
  extends RuntimeException(
    s"CHECK constraint `$check` ($checkExpr) violated by $scope; " +
      s"first violating row: $sample")

/** Table-level CHECK constraints on a [[ManifestTable]] root — Delta's
  * `ALTER TABLE … ADD CONSTRAINT … CHECK (expr)`. Each constraint is a
  * named SQL boolean expression stored as one tiny file
  * `<root>/_checks/<name>`; every commit path enforces the full set on
  * the rows that commit can NEWLY introduce and throws
  * [[CheckViolationException]] BEFORE any data lands (the table never
  * advances on a rejected batch — spec-pinned).
  *
  * SQL CHECK semantics: a row passes unless the expression is
  * literally FALSE — NULL passes (unknown is not a violation), same
  * as ANSI and Delta.
  *
  * SCALE CONTRACT — what gets scanned per commit:
  *  - [[ManifestTable.commit]]/[[ManifestTable.commitBatch]]: the
  *    full df (it IS the new table — full-replace semantics);
  *  - merge family: the SOURCE batch only. Unchanged target rows
  *    passed their own commit-time check, so by induction the whole
  *    table satisfies every check that predates its data — O(batch)
  *    per merge, never O(table), the only affordable shape for a
  *    100 TB streaming sink;
  *  - UPDATE: the post-image of MATCHED rows only (O(matched)).
  * The induction breaks for a check added AFTER rows landed — run
  * [[validate]] (one full scan, explicit and on-demand) to certify
  * pre-existing data, exactly Delta's ADD CONSTRAINT behavior.
  *
  * Enforcement costs ONE extra pass over the checked rows (codegen'd
  * filter + limit 1; short-circuits at the first violation). Tables
  * with no `_checks` dir pay a single `exists` probe per commit. */
object Checks {

  private type Path = org.apache.hadoop.fs.Path

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def checksDir(root: String) = new Path(root, "_checks")

  /** Register a CHECK constraint. Fails if `name` is already defined
    * (drop first — redefinition racing a concurrent commit's read of
    * the set would be ambiguous about which version it enforced).
    * NOTE: registration does NOT validate existing rows — run
    * [[validate]] for that (the Delta ADD CONSTRAINT split, made
    * explicit because the validating scan is O(table)). */
  def setCheck(spark: SparkSession, root: String, name: String,
      checkExpr: String): Unit = {
    require(name.matches("[A-Za-z0-9_-]+"),
      s"check name must be [A-Za-z0-9_-]+: $name")
    // parse NOW so a typo fails at registration, not at first commit
    // (functions.expr alone is lazy — Spark 4 defers to analysis time)
    spark.sessionState.sqlParser.parseExpression(checkExpr)
    val fs = fsOf(spark, root)
    fs.mkdirs(checksDir(root))
    val p = new Path(checksDir(root), name)
    require(!fs.exists(p), s"check `$name` already defined at $root")
    val out = fs.create(p, false) // no-overwrite: the registration CAS
    try out.write(checkExpr.getBytes("UTF-8")) finally out.close()
  }

  /** Remove a CHECK constraint (no-op if absent). */
  def dropCheck(spark: SparkSession, root: String, name: String): Unit = {
    fsOf(spark, root).delete(new Path(checksDir(root), name), false)
    ()
  }

  /** The registered constraints: name -> SQL expression. */
  def checks(spark: SparkSession, root: String): Map[String, String] = {
    val fs = fsOf(spark, root)
    val d = checksDir(root)
    if (!fs.exists(d)) Map.empty
    else fs.listStatus(d).toSeq.map { st =>
      val in = fs.open(st.getPath)
      val body =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
          buf.toString("UTF-8")
        } finally in.close()
      st.getPath.getName -> body
    }.toMap
  }

  /** A row VIOLATES a check iff the expression is literally FALSE
    * (NULL passes — ANSI CHECK). */
  private def violates(checkExpr: String): Column =
    !coalesce(expr(checkExpr), lit(true))

  /** Enforce every registered check on `df` (the rows a commit newly
    * introduces — see the scale contract above). ONE pass: a single
    * OR-of-violations filter with `limit(1)`, then the surviving row
    * is probed per-check to NAME the violated constraint in the
    * error. No-op (zero Spark actions) when no checks are registered. */
  private[ops] def enforce(spark: SparkSession, root: String,
      df: DataFrame, scope: String): Unit = {
    val cs = checks(spark, root)
    if (cs.isEmpty) return
    val applicable = cs // checks may reference any column; a check on
    // a column df lacks fails loudly at resolution — better than
    // silently skipping a constraint the caller believes is enforced
    val anyViolation = applicable.values.map(violates).reduce(_ || _)
    val flags = struct(applicable.toSeq.sortBy(_._1).map {
      case (n, e) => violates(e).as(n)
    }: _*)
    val hit = df.withColumn("__check_flags", flags)
      .filter(anyViolation).limit(1).collect()
    hit.headOption.foreach { row =>
      val fl = row.getStruct(row.fieldIndex("__check_flags"))
      val bad = applicable.toSeq.sortBy(_._1).find {
        case (n, _) => !fl.isNullAt(fl.fieldIndex(n)) &&
          fl.getBoolean(fl.fieldIndex(n))
      }.getOrElse(applicable.head)
      val sample = row.schema.fieldNames.filter(_ != "__check_flags")
        .map(f => s"$f=${row.get(row.fieldIndex(f))}").mkString(", ")
      throw new CheckViolationException(bad._1, bad._2, scope, sample)
    }
  }

  /** Certify the CURRENT committed version against every registered
    * check — the explicit O(table) sweep for constraints added after
    * data landed. Returns (check name -> violation count); all zeros
    * means the induction premise holds again. ONE aggregate scan for
    * all checks together. */
  def validate(spark: SparkSession, root: String): Map[String, Long] = {
    import org.apache.spark.sql.functions.{count, when}
    val cs = checks(spark, root)
    if (cs.isEmpty) return Map.empty
    val df = ManifestTable.read(spark, root)
      .getOrElse(sys.error(s"no committed version at $root"))
    val aggs = cs.toSeq.sortBy(_._1).map { case (n, e) =>
      count(when(violates(e), 1)).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    cs.keys.map(n => n -> row.getLong(row.fieldIndex(n))).toMap
  }
}
