package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, expr, lit, not}

/** A provided value for a generated column disagreed with its
  * generation expression — nothing was committed. */
final class GeneratedColumnViolation(val column: String,
    val genExpr: String, val scope: String, val sample: String)
  extends RuntimeException(
    s"generated column `$column` ($genExpr) mismatch in $scope; " +
      s"first offending row: $sample")

/** GENERATED ALWAYS AS columns on a [[ManifestTable]] root — Delta's
  * generated-column semantic: each is a named SQL expression stored as
  * one tiny file `<root>/_generated/<name>`. On every data-landing
  * path (commit / commitBatch / merge source), a batch that LACKS the
  * column gets it computed (a free projection inside the write plan);
  * a batch that PROVIDES it is validated value-by-value against the
  * expression (null-safe equality; one codegen'd filter + limit(1)
  * pass, the [[Checks]] shape) and rejected whole on the first
  * mismatch — a "generated" column that silently drifts from its
  * definition is worse than none.
  *
  * SCOPE: generation/validation runs where batches land. DML paths do
  * NOT recompute ([[ManifestTable.updateWhere]] SET-ting a generation
  * DEPENDENCY without SET-ting the generated column leaves the stale
  * derived value — same caveat Delta resolves with a constraint;
  * register a [[Checks]] check mirroring the expression when UPDATE
  * must be guarded too). Registration is first-wins like checks. */
object Generated {

  private type Path = org.apache.hadoop.fs.Path

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def genDir(root: String) = new Path(root, "_generated")

  /** Register `name` as GENERATED ALWAYS AS (`genExpr`). Fails if
    * already registered (drop first). Parses eagerly. */
  def setGenerated(spark: SparkSession, root: String, name: String,
      genExpr: String): Unit = {
    require(name.matches("[A-Za-z0-9_]+"),
      s"generated column name must be [A-Za-z0-9_]+: $name")
    spark.sessionState.sqlParser.parseExpression(genExpr)
    val fs = fsOf(spark, root)
    fs.mkdirs(genDir(root))
    val p = new Path(genDir(root), name)
    require(!fs.exists(p),
      s"generated column `$name` already defined at $root")
    val out = fs.create(p, false)
    try out.write(genExpr.getBytes("UTF-8")) finally out.close()
  }

  /** Remove a generated-column definition (no-op if absent). */
  def dropGenerated(spark: SparkSession, root: String,
      name: String): Unit = {
    fsOf(spark, root).delete(new Path(genDir(root), name), false)
    ()
  }

  /** The registered generated columns: name -> SQL expression. */
  def generated(spark: SparkSession, root: String): Map[String, String] = {
    val fs = fsOf(spark, root)
    val d = genDir(root)
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

  /** Complete-or-validate `df` against the registered definitions:
    * missing columns are COMPUTED (appended in registration-name
    * order), provided columns are VALIDATED (null-safe equality with
    * the expression over the df's OTHER columns; first mismatch
    * throws). Returns the completed df. Zero Spark actions when
    * nothing is registered; one filter+limit(1) action per call when
    * any provided column needs validation. */
  private[ops] def apply(spark: SparkSession, root: String,
      df: DataFrame, scope: String): DataFrame = {
    val defs = generated(spark, root)
    if (defs.isEmpty) return df
    val present = df.columns.toSet
    val (toValidate, toCompute) = defs.partition(kv => present(kv._1))
    toValidate.toSeq.sortBy(_._1).foreach { case (c, e) =>
      val bad = df.filter(not(df.col(c) <=> expr(e))).limit(1).collect()
      bad.headOption.foreach { row =>
        val sample = row.schema.fieldNames
          .map(f => s"$f=${row.get(row.fieldIndex(f))}").mkString(", ")
        throw new GeneratedColumnViolation(c, e, scope, sample)
      }
    }
    toCompute.toSeq.sortBy(_._1).foldLeft(df) { case (acc, (c, e)) =>
      acc.withColumn(c, expr(e))
    }
  }
}
