package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validation surface of the reference:
  *  - valid/error row splitting with first-failing-rule reasons
  *    (`dags/snowflake-EDW-ETL-dag.py:98-145`,
  *    `dbt/dbt-project/models/silver/silver_error_*.sql`);
  *  - the 24 declarative dbt data tests — not_null / unique /
  *    relationships / accepted range (`dbt/dbt-project/models/schema.yml`).
  */
object Quality {

  /** A named validation rule; `passes` is the predicate a GOOD row
    * satisfies. Rule order is load-bearing: the error reason is the
    * FIRST failing rule, exactly like the reference's CASE chain
    * (SURVEY §2.2 P5). */
  final case class Rule(reason: String, passes: Column)

  /** Annotate every row with `error_reason` (null when valid) in one
    * pass — both branches derive from it without recomputing the scan:
    * valid = filter(isNull), errors = filter(isNotNull). */
  def withErrorReason(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    // fold back-to-front so the WHEN chain evaluates in rule order
    val chain = rules.reverse.foldLeft(lit(null).cast("string")) { (tail, r) =>
      when(!coalesce(r.passes, lit(false)), lit(r.reason)).otherwise(tail)
    }
    df.withColumn("error_reason", chain)
  }

  /** P4/P5 split. Cache upstream if both sides fan out to writes. */
  def splitValidError(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val annotated = withErrorReason(df, rules)
    (annotated.filter(col("error_reason").isNull).drop("error_reason"),
     annotated.filter(col("error_reason").isNotNull))
  }

  /** One data-quality check = name + violation counter over a table. */
  final case class Check(name: String, violations: DataFrame => Column)

  def notNull(c: String): Check =
    Check(s"${c}_not_null", _ => count(when(col(c).isNull, 1)))
  def unique(cs: Seq[String]): Check =
    Check(s"${cs.mkString("_")}_unique",
      _ => (count(lit(1)) -
        countDistinct(col(cs.head), cs.tail.map(col): _*)).cast("long"))
  def between(c: String, lo: Double, hi: Double): Check =
    Check(s"${c}_between",
      _ => count(when(col(c).isNull || col(c) <= lo || col(c) > hi, 1)))

  /** Run checks over one table with a single aggregate job (all
    * violation counters in one pass — 24 reference tests become one
    * scan per table, not 24). Returns (check_name, n_violations, passed). */
  def runChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.map(c => c.violations(df).cast("long").as(c.name))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map { c =>
      row.select(
        lit(c.name).as("check_name"),
        col(c.name).as("n_violations"),
        (col(c.name) === 0).as("passed"))
    }
    stacked.reduce(_.unionByName(_))
  }

  /** Referential-integrity check (dbt `relationships`): child keys with
    * no parent. Anti-join keyed on the FK — broadcastable when the
    * parent is a dim. */
  def relationshipViolations(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
}
