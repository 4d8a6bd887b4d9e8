package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query.
  *
  * @param name   stable key — shows up in CORRECTNESS_r{N}.json
  * @param fn     (spark, sfDir) => result; must be deterministic
  * @param oracle equivalent DuckDB SQL over the same tables; None for
  *               ops not expressible in ANSI SQL (driver then records a
  *               weaker rows-only check)
  * @param covers SURVEY.md §2 operator ids this query exercises
  *
  * Determinism contract (so the driver's value-hash compare passes):
  *  - every aggregate over a floating-point column goes through an
  *    exact DECIMAL cast first, then to double — bit-identical on any
  *    summation order, in Spark and DuckDB alike;
  *  - ratios/averages are computed as double divisions of those exact
  *    values (IEEE: same operands => same bits);
  *  - every result is fully ordered by a unique key set;
  *  - column names are lower_snake_case and aliased identically in the
  *    Spark code and the oracle SQL.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    covers: Seq[String] = Nil)

trait QueryPack {
  def queries: Seq[Q]
}
