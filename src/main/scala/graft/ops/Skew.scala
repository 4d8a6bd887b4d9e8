package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (builder brief: "salting for skew,
  * AQE for runtime re-plan").
  *
  * AQE's skew-join split handles sort-merge skew automatically when
  * statistics surface it; salting is the explicit fallback for
  * pathological keys (one key = 30% of a 100 TB fact) or for
  * aggregations, where AQE cannot split a single hot group.
  */
object Skew {

  /** Salted equi-join of a skewed big side against a smaller side:
    * big rows get a random-but-deterministic salt in [0, buckets),
    * the small side is exploded ×buckets, and the join key becomes
    * (key, salt) — spreading each hot key over `buckets` reducers.
    * Exact same rows as the unsalted join; pay ×buckets duplication
    * of the small side only. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // deterministic pseudo-salt (no rand(): keeps retries/stage
    // re-execution and tests reproducible)
    val salted = big.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(buckets)))
    val exploded = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    val out = salted.join(exploded,
      Seq(key, "__salt"), joinType)
    out.drop("__salt")
  }

  /** Two-phase aggregation for hot group keys: partial aggregate on
    * (key, salt), then final aggregate on key. `partials` maps each
    * wanted metric to its (partial, merge) pair — e.g. count →
    * (count, sum). Exact results, no single hot reducer. */
  def saltedCountSum(
      df: DataFrame,
      key: String,
      sumCol: Column,
      buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(buckets)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(sumCol).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n_rows"), sum(col("__s")).as("sum_value"))
  }
}
