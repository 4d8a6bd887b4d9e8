package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog register sketch (Flajolet et al. 2007) with
  * EXACT-INTEGER register math, so the sketch itself — not just its
  * estimate — is oracle-checkable bit-for-bit on any engine:
  *
  *  - the 60-bit md5-seeded [[TextFunctions.hash60]] supplies the
  *    uniform hash (same family as every other sketch here);
  *  - bucket = top `p` bits; rho = 1 + leading-zero count of the
  *    remaining (60-p) bits, computed as `rem - length(bin(rest)) + 1`
  *    — `bin` (minimal-width binary string) is integer-exact in both
  *    Spark and DuckDB, so no log2 / floating point touches the
  *    registers;
  *  - registers are `max(rho)` per bucket: the standard mergeable
  *    aggregation (max commutes, so partial aggregation and
  *    cross-partition merge are free — the property that makes HLL the
  *    industry default for distinct counts over 100 TB streams).
  *
  * The cardinality ESTIMATE (harmonic mean + bias correction) is
  * driver-side over the ≤ 2^p register rows ([[estimate]]) — a bounded
  * collect by construction, like the IVF centroid table. The estimate
  * involves non-correctly-rounded double math (pow sums), so it is
  * spec-verified, while the driver's oracle gates the registers.
  *
  * Complements the KMV/bottom-k sketches ([[KmvSketch]], q74/q78/q91):
  * KMV answers distinct-count + uniform-sample, HLL answers
  * distinct-count in O(2^p) bits with O(1) update — the right sketch
  * when only cardinality matters.
  */
object HllSketch {

  /** Observed-register table for the values of `value` in `df`:
    * (bucket, max_rho), one row per non-empty bucket, bucket in
    * [0, 2^p). Deterministic and mergeable: union two register tables
    * and re-aggregate max to merge sketches. */
  def registers(df: DataFrame, value: Column, p: Int = 6,
      seed: Int = 0): DataFrame = {
    require(p >= 1 && p <= 16, s"p must be in [1,16]: $p")
    val rem = 60 - p
    val h = TextFunctions.hash60(value, seed)
    val bucket = shiftright(h, rem).as("bucket")
    val rest = h.bitwiseAND(lit((1L << rem) - 1L))
    // rho = position of the highest set bit counted from the left of
    // the rem-bit field, 1-based; all-zero field -> rem + 1
    val rho = when(rest === 0L, lit(rem + 1))
      .otherwise(lit(rem) - (length(bin(rest)) - 1))
    df.select(bucket, rho.cast("long").as("__rho"))
      .groupBy(col("bucket"))
      .agg(max(col("__rho")).as("max_rho"))
  }

  /** GROUPED register tables: one HLL sketch per value of `group`
    * (source / day / shard) — (group, bucket, max_rho) rows. The
    * grouped form is what a 100 TB pipeline actually materializes:
    * per-partition sketches that roll up to any coarser grain by
    * re-aggregating max over the group subset (day→month, source→all)
    * without touching the data again. */
  def registersBy(df: DataFrame, group: String, value: Column, p: Int = 6,
      seed: Int = 0): DataFrame = {
    require(p >= 1 && p <= 16, s"p must be in [1,16]: $p")
    val rem = 60 - p
    val h = TextFunctions.hash60(value, seed)
    val bucket = shiftright(h, rem).as("bucket")
    val rest = h.bitwiseAND(lit((1L << rem) - 1L))
    val rho = when(rest === 0L, lit(rem + 1))
      .otherwise(lit(rem) - (length(bin(rest)) - 1))
    df.select(col(group), bucket, rho.cast("long").as("__rho"))
      .groupBy(col(group), col("bucket"))
      .agg(max(col("__rho")).as("max_rho"))
  }

  /** Standard HLL estimate from a register table (small-range linear
    * counting below 2.5·m, raw harmonic estimate otherwise; the
    * large-range correction is irrelevant at 60-bit hash width).
    * Collects ≤ 2^p rows — bounded by construction. */
  def estimate(registers: DataFrame, p: Int): Double = {
    val m = 1 << p
    val regs = registers.select(col("bucket"), col("max_rho"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val z = (0 until m).map(j =>
      math.pow(2.0, -regs.getOrElse(j.toLong, 0L).toDouble)).sum
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / z
    val zeros = m - regs.count { case (_, rho) => rho > 0 }
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}
