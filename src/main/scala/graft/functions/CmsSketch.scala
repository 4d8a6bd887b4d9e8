package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) with EXACT-INTEGER
  * register math — like [[HllSketch]], the sketch itself is
  * oracle-checkable bit-for-bit, not just its estimates:
  *
  *  - row `j` of the sketch hashes with the seeded 60-bit
  *    [[TextFunctions.hash60]] (seed = `seedBase + j` — the d
  *    pairwise-independent hash functions of the paper, drawn from the
  *    same md5 family as every other sketch here);
  *  - cell (j, h_j(x) mod width) accumulates the occurrence count —
  *    a plain sum, so partial aggregation and cross-partition merge
  *    are free (sum commutes), the property that lets a 100 TB token
  *    stream reduce to d·w integers with map-side combine doing
  *    almost all the work;
  *  - the register table is emitted DENSE (every (row, col) cell,
  *    zeros included): the sketch's merge identity is the zero grid,
  *    and a dense fixed-shape table is what a register store
  *    (or the driver's hash compare) wants.
  *
  * Point-frequency estimates ([[estimate]]) take the min over the d
  * cells a key hashes to — an upper bound on the true count with
  * ε = e/w overestimate bounds; spec-verified, while the driver's
  * oracle gates the registers.
  *
  * Completes the sketch family: KMV ([[KmvSketch]]) = distinct count +
  * uniform sample, HLL ([[HllSketch]]) = distinct count in O(2^p)
  * bits, CMS = per-key FREQUENCY (heavy hitters, quota enforcement)
  * in O(d·w) integers.
  */
object CmsSketch {

  /** Dense register table for the occurrences of `value` in `df`:
    * (row, col, cnt), exactly depth·width rows, zeros included.
    * Mergeable: union two register tables and re-aggregate sum. */
  def registers(df: DataFrame, value: Column, depth: Int = 4,
      width: Int = 32, seedBase: Int = 100): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16]: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    val cells = df
      .select(posexplode(array((0 until depth).map(j =>
        (TextFunctions.hash60(value, seedBase + j) % width).cast("int")
      ): _*)).as(Seq("row", "col")))
      .groupBy(col("row"), col("col")).agg(count(lit(1)).as("cnt"))
    val spark = df.sparkSession
    val grid = spark.range(depth.toLong * width).select(
      expr(s"CAST(id div $width AS INT)").as("row"),
      (col("id") % width).cast("int").as("col"))
    grid.join(cells, Seq("row", "col"), "left")
      .select(col("row"), col("col"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** GROUPED register tables: one CMS per value of `group` (source /
    * day / shard) — (group, row, col, cnt) rows, SPARSE (zero cells
    * dropped; they are the merge identity). Roll up to any coarser
    * grain by re-aggregating sum over the group subset — the same
    * contract as [[HllSketch.registersBy]], for frequency instead of
    * cardinality. */
  def registersBy(df: DataFrame, group: String, value: Column,
      depth: Int = 4, width: Int = 32, seedBase: Int = 100): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16]: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    df.select(col(group), posexplode(array((0 until depth).map(j =>
        (TextFunctions.hash60(value, seedBase + j) % width).cast("int")
      ): _*)).as(Seq("row", "col")))
      .groupBy(col(group), col("row"), col("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** CMS point-frequency estimates for the keys of `keys` against a
    * register table: min over the d cells each key hashes to. Joins
    * the (broadcastable) register table — nothing is collected.
    *
    * Accepts SPARSE register tables (the [[registersBy]] /
    * `SketchStream.mergedCms` shape): the join is LEFT, missing cells
    * coalesce to 0 — so a key whose row hits an absent (zero) cell
    * still takes that 0 into its min (the CMS bound requires the min
    * over ALL d cells, not just the stored ones), and a key hitting no
    * stored cell at all reports est = 0 instead of vanishing from the
    * output. Dense tables ([[registers]]) behave identically: every
    * cell matches, nothing coalesces. */
  def estimate(registers: DataFrame, keys: DataFrame, key: Column,
      depth: Int = 4, width: Int = 32, seedBase: Int = 100): DataFrame = {
    val cells = keys
      .select(key.as("key"), posexplode(array((0 until depth).map(j =>
        (TextFunctions.hash60(key, seedBase + j) % width).cast("int")
      ): _*)).as(Seq("row", "col")))
    cells.join(broadcast(registers), Seq("row", "col"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
