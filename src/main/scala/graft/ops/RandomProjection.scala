package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Seeded ±1 sign random projection (Achlioptas-style) — the
  * dimensionality-reduction step a 100 TB embedding pipeline runs
  * before LSH bucketing or coarse ANN: project d-dim vectors onto k
  * pseudo-random ±1 directions, preserving dot products in expectation
  * at k/d of the storage and compute.
  *
  * Determinism contract: the projection matrix is never materialized —
  * R[i,j] = sign of the seeded 60-bit md5 hash of "i_j", so any engine
  * (and any re-run, on any cluster size) derives the identical matrix;
  * inputs go through the ANN family's exact ×1000 integer quantization
  * and each output component is an exact int64 fold in array order —
  * no float summation anywhere.
  *
  * Scale shape: pure narrow projection over the scan (codegen'd HOFs:
  * one transform + fold per output dim) — no shuffle, no join, no
  * broadcast; runs at scan speed like [[Quantization]]. */
object RandomProjection {

  private def signOf(i: Column, j: Int, seed: Int): Column =
    when(pmod(T.hash60(concat(i.cast("string"), lit("_" + j)), seed),
      lit(2)) === 0, lit(1L)).otherwise(lit(-1L))

  /** Project each vector onto `k` seeded ±1 directions; output columns
    * `y0..y{k-1}` are exact int64 in quantized (×1000) units. */
  def signProject(emb: DataFrame, k: Int, seed: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    require(k > 0, "k must be positive")
    val q = V.quantize(col(vec))
    val ys = (0 until k).map { j =>
      aggregate(
        transform(q, (x, i) => x * signOf(i, j, seed)),
        lit(0L), (acc, v) => acc + v).as(s"y$j")
    }
    emb.select(col(id) +: ys: _*)
  }
}
