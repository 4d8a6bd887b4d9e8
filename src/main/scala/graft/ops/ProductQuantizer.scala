package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search") — the vector-compression
  * half of the IVF-PQ index every billion-vector ANN deployment runs:
  * the d-dim embedding splits into `m` contiguous subspaces of d/m
  * dims, each subspace gets its own tiny k-means codebook, and a
  * vector compresses to m small codes (m·log2(k) bits instead of d
  * floats — 64 floats → 4 codes here). Distances against compressed
  * vectors then resolve per-subspace from a k·m lookup table (ADC);
  * the reconstruction error this op reports is exactly the quantity
  * the ADC approximation is off by, which is why it is THE codebook
  * tuning signal.
  *
  * Determinism: each subspace trains with [[KMeans.centroids]]'s
  * exact-integer Lloyd (quantized vectors, smallest-id init, exact
  * per-dim sums, fixed-order distance folds, (dist, cid) tie-break) on
  * the SLICED vector — so codes and per-subspace squared errors are
  * oracle-checkable bit-for-bit like every other ANN op here.
  *
  * Scale shape: `m` independent subspace trainings, each the
  * [[KMeans.centroids]] shape (k-row broadcast centroid state, k·(d/m)
  * shuffle rows per iteration); encoding is one narrow pass per
  * subspace with the k-row codebook riding as a broadcast array. The
  * union stacks m row-sets of n rows — at 100 TB each subspace pass is
  * embarrassingly parallel and nothing materializes beyond k·d
  * centroid cells. m is a config constant (4), not a data dimension.
  */
object ProductQuantizer {

  /** PQ-encode every vector: (id, sub, code, dist_sq) — `m` rows per
    * vector, `code` = the subspace's nearest trained centroid id,
    * `dist_sq` = exact squared distance of the quantized sub-vector
    * to that centroid (the per-subspace reconstruction error). */
  def encode(emb: DataFrame, dim: Int, m: Int, k: Int, iters: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val w = dim / m
    (0 until m).map { s =>
      val sliced = emb.select(col(id), slice(col(vec), s * w + 1, w).as(vec))
      KMeans.assign(sliced, k, iters, id, vec)
        .select(col(id), lit(s).as("sub"),
          col("cluster").as("code"), col("dist_sq"))
    }.reduce(_.unionByName(_))
  }

  /** Per-vector total reconstruction error: sum of the m subspace
    * errors (exact: each addend is a deterministic double, summed in
    * sub order via a pivot-style conditional sum — m is a constant,
    * so the sum order is fixed, not data-ordered). */
  def reconstructionError(emb: DataFrame, dim: Int, m: Int, k: Int,
      iters: Int, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    val codes = encode(emb, dim, m, k, iters, id, vec)
    // fixed-order sum: collect the m per-sub errors into a sub-indexed
    // sorted array, then fold left — order is (sub 0, 1, ..., m-1) by
    // construction, never shuffle order
    codes.groupBy(col(id))
      .agg(sort_array(collect_list(struct(col("sub"), col("dist_sq"))))
        .as("__e"))
      .select(col(id),
        aggregate(col("__e"), lit(0.0), (acc, x) => acc + x("dist_sq"))
          .as("recon_sq"))
  }
}
