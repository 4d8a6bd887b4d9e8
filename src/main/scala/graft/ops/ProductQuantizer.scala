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

  private def sliced(emb: DataFrame, s: Int, w: Int, id: String,
      vec: String): DataFrame =
    emb.select(col(id), slice(col(vec), s * w + 1, w).as(vec))

  /** Trained PQ codebooks: (sub, cid, mean) — one k-row
    * [[KMeans.centroids]] table per subspace, means over the d/m
    * sliced dims. k·m rows total, broadcastable by construction. */
  def codebooks(emb: DataFrame, dim: Int, m: Int, k: Int, iters: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val w = dim / m
    (0 until m).map { s =>
      KMeans.centroids(sliced(emb, s, w, id, vec), k, iters, id, vec)
        .select(lit(s).as("sub"), col("cid"), col("mean"))
    }.reduce(_.unionByName(_))
  }

  /** PQ-encode every vector: (id, sub, code, dist_sq) — `m` rows per
    * vector, `code` = the subspace's nearest trained centroid id,
    * `dist_sq` = exact squared distance of the quantized sub-vector
    * to that centroid (the per-subspace reconstruction error). */
  def encode(emb: DataFrame, dim: Int, m: Int, k: Int, iters: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val w = dim / m
    (0 until m).map { s =>
      KMeans.assign(sliced(emb, s, w, id, vec), k, iters, id, vec)
        .select(col(id), lit(s).as("sub"),
          col("cluster").as("code"), col("dist_sq"))
    }.reduce(_.unionByName(_))
  }

  /** ADC top-k search (the paper's Asymmetric Distance Computation —
    * the QUERY path of an IVF-PQ index): corpus vectors live only as
    * their m PQ codes; each query computes its exact squared distance
    * to every codebook centroid once (a k·m-entry lookup table, NOT a
    * per-candidate computation), and a candidate's estimated distance
    * is the sum of its m code lookups. Approximate by construction —
    * the estimate is the distance to the candidate's reconstruction —
    * and exactly reproducible: LUT entries use [[KMeans.distSq]]'s
    * fixed-order fold, and the per-candidate sum folds the m terms in
    * sub order (sorted collect, never shuffle order).
    *
    * Returns (id_q, rank, id_c, dist_est), topK per query, ties on
    * (dist_est, id_c). Self-matches are excluded.
    *
    * Scale shape: training + encoding as [[codebooks]]/[[encode]];
    * the LUT is #queries·k·m rows and BROADCASTS; the only shuffle of
    * corpus-sized data is the (sub, code) equi-join of the code table
    * against the LUT and the per-(query, candidate) regroup — n·m
    * rows each, never n·#queries·d. Per-query top-k is a rank window
    * partitioned by query. */
  def adcSearch(emb: DataFrame, queries: DataFrame, dim: Int, m: Int,
      k: Int, iters: Int, topK: Int, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val w = dim / m
    // one shared codebook: train per subspace, encode corpus and
    // build the query LUT against the SAME frozen centroids
    val perSub = (0 until m).map { s =>
      val cents = KMeans.centroids(sliced(emb, s, w, id, vec), k, iters,
        id, vec)
      val codes = KMeans.assignWith(sliced(emb, s, w, id, vec), cents,
          id, vec)
        .select(col(id).as("id_c"), lit(s).as("sub"),
          col("cluster").as("code"))
      val cArr = cents.agg(
        sort_array(collect_list(struct(col("cid"), col("mean"))))
          .as("__cs"))
      val lut = KMeans.prep(sliced(queries, s, w, id, vec), id, vec)
        .crossJoin(broadcast(cArr)) // k-row codebook as a 1-row array
        .select(col(id).as("id_q"), lit(s).as("sub"),
          explode(transform(col("__cs"), c =>
            struct(c("cid").as("code"),
              KMeans.distSq(col("__qd"), c("mean")).as("d")))).as("__l"))
        .select(col("id_q"), col("sub"), col("__l.code").as("code"),
          col("__l.d").as("d"))
      codes.join(broadcast(lut), Seq("sub", "code"))
        .select(col("id_q"), col("id_c"), col("sub"), col("d"))
    }
    val terms = perSub.reduce(_.unionByName(_))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_q"))
      .orderBy(col("dist_est").asc, col("id_c").asc)
    terms.filter(col("id_q") =!= col("id_c"))
      .groupBy(col("id_q"), col("id_c"))
      // fixed-order sum: fold the m per-sub terms in sub order
      .agg(sort_array(collect_list(struct(col("sub"), col("d"))))
        .as("__t"))
      .select(col("id_q"), col("id_c"),
        aggregate(col("__t"), lit(0.0), (acc, x) => acc + x("d"))
          .as("dist_est"))
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= topK)
      .select(col("id_q"), col("rank"), col("id_c"), col("dist_est"))
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
