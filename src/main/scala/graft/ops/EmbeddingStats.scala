package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Aggregate diagnostics over labeled embedding sets — the curation
  * signals a training-data pipeline reads off its clustered corpus
  * (how tight is each cluster, which labels are noise) before deciding
  * mixing weights or pruning.
  *
  * Determinism contract: same as the ANN family — vectors are
  * quantized to exact int64 (×1000), every sum/dot/norm is exact
  * integer arithmetic, and only the final cosine is a single IEEE
  * double expression. The per-label mean goes through the
  * DECIMAL(18,6) channel (exact sum, one division) so the result is
  * independent of aggregation order — the property that lets DuckDB
  * reproduce it bit-for-bit.
  */
object EmbeddingStats {

  /** Class-centroid EXPORT — the per-label mean embedding table
    * (label, dim, member count, centroid coordinate): the prototype
    * set a nearest-class-mean classifier, SemDeDup cluster stage, or
    * IVF-style coarse quantizer consumes. Exact integer per-dim sums,
    * then exactly two IEEE divisions (sum/n, then the ×1000
    * dequantization) — bit-stable on any engine and aggregation
    * order. One posexplode + one map-side-combined aggregation;
    * output is #labels × dim rows (broadcastable metadata). */
  def classCentroids(emb: DataFrame, id: String = "vec_id",
      vec: String = "embedding", label: String = "label"): DataFrame =
    Compute.spread(emb)
      .select(col(label), posexplode(V.quantize(col(vec))).as(Seq("pos", "v")))
      .groupBy(col(label), col("pos"))
      .agg(sum(col("v")).as("__s"), count(lit(1)).as("n_vecs"))
      .select(col(label), (col("pos") + 1).as("dim"), col("n_vecs"),
        (col("__s").cast("double") / col("n_vecs").cast("double") /
          lit(1000.0)).as("centroid"))

  /** LABEL-ERROR candidates by centroid-distance ratio — confident-
    * learning-lite over the embedding space: each vector's squared
    * distance to its own label centroid, relative to the label's mean
    * squared distance; the top ratios are the members farthest from
    * their class relative to classmates — mislabeled/outlier
    * candidates for relabeling or pruning.
    *
    * Exactness trick: the centroid mean never materializes as a
    * float. With n = label count and s_i = exact per-dim integer sum,
    * n²·‖q − s/n‖² = Σ_i (n·q_i − s_i)² — exact int64 per member.
    * The ratio then divides by the label mean of that same integer
    * (two IEEE divisions), so the score is bit-stable on any engine
    * and any aggregation order.
    *
    * Member-count bound: the per-member sum is n²-scaled, so with
    * quantized |v| ≤ ~1000 and d = 64 the worst case d·(2000n)² stays
    * under 2^63 only for n ≲ 1.9×10^5 members per label (comfortable
    * for per-label diagnostics; far looser in practice since the
    * summand is a deviation, not the full range). The LABEL-level
    * total (`tot`, an extra factor of n) goes through the
    * decimal(38,0) channel — DuckDB's HUGEINT sum matches it exactly
    * — so the reported ratio never silently wraps even when a label
    * approaches that bound.
    *
    * Scale shape: identical to [[clusterCoherence]] — one posexplode,
    * one (label, pos) sum aggregation, broadcast centroid table join,
    * one per-member aggregation, then a TakeOrdered top-k. O(n·d). */
  def labelOutliers(emb: DataFrame, topK: Int = 20, id: String = "vec_id",
      vec: String = "embedding", label: String = "label"): DataFrame = {
    val u = Compute.spread(emb)
      .select(col(id), col(label),
        posexplode(V.quantize(col(vec))).as(Seq("pos", "v")))
    val cent = u.groupBy(col(label), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
    val d = u.join(broadcast(cent), Seq(label, "pos"))
      .groupBy(col(id), col(label))
      .agg(sum((col("n") * col("v") - col("s")) *
        (col("n") * col("v") - col("s"))).as("nsq_d2"))
    val m = d.groupBy(col(label))
      .agg(sum(col("nsq_d2").cast("decimal(38,0)")).as("tot"),
        count(lit(1)).as("cnt"))
    d.join(broadcast(m), Seq(label))
      .select(col(id), col(label), col("nsq_d2"),
        // a degenerate label (all members identical) has tot = 0 and
        // every nsq_d2 = 0: nobody is an outlier, define the ratio 0
        when(col("tot") === 0L, lit(0.0))
          .otherwise(col("nsq_d2").cast("double") /
            (col("tot").cast("double") / col("cnt").cast("double")))
          .as("outlier_ratio"))
      .orderBy(col("outlier_ratio").desc, col(id))
      .limit(topK)
  }

  /** Per-label cluster coherence: member count and the
    * mean/min/max cosine of members to their label centroid.
    *
    * The centroid is the UNSCALED per-position sum of the quantized
    * member vectors — cosine is scale-invariant, so dividing by the
    * count would only introduce a rounding step; using the sum keeps
    * the whole chain in exact integers.
    *
    * Scale shape: one posexplode (rows × dim), one (label, pos)
    * aggregation for centroids, then the centroid table — #labels ×
    * dim rows, broadcastable metadata — joins back for one exact
    * dot/norm aggregation per member. No pairwise work anywhere:
    * coherence is O(n·d), not O(n²). */
  def clusterCoherence(emb: DataFrame, id: String = "vec_id",
      vec: String = "embedding", label: String = "label"): DataFrame =
    memberCentroidCosine(emb, id, vec, label)
      .select(col(label), col("cos_centroid").as("cos"))
      .groupBy(col(label)).agg(
        count(lit(1)).as("n_vecs"),
        (sum(col("cos").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("mean_cos"),
        min(col("cos")).as("min_cos"),
        max(col("cos")).as("max_cos"))

  /** Exact COVARIANCE MATRIX of the embedding columns — the
    * whitening/PCA preparation step (dead-dimension and correlated-
    * dimension detection before quantization or projection; an eigen
    * solver consumes this table). Upper triangle only (dim_i ≤ dim_j),
    * d(d+1)/2 rows.
    *
    * Exactness: cov = (n·Σxy − Σx·Σy) / n² on the quantized integer
    * grid — every sum is exact int64 (cell bound |Σxy| ≤ n·10^6 ⇒
    * safe to ~9×10^12 rows), then ONE IEEE division and the 10^6
    * dequantization. No float summation anywhere, so any engine and
    * any aggregation order reproduce the same bits.
    *
    * Scale shape: one double-posexplode pass emits n·d(d+1)/2 narrow
    * (i, j, x·y) rows that map-side combine into d(d+1)/2 cells — the
    * classic distributed Gram-matrix build; nothing data-sized
    * survives the aggregation. The n²-scaled numerator goes through
    * decimal(38,0) (the [[labelOutliers]] rule) so the op is safe at
    * any n. */
  def covarianceMatrix(emb: DataFrame,
      vec: String = "embedding"): DataFrame = {
    // (i, j ≥ i, x_i, x_j) stream: explode the quantized vector, then
    // re-explode each row's TAIL slice so pairs stay row-aligned
    val pairs = Compute.spread(emb)
      .select(V.quantize(col(vec)).as("__q"))
      .select(posexplode(col("__q")).as(Seq("__i", "__x")), col("__q"))
      .select(col("__i"), col("__x"),
        posexplode(slice(col("__q"), col("__i") + 1,
          greatest(size(col("__q")) - col("__i"), lit(0)))).as(Seq("__dj", "__y")))
      .select((col("__i") + 1).as("dim_i"),
        (col("__i") + 1 + col("__dj")).as("dim_j"),
        col("__x"), col("__y"))
    pairs
      .groupBy(col("dim_i"), col("dim_j"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"))
      .select(col("dim_i").cast("int").as("dim_i"),
        col("dim_j").cast("int").as("dim_j"), col("n"),
        ((col("n").cast("decimal(38,0)") * col("__sxy") -
          col("__sx").cast("decimal(38,0)") * col("__sy"))
          .cast("double") /
          (col("n").cast("double") * col("n").cast("double")) /
          lit(1000000.0)).as("cov"))
      .orderBy(col("dim_i"), col("dim_j"))
  }

  /** Per-member cosine to its label centroid — [[clusterCoherence]]'s
    * inner quantity kept at member grain (the signal SemDeDup-style
    * semantic dedup ranks keepers by). Same exact-integer chain and
    * the same scale shape: O(n·d) + broadcast centroid metadata. */
  def memberCentroidCosine(emb: DataFrame, id: String = "vec_id",
      vec: String = "embedding", label: String = "label"): DataFrame = {
    val q = Compute.spread(emb)
      .select(col(id), col(label), V.quantize(col(vec)).as("q"))
    val u = q.select(col(id), col(label),
      posexplode(col("q")).as(Seq("pos", "v")))
    val cent = u.groupBy(col(label), col("pos")).agg(sum(col("v")).as("s"))
    val centNorm = cent.groupBy(col(label))
      .agg(sum(col("s") * col("s")).as("cnsq"))
    val per = u.join(broadcast(cent), Seq(label, "pos"))
      .groupBy(col(id), col(label))
      .agg(sum(col("v") * col("s")).as("dot"),
        sum(col("v") * col("v")).as("nsq"))
    per.join(broadcast(centNorm), Seq(label))
      .select(col(id), col(label),
        when(col("nsq") === 0 || col("cnsq") === 0, lit(0.0))
          .otherwise(V.cosineFrom(col("dot"), col("nsq"), col("cnsq")))
          .as("cos_centroid"))
  }
}
