package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Distributed Lloyd k-means over the quantized embedding store — the
  * TRAINING side of the IVF ANN path (q79 probes centroids; this op
  * produces them), fully deterministic so the assignments themselves
  * are oracle-checkable:
  *
  *  - vectors are the exact integer quantizations every similarity op
  *    here shares, so per-cluster per-dimension SUMS are exact int64
  *    (order-free — no float summation anywhere in the update step);
  *  - a centroid mean is one IEEE division per dimension of those
  *    exact operands (identical bits on any engine);
  *  - assignment distance folds (q − m)² in FIXED index order per row
  *    (a per-row lambda fold, not a data-order aggregation), and ties
  *    break on the centroid id;
  *  - init = the k smallest-id vectors (the q79 convention), so no
  *    RNG state exists anywhere.
  *
  * Scale shape: each iteration is (a) one narrow assignment pass — the
  * k-row centroid table rides along as a collected 1-row broadcast
  * array, and the argmin is a per-row `array_min` over k structs (no
  * k×n join materializes); (b) one per-dim integer sum aggregation
  * whose shuffle carries k·d rows (map-side combined). The centroid
  * state between iterations is k rows — driver-bounded by contract,
  * like the IVF centroid table. Empty clusters keep their previous
  * mean (deterministic, mirrors the common production rule).
  */
object KMeans {

  private[ops] def prep(emb: DataFrame, id: String, vec: String): DataFrame =
    emb.select(col(id), V.quantize(col(vec)).as("__q"))
      .withColumn("__qd", transform(col("__q"), _.cast("double")))

  /** Per-row squared distance of the quantized-double vector `qd` to
    * a centroid mean — fixed index-order fold, the determinism pin.
    * `private[ops]`: [[ProductQuantizer]] reuses the exact same fold
    * so ADC lookup entries carry identical bits to assignment
    * distances. */
  private[ops] def distSq(qd: org.apache.spark.sql.Column,
      mean: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(qd, mean, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  /** Nearest trained centroid per row of (already-prepped) `q`. */
  private def assignPrepped(q: DataFrame, cents: DataFrame,
      id: String): DataFrame = {
    val cArr = cents.agg(
      sort_array(collect_list(struct(col("cid"), col("mean")))).as("__cs"))
    q.crossJoin(broadcast(cArr))
      .withColumn("__best", array_min(transform(col("__cs"), c =>
        struct(distSq(col("__qd"), c("mean")).as("dist_sq"),
          c("cid").as("cid")))))
      .select(col(id), col("__q"),
        col("__best.cid").as("cluster"),
        col("__best.dist_sq").as("dist_sq"))
  }

  /** Trained centroid table (cid, mean) after `iters` Lloyd updates
    * from the smallest-id init — k rows, bounded by contract. */
  def centroids(emb: DataFrame, k: Int, iters: Int, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 0, "need k >= 1 and iters >= 0")
    val q = prep(emb, id, vec)
    val init = q.orderBy(col(id)).limit(k)
      .withColumn("cid",
        (row_number().over(Window.orderBy(col(id))) - 1).cast("long"))
      .select(col("cid"), col("__qd").as("mean"))
    var cents = init
    for (_ <- 1 to iters) {
      val assigned = assignPrepped(q, cents, id)
      // exact integer per-dim sums; shuffle carries k·d rows
      val sums = assigned
        .select(col("cluster"), posexplode(col("__q")).as(Seq("__dim", "__v")))
        .groupBy(col("cluster"), col("__dim"))
        .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
      val upd = sums.groupBy(col("cluster"))
        .agg(sort_array(collect_list(struct(col("__dim"), col("__s"))))
          .as("__ss"), max(col("__n")).as("__n"))
        .select(col("cluster").as("cid"),
          transform(col("__ss"),
            p => p("__s").cast("double") / col("__n").cast("double"))
            .as("mean"))
      cents = cents.select(col("cid"), col("mean").as("__prev"))
        .join(upd, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("mean"), col("__prev")).as("mean"))
    }
    cents
  }

  /** Assignments after `iters` full Lloyd updates: (id, cluster,
    * dist_sq) with cluster = final nearest centroid id in [0, k). */
  def assign(emb: DataFrame, k: Int, iters: Int, id: String = "vec_id",
      vec: String = "embedding"): DataFrame =
    assignPrepped(prep(emb, id, vec), centroids(emb, k, iters, id, vec), id)
      .drop("__q")

  /** Assignments against an ALREADY-TRAINED centroid table (cid,
    * mean) — the encode-with-frozen-codebook path ([[ProductQuantizer]]
    * trains once, encodes corpus and queries against the same
    * codebook). Same broadcast argmin as [[assign]]. */
  def assignWith(emb: DataFrame, cents: DataFrame, id: String = "vec_id",
      vec: String = "embedding"): DataFrame =
    assignPrepped(prep(emb, id, vec), cents, id).drop("__q")

  /** Simplified (centroid-based) silhouette — the clustering-quality
    * gate of the curation loop: a(i) = distance of vector i to its OWN
    * trained centroid, b(i) = min distance to any OTHER centroid,
    * s(i) = (b−a)/max(a,b) (0 when both distances are 0), reported as
    * per-cluster member count + mean. The medoid-free variant
    * (Hruschka et al. 2004) — the full silhouette's all-pairs a/b
    * terms would be O(n²); against k centroids the whole metric is
    * ONE broadcast argmin-shaped pass, so it survives corpus scale
    * exactly like assignment does.
    *
    * Determinism: distances are the fixed-order folds every k-means
    * op here shares, sqrt and the (b−a)/max ratio are single IEEE ops
    * per row, each s(i) passes the repo-wide DECIMAL(18,6) channel so
    * the per-cluster sum is order-free, and the mean is one division
    * of exact operands. */
  def silhouette(emb: DataFrame, k: Int, iters: Int, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2, got $k")
    val q = prep(emb, id, vec)
    val cents = centroids(emb, k, iters, id, vec)
    val cArr = cents.agg(
      sort_array(collect_list(struct(col("cid"), col("mean")))).as("__cs"))
    val s = q.crossJoin(broadcast(cArr)) // declared 1-row centroid attach
      .withColumn("__ds", transform(col("__cs"), c =>
        struct(distSq(col("__qd"), c("mean")).as("dist_sq"),
          c("cid").as("cid"))))
      .withColumn("__own", array_min(col("__ds")))
      .withColumn("__b", array_min(
        filter(col("__ds"), d => d("cid") =!= col("__own").getField("cid"))))
      .select(col("__own").getField("cid").as("cluster"), {
        val a = sqrt(col("__own").getField("dist_sq"))
        val b = sqrt(col("__b").getField("dist_sq"))
        val m = greatest(a, b)
        when(m === lit(0.0), lit(0.0)).otherwise((b - a) / m)
          .cast("decimal(18,6)").as("__s")
      })
    s.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("__ss"))
      .select(col("cluster"), col("n"),
        (col("__ss").cast("double") / col("n").cast("double"))
          .as("avg_sil"))
      .orderBy(col("cluster"))
  }

  /** Cluster-BALANCED sampling — the semantic-diversity recipe step:
    * train k clusters ([[assign]]), then draw so no semantic cluster
    * contributes more than `perCluster` vectors in expectation —
    * acceptance rate min(1, perCluster / |cluster|), decided by the
    * seeded 60-bit hash on the id (the mixtureSample draw idiom:
    * deterministic, replayable, identical in the oracle). Dominant
    * topics stop drowning the mixture; rare ones pass whole — the
    * embedding-space analog of per-source quota fill (q130) and
    * temperature flattening (q117), keyed by LEARNED structure instead
    * of a metadata column.
    *
    * Scale shape: training as [[centroids]]; the rate table is k rows
    * (broadcast); the draw is one codegen'd hash compare per row — no
    * shuffle beyond the assignment argmin's broadcast attach. */
  def clusterBalancedSample(emb: DataFrame, k: Int, iters: Int,
      perCluster: Long, seed: Int, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val assigned = assign(emb, k, iters, id, vec)
    val rates = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("__n"))
      .select(col("cluster"),
        least(lit(1.0),
          lit(perCluster.toDouble) / col("__n").cast("double"))
          .as("accept_rate"))
      .withColumn("__thresh",
        floor(col("accept_rate") * lit(1152921504606846976.0)) // 2^60
          .cast("long"))
    assigned.join(broadcast(rates), Seq("cluster"))
      .filter(T.hash60(col(id).cast("string"), seed) < col("__thresh"))
      .select(col(id), col("cluster"), col("accept_rate"))
  }

  /** IVF ANN over TRAINED centroids — q79's probe pattern with this
    * op's Lloyd-trained coarse quantizer instead of fixed seed
    * vectors, end-to-end in-plan (the centroid table is never
    * collected): corpus vectors index into their nearest trained
    * cell, each query probes its `nProbe` nearest cells, and only
    * same-cell candidates are scored exactly (quantized cosine, the
    * shared similarity channel). Approximate by design — a true
    * neighbor in an unprobed cell is missed — and exactly reproducible.
    *
    * Scale shape: training as [[centroids]]; the probe explode is
    * nProbe rows per query; the candidate join is an equi-join on the
    * cell id (shuffle carries corpus once, keyed by cell); per-query
    * top-k is a window over the candidate set, partitioned by query. */
  def ivfSearch(emb: DataFrame, queries: DataFrame, k: Int, iters: Int,
      nProbe: Int, topK: Int, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    require(nProbe >= 1 && topK >= 1, "need nProbe >= 1 and topK >= 1")
    // the trained table is consumed twice (probe-side centroid array +
    // corpus assignment) and deliberately NOT checkpointed: one fused
    // lazy DAG lets Spark overlap both subtrees, and an eager pin was
    // MEASURED worse (q162 0.39→1.02 s at sf0.1, ledger
    // 20260814_115955 — the blocking barrier costs more than the
    // k-row recompute). A 100 TB caller reusing a trained quantizer
    // across queries should train once via [[centroids]], persist the
    // k rows itself, and probe with [[assignWith]].
    val cents = centroids(emb, k, iters, id, vec)
    val cArr = cents.agg(
      sort_array(collect_list(struct(col("cid"), col("mean")))).as("__cs"))
    val corpus = assignPrepped(prep(emb, id, vec), cents, id)
      .withColumn("__n", V.normSqQ(col("__q")))
      .select(col(id).as("id_c"), col("cluster"),
        col("__q").as("q_c"), col("__n").as("n_c"))
    val probes = prep(queries, id, vec).crossJoin(broadcast(cArr))
      .select(col(id).as("id_q"), col("__q").as("q_q"),
        V.normSqQ(col("__q")).as("n_q"),
        explode(slice(array_sort(transform(col("__cs"), c =>
          struct(distSq(col("__qd"), c("mean")).as("dist_sq"),
            c("cid").as("cid")))), 1, nProbe)).as("__p"))
      .select(col("id_q"), col("q_q"), col("n_q"),
        col("__p.cid").as("cluster"))
    val w = Window.partitionBy(col("id_q"))
      .orderBy(col("cosine").desc, col("id_c").asc)
    probes.join(corpus, Seq("cluster"))
      .filter(col("id_q") =!= col("id_c"))
      .withColumn("cosine", V.cosineFrom(
        V.dotQ(col("q_q"), col("q_c")), col("n_q"), col("n_c")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("id_q"), col("rank"), col("id_c"), col("cosine"))
  }
}
