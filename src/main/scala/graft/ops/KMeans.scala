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

  /** Assignments after `iters` full Lloyd updates: (id, cluster,
    * dist_sq) with cluster = final nearest centroid id in [0, k). */
  def assign(emb: DataFrame, k: Int, iters: Int, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 0, "need k >= 1 and iters >= 0")
    val q = emb.select(col(id), V.quantize(col(vec)).as("__q"))
      .withColumn("__qd", transform(col("__q"), _.cast("double")))
    // init: the k smallest-id vectors, cid by id rank (k-row window)
    val init = q.orderBy(col(id)).limit(k)
      .withColumn("cid",
        (row_number().over(Window.orderBy(col(id))) - 1).cast("long"))
      .select(col("cid"), col("__qd").as("mean"))
    def assignTo(cents: DataFrame): DataFrame = {
      val cArr = cents.agg(
        sort_array(collect_list(struct(col("cid"), col("mean")))).as("__cs"))
      q.crossJoin(broadcast(cArr))
        .withColumn("__best", array_min(transform(col("__cs"), c =>
          struct(
            aggregate(
              zip_with(col("__qd"), c("mean"), (a, b) => (a - b) * (a - b)),
              lit(0.0), (acc, x) => acc + x).as("dist_sq"),
            c("cid").as("cid")))))
        .select(col(id), col("__q"),
          col("__best.cid").as("cluster"),
          col("__best.dist_sq").as("dist_sq"))
    }
    var cents = init
    for (_ <- 1 to iters) {
      val assigned = assignTo(cents)
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
    assignTo(cents).drop("__q")
  }
}
