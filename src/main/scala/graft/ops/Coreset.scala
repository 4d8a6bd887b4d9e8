package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{VectorFunctions => V}

/** Diversity-driven subset selection over the embedding store — the
  * data-pruning / demonstration-selection pass of a training-data
  * pipeline:
  *
  *  - [[kCenterGreedy]]: farthest-point sampling (the k-Center greedy
  *    2-approximation, Gonzalez 1985; used for core-set data selection
  *    per Sener & Viswanath's active-learning formulation, Sener &
  *    Savarese 2018) — pick the point farthest from everything chosen
  *    so far, k times. The radius sequence it emits IS the coverage
  *    curve: after i centers every vector sits within `radius(i+1)`
  *    of a center.
  *  - [[mmrTopK]]: Maximal Marginal Relevance re-ranking (Carbonell &
  *    Goldstein 1998) — greedy top-k that trades query relevance
  *    against redundancy with already-selected results; the classic
  *    diversified-retrieval pass over a dense index.
  *
  * Both are greedy small-k driver loops: per round ONE codegen'd scan
  * of the cached quantized projection (exact int64 distance / dot
  * algebra on the shared ×1000 channel) and ONE bounded 1-row
  * `TakeOrdered` collect — the q127 centroid / q197 power-iteration
  * precedent. No join, no window, no all-pairs anywhere: k rounds cost
  * k scans regardless of corpus size, which is exactly how
  * farthest-point sampling is run at scale.
  *
  * Determinism: distances are exact integers (‖a−b‖² = ‖a‖² − 2a·b +
  * ‖b‖², each term an exact int64 of quantized components); cosines
  * are one IEEE double division of exact ints (zero-norm guard → 0.0,
  * the q196 convention); MMR's λ = 1/2 makes the score 0.5·rel −
  * 0.5·pen a product of exact-power-of-two scalings — bit-identical
  * across engines. All argmax ties break on ascending id.
  */
object Coreset {

  /** Exact squared L2 distance from the quantized column to a
    * driver-local center, via the dot identity (all codegen'd —
    * [[graft.expressions.LongArrayDot]], no interpreted HOF). */
  private def distSqTo(q: Column, c: Array[Long]): Column = {
    val cn = c.map(x => x * x).sum
    V.normSqQ(q) - lit(2L) * V.dotQ(q, typedLit(c.toSeq)) + lit(cn)
  }

  /** The cached quantized projection `(vec_id, q)`. */
  private def quantized(emb: DataFrame, id: String, vec: String) =
    graft.CacheTracker.track(Compute.spread(emb)
      .select(col(id).as("vec_id"), V.quantize(col(vec)).as("q")))

  /** k-Center greedy selection. Seed = the max-norm vector (the
    * farthest point from the origin — deterministic, data-dependent);
    * round i ≥ 2 picks the vector maximizing its min distance to the
    * i−1 chosen centers. Output, one row per pick:
    * `(rk, vec_id, radius_sq, radius)` where `radius_sq` is the exact
    * integer min-distance of pick i to centers 1..i−1 — equivalently
    * the COVERAGE RADIUS² of the first i−1 centers (NULL for the
    * seed) — and `radius` descales it to original embedding units. */
  def kCenterGreedy(emb: DataFrame, k: Int, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    require(k >= 1, s"k=$k")
    val spark = emb.sparkSession
    val q = quantized(emb, id, vec)
    val seed = q.select(col("vec_id"), col("q"),
        V.normSqQ(col("q")).as("n"))
      .orderBy(desc("n"), asc("vec_id")).limit(1).head()
    var picks = Vector[(Int, Long, Option[Long])](
      (1, seed.getAs[Long]("vec_id"), None))
    var center = seed.getSeq[Long](1).toArray
    // mind = min distance to all centers chosen so far; extending it
    // per round keeps every prior center in ONE codegen'd least(...)
    // chain over the cached scan — no recache, no shuffle.
    var cur = q.withColumn("mind", distSqTo(col("q"), center))
    for (i <- 2 to k) {
      val sel = cur.orderBy(desc("mind"), asc("vec_id")).limit(1).head()
      picks :+= ((i, sel.getAs[Long]("vec_id"),
        Some(sel.getAs[Long]("mind"))))
      center = sel.getSeq[Long](1).toArray
      cur = cur.withColumn("mind",
        least(col("mind"), distSqTo(col("q"), center)))
    }
    val schema = StructType(Seq(
      StructField("rk", IntegerType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("radius_sq", LongType, nullable = true)))
    spark.createDataFrame(
        java.util.Arrays.asList(picks.map { case (rk, vid, r) =>
          Row(rk, vid, r.map(Long.box).orNull)
        }: _*), schema)
      .withColumn("radius",
        sqrt(col("radius_sq").cast("double")) / lit(1000.0d))
      .orderBy(col("rk"))
  }

  /** Guarded integer-exact cosine of the quantized column against a
    * driver-local vector (zero-norm on either side → 0.0). */
  private def cosTo(q: Column, n: Column, c: Array[Long]): Column = {
    val cn = c.map(x => x * x).sum
    if (cn == 0L) lit(0.0d)
    else when(n === 0L, lit(0.0d)).otherwise(
      V.dotQ(q, typedLit(c.toSeq)).cast("double")
        / (sqrt(n.cast("double")) * sqrt(lit(cn.toDouble))))
  }

  /** MMR-diversified top-k with λ = 1/2: the query is the MIN-id
    * vector (deterministic, excluded from candidates); round 1 picks
    * max relevance, round i ≥ 2 maximizes
    * 0.5·cos(query, d) − 0.5·max_{s∈S} cos(d, s). Output per pick:
    * `(rk, vec_id, relevance, penalty, mmr_score)` — `penalty` the
    * realized max-similarity term (NULL for the first pick). */
  def mmrTopK(emb: DataFrame, k: Int, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    require(k >= 1, s"k=$k")
    val spark = emb.sparkSession
    val q0 = quantized(emb, id, vec)
    val qRow = q0.orderBy(asc("vec_id")).limit(1).head()
    val qVec = qRow.getSeq[Long](1).toArray
    val cand = q0.where(col("vec_id") =!= qRow.getAs[Long]("vec_id"))
      .withColumn("n", V.normSqQ(col("q")))
      .withColumn("rel", cosTo(col("q"), col("n"), qVec))
    val first = cand.orderBy(desc("rel"), asc("vec_id")).limit(1).head()
    var picks = Vector[(Int, Long, Double, Option[Double])](
      (1, first.getAs[Long]("vec_id"), first.getAs[Double]("rel"), None))
    // pen = max cosine to the chosen set; extended per round as one
    // greatest(...) chain, same shape as kCenterGreedy's least chain.
    var cur = cand.withColumn("pen",
      cosTo(col("q"), col("n"), first.getSeq[Long](1).toArray))
      .where(col("vec_id") =!= first.getAs[Long]("vec_id"))
    for (i <- 2 to k) {
      val sel = cur
        .withColumn("score", lit(0.5d) * col("rel") - lit(0.5d) * col("pen"))
        .orderBy(desc("score"), asc("vec_id")).limit(1).head()
      picks :+= ((i, sel.getAs[Long]("vec_id"), sel.getAs[Double]("rel"),
        Some(sel.getAs[Double]("pen"))))
      cur = cur.withColumn("pen", greatest(col("pen"),
          cosTo(col("q"), col("n"), sel.getSeq[Long](1).toArray)))
        .where(col("vec_id") =!= sel.getAs[Long]("vec_id"))
    }
    val schema = StructType(Seq(
      StructField("rk", IntegerType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("relevance", DoubleType, nullable = false),
      StructField("penalty", DoubleType, nullable = true)))
    spark.createDataFrame(
        java.util.Arrays.asList(picks.map { case (rk, vid, rel, p) =>
          Row(rk, vid, rel, p.map(Double.box).orNull)
        }: _*), schema)
      .withColumn("mmr_score",
        lit(0.5d) * col("relevance")
          - lit(0.5d) * coalesce(col("penalty"), lit(0.0d)))
      .orderBy(col("rk"))
  }
}
