package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Principal-direction estimation and top-component removal over the
  * embedding store — the PCA post-processing a training-data pipeline
  * runs before semantic dedup / ANN ("all-but-the-top", Mu &
  * Viswanath 2018: frequency-direction energy dominates raw text
  * embeddings; removing the top principal component measurably
  * improves similarity search).
  *
  * Everything is EXACT integer arithmetic so a SQL engine reproduces
  * each number bit-for-bit:
  *  - vectors ride the shared ×1000 quantization
  *    ([[graft.functions.VectorFunctions.quantize]] — the dk channel
  *    every ANN oracle uses);
  *  - power iteration runs on the UN-materialized Gram matrix
  *    G = XᵀX via the two-pass identity G·v = Xᵀ(X·v): per
  *    iteration one O(n·d) scan computes t = qv·v per vector, a
  *    second O(n·d) aggregation computes w_j = Σ qv_j·t — G (d²
  *    cells) never exists, X never moves;
  *  - after each mat-vec the d-vector rescales to ≤1024 by
  *    TRUNCATING integer division ((w·1024) div max|w| — Spark DIV,
  *    DuckDB `//`, and JVM `/` all truncate toward zero, so all
  *    three agree on negatives), keeping every subsequent product in
  *    exact int64: |t| ≤ d·q_max·1024, |w_j| ≤ n·q_max·|t| — exact
  *    to n ≈ 4·10⁸ vectors at d = 64; beyond that, drop the rescale
  *    target (the one knob) a power of two;
  *  - the d-sized iterate collects to the driver per round — a
  *    BOUNDED d-row collect (the q127 centroid precedent), rebroadcast
  *    as a literal array into codegen'd zip_with/aggregate HOFs.
  *
  * Scale shape: `iters + 1` (or +2 for [[removeTop]]) scans of the
  * cached quantized projection; no join, no window, no d²
  * materialization. At 100 TB this is a handful of map-side-combined
  * aggregations.
  */
object Pca {

  /** t = qv·v — exact int64 dot of the quantized column against the
    * driver-local direction. */
  private def dotLit(q: Column, v: Array[Long]): Column =
    aggregate(zip_with(q, typedLit(v.toSeq), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)

  /** Run `iters` rounds of rescaled power iteration; returns the final
    * integer direction (length d, components in [-1024, 1024]) and the
    * cached quantized frame (column `q`) for follow-up passes. The
    * caller must NOT unpersist `q` — it is CacheTracker-registered. */
  private def iterate(emb: DataFrame, iters: Int,
      vec: String): (Array[Long], DataFrame) = {
    val q = graft.CacheTracker.track(
      Compute.spread(emb).select(V.quantize(col(vec)).as("q")))
    val d = q.select(size(col("q"))).head().getInt(0)
    var v = Array.fill(d)(1L)
    for (_ <- 1 to iters) {
      val w = new Array[Long](d)
      q.select(posexplode(col("q")).as(Seq("pos", "x")),
          dotLit(col("q"), v).as("t"))
        .groupBy(col("pos")).agg(sum(col("x") * col("t")).as("w"))
        .collect() // bounded: exactly d rows
        .foreach(r => w(r.getAs[Int]("pos")) = r.getAs[Long]("w"))
      val s = math.max(1L, w.map(math.abs).max)
      v = w.map(wj => wj * 1024L / s) // JVM trunc div == SQL DIV / `//`
    }
    (v, q)
  }

  /** Leading principal direction of the quantized Gram matrix after
    * `iters` rescaled power-iteration rounds, plus the Rayleigh
    * eigenvalue estimate λ = (Σ t²)/(Σ v²)/10⁶ (descaled to original
    * embedding units; t² rides the DECIMAL(38,0) channel — exact at
    * any corpus size). Output: one row per dimension
    * `(dim, u, lambda)` with u the unit direction (v/√Σv², computed
    * in IEEE doubles from exact ints — engine-stable). */
  def principalDirection(emb: DataFrame, iters: Int = 4,
      vec: String = "embedding"): DataFrame = {
    val (v, q) = iterate(emb, iters, vec)
    val vv = v.map(x => x * x).sum
    val lambdaDf = q.select(dotLit(col("q"), v).as("t"))
      .agg(sum(col("t").cast("decimal(38,0)") * col("t")).as("st2"))
      .select((if (vv == 0L) lit(0.0d)
        else col("st2").cast("double") / lit(vv.toDouble)
          / lit(1000000.0d)).as("lambda"))
    val spark = emb.sparkSession
    import spark.implicits._
    val dirs = v.zipWithIndex.map { case (vj, j) =>
      (j + 1, if (vv == 0L) 0.0 else vj.toDouble / math.sqrt(vv.toDouble))
    }.toSeq.toDF("dim", "u")
    // declared 1-row scalar attach (the q167 pattern)
    dirs.crossJoin(broadcast(lambdaDf)).orderBy(col("dim"))
  }

  /** All-but-the-top removal audit: for every vector, the exact
    * projection onto the iterated direction and what remains after
    * removing it —
    *  - `dot`             exact int64 qv·v (quantized units);
    *  - `removed_share`   cos²(qv, v) = dot²/(Σv²·Σqv²) — the energy
    *                      fraction the removal takes (0 for zero
    *                      vectors / a dead direction);
    *  - `residual_norm_sq` ‖qv − (dot/Σv²)·v‖² in ORIGINAL units,
    *                      computed as the exact integer
    *                      Σ(qv_j·Σv² − dot·v_j)² over the
    *                      DECIMAL(38,0) channel, then one descale
    *                      division — no per-component float
    *                      summation anywhere. */
  def removeTop(emb: DataFrame, iters: Int = 4, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    val (v, q0) = iterate(emb, iters, vec)
    val vv = v.map(x => x * x).sum
    val q = Compute.spread(emb)
      .select(col(id), V.quantize(col(vec)).as("q"))
    val dot = dotLit(col("q"), v)
    val qnorm = aggregate(col("q"), lit(0L), (acc, x) => acc + x * x)
    val residRaw = aggregate(
      zip_with(col("q"), typedLit(v.toSeq),
        (x, vj) => x * lit(vv) - col("dot") * vj),
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)"),
      (acc, a) =>
        (acc + a.cast("decimal(38,0)") * a).cast("decimal(38,0)"))
    q.withColumn("dot", dot)
      .withColumn("qnorm", qnorm)
      .select(
        col(id),
        col("dot"),
        when(lit(vv) === 0L || col("qnorm") === 0L, lit(0.0d))
          .otherwise((col("dot") * col("dot")).cast("double")
            / lit(vv.toDouble) / col("qnorm").cast("double"))
          .as("removed_share"),
        (if (vv == 0L)
          (col("qnorm").cast("double") / lit(1000000.0d))
        else
          (residRaw.cast("double") / lit((vv * vv).toDouble)
            / lit(1000000.0d))).as("residual_norm_sq"))
  }
}
