package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of embedding columns — the storage/compute
  * compression step a 100 TB embedding store takes before ANN serving
  * (4× smaller than float32, SIMD-friendly int dot products), plus the
  * per-vector audit stats a curation pipeline reads to decide whether
  * the precision loss is acceptable.
  *
  * Determinism contract (the property that lets DuckDB reproduce the
  * result bit-for-bit, per the ANN family in
  * [[graft.functions.VectorFunctions]]):
  *  - amax and max-abs-error are MAXIMA — order-independent by nature;
  *  - the scale is one IEEE double division amax/127;
  *  - codes use the floor-based half-up idiom floor(x/scale + 0.5)
  *    (never round(): engines legally disagree on repr-ties), clamped
  *    to ±127 AFTER rounding so the amax component itself cannot
  *    overflow to ±128 through float→double slack;
  *  - the quantized norm is an exact int64 fold in array order.
  *
  * Scale shape: a single narrow projection over the scan — codegen'd
  * higher-order functions only, no UDF, no shuffle, no join. Cost is
  * O(n·d) with zero data movement; at 100 TB this runs at scan speed.
  */
object Quantization {

  /** Per-vector int8 codes + audit stats:
    *  - `amax`        absolute-max component (double; the dequant scale
    *                  is amax/127);
    *  - `n_sat`       components landing on the ±127 saturation rail;
    *  - `max_abs_err` worst absolute reconstruction error
    *                  |x − code·scale| (0 for the all-zero vector);
    *  - `qnorm_sq`    exact integer squared norm of the code vector —
    *                  the quantity int8 ANN reuses per comparison. */
  /** (id, __xd, amax, __scale, q8) — the shared quantization core
    * behind [[int8Stats]] and [[adcTopK]]. */
  private def withCodes(emb: DataFrame, id: String, vec: String): DataFrame = {
    val xd = transform(col(vec), x => x.cast("double"))
    emb
      .select(col(id), xd.as("__xd"))
      .withColumn("amax", array_max(transform(col("__xd"), x => abs(x))))
      .withColumn("__scale", col("amax") / lit(127.0d))
      .withColumn("q8",
        when(col("amax") === 0d, transform(col("__xd"), _ => lit(0L)))
          .otherwise(transform(col("__xd"), x =>
            greatest(lit(-127L), least(lit(127L),
              floor(x / col("__scale") + lit(0.5d)).cast("long"))))))
  }

  def int8Stats(emb: DataFrame, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    val df = withCodes(emb, id, vec)
    df.select(
      col(id),
      col("amax"),
      size(filter(col("q8"), q => abs(q) === 127L)).cast("long").as("n_sat"),
      when(col("amax") === 0d, lit(0.0d))
        .otherwise(array_max(zip_with(col("__xd"), col("q8"),
          (x, q) => abs(x - q.cast("double") * col("__scale")))))
        .as("max_abs_err"),
      aggregate(col("q8"), lit(0L), (acc, q) => acc + q * q).as("qnorm_sq"))
  }

  /** ADC top-k over the int8 store — the SERVING counterpart of
    * [[int8Stats]]: both sides live as codes only (the realistic
    * deployment: raw floats are cold storage), similarity is the
    * EXACT int64 code dot product normalized by the exact int code
    * norms — one IEEE division over integers, so DuckDB reproduces
    * every score bit-for-bit. A zero vector (amax = 0) has no
    * direction; its similarity is defined 0 on both sides.
    *
    * Scale shape: query side broadcast (ANN-benchmark protocol — the
    * query set is sampled, never data-sized), one pass over the
    * corpus codes, per-query top-k via rank-filter (WindowGroupLimit
    * pushes the limit into the shuffle). The corpus never moves. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val prep = (d: DataFrame, suffix: String) =>
      withCodes(d, id, vec).select(
        col(id).as(s"id_$suffix"), col("q8").as(s"q8_$suffix"),
        aggregate(col("q8"), lit(0L), (acc, q) => acc + q * q)
          .as(s"qn_$suffix"))
    val scored = prep(corpus, "c")
      .join(broadcast(prep(queries, "q")), col("id_q") =!= col("id_c"))
      .withColumn("__dot",
        aggregate(zip_with(col("q8_q"), col("q8_c"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
      .withColumn("acos",
        when(col("qn_q") === 0L || col("qn_c") === 0L, lit(0.0d))
          .otherwise(col("__dot").cast("double")
            / (sqrt(col("qn_q").cast("double"))
              * sqrt(col("qn_c").cast("double")))))
    val w = Window.partitionBy(col("id_q"))
      .orderBy(col("acos").desc, col("id_c").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id_q"), col("rank"), col("id_c"), col("acos"))
  }

  /** Recall@k of the int8 ADC path against the exact float truth
    * ([[graft.ops.Dedup.annTopK]]'s integer-cosine baseline) — the
    * quality harness that decides whether 4× compression costs any
    * retrieval quality. Same denominator semantics as
    * `Dedup.annRecall`: hits / |true top-k|, zero-neighbor queries
    * absent. */
  def adcRecall(corpus: DataFrame, queries: DataFrame, k: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val exact = Dedup.annTopK(corpus, queries, id, vec, k)
      .select(col("id_q"), col("id_c"))
    val approx = adcTopK(corpus, queries, k, id, vec)
      .select(col("id_q"), col("id_c")).withColumn("__hit", lit(1))
    exact.join(approx, Seq("id_q", "id_c"), "left")
      .groupBy(col("id_q"))
      .agg(count(col("__hit")).as("n_hits"), count(lit(1)).as("n_true"))
      .withColumn("recall",
        col("n_hits").cast("double") / col("n_true").cast("double"))
  }
}
