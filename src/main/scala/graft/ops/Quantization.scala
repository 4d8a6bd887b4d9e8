package graft.ops

import org.apache.spark.sql.DataFrame
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
  def int8Stats(emb: DataFrame, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    val xd = transform(col(vec), x => x.cast("double"))
    val df = emb
      .select(col(id), xd.as("__xd"))
      .withColumn("amax", array_max(transform(col("__xd"), x => abs(x))))
      .withColumn("__scale", col("amax") / lit(127.0d))
      .withColumn("q8",
        when(col("amax") === 0d, transform(col("__xd"), _ => lit(0L)))
          .otherwise(transform(col("__xd"), x =>
            greatest(lit(-127L), least(lit(127L),
              floor(x / col("__scale") + lit(0.5d)).cast("long"))))))
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
}
