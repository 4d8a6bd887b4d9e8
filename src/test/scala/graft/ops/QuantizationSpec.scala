package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract tests for int8 scalar quantization (q105). The DuckDB
  * oracle proves engine equality; these pin the numeric properties. */
class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("int8Stats: hand-computed codes on a tiny vector") {
    // amax = 2.54, scale = 0.02 → codes 127, -50, 0
    val df = Seq((1L, Seq(2.54f, -1.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Quantization.int8Stats(df).head()
    assert(math.abs(r.getAs[Double]("amax") - 2.54) < 1e-6) // float widen
    assert(r.getAs[Long]("n_sat") == 1)
    // qnorm = 127² + 50² + 0²
    assert(r.getAs[Long]("qnorm_sq") == 127L * 127 + 50L * 50)
    assert(r.getAs[Double]("max_abs_err") >= 0)
  }

  test("int8Stats: all-zero vector yields zero codes and zero error") {
    val df = Seq((1L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Quantization.int8Stats(df).head()
    assert(r.getAs[Double]("amax") == 0.0)
    assert(r.getAs[Long]("n_sat") == 0)
    assert(r.getAs[Double]("max_abs_err") == 0.0)
    assert(r.getAs[Long]("qnorm_sq") == 0L)
  }

  test("int8Stats over real embeddings: every non-zero vector saturates " +
      "its amax component and error stays within half a quantization step") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val rows = Quantization.int8Stats(emb).collect()
    assert(rows.length == emb.count())
    rows.foreach { r =>
      val amax = r.getAs[Double]("amax")
      if (amax > 0) {
        assert(r.getAs[Long]("n_sat") >= 1,
          s"vec ${r.get(0)}: the amax component must land on the rail")
        // half-up rounding error bound: |x - q·scale| ≤ scale/2 (+fp slack)
        val scale = amax / 127.0
        assert(r.getAs[Double]("max_abs_err") <= scale / 2 + 1e-12,
          s"vec ${r.get(0)} exceeds the rounding bound")
        assert(r.getAs[Long]("qnorm_sq") <= 127L * 127 *
          emb.head().getAs[Seq[Float]]("embedding").length)
      }
    }
  }
}
