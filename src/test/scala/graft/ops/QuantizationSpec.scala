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

  test("signProject: one-hot inputs map to ±1000 components; " +
      "deterministic and seed-sensitive") {
    // one-hot vectors: each output component is exactly ±(1.0 × 1000)
    val oneHot = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val p = RandomProjection.signProject(oneHot, k = 4, seed = 11)
      .orderBy($"vec_id").collect()
    p.foreach { r =>
      (0 until 4).foreach(j =>
        assert(math.abs(r.getAs[Long](s"y$j")) == 1000L,
          s"vec ${r.get(0)} y$j must be ±1000"))
    }
    // linearity on exactly-representable inputs: P(a) + P(b) = P(a+b)
    val ab = Seq((1L, Seq(1.0f, 2.0f, -3.0f)), (2L, Seq(4.0f, -1.0f, 0.5f)),
      (3L, Seq(5.0f, 1.0f, -2.5f))).toDF("vec_id", "embedding")
    val rows = RandomProjection.signProject(ab, k = 4, seed = 11)
      .orderBy($"vec_id").collect()
    (0 until 4).foreach { j =>
      assert(rows(0).getAs[Long](s"y$j") + rows(1).getAs[Long](s"y$j") ==
        rows(2).getAs[Long](s"y$j"), s"projection must be linear in y$j")
    }
    // a different seed draws a different matrix
    val other = RandomProjection.signProject(oneHot, k = 4, seed = 12)
      .orderBy($"vec_id").collect()
    assert(p.map(_.toSeq).toSeq != other.map(_.toSeq).toSeq)
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

  test("adcTopK: exactly-representable vectors rank by true cosine; " +
      "zero vectors score 0 everywhere") {
    import spark.implicits._
    // components in {-1, 0, 1}: amax = 1, scale = 1/127, every code
    // lands exactly on ±127/0 — int8 similarity EQUALS float cosine
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),   // cos with q = 1/√2
      (2L, Seq(1.0f, 1.0f, 0.0f)),   // cos with q = 1
      (3L, Seq(-1.0f, -1.0f, 0.0f)), // cos with q = −1
      (4L, Seq(0.0f, 0.0f, 0.0f)),   // zero vector → similarity 0
      (10L, Seq(1.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Quantization.adcTopK(corpus,
        corpus.filter($"vec_id" === 10L), k = 4)
      .orderBy($"rank").collect()
    assert(out.map(_.getAs[Long]("id_c")).toSeq == Seq(2L, 1L, 4L, 3L))
    assert(out(0).getAs[Double]("acos") == 1.0)
    assert(out(2).getAs[Double]("acos") == 0.0) // the zero vector
    assert(out(3).getAs[Double]("acos") == -1.0)
  }

  test("adcRecall over real embeddings: valid denominators, recall in " +
      "[0,1], and codes lose little at k=5") {
    import spark.implicits._
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val r = Quantization.adcRecall(emb, emb.filter($"vec_id" < 10), k = 5)
      .collect()
    assert(r.length == 10)
    r.foreach { row =>
      assert(row.getAs[Long]("n_true") == 5)
      val rec = row.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // int8 at 64 dims keeps most of the true top-5 (macro recall ≥ 0.8)
    val macroR = r.map(_.getAs[Double]("recall")).sum / r.length
    assert(macroR >= 0.8, s"int8 recall collapsed: $macroR")
  }
}
