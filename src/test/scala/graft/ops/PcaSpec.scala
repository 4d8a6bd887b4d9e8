package graft.ops

import graft.SparkSpec

/** Contract tests for power-iteration PCA + all-but-the-top removal
  * (q197/q198). The DuckDB oracle proves engine equality on the real
  * corpus; these pin the linear algebra on constructed data.
  *
  * The rank-1 family lies along (1, 1), which the ≤1024 integer
  * rescale represents EXACTLY ((1024, 1024) — no truncation error),
  * so direction, eigenvalue, shares, and residuals all have closed
  * forms the assertions can demand to double precision. A direction
  * like (3, 1) truncates to (1024, 341) ≈ 0.1% off — inherent to the
  * integer rescale and covered by the loose-direction test. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def rank1 = Seq(
    (1L, Seq(1.0f, 1.0f)),
    (2L, Seq(2.0f, 2.0f)),
    (3L, Seq(-1.0f, -1.0f))).toDF("vec_id", "embedding")

  test("principalDirection: rank-1 data along (1,1) recovers the " +
      "exact unit direction and eigenvalue") {
    val rows = Pca.principalDirection(rank1, iters = 3).collect()
    assert(rows.length == 2)
    val u = rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("u"))
    assert(u(0) == u(1))
    assert(math.abs(u(0) - 1.0 / math.sqrt(2.0)) < 1e-15)
    // rank-1 Gram: λ = Σ‖x‖² = 2 + 8 + 2 = 12, exactly
    assert(math.abs(rows.head.getAs[Double]("lambda") - 12.0) < 1e-9)
    // deterministic: a second run reproduces bit-identical rows
    val again = Pca.principalDirection(rank1, iters = 3).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("principalDirection: a skewed direction is recovered to the " +
      "documented 1/1024 truncation bound") {
    val df = Seq(
      (1L, Seq(3.0f, 1.0f)),
      (2L, Seq(6.0f, 2.0f)),
      (3L, Seq(-3.0f, -1.0f))).toDF("vec_id", "embedding")
    val rows = Pca.principalDirection(df, iters = 3).collect()
    val u = rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("u"))
    assert(math.abs(u(0) / u(1) - 3.0) < 0.01) // 1024/341 = 3.0029…
    assert(math.abs(rows.head.getAs[Double]("lambda") - 60.0) < 0.05)
  }

  test("removeTop: on-direction vectors lose everything; orthogonal " +
      "vectors keep their whole norm — all exact") {
    val df = Seq(
      (1L, Seq(1.0f, 1.0f)),   // on the direction
      (2L, Seq(2.0f, 2.0f)),   // on the direction
      (3L, Seq(10.0f, 10.0f)), // dominates the Gram → sets the direction
      (4L, Seq(-1.0f, 1.0f)),  // orthogonal to (1, 1)
      (5L, Seq(0.0f, 0.0f))    // zero vector: share 0, residual 0
    ).toDF("vec_id", "embedding")
    val out = Pca.removeTop(df, iters = 3).collect()
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    for (id <- Seq(1L, 2L, 3L)) {
      assert(byId(id).getAs[Double]("removed_share") == 1.0,
        s"vec $id should project fully onto the top direction")
      assert(byId(id).getAs[Double]("residual_norm_sq") == 0.0,
        s"vec $id residual should vanish")
    }
    // orthogonal: exact zero projection, residual = ‖x‖² = 2
    assert(byId(4L).getAs[Long]("dot") == 0L)
    assert(byId(4L).getAs[Double]("removed_share") == 0.0)
    assert(math.abs(byId(4L).getAs[Double]("residual_norm_sq") - 2.0) < 1e-12)
    assert(byId(5L).getAs[Double]("removed_share") == 0.0)
    assert(byId(5L).getAs[Double]("residual_norm_sq") == 0.0)
  }

  test("removeTop over real embeddings: shares in [0,1], residual " +
      "bounded by the vector's own energy") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val rows = Pca.removeTop(emb, iters = 4).collect()
    assert(rows.length == emb.count())
    rows.foreach { r =>
      val share = r.getAs[Double]("removed_share")
      assert(share >= 0.0 && share <= 1.0 + 1e-12, s"share=$share")
      assert(r.getAs[Double]("residual_norm_sq") >= 0.0)
    }
    // the direction is informative on real data: it removes a
    // non-trivial share from at least some vectors
    assert(rows.map(_.getAs[Double]("removed_share")).max > 0.01)
  }
}
