package graft.ops

import graft.SparkSpec

/** Contract tests for greedy diversity selection (q199/q200). The
  * DuckDB oracle proves engine equality on the real corpus; these pin
  * the greedy semantics on constructed geometry with closed forms.
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  test("kCenterGreedy: seed is the max-norm point (id tie-break), " +
      "then farthest-point order with exact integer radii") {
    // 1=(10,0) and 2=(-10,0) tie on norm -> seed id 1; then the
    // farthest-first order is 2 (d²=4e8), 4 (d²=1.01e8), 3 (d²=1e6).
    val df = Seq(
      (1L, Seq(10.0f, 0.0f)),
      (2L, Seq(-10.0f, 0.0f)),
      (3L, Seq(9.0f, 0.0f)),
      (4L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val rows = Coreset.kCenterGreedy(df, k = 4).collect()
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L, 4L, 3L))
    assert(rows.head.isNullAt(rows.head.fieldIndex("radius_sq")))
    val radii = rows.drop(1).map(_.getAs[Long]("radius_sq")).toSeq
    assert(radii == Seq(400000000L, 101000000L, 1000000L))
    // descaled radius: sqrt in original units (20, √101, 1)
    assert(math.abs(rows(1).getAs[Double]("radius") - 20.0) < 1e-12)
    assert(math.abs(rows(3).getAs[Double]("radius") - 1.0) < 1e-12)
    // coverage curve is non-increasing by construction
    assert(radii == radii.sorted(Ordering[Long].reverse))
  }

  test("kCenterGreedy is deterministic and k=1 returns only the seed") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val a = Coreset.kCenterGreedy(emb, k = 5).collect()
    val b = Coreset.kCenterGreedy(emb, k = 5).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    val one = Coreset.kCenterGreedy(emb, k = 1).collect()
    assert(one.length == 1 && one.head.getAs[Long]("vec_id")
      == a.head.getAs[Long]("vec_id"))
  }

  test("mmrTopK: relevance-first pick, then redundancy-penalized " +
      "order on constructed geometry") {
    // query = min-id vector (1,0); candidates: 2 nearly parallel to
    // the query, 3 at 37°, 4 orthogonal, 5 at 53°. Greedy: 2 (max
    // rel), then 3 (least redundant of the relevant), then 5, then 4
    // (orthogonal to the query but by then also most redundant-free
    // slot is gone — its −0.3 score loses to 5's −0.18).
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.01f)),
      (3L, Seq(0.8f, 0.6f)),
      (4L, Seq(0.0f, 1.0f)),
      (5L, Seq(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val rows = Coreset.mmrTopK(df, k = 4).collect()
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == Seq(2L, 3L, 5L, 4L))
    assert(rows.head.isNullAt(rows.head.fieldIndex("penalty")))
    assert(math.abs(rows.head.getAs[Double]("mmr_score")
      - 0.5 * rows.head.getAs[Double]("relevance")) == 0.0)
    // penalty is the max cosine to the already-chosen set: for pick 3
    // that is cos(3, 2) ≈ 0.8059 — strictly above its raw cos to the
    // query (0.8) because 2 leans slightly toward 3's halfplane
    assert(rows(1).getAs[Double]("penalty") > 0.8)
    assert(rows(1).getAs[Double]("penalty") < 0.81)
  }

  test("mmrTopK over real embeddings matches a local greedy mirror") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val k = 6
    val got = Coreset.mmrTopK(emb, k).collect()
      .map(r => (r.getAs[Int]("rk"), r.getAs[Long]("vec_id")))
    // local mirror over the same quantized ints (test-only collect)
    val vecs = emb.collect().map { r =>
      val q = r.getSeq[Float](r.fieldIndex("embedding"))
        .map(x => math.round(x.toDouble * 1000)).toArray
      r.getAs[Long]("vec_id") -> q
    }.sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val na = dot(a, a); val nb = dot(b, b)
      if (na == 0L || nb == 0L) 0.0
      else dot(a, b).toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val (qid, qv) = vecs.head
    var cand = vecs.tail.map { case (id, v) => (id, v, cos(v, qv)) }
    var chosen = Vector.empty[Long]
    var pens = Map.empty[Long, Double]
    for (i <- 1 to k) {
      val best =
        if (i == 1) cand.minBy { case (id, _, rel) => (-rel, id) }
        else cand.minBy { case (id, _, rel) =>
          (-(0.5 * rel - 0.5 * pens(id)), id) }
      chosen :+= best._1
      cand = cand.filterNot(_._1 == best._1)
      pens = cand.map { case (id, v, _) =>
        id -> math.max(pens.getOrElse(id, cos(v, best._2)),
          cos(v, best._2))
      }.toMap
    }
    assert(got.map(_._2).toSeq == chosen)
    assert(!chosen.contains(qid), "the query vector is not a candidate")
  }
}
