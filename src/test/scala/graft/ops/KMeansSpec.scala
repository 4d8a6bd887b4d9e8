package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight, well-separated 64-dim blobs around +1 and -1
  private def blobs = {
    val rows = (0 until 20).map { i =>
      val base = if (i < 10) 1.0f else -1.0f
      val v = Array.tabulate(64)(d => base + 0.01f * ((i * 7 + d) % 5))
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("separable blobs: two iterations recover the true partition") {
    val out = KMeans.assign(blobs, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // init picks vec_id 0 and 1 (both in blob A) — only the UPDATE
    // step can pull a centroid across to blob B, so convergence here
    // proves the Lloyd round actually moves centroids
    val a = (0L until 10L).map(out)
    val b = (10L until 20L).map(out)
    assert(a.distinct.size == 1, s"blob A split: $a")
    assert(b.distinct.size == 1, s"blob B split: $b")
    assert(a.head != b.head, "blobs must land in different clusters")
  }

  test("ivfSearch: trained cells route queries to their own blob; " +
      "deterministic under repartition") {
    val d = blobs
    val q = d.filter($"vec_id".isin(0L, 15L))
    val out = KMeans.ivfSearch(d, q, k = 2, iters = 2, nProbe = 1,
      topK = 3).collect()
    // with 1 probed cell over converged 2-blob centroids, neighbors of
    // a blob-A query are all blob-A members (and vice versa)
    out.foreach { r =>
      val (idQ, idC) = (r.getLong(0), r.getLong(2))
      assert((idQ < 10) == (idC < 10),
        s"query $idQ got cross-blob neighbor $idC")
    }
    assert(out.count(_.getLong(0) == 0L) == 3 &&
      out.count(_.getLong(0) == 15L) == 3)
    val r2 = KMeans.ivfSearch(d.repartition(5), q, k = 2, iters = 2,
      nProbe = 1, topK = 3).orderBy("id_q", "rank").collect()
    val r1 = out.sortBy(r => (r.getLong(0), r.getInt(1)))
    assert(r1.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sameElements(r2.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))))
  }

  test("clusterBalancedSample: per-cluster rates correct, draw " +
      "deterministic, rate-1 clusters pass whole") {
    val d = blobs // 10 vectors per blob
    // perCluster = 4: both clusters sample at rate 0.4
    val out = KMeans.clusterBalancedSample(d, k = 2, iters = 2,
      perCluster = 4L, seed = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.forall(_._3 == 0.4))
    // the draw equals the explicit hash-threshold recompute on the
    // SAME assignment — deterministic and replayable
    val again = KMeans.clusterBalancedSample(d, k = 2, iters = 2,
      perCluster = 4L, seed = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // a different seed moves the accepted set
    val moved = KMeans.clusterBalancedSample(d, k = 2, iters = 2,
      perCluster = 4L, seed = 4).collect().map(_.getLong(0)).toSet
    assert(moved != out.map(_._1).toSet || moved.isEmpty == out.isEmpty)
    // perCluster >= cluster size: everything passes at rate 1
    val all = KMeans.clusterBalancedSample(d, k = 2, iters = 2,
      perCluster = 10L, seed = 3).collect()
    assert(all.length == 20 && all.forall(_.getDouble(2) == 1.0))
  }

  test("silhouette: separable blobs score near 1; counts partition " +
      "the input; brute recompute matches") {
    val out = KMeans.silhouette(blobs, k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._2).sum == 20, "every vector scored exactly once")
    out.foreach { case (c, _, s) =>
      assert(s > 0.8 && s <= 1.0,
        s"well-separated blobs must score near 1, cluster $c got $s")
    }
    // brute recompute off the trained centroids: a = own dist,
    // b = other dist, s = (b-a)/max — through the same decimal channel
    val cents = KMeans.centroids(blobs, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    val qd = blobs.select($"vec_id",
        graft.functions.VectorFunctions.quantize($"embedding").as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val exp = qd.map { case (_, q) =>
      val ds = cents.toSeq.sortBy(_._1).map { case (cid, m) =>
        (q.zip(m).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }
      val (aSq, own) = ds.min
      val bSq = ds.filter(_._2 != own).map(_._1).min
      val (a, b) = (math.sqrt(aSq), math.sqrt(bSq))
      val s = if (math.max(a, b) == 0.0) BigDecimal(0)
        else BigDecimal(
          new java.math.BigDecimal((b - a) / math.max(a, b))
            .setScale(6, java.math.RoundingMode.HALF_UP))
      (own, s)
    }.groupBy(_._1).map { case (c, xs) =>
      c -> (xs.length.toLong,
        (xs.map(_._2).sum.toDouble / xs.length))
    }
    out.foreach { case (c, n, s) =>
      val (en, es) = exp(c)
      assert(n == en && math.abs(s - es) < 1e-12,
        s"cluster $c: got ($n, $s) expected ($en, $es)")
    }
  }

  test("silhouette: partitioning-invariant; k >= 2 enforced") {
    val r1 = KMeans.silhouette(blobs, k = 3, iters = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val r2 = KMeans.silhouette(blobs.repartition(7), k = 3, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r1.sameElements(r2), "silhouette must not depend on partitioning")
    r1.foreach { case (_, _, s) => assert(s >= -1.0 && s <= 1.0) }
    intercept[IllegalArgumentException] {
      KMeans.silhouette(blobs, k = 1, iters = 1)
    }
  }

  test("assignments independent of partitioning; iters=0 is nearest-init") {
    val d = blobs
    val r1 = KMeans.assign(d, k = 3, iters = 1).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val r2 = KMeans.assign(d.repartition(7), k = 3, iters = 1)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r1.sameElements(r2), "k-means must not depend on partitioning")
    val init = KMeans.assign(d, k = 2, iters = 0).orderBy("vec_id").collect()
    // with zero updates, vec 0 and 1 ARE the centroids: self-distance 0
    assert(init(0).getLong(1) == 0L && init(0).getDouble(2) == 0.0)
    assert(init(1).getLong(1) == 1L && init(1).getDouble(2) == 0.0)
  }
}
