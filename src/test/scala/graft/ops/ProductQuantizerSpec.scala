package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("encode: m codes per vector, codes in [0,k), deterministic") {
    val vecs = (0L until 8L).map(i =>
      i -> Seq.tabulate(8)(d => (i * 8 + d).toFloat / 100f))
    val codes = ProductQuantizer.encode(emb(vecs: _*), dim = 8, m = 2,
      k = 2, iters = 1).collect()
    assert(codes.length == 16) // 8 vectors x 2 subspaces
    assert(codes.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 2))
    assert(codes.map(r => (r.getLong(0), r.getInt(1))).distinct.length == 16)
    // deterministic across runs
    val again = ProductQuantizer.encode(emb(vecs: _*), dim = 8, m = 2,
      k = 2, iters = 1).collect()
    assert(codes.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("encode: a vector sitting ON a centroid has zero subspace error") {
    // 4 well-separated clusters in each subspace; iters=0 keeps the
    // init centroids = the 4 smallest-id vectors, so those vectors
    // must encode to themselves with dist_sq == 0 in every subspace
    val vecs = (0L until 6L).map(i =>
      i -> Seq.tabulate(4)(d => (i * 10 + d).toFloat))
    val codes = ProductQuantizer.encode(emb(vecs: _*), dim = 4, m = 2,
      k = 4, iters = 0)
      .filter(col("vec_id") < 4).collect()
    assert(codes.forall(_.getDouble(3) == 0.0),
      s"init vectors must reconstruct exactly: ${codes.mkString(", ")}")
  }

  test("reconstructionError = fixed-order sum of subspace errors") {
    val vecs = (0L until 8L).map(i =>
      i -> Seq.tabulate(8)(d => ((i * 13 + d * 7) % 50).toFloat / 10f))
    val codes = ProductQuantizer.encode(emb(vecs: _*), dim = 8, m = 2,
      k = 2, iters = 1)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(3))
        .foldLeft(0.0)(_ + _)).toMap
    val recon = ProductQuantizer.reconstructionError(emb(vecs: _*), dim = 8,
      m = 2, k = 2, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(recon == codes)
  }

  test("adcSearch: estimate against an on-centroid candidate equals the " +
      "exact quantized distance (reconstruction identity)") {
    // iters=0 keeps codebooks = the 4 smallest-id sub-vectors, so
    // candidates 0..3 reconstruct exactly; the ADC estimate to them
    // must be the TRUE quantized squared distance
    val vecs = (0L until 8L).map(i =>
      i -> Seq.tabulate(8)(d => ((i * 11 + d * 3) % 20).toFloat / 5f))
    val df = emb(vecs: _*)
    val got = ProductQuantizer.adcSearch(df, df.filter(col("vec_id") === 7L),
        dim = 8, m = 2, k = 4, iters = 0, topK = 7)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    def quant(x: Float): Double = BigDecimal(x.toDouble * 1000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
    val q7 = vecs(7)._2.map(quant)
    (0L until 4L).foreach { c =>
      val qc = vecs(c.toInt)._2.map(quant)
      val exact = q7.zip(qc).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(got(c) == exact,
        s"candidate $c: ADC ${got(c)} != exact $exact")
    }
    // no self-match, ranked ascending
    assert(!got.contains(7L))
  }

  test("adcSearch: ranks ascend in dist_est with id tie-break, topK bound") {
    val vecs = (0L until 12L).map(i =>
      i -> Seq.tabulate(8)(d => ((i * 7 + d * 5) % 30).toFloat / 6f))
    val rows = ProductQuantizer.adcSearch(emb(vecs: _*),
        emb(vecs.take(2): _*), dim = 8, m = 2, k = 3, iters = 1, topK = 4)
      .orderBy(col("id_q"), col("rank")).collect()
    assert(rows.length == 8) // 2 queries x topK 4
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ds = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(ds.sameElements(ds.sorted), "dist_est must ascend with rank")
    }
  }

  test("ivfPqEncode: m codes per vector, cells in [0,kc); init vectors' " +
      "residuals reconstruct exactly at iters=0") {
    val vecs = (0L until 8L).map(i =>
      i -> Seq.tabulate(8)(d => ((i * 9 + d * 4) % 25).toFloat / 5f))
    val codes = ProductQuantizer.ivfPqEncode(emb(vecs: _*), dim = 8,
      kc = 3, cIters = 0, m = 2, k = 4, iters = 0).collect()
    assert(codes.length == 16)
    assert(codes.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 3))
    assert(codes.forall(r => r.getLong(3) >= 0 && r.getLong(3) < 4))
    // coarse init = vectors 0..2 themselves, so their residual is the
    // zero vector; PQ init (4 smallest ids) therefore contains the
    // zero codeword and those vectors reconstruct exactly
    assert(codes.filter(_.getLong(0) < 3).forall(_.getDouble(4) == 0.0),
      codes.filter(_.getLong(0) < 3).mkString(", "))
  }

  test("ivfPqSearch: topK rows per query, dist ascends, no self-match") {
    val vecs = (0L until 16L).map(i =>
      i -> Seq.tabulate(8)(d => ((i * 5 + d * 11) % 40).toFloat / 8f))
    val rows = ProductQuantizer.ivfPqSearch(emb(vecs: _*),
        emb(vecs.take(3): _*), dim = 8, kc = 3, cIters = 1, m = 2, k = 3,
        iters = 1, nProbe = 2, topK = 4)
      .orderBy(col("id_q"), col("rank")).collect()
    assert(rows.nonEmpty && rows.length <= 12)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(!rs.exists(_.getLong(2) == q), "self-match leaked")
      val ds = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(ds.sameElements(ds.sorted))
    }
  }

  test("ivfPqSearch: non-numeric ids (with '#') survive the LUT key") {
    // the (id_q, cell) LUT key rides through as a struct — a string
    // concat/split round-trip would null these ids out (round-7 ADVICE)
    val vecs = (0L until 12L).map(i =>
      s"doc#$i" -> Seq.tabulate(8)(d => ((i * 5 + d * 11) % 40).toFloat / 8f))
    val df = vecs.toDF("vec_id", "embedding")
    val rows = ProductQuantizer.ivfPqSearch(df,
        vecs.take(2).toDF("vec_id", "embedding"), dim = 8, kc = 2,
        cIters = 1, m = 2, k = 3, iters = 1, nProbe = 2, topK = 3)
      .collect()
    assert(rows.nonEmpty)
    val qids = rows.map(_.getString(0)).toSet
    assert(qids.subsetOf(Set("doc#0", "doc#1")) && qids.nonEmpty)
    assert(rows.forall(r => r.getString(2).startsWith("doc#")))
    assert(rows.forall(r => r.getString(0) != r.getString(2)))
  }

  test("ivfPqRefine: exact re-rank of the ADC shortlist") {
    val vecs = (0L until 16L).map(i =>
      i -> Seq.tabulate(8)(d => ((i * 5 + d * 11) % 40).toFloat / 8f))
    val df = emb(vecs: _*)
    val qs = emb(vecs.take(3): _*)
    val shortlist = ProductQuantizer.ivfPqSearch(df, qs, dim = 8, kc = 3,
        cIters = 1, m = 2, k = 3, iters = 1, nProbe = 2, topK = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val refined = ProductQuantizer.ivfPqRefine(df, qs, dim = 8, kc = 3,
        cIters = 1, m = 2, k = 3, iters = 1, nProbe = 2, shortlist = 6,
        topK = 3).orderBy(col("id_q"), col("rank")).collect()
    assert(refined.nonEmpty)
    refined.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(!rs.exists(_.getLong(2) == q), "self-match leaked")
      // exact distances ascend with rank; every refined id came from
      // the ADC shortlist (refinement reorders, never re-discovers)
      val ds = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(ds.sameElements(ds.sorted))
      rs.foreach(r => assert(shortlist((q, r.getLong(2)))))
    }
  }

  test("ivfPqIngest: frozen-state encode, replay-stable, cross-batch " +
      "dedup, batch 2 never retrains") {
    val vecs = (0L until 20L).map(i =>
      i -> Seq.tabulate(8)(d => ((i * 5 + d * 11) % 40).toFloat / 8f))
    val b0 = vecs.filter(_._1 % 2 == 0).toDF("vec_id", "embedding")
    val b1 = vecs.filter(_._1 % 2 == 1).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_ingest_").toString + "/index"
    // state trains ONCE, on batch 0 only
    val (coarse, cents) = ProductQuantizer.ivfPqState(b0, dim = 8, kc = 2,
      cIters = 1, m = 2, k = 3, iters = 1)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))
    val r0 = ProductQuantizer.ivfPqIngest(spark, b0, coarse, cents, idx,
      "b0", dim = 8, m = 2).collect().map(key).toSet
    val r1 = ProductQuantizer.ivfPqIngest(spark, b1, coarse, cents, idx,
      "b1", dim = 8, m = 2).collect().map(key).toSet
    assert(r0.map(_._1) == (0L until 20L by 2).toSet)
    assert(r1.map(_._1) == (1L until 20L by 2).toSet)
    // batch 1 NEVER retrains: its codes equal a direct frozen-state
    // encode — the state tables are inputs, not recomputed
    val direct = ProductQuantizer.ivfPqEncodeWith(coarse, cents, b1,
      dim = 8, m = 2).collect().map(key).toSet
    assert(r1 == direct)
    // replay of batch 1 (same batchId, same vectors) is exactly-once:
    // identical admitted rows, no duplicate state
    val replay = ProductQuantizer.ivfPqIngest(spark, b1, coarse, cents,
      idx, "b1", dim = 8, m = 2).collect().map(key).toSet
    assert(replay == r1)
    // a batch re-delivering already-indexed vectors admits nothing new
    val redeliver = ProductQuantizer.ivfPqIngest(spark, b0, coarse, cents,
      idx, "b2", dim = 8, m = 2).collect()
    assert(redeliver.isEmpty)
    // the persistent index table is exactly the union of the batches
    val table = spark.read.option("recursiveFileLookup", "true")
      .parquet(idx).collect()
      .map(r => (key(r), r.getAs[String]("batch_id"))).toMap
    assert(table.keySet == r0 ++ r1)
    assert(table.count(_._2 == "b0") == r0.size)
    assert(table.count(_._2 == "b1") == r1.size)
  }

  test("subspace independence: per-subspace codes equal a standalone " +
      "k-means on the sliced vectors") {
    val vecs = (0L until 10L).map(i =>
      i -> Seq.tabulate(8)(d => ((i * 31 + d * 17) % 40).toFloat / 4f))
    val df = emb(vecs: _*)
    val pq = ProductQuantizer.encode(df, dim = 8, m = 2, k = 3, iters = 1)
      .filter(col("sub") === 1)
      .select(col("vec_id"), col("code")).as[(Long, Long)].collect().toMap
    val standalone = KMeans.assign(
        df.select(col("vec_id"), slice(col("embedding"), 5, 4).as("embedding")),
        k = 3, iters = 1)
      .select(col("vec_id"), col("cluster")).as[(Long, Long)].collect().toMap
    assert(pq == standalone)
  }
}
