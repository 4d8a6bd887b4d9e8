package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.EmbeddingStats

/** Property tests for the shard-packing / stratified-sampling /
  * cluster-coherence operators (q86–q88). The DuckDB oracles prove
  * engine equality; these pin the CONTRACTS: budget bounds, quota
  * bounds, determinism under re-partitioning, cosine range. */
class PackSampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  test("packShards: shard totals within budget + one doc; ids contiguous") {
    val budget = 300L
    val packed = CorpusPipeline.packShards(docs, budget,
      bucket = expr("doc_id DIV 64")).cache()
    val perShard = packed.groupBy($"shard")
      .agg(sum($"n_tokens").as("tot"), max($"n_tokens").as("mx"))
      .collect()
    perShard.foreach { r =>
      assert(r.getAs[Long]("tot") <= budget + r.getAs[Long]("mx"),
        s"shard ${r.get(0)} exceeds budget+doc")
    }
    // shards are a non-decreasing function of doc order with no gaps
    val shards = packed.orderBy($"doc_id").select($"shard")
      .as[Long].collect()
    assert(shards.zip(shards.tail).forall { case (a, b) => b >= a },
      "shard ids must be non-decreasing in doc order")
    assert(shards.distinct.sorted.sameElements(shards.min to shards.max),
      "shard ids must be contiguous")
    packed.unpersist()
  }

  test("packShards: assignment independent of bucketing granularity") {
    val a = CorpusPipeline.packShards(docs, 500, expr("doc_id DIV 16"))
    val b = CorpusPipeline.packShards(docs, 500, expr("doc_id DIV 512"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "two-level decomposition must not depend on the bucket width")
  }

  test("stratifiedSample: quota respected, deterministic, seed-sensitive") {
    val s1 = CorpusPipeline.stratifiedSample(docs, quota = 5, seed = 1).cache()
    val counts = s1.groupBy($"lang", $"source").count().collect()
    assert(counts.forall(_.getAs[Long]("count") <= 5))
    // sample size = sum over strata of min(stratum size, quota)
    val expected = docs.groupBy($"lang", $"source").count()
      .select(sum(least($"count", lit(5L)))).as[Long].head()
    assert(counts.map(_.getAs[Long]("count")).sum == expected)
    val s1again = CorpusPipeline.stratifiedSample(docs, quota = 5, seed = 1)
    assert(s1.exceptAll(s1again).isEmpty, "same seed => same sample")
    val s2 = CorpusPipeline.stratifiedSample(docs, quota = 5, seed = 2)
    assert(s2.exceptAll(s1).count() > 0, "different seed => different draw")
    s1.unpersist()
  }

  test("writeShardsByTokenBudget: export lands every doc in its assigned shard") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    CorpusPipeline.writeShardsByTokenBudget(docs, out, 500,
      bucket = expr("doc_id DIV 64"))
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val assign = CorpusPipeline.packShards(docs, 500, expr("doc_id DIV 64"))
    val mismatched = back.select($"doc_id", $"shard".cast("long").as("s"))
      .join(assign.select($"doc_id", $"shard"), "doc_id")
      .filter($"s" =!= $"shard")
    assert(mismatched.isEmpty, "partition dir must equal packed shard id")
  }

  test("mixtureSample: rates honor the spec, unknown strata drop, " +
      "deterministic and seed-sensitive") {
    val m = CorpusPipeline.mixtureSample(docs,
      shares = Seq("en" -> 0.5, "de" -> 0.5), targetTotal = 100,
      seed = 3).cache()
    // only named strata survive
    assert(m.select($"lang").distinct().as[String].collect().toSet
      .subsetOf(Set("en", "de")))
    // realized counts concentrate near rate * n_s (binomial; wide bound)
    val real = m.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("en", "de").foreach { l =>
      val n = expect(l).toDouble
      val rate = math.min(1.0, 0.5 * 100 / n)
      val got = real.getOrElse(l, 0L).toDouble
      assert(math.abs(got - rate * n) <= 4 * math.sqrt(rate * n) + 1,
        s"$l: got $got expected ~${rate * n}")
    }
    val again = CorpusPipeline.mixtureSample(docs,
      Seq("en" -> 0.5, "de" -> 0.5), 100, 3)
    assert(m.exceptAll(again).isEmpty, "same seed => same sample")
    val other = CorpusPipeline.mixtureSample(docs,
      Seq("en" -> 0.5, "de" -> 0.5), 100, 4)
    assert(other.exceptAll(m).count() > 0, "different seed => different draw")
    m.unpersist()
  }

  test("upsampleMixture: copy counts bracket floor/ceil of the rate, " +
      "realized totals track rate * n_s, replicas enumerated") {
    val u = CorpusPipeline.upsampleMixture(docs,
      shares = Seq("en" -> 0.6, "de" -> 0.4), targetTotal = 400,
      seed = 5).cache()
    val expect = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("en" -> 0.6, "de" -> 0.4).foreach { case (l, share) =>
      val n = expect(l).toDouble
      val rate = share * 400 / n
      // every doc's n_copies is floor(rate) or ceil(rate)
      val copies = u.filter($"lang" === l).groupBy($"doc_id")
        .agg(max($"n_copies").as("c"), count(lit(1)).as("rows"))
      val bad = copies.filter($"c" =!= $"rows" ||
        $"c" < math.floor(rate).toLong || $"c" > math.ceil(rate).toLong)
      assert(bad.isEmpty, s"$l: copy counts must bracket rate=$rate")
      // realized stratum size ~ rate * n_s (Bernoulli only on the frac)
      val got = u.filter($"lang" === l).count().toDouble
      assert(math.abs(got - rate * n) <= 4 * math.sqrt(n) + 1,
        s"$l: got $got expected ~${rate * n}")
    }
    // copy ids enumerate 1..n_copies
    assert(u.filter($"copy" < 1 || $"copy" > $"n_copies").isEmpty)
    val again = CorpusPipeline.upsampleMixture(docs,
      Seq("en" -> 0.6, "de" -> 0.4), 400, 5)
    assert(u.exceptAll(again).isEmpty, "same seed => same replica set")
    u.unpersist()
  }

  test("clusterCoherence: cosine bounds, counts, self-consistency") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val c = EmbeddingStats.clusterCoherence(emb).cache()
    val rows = c.collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == emb.count())
    rows.foreach { r =>
      val (mn, mx, mean) = (r.getAs[Double]("min_cos"),
        r.getAs[Double]("max_cos"), r.getAs[Double]("mean_cos"))
      assert(mn >= -1.0001 && mx <= 1.0001 && mn <= mx)
      assert(mean >= mn - 1e-6 && mean <= mx + 1e-6)
    }
    c.unpersist()
  }

  test("semanticDedup: same-label components keep one member; " +
      "identical content in another cluster is untouched") {
    import graft.ops.Dedup
    val dim = 64
    def vec(hot: Int, scale: Float): Seq[Float] =
      Seq.tabulate(dim)(i => if (i == hot) scale else 0.0f)
    val emb = Seq(
      (1L, vec(0, 1.0f), 0), // dup pair {1,2}: same direction, all
      (2L, vec(0, 2.0f), 0), //   bands collide, cosine exactly 1.0
      (3L, vec(1, 1.0f), 0), // same label, orthogonal: own cluster
      (4L, vec(0, 1.0f), 1)  // identical to 1 but OTHER label: kept
    ).toDF("vec_id", "embedding", "label")
    val out = Dedup.semanticDedup(emb, minCos = 0.4)
      .orderBy($"vec_id")
      .select($"vec_id", $"cluster", $"kept")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, true),  // equal centroid cosine: min-id tie-break keeps 1
      (2L, 1L, false),
      (3L, 3L, true),
      (4L, 4L, true))) // cross-label LSH collision filtered out
  }

  test("packSequences: every sequence is exactly `width` tokens except " +
      "the last; totals and ids are conserved") {
    val width = 100L
    val seqs = CorpusPipeline.packSequences(docs, width,
      bucket = expr("doc_id DIV 64")).cache()
    val rows = seqs.orderBy($"seq_id").collect()
    val totalTokens = docs
      .select(sum(size(split($"text", " ")).cast("long"))).as[Long].head()
    // conservation: concatenation loses no tokens
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalTokens)
    // exact width everywhere but the final cut
    rows.init.foreach(r => assert(r.getAs[Long]("n_tokens") == width,
      s"seq ${r.get(0)} is not full"))
    assert(rows.last.getAs[Long]("n_tokens") <= width)
    // contiguous ids from 0
    val ids = rows.map(_.getAs[Long]("seq_id"))
    assert(ids.sameElements(0L until ids.length))
    // doc spans are contiguous across consecutive sequences: a
    // sequence starts at the doc the previous one ended in (crossing)
    // or the next doc — never earlier, never skipping
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b.getAs[Long]("first_doc") >= a.getAs[Long]("last_doc"))
    }
    seqs.unpersist()
  }

  test("packSequences: assignment independent of bucketing granularity") {
    val a = CorpusPipeline.packSequences(docs, 75, expr("doc_id DIV 16"))
    val b = CorpusPipeline.packSequences(docs, 75, expr("doc_id DIV 512"))
    assert(a.orderBy($"seq_id").collect().toSeq ==
      b.orderBy($"seq_id").collect().toSeq)
  }
}
