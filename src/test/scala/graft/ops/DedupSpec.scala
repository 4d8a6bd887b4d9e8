package graft.ops

import graft.SparkSpec
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val sf001 = sf("sf0.001")

  test("exact dedup finds identical texts regardless of case/whitespace") {
    val df = Seq(
      (1L, "Hello World"), (2L, "hello   world"), (3L, "other doc")
    ).toDF("doc_id", "text")
    val groups = Dedup.exactDupGroups(df, "doc_id", "text")
    assert(groups.count() == 2)
    val dup = groups.filter($"n_docs" === 2).select($"keeper").as[Long].head()
    assert(dup == 1L)
  }

  test("jaccard: identical docs score 1.0, disjoint docs absent") {
    val df = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w v u")
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.01)
      .as[(Long, Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 4L, 1.0)))
  }

  test("containment: embedded quote scores 1.0 while jaccard is low; " +
      "df cap drops boilerplate grams") {
    val quote = "alpha beta gamma delta epsilon"
    val long = s"one two three four five six seven $quote eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val df = Seq((1L, quote), (2L, long), (3L, "unrelated words only here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(df, "doc_id", "text",
      n = 3, minC = 0.9, maxDf = 100).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Double]("containment") == 1.0,
      "every 3-gram of the quote appears in the long doc")
    // the same pair's jaccard is far below the containment threshold
    val j = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.9).count()
    assert(j == 0, "symmetric jaccard must NOT fire on the excerpt pair")
    // a df cap of 1 excludes every shared gram -> no pairs at all
    assert(Dedup.containmentPairs(df, "doc_id", "text", 3, 0.9, maxDf = 1)
      .isEmpty)
  }

  test("LSH candidates cover all high-jaccard pairs on real data (recall)") {
    val docs = graft.Tables(spark, sf001, "documents")
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 16)
    val cand = Dedup.lshCandidatePairs(sig, "doc_id", 16, 4)
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test corpus should contain planted near-dups")
    assert(exact.subsetOf(cand),
      s"LSH missed ${(exact -- cand).take(5)} of ${exact.size} true pairs")
  }

  test("simhash of identical docs is identical; near-dup within distance") {
    val df = Seq(
      (1L, "spark makes big data processing simple and fast for everyone"),
      (2L, "spark makes big data processing simple and fast for everyone"),
      (3L, "completely different content about cats and pianos here now")
    ).toDF("doc_id", "text")
    val sh = Dedup.simhash(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    val pairs = Dedup.simhashNearPairs(Dedup.simhash(df, "doc_id", "text"),
      "doc_id", 0).as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("ann top-k: self excluded, ranks deterministic, cosine within [-1,1]") {
    val emb = graft.Tables(spark, sf001, "embeddings")
    val res = Dedup.annTopK(emb, emb.filter($"vec_id" < 3), "vec_id",
        "embedding", 4)
      .as[(Long, Int, Long, Double)].collect()
    assert(res.length == 12)
    assert(res.forall { case (q, _, c, cos) => q != c && cos >= -1.0 && cos <= 1.0 })
    // ranks strictly ordered by descending cosine within each query
    res.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-(_: Double)).toSeq)
    }
  }

  test("annTopKLshFiltered: every result matches the query's label, " +
      "and equals the label-restricted rerank of the same buckets") {
    val emb = graft.Tables(spark, sf001, "embeddings")
    val got = Dedup.annTopKLshFiltered(emb, emb.filter($"vec_id" < 10),
        "vec_id", "embedding", "label", k = 5, bits = 2)
      .as[(Long, Int, Int, Long, Double)].collect()
    val labels = emb.select($"vec_id", $"label").as[(Long, Int)]
      .collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (q, lbl, _, c, _) =>
      assert(q != c, "self must be excluded")
      assert(labels(q) == lbl && labels(c) == lbl,
        s"candidate $c (label ${labels(c)}) leaked into query $q's " +
          s"label-$lbl result")
    }
    // the filtered result = the unfiltered SAME-bucket candidates
    // post-filtered by label, reranked — in-key pruning loses nothing
    // relative to post-filtering the full bucket (it only avoids the
    // starvation of post-filtering a pre-cut top-k)
    val all = Dedup.annTopKLsh(emb, emb.filter($"vec_id" < 10),
        "vec_id", "embedding", k = Int.MaxValue, bits = 2)
      .as[(Long, Int, Long, Double)].collect()
    val expect = all.filter { case (q, _, c, _) => labels(q) == labels(c) }
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy(r => (-r._4, r._3)).take(5).zipWithIndex
          .map { case ((_, _, c, cos), i) => (q, i + 1, c, cos) }
      }.toSet
    assert(got.map { case (q, _, rk, c, cos) => (q, rk, c, cos) }.toSet
      == expect)
    // deterministic under repartition
    val again = Dedup.annTopKLshFiltered(emb.repartition(7),
        emb.filter($"vec_id" < 10), "vec_id", "embedding", "label",
        k = 5, bits = 2)
      .as[(Long, Int, Int, Long, Double)].collect()
    assert(got.sortBy(r => (r._1, r._3)).sameElements(
      again.sortBy(r => (r._1, r._3))))
  }

  test("langId picks the lexicon with most hits, 'und' when none") {
    val df = Seq(
      (1L, "the cat and the dog is here"),
      (2L, "der hund und die katze ist da"),
      (3L, "zzz qqq www")
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", T.langId($"text")).as[(Long, String)]
      .collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }
}
