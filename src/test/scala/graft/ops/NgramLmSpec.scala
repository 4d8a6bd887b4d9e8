package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("bigramScore: hand-checked add-one model on a 3-doc corpus") {
    // corpus: "a b a b", "a b", "c"
    //   bigrams: "a b" x3 ("a b a b" has a b, b a, a b), "b a" x1
    //   unigrams: a x3? -> a:3 (doc1 a,a + doc2 a), b:3, c:1; V = 3
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val got = NgramLm.bigramScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def lp(cBi: Long, cUni: Long, v: Long): Double =
      BigDecimal(math.log((cBi + 1.0) / (cUni + v.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val v = 3L
    // doc1: (a b):3, (b a):1, (a b):3 over prefixes a:3, b:3, a:3
    val d1 = Seq(lp(3, 3, v), lp(1, 3, v), lp(3, 3, v))
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - d1.sum / 3) < 1e-12)
    // doc2: one transition (a b):3 / a:3
    assert(got(2L) == ((1L, lp(3, 3, v))))
    // doc3: single token -> no transitions, score 0
    assert(got(3L) == ((0L, 0.0)))
  }

  test("bigramScore: repeated phrasing scores higher than novel phrasing") {
    // template docs share all transitions; the odd doc's transitions
    // are unique -> lower (more negative) average log-probability
    val tmpl = (1L to 8L).map(i => (i, "the quick brown fox jumps"))
    val novel = Seq((99L, "zebra quartz vivid jolt wax"))
    val docs = (tmpl ++ novel).toDF("doc_id", "text")
    val got = NgramLm.bigramScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) > got(99L),
      s"template ${got(1L)} must outscore novel ${got(99L)}")
    assert(got.values.forall(_ < 0.0), "log-probs are negative")
  }

  test("crossScore: unseen transitions back off to the add-one floor") {
    // model trained on "a b"; scoring "x y" hits prefix-unseen floor
    // ln(1 / (0 + V)) with V = 2 (a, b)
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val score = Seq((9L, "x y")).toDF("doc_id", "text")
    val got = NgramLm.crossScore(train, score).collect().head
    val floor = BigDecimal(math.log(1.0 / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(1) == 1L && got.getDouble(2) == floor)
  }

  test("importanceWeights: target-domain docs rank above off-domain") {
    // target = docs repeating one phrase; corpus also carries an
    // off-domain phrase family — target-like docs must get higher
    // importance than off-domain ones
    val target = (1L to 4L).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val corpus = ((1L to 4L).map(i => (i, "alpha beta gamma delta")) ++
      (11L to 14L).map(i => (i, "omega psi chi phi")))
      .toDF("doc_id", "text")
    val got = NgramLm.importanceWeights(target, corpus).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got(1L) > got(11L),
      s"on-target ${got(1L)} must exceed off-target ${got(11L)}")
    // importance = target_logp - corpus_logp exactly
    val row = NgramLm.importanceWeights(target, corpus).collect().head
    assert(row.getDouble(4) == row.getDouble(2) - row.getDouble(3))
  }

  test("crossScore(train = score) is exactly bigramScore (self-score " +
      "identity) on real documents") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val a = NgramLm.bigramScore(docs).collect().map(_.toSeq)
    val b = NgramLm.crossScore(docs, docs).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("kneserNeyScore: hand-checked D=3/4 interpolated KN on the " +
      "3-doc corpus") {
    // corpus "a b a b" / "a b" / "c": bigram types (a b):3, (b a):1,
    // nt = 2, V = 3, contDen = 5; continuation counts N1+(·b) =
    // N1+(·a) = 1; prefixes: c(a·)=3 N1+(a·)=1, c(b·)=1 N1+(b·)=1.
    //   p(b|a) = (max(12−3,0)·5 + 3·1·2) / (12·5) = 51/60 = 0.85
    //   p(a|b) = (max(4−3,0)·5 + 3·1·2) / (4·5)  = 11/20 = 0.55
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val got = NgramLm.kneserNeyScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def lp(p: Double): Double = BigDecimal(math.log(p))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2
      - (lp(0.85) + lp(0.55) + lp(0.85)) / 3) < 1e-12)
    assert(got(2L) == ((1L, lp(0.85))))
    assert(got(3L) == ((0L, 0.0)))
    // KN discounts less than add-one overestimates: the frequent
    // transition keeps more mass (0.85 vs add-one's 4/6)
    assert(0.85 > 4.0 / 6.0)
  }

  test("kneserNeyScore: the model is a distribution — p(·|w1) sums " +
      "to 1 over the vocabulary (exact rational check)") {
    // enumerate p(w2|a) over V = {a, b, c} with exact rationals:
    //   seen (a b): 51/60; unseen w2=a: 3·1·(1+1)/60; w2=c:
    //   3·1·(0+1)/60 — total 60/60
    val num = Seq(51L, 6L, 3L)
    assert(num.sum == 60L)
  }

  test("perplexityBuckets: per-source terciles follow the LM order; " +
      "unrankable docs are unscored and never kept") {
    val docs = Seq(
      // source s1: a fluency ladder — repeated template docs (high),
      // a middle family, and unique-word docs (low)
      (1L, "s1", "the quick brown fox jumps over the lazy dog"),
      (2L, "s1", "the quick brown fox jumps over the lazy dog"),
      (3L, "s1", "the quick brown fox leaps over a sleepy cat"),
      (4L, "s1", "a quick brown cat jumps over the lazy fox"),
      (5L, "s1", "zebra quartz vivid jolt waxy nymph fjord gyp"),
      (6L, "s1", "krypton blitz quartz vex mamba ghoul pix yurt"),
      // source s2: two docs + one single-token (unrankable) doc
      (7L, "s2", "alpha beta alpha beta alpha beta"),
      (8L, "s2", "gamma delta epsilon zeta eta theta"),
      (9L, "s2", "solo")).toDF("doc_id", "source", "text")
    val rows = NgramLm.perplexityBuckets(docs).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the bucket matches a local tercile cut over (score desc, id)
    for (src <- Seq("s1", "s2")) {
      val ranked = rows.filter(r => r.getAs[String]("source") == src
          && r.getAs[Long]("n_bigrams") > 0)
        .sortBy(r => (-r.getAs[Double]("avg_logp"), r.getAs[Long]("doc_id")))
      val n = ranked.length
      ranked.zipWithIndex.foreach { case (r, i) =>
        // ntile(3): first ceil-sized groups get the extra rows
        val base = n / 3; val rem = n % 3
        val expect =
          if (i < (base + (if (rem > 0) 1 else 0))) 1
          else if (i < 2 * base + math.min(rem, 2)) 2 else 3
        assert(r.getAs[Int]("bucket") == expect,
          s"src=$src i=$i got=${r.getAs[Int]("bucket")} want=$expect")
      }
    }
    // fluency ladder lands as head/middle/tail in s1
    assert(byId(1L).getAs[String]("label") == "head")
    assert(byId(5L).getAs[String]("label") == "tail")
    assert(!byId(5L).getAs[Boolean]("kept"))
    assert(byId(1L).getAs[Boolean]("kept"))
    // the single-token doc is unscored, NULL bucket, never kept
    assert(byId(9L).isNullAt(byId(9L).fieldIndex("bucket")))
    assert(byId(9L).getAs[String]("label") == "unscored")
    assert(!byId(9L).getAs[Boolean]("kept"))
    // kept <=> bucket in {1, 2}
    rows.foreach { r =>
      val kept = r.getAs[Boolean]("kept")
      val b = if (r.isNullAt(r.fieldIndex("bucket"))) 99
        else r.getAs[Int]("bucket")
      assert(kept == (b <= 2))
    }
  }

  test("kneserNeyScore and perplexityBuckets on real documents: " +
      "every doc covered, finite, buckets balanced per source") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val kn = NgramLm.kneserNeyScore(docs)
    assert(kn.count() == docs.count())
    assert(kn.filter(col("avg_logp").isNull ||
      col("avg_logp").isNaN).count() == 0)
    val bk = NgramLm.perplexityBuckets(docs)
    assert(bk.count() == docs.count())
    val sizes = bk.filter(col("bucket").isNotNull)
      .groupBy(col("source"), col("bucket")).count()
      .groupBy(col("source"))
      .agg((max(col("count")) - min(col("count"))).as("spread"))
      .collect()
    assert(sizes.forall(_.getAs[Long]("spread") <= 1L),
      "ntile buckets must be balanced within 1 per source")
  }

  test("bigramScore on real documents: every doc scored, finite") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val got = NgramLm.bigramScore(docs)
    assert(got.count() == docs.count())
    assert(got.filter(col("avg_logp").isNull ||
      col("avg_logp").isNaN).count() == 0)
  }
}
