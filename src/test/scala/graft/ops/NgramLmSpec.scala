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

  test("bigramScore on real documents: every doc scored, finite") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val got = NgramLm.bigramScore(docs)
    assert(got.count() == docs.count())
    assert(got.filter(col("avg_logp").isNull ||
      col("avg_logp").isNaN).count() == 0)
  }
}
