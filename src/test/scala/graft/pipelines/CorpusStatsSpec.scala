package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Corpus-law diagnostics: the Zipf OLS fit reproduces a local exact
  * recompute through the same decimal channel, and the Heaps curve is
  * monotone with exact totals at the last checkpoint. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  // a deliberately Zipf-ish corpus: token t_i appears ~N/i times
  private def zipfCorpus = {
    val words = (1 to 12).flatMap(i => Seq.fill(120 / i)(s"tok$i"))
    // spread the multiset over 10 docs deterministically
    words.zipWithIndex.groupBy(_._2 % 10).toSeq.map { case (d, ws) =>
      (d.toLong, ws.map(_._1).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("zipfSlope: matches the exact local OLS recompute; slope is " +
      "negative on a Zipfian head; k >= 2 enforced") {
    val got = CorpusPipeline.zipfSlope(zipfCorpus, k = 12)
      .as[(Long, Double, Double)].head()
    // local recompute: same counts, same decimal-ln channel, same
    // fixed IEEE expression
    val counts = zipfCorpus.select(explode(split($"text", " ")).as("t"))
      .groupBy($"t").count().as[(String, Long)].collect()
      .sortBy { case (t, c) => (-c, t) }.take(12)
    def dec6(d: Double): BigDecimal = BigDecimal(
      new java.math.BigDecimal(d).setScale(6, java.math.RoundingMode.HALF_UP))
    val terms = counts.zipWithIndex.map { case ((_, c), i) =>
      val x = dec6(math.log((i + 1).toDouble))
      val y = dec6(math.log(c.toDouble))
      (x, y, x * y, x * x)
    }
    val n = terms.length.toDouble
    val (sx, sy, sxy, sxx) = (
      terms.map(_._1).sum.toDouble, terms.map(_._2).sum.toDouble,
      terms.map(_._3).sum.toDouble, terms.map(_._4).sum.toDouble)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(got._1 == 12L)
    assert(got._2 == slope, s"slope ${got._2} != local $slope")
    assert(got._3 == icept)
    // the head is Zipfian by construction: slope near -1
    assert(got._2 < -0.5 && got._2 > -1.5, s"slope ${got._2}")
    intercept[IllegalArgumentException] {
      CorpusPipeline.zipfSlope(zipfCorpus, k = 1)
    }
  }

  test("heapsLaw: cumulative columns monotone; last checkpoint holds " +
      "the exact corpus totals; first-occurrence semantics") {
    val docs = Seq(
      (0L, "a b c"), (4L, "a b d"), (8L, "a e"),
      (12L, "f f f"), (16L, "a b c d e f g")).toDF("doc_id", "text")
    val got = CorpusPipeline.heapsLaw(docs, nCheckpoints = 16)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 16)
    // monotone nondecreasing in both cumulative columns
    got.sliding(2).foreach { case Array(p, c) =>
      assert(c._3 >= p._3 && c._4 >= p._4, s"$p -> $c")
    }
    // final checkpoint: exact totals
    val toks = docs.select(explode(split($"text", " ")).as("t"))
    assert(got.last._3 == toks.count())
    assert(got.last._4 == toks.distinct().count())
    // cut ids are (max * i) div 16 with max = 16
    got.foreach { case (ck, cut, _, _) => assert(cut == 16 * ck / 16) }
    // first-occurrence: 'a' counts at the checkpoint covering doc 0,
    // so vocab at the first checkpoint covering doc_id >= 0 includes
    // the first doc's 3 types
    assert(got.head._4 >= 3)
  }
}
