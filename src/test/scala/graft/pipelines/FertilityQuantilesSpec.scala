package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 batch D: tokenizer fertility, grouped length quantiles. */
class FertilityQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("tokenizerFertility: letter runs + digit runs + punctuation marks") {
    val d = Seq(
      ("a", 1L, "plain words here"),          // 3 words, 3 subtokens
      ("a", 2L, "x2go is-great, really!"),    // 3 words, 9 subtokens
      ("b", 3L, "one two")                    // 2 words, 2 subtokens
    ).toDF("source", "doc_id", "text")
    val out = CorpusPipeline.tokenizerFertility(d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // "x2go" -> x,2,go ; "is-great," -> is,-,great,"," ; "really!" -> really,!
    assert(out("a") == ((2L, 6L, 12L, 2.0)))
    assert(out("b") == ((1L, 2L, 2L, 1.0)))
  }

  test("lengthQuantilesBy: nearest-rank per group, groups independent") {
    // group a: lengths 1..10 (p50 -> 5, p90 -> 9, p99 -> 10)
    // group b: all length 4
    val a = (1 to 10).map(n => ("a", ("t " * (n - 1) + "t")))
    val b = (1 to 5).map(_ => ("b", "w w w w"))
    val d = (a ++ b).zipWithIndex
      .map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val out = CorpusPipeline.lengthQuantilesBy(d)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    assert(out(("a", 0.5)) == 5L && out(("a", 0.9)) == 9L &&
      out(("a", 0.99)) == 10L)
    assert(out(("b", 0.5)) == 4L && out(("b", 0.99)) == 4L)
  }
}
