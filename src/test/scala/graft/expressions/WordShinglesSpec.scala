package graft.expressions

import graft.SparkSpec
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

/** The native one-pass shingler must be BIT-identical to the builtin
  * `shingles(tokens(text), n)` chain it replaces — same strings, same
  * order, same short-document and degenerate-whitespace semantics —
  * because every downstream hash (minhash, LSH bands, winnowing,
  * decontamination) and every DuckDB oracle is keyed on those exact
  * strings. */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one two three",
    "one two",          // shorter than n=3 → empty
    "single",
    "",                 // split("", " ") = [""]
    "a  b",             // double space → empty middle token
    " leading",         // leading space → empty first token
    "trailing ",        // trailing space → empty last token
    "unicode héllo wörld ünïcode tëst",
    "的 是 了 在 我 有 不")   // multi-byte CJK with spaces

  test("native shingles == builtin chain for n = 1..5") {
    val df = cases.toDF("text")
    (1 to 5).foreach { n =>
      val diff = df
        .withColumn("builtin", T.shingles(T.tokens(col("text")), n))
        .withColumn("native", T.shinglesOf(col("text"), n))
        .filter(not(col("builtin") <=> col("native")))
      assert(diff.isEmpty, s"n=$n: " + diff.collect().mkString("; "))
    }
  }

  test("native shingles == builtin chain on the documents corpus") {
    val docs = graft.Tables(spark, sf("sf0.01"), "documents")
    (2 to 4).foreach { n =>
      val diff = docs
        .withColumn("builtin", T.shingles(T.tokens(col("text")), n))
        .withColumn("native", T.shinglesOf(col("text"), n))
        .filter(not(col("builtin") <=> col("native")))
      assert(diff.isEmpty, s"n=$n mismatch")
    }
  }

  test("null text yields null (UnaryExpression null propagation)") {
    val df = Seq[Option[String]](None, Some("a b c")).toDF("text")
    val out = df.select(T.shinglesOf(col("text"), 2).as("sh"))
      .collect().map(r => Option(r.get(0)))
    assert(out.count(_.isEmpty) == 1)
    assert(out.count(_.isDefined) == 1)
  }
}
