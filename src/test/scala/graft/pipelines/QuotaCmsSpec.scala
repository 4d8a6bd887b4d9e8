package graft.pipelines

import graft.SparkSpec
import graft.functions.CmsSketch
import org.apache.spark.sql.functions._

/** Round-6 batch: CMS sketch, quota fill, within-doc dup coverage. */
class QuotaCmsSpec extends SparkSpec {
  import spark.implicits._

  test("CmsSketch: dense grid, total mass conserved per row, merge = sum") {
    val toks = Seq.fill(50)("alpha").zipWithIndex
      .map { case (t, i) => if (i % 5 == 0) "beta" else t }
      .toDF("tok")
    val reg = CmsSketch.registers(toks, col("tok"), depth = 4, width = 8)
    val rows = reg.collect()
    assert(rows.length == 32) // dense: every (row, col) cell present
    // each row of the sketch sees every occurrence exactly once
    val perRow = rows.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perRow.values.toSet == Set(50L))
    // merging a sketch with itself doubles every cell
    val merged = reg.union(reg).groupBy("row", "col")
      .agg(sum("cnt").as("cnt"))
    // grand total = depth x occurrences; self-merge doubles it
    assert(merged.collect().map(_.getLong(2)).sum == 2L * 4L * 50L)
  }

  test("CmsSketch.estimate: upper bound on the true count, tight when sparse") {
    val toks = (Seq.fill(40)("alpha") ++ Seq.fill(10)("beta") ++
      Seq.fill(3)("gamma")).toDF("tok")
    val reg = CmsSketch.registers(toks, col("tok"), depth = 4, width = 32)
    val keys = Seq("alpha", "beta", "gamma").toDF("k")
    val est = CmsSketch.estimate(reg, keys, col("k"), depth = 4, width = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 40L && est("beta") >= 10L && est("gamma") >= 3L)
    // 3 distinct keys in a 4x32 grid: min-over-rows should be exact
    assert(est == Map("alpha" -> 40L, "beta" -> 10L, "gamma" -> 3L))
  }

  test("CmsSketch.registersBy: per-group sketches roll up to the global grid") {
    val d = (Seq.fill(12)(("a", "x")) ++ Seq.fill(5)(("b", "x")) ++
      Seq.fill(3)(("b", "y"))).toDF("g", "tok")
    val grouped = CmsSketch.registersBy(d, "g", col("tok"),
      depth = 4, width = 8)
    val rolled = grouped.groupBy("row", "col").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val global = CmsSketch.registers(d, col("tok"), depth = 4, width = 8)
      .filter(col("cnt") =!= 0L)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(rolled == global, "grouped CMS must roll up by sum")
  }

  test("quotaFill: kept prefix respects the budget; next doc would burst it") {
    val docs = (1L to 20L).map(i => (i, "src", "t " * 99 + "t"))
      .toDF("doc_id", "source", "text") // every doc = 100 tokens
    val out = CorpusPipeline.quotaFill(docs, budgetTokens = 450L)
      .orderBy("cum_tokens").collect()
    assert(out.length == 4) // 4 docs of 100 fit in 450, the 5th bursts
    assert(out.map(_.getLong(3)).toSeq == Seq(100L, 200L, 300L, 400L))
    // deterministic: same call twice yields the same doc ids
    val again = CorpusPipeline.quotaFill(docs, budgetTokens = 450L)
      .orderBy("cum_tokens").collect()
    assert(out.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("quotaFill: budgets are per source, priority order is hash not id") {
    val docs = ((1L to 10L).map(i => (i, "a", "x y z")) ++
      (11L to 12L).map(i => (i, "b", "x y z"))).toDF("doc_id", "source", "text")
    val out = CorpusPipeline.quotaFill(docs, budgetTokens = 9L)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    val bySrc = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(bySrc("a").size == 3 && bySrc("b") == Set(11L, 12L))
  }

  test("dupNgramCoverage: repeated trigram covers the union of its spans") {
    val d = Seq(
      (1L, "a b c x a b c"),   // "a b c" twice: covers 0-2 and 4-6 = 6 of 7
      (2L, "p q r s t u"),     // no repeats
      (3L, "k k k k k")        // "k k k" three times: covers all 5
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.dupNgramCoverage(d, n = 3)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((7L, 6L)))
    assert(out(2L) == ((6L, 0L)))
    assert(out(3L) == ((5L, 5L)))
  }

  test("dupNgramCoverage: short docs (< n tokens) report zero coverage") {
    val d = Seq((1L, "a b")).toDF("doc_id", "text")
    val Array(r) = CorpusPipeline.dupNgramCoverage(d, n = 3).collect()
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L && r.getDouble(3) == 0.0)
  }
}
