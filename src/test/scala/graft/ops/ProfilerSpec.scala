package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Single-pass table profiler. */
class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, exact distinct, numeric ranges, type tags") {
    val d = Seq(
      (1L, Some(2.5), "a"),
      (2L, None, "b"),
      (3L, Some(7.5), "a"),
      (3L, Some(2.5), null)
    ).toDF("id", "x", "s")
    val out = Profiler.profile(d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("id").getString(1) == "bigint")
    assert(out("id").getLong(2) == 4L)    // n_rows
    assert(out("id").getLong(3) == 0L)    // n_nulls
    assert(out("id").getLong(4) == 3L)    // n_distinct
    assert(out("id").getDouble(5) == 1.0 && out("id").getDouble(6) == 3.0)
    assert(out("x").getLong(3) == 1L && out("x").getLong(4) == 2L)
    assert(out("x").getDouble(5) == 2.5 && out("x").getDouble(6) == 7.5)
    assert(out("s").getLong(3) == 1L && out("s").getLong(4) == 2L)
    assert(out("s").isNullAt(5) && out("s").isNullAt(6))
  }

  test("profile: one scan of the input, not one per column") {
    val d = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val plan = Profiler.profile(d).queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("LocalTableScan")) <= 1,
      "profiler must aggregate in a single pass:\n" + plan)
  }
}
