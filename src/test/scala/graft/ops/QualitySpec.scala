package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1, 10.0, "a@x.com"),   // valid
    (2, -5.0, "b@x.com"),   // fails qty rule
    (3, -5.0, "no-at"),     // fails qty rule first (order matters)
    (4, 10.0, null)         // fails email rule (null-safe)
  ).toDF("id", "qty", "email")

  private def rules = Seq(
    Quality.Rule("invalid_qty", $"qty" > 0),
    Quality.Rule("invalid_email", $"email".contains("@")))

  test("error reason is the FIRST failing rule, null-safe") {
    val got = Quality.withErrorReason(df, rules)
      .select($"id", $"error_reason").as[(Int, Option[String])]
      .collect().toMap
    assert(got == Map(
      1 -> None, 2 -> Some("invalid_qty"),
      3 -> Some("invalid_qty"), 4 -> Some("invalid_email")))
  }

  test("valid and error branches partition the input exactly") {
    val (valid, err) = Quality.splitValidError(df, rules)
    assert(valid.count() + err.count() == df.count())
    assert(valid.columns.toSeq == df.columns.toSeq)
    assert(valid.select("id").as[Int].collect().toSet == Set(1))
  }

  test("runChecks counts violations in one pass") {
    val t = Seq((1, "a"), (2, null), (2, "c")).toDF("k", "v")
    val res = Quality.runChecks(t, Seq(
        Quality.notNull("v"), Quality.unique(Seq("k"))))
      .as[(String, Long, Boolean)].collect().toMap2
    assert(res("v_not_null") == ((1L, false)))
    assert(res("k_unique") == ((1L, false)))
  }

  test("relationshipViolations finds orphans, ignores null FKs") {
    val child = Seq(Some(1), Some(9), None).toDF("fk")
    val parent = Seq(1, 2).toDF("pk")
    val orphans = Quality.relationshipViolations(child, "fk", parent, "pk")
      .as[Int].collect().toSeq
    assert(orphans == Seq(9))
  }

  implicit class TupleMap(rows: Array[(String, Long, Boolean)]) {
    def toMap2: Map[String, (Long, Boolean)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
