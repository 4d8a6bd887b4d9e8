package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based quality filter: golden fixture fit + scoring contract. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("golden: the fixture corpus is separable and fit exactly") {
    val model = QualityClassifier.defaultModel(spark)
    val fixtures = QualityClassifier.trainingData
      .toDF("text", "expected")
    val out = model.score(fixtures, "text")
      .select("expected", "quality_pred").collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"fixture misfit: expected ${r.getString(0)}, got ${r.getString(1)}"))
  }

  test("empty/whitespace/null text scores garbage") {
    val model = QualityClassifier.defaultModel(spark)
    val d = Seq((1L, ""), (2L, "   "), (3L, null: String))
      .toDF("id", "text")
    val out = model.score(d, "text").select("quality_pred")
      .as[String].collect()
    assert(out.forall(_ == "garbage"))
  }

  test("scoring is partition-invariant (distributed transform path)") {
    val model = QualityClassifier.defaultModel(spark)
    // verbatim fixture sentences: the golden test pins their labels,
    // so this test isolates partition-invariance of the transform path
    val d = (1L to 40L).map(i =>
      (i, if (i % 2 == 0)
            "engineers tested the bridge design under repeated load cycles"
          else "free free free win win win prize prize prize claim claim"))
      .toDF("id", "text")
    val a = model.score(d, "text")
      .select("id", "quality_pred").collect().map(r =>
        r.getLong(0) -> r.getString(1)).toMap
    val b = model.score(d.repartition(7), "text")
      .select("id", "quality_pred").collect().map(r =>
        r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a(2L) == "clean" && a(1L) == "garbage")
  }
}
