package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Property tests for the MERGE kernel (SURVEY §5 test plan): the
  * full-outer-join implementation must agree with the obvious
  * driver-side reference model on arbitrary inputs, stay idempotent,
  * and preserve key uniqueness. ScalaCheck drives generation; each
  * sample round-trips through real Spark jobs, so sample counts are
  * kept modest. */
class UpsertPropertySpec extends SparkSpec {
  import spark.implicits._

  private val keyGen = Gen.choose(0, 8)
  private val rowGen = for {
    k <- keyGen; v <- Gen.choose(0, 1000); n <- Gen.choose(0, 1000)
  } yield (k, v, n)
  // unique keys per side, as the reference guarantees via pre-MERGE dedup
  private def sideGen = Gen.listOf(rowGen)
    .map(_.groupBy(_._1).map(_._2.head).toList)

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"$name: $res")
  }

  test("upsert agrees with the reference model (merge algebra)") {
    check("model", Prop.forAll(sideGen, sideGen) { (t, s) =>
      val target = t.toDF("k", "v", "n")
      val source = s.toDF("k", "v", "n")
      val got = Upsert.upsert(target, source, Seq("k"))
        .as[(Int, Int, Int)].collect().toSet
      val model = (t.map(r => r._1 -> r).toMap ++ s.map(r => r._1 -> r).toMap)
        .values.toSet
      got == model
    })
  }

  test("upsert is idempotent and preserves key uniqueness") {
    check("idempotent", Prop.forAll(sideGen, sideGen) { (t, s) =>
      val target = t.toDF("k", "v", "n")
      val source = s.toDF("k", "v", "n")
      val once = Upsert.upsert(target, source, Seq("k"))
        .as[(Int, Int, Int)].collect().toSet
      val twice = Upsert.upsert(once.toSeq.toDF("k", "v", "n"), source, Seq("k"))
        .as[(Int, Int, Int)].collect().toSet
      once == twice && once.map(_._1).size == once.size
    })
  }

  test("valid/error split partitions the input exactly") {
    import org.apache.spark.sql.functions._
    check("split", Prop.forAll(Gen.listOf(rowGen)) { rows =>
      val df = rows.toDF("k", "v", "n")
      val rules = Seq(
        Quality.Rule("bad_v", col("v") < 500),
        Quality.Rule("bad_n", col("n") >= 100))
      val out = Quality.withErrorReason(df, rules).cache()
      val valid = out.filter(col("error_reason").isNull).count()
      val invalid = out.filter(col("error_reason").isNotNull).count()
      val expectValid = rows.count(r => r._2 < 500 && r._3 >= 100)
      valid + invalid == rows.length && valid == expectValid
    })
  }
}
