package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec
import graft.functions.{VectorFunctions => V}

/** Property tests for the bucketed pair generators:
  *  - the pigeonhole chunk join must agree EXACTLY with the brute-force
  *    hamming compare on arbitrary signatures (it is an exact
  *    optimization, not an approximation);
  *  - the banded-LSH cosine generator must return precisely the
  *    all-pairs matches that collide in ≥1 band (its declared
  *    semantics) — no phantom pairs, no missed collisions. */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, s"$name: $res")
  }

  test("simhashNearPairs == brute-force hamming filter (exactness)") {
    val hashGen = Gen.choose(0L, (1L << 60) - 1)
    // skewed generator: half the hashes cluster near a few centers so
    // near-pairs actually occur at small distances
    val clustered = for {
      center <- Gen.oneOf(0L, 12345L, (1L << 59) + 7L)
      flips <- Gen.choose(0, 12)
      bits <- Gen.listOfN(flips, Gen.choose(0, 59))
    } yield bits.foldLeft(center)((h, b) => h ^ (1L << b))
    val setGen = Gen.listOfN(30, Gen.frequency(1 -> hashGen, 2 -> clustered))
    val distGen = Gen.choose(1, 14)
    check("pigeonhole", Prop.forAll(setGen, distGen) { (hs, maxDist) =>
      val df = hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
        .toDF("doc_id", "simhash")
      val got = Dedup.simhashNearPairs(df, "doc_id", maxDist)
        .as[(Long, Long, Int)].collect().toSet
      val idx = hs.zipWithIndex
      val want = (for {
        (ha, a) <- idx; (hb, b) <- idx if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= maxDist
      } yield (a.toLong, b.toLong, d)).toSet
      got == want
    })
  }

  test("jaccardPairsPrefix == inverted-index jaccardPairs (exactness)") {
    val word = Gen.oneOf("the", "cat", "sat", "on", "mat", "dog", "ran",
      "far", "big", "red")
    val docGen = Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val corpusGen = Gen.listOfN(15, docGen)
    val jGen = Gen.oneOf(0.1, 0.2, 0.4, 0.7)
    check("prefix-filter", Prop.forAll(corpusGen, jGen) { (docs, minJ) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val key = (r: (Long, Long, Long, Double)) => (r._1, r._2, r._3)
      val base = Dedup.jaccardPairs(df, "doc_id", "text", 3, minJ)
        .as[(Long, Long, Long, Double)].collect().map(key).toSet
      val pfx = Dedup.jaccardPairsPrefix(df, "doc_id", "text", 3, minJ)
        .as[(Long, Long, Long, Double)].collect().map(key).toSet
      base == pfx
    })
  }

  test("embeddingDupPairs(banded) == all-pairs restricted to band collisions") {
    val vecGen = Gen.listOfN(64, Gen.choose(-1.0f, 1.0f))
    val setGen = Gen.listOfN(25, vecGen)
    check("banded-lsh", Prop.forAll(setGen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val minCos = 0.2
      val got = Dedup.embeddingDupPairsLsh(df, "vec_id", "embedding", minCos)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      val exact = Dedup.embeddingDupPairsExact(df, "vec_id", "embedding",
          minCos)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      // band buckets straight from the production bucket expression
      val buckets = df
        .select($"vec_id", array((0 until 4).map(t =>
          Dedup.lshBucket(V.quantize($"embedding"), 4, planeOffset = t * 4)): _*)
          .as("bks"))
        .as[(Long, Seq[Long])].collect().toMap
      val want = exact.filter { case (a, b) =>
        buckets(a).zip(buckets(b)).exists { case (x, y) => x == y }
      }
      got == want
    })
  }
}
