package graft

class VerifyHashSpec extends SparkSpec {
  import spark.implicits._

  test("canonHash: order- and partitioning-independent, column-order canon") {
    val a = Seq((1, "x"), (2, "y"), (3, null: String)).toDF("id", "v")
    val h = Verify.canonHash(a)
    assert(Verify.canonHash(a.orderBy($"id".desc)) == h)
    assert(Verify.canonHash(a.repartition(7)) == h)
    // column ORDER canons away: columns sort by name before hashing
    // (schema/name equality is the gate's separate schema_match check;
    // the digest pins VALUES). A rename that keeps the sorted position
    // ("v" -> "w", still after "id") leaves the digest unchanged; one
    // that MOVES the column ("v" -> "a", now first) reorders the
    // concatenation and must change it.
    assert(Verify.canonHash(a.select($"v", $"id")) == h)
    assert(Verify.canonHash(a.withColumnRenamed("v", "w")) == h)
    assert(Verify.canonHash(a.withColumnRenamed("v", "a")) != h)
  }

  test("canonHash: duplicate-row multiplicity changes the digest " +
      "(round-7 ADVICE: XOR pair-cancellation blind spot)") {
    val one = Seq((1, "x"), (2, "y")).toDF("id", "v")
    // same DISTINCT rows, one duplicated as an identical PAIR — under
    // the old per-row XOR the pair cancelled to 0 and (with equal row
    // counts impossible) the digest part collided with other
    // multiplicity splits; now both the count and the digest move
    val dupPair = Seq((1, "x"), (1, "x"), (1, "x"), (2, "y"))
      .toDF("id", "v")
    val other = Seq((1, "x"), (2, "y"), (2, "y"), (2, "y")).toDF("id", "v")
    val h1 = Verify.canonHash(one)
    val h2 = Verify.canonHash(dupPair)
    val h3 = Verify.canonHash(other)
    assert(h1 != h2)
    // SAME row count, same distinct rows, different multiplicity
    // split (3+1 vs 1+3): the old XOR-of-row-hashes was blind to
    // exactly this; the digest half must differ
    assert(h2 != h3)
    assert(h2.split(":")(0) == "4" && h3.split(":")(0) == "4")
    // null value vs the string "null" stay distinct in the canon
    val n1 = Seq((1, null: String)).toDF("id", "v")
    val n2 = Seq((1, "null")).toDF("id", "v")
    assert(Verify.canonHash(n1) != Verify.canonHash(n2))
    // empty result is stable
    assert(Verify.canonHash(one.filter($"id" > 99)) == "0:0")
  }
}
