package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Scale-path utilities: salted joins/aggregations must be row-exact
  * vs their unsalted equivalents, and bucketed joins must be
  * shuffle-free on both sides. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches unsalted join exactly") {
    // skewed big side: key "hot" dominates
    val big = ((1 to 500).map(i => ("hot", i)) ++
      (1 to 50).map(i => ("cold", i)) ++
      (1 to 5).map(i => ("orphan", i))).toDF("k", "v")
    val small = Seq(("hot", "H"), ("cold", "C"), ("never", "N")).toDF("k", "tag")

    val expected = big.join(small, Seq("k")).orderBy("k", "v")
      .as[(String, Int, String)].collect().toSeq
    val got = Skew.saltedJoin(big, small, "k", buckets = 8).orderBy("k", "v")
      .as[(String, Int, String)].collect().toSeq
    assert(got == expected)

    val leftExpected = big.join(small, Seq("k"), "left").count()
    val leftGot = Skew.saltedJoin(big, small, "k", 8, "left").count()
    assert(leftGot == leftExpected)
  }

  test("saltedCountSum matches plain aggregation exactly") {
    val df = ((1 to 300).map(i => ("hot", i.toDouble)) ++
      (1 to 30).map(i => ("cold", i.toDouble))).toDF("k", "x")
    val got = Skew.saltedCountSum(df, "k", col("x").cast("decimal(18,6)"), 8)
      .orderBy("k").collect()
    val exp = df.groupBy("k")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("x").cast("decimal(18,6)")).as("sum_value"))
      .orderBy("k").collect()
    assert(got.toSeq.toString == exp.toSeq.toString)
  }

  test("bucketed join is shuffle-free on both sides") {
    val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
    val lineitem = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 4)
    Bucketing.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 4)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = orders.join(
        lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
      assert(Bucketing.hasShuffle(shuffled), "unbucketed join should shuffle")
      val j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      assert(!Bucketing.hasShuffle(j), "bucketed join must not shuffle:\n" +
        j.queryExecution.executedPlan.toString)
      assert(j.count() == lineitem.count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("range-sorted layout skips row groups a shuffled layout must read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_").toString
    val data = spark.range(200000).selectExpr("id AS k", "id * 3 AS v")
    // force many small row groups so skipping is observable — bare key:
    // session-conf entries are copied verbatim into the writer's Hadoop
    // conf (a spark.hadoop. prefix is only stripped from the STATIC
    // SparkConf at session startup and would be a silent no-op here)
    spark.conf.set("parquet.block.size", "65536")
    try {
      Bucketing.writeRangeSorted(data, s"$dir/sorted", "k", numFiles = 8)
      data.orderBy(org.apache.spark.sql.functions.rand(7))
        .repartition(8)
        .write.mode("overwrite").parquet(s"$dir/shuffled")
    } finally spark.conf.unset("parquet.block.size")

    def readRows(path: String): Long =
      Bucketing.scanOutputRows(
        spark.read.parquet(path).filter($"k" >= 1000 && $"k" < 2000))

    val sortedRows = readRows(s"$dir/sorted")
    val shuffledRows = readRows(s"$dir/shuffled")
    // both produce the same ANSWER; the sorted layout decodes far less
    assert(sortedRows >= 1000 && sortedRows < shuffledRows / 4,
      s"sorted=$sortedRows shuffled=$shuffledRows")
  }
}
