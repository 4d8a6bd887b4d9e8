package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rendezvous (HRW) sharding: the minimal-movement property IS the
  * operator's contract. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("growing 8 -> 9 shards moves exactly the keys won by the new shard") {
    val keys = (1L to 2000L).toDF("k")
    val both = keys.select(col("k"),
      Sharding.rendezvousShard(col("k"), 8).as("s8"),
      Sharding.rendezvousShard(col("k"), 9).as("s9"))
    val moved = both.filter(col("s8") =!= col("s9"))
    // every moved key landed on the NEW shard (id 8) — nothing else
    // reshuffled
    assert(moved.filter(col("s9") =!= 8).count() == 0L)
    val nMoved = moved.count().toDouble
    // expected movement ~ 1/9 of keys; generous envelope, fixed hash
    assert(nMoved / 2000.0 > 0.05 && nMoved / 2000.0 < 0.20,
      s"moved fraction ${nMoved / 2000.0} outside the ~1/9 envelope")
  }

  test("assignment is total, stable, and roughly balanced") {
    val keys = (1L to 3000L).toDF("k")
    val counts = Sharding.shardCounts(keys, col("k"), 8)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(counts.keySet == (0 until 8).toSet, "every shard populated")
    assert(counts.values.sum == 3000L)
    // fixed hash: balance is deterministic; 3000/8 = 375 per shard
    assert(counts.values.forall(n => n > 280 && n < 470),
      s"imbalanced: $counts")
    val a = Sharding.shardCounts(keys, col("k"), 8).collect().toSeq
    val b = Sharding.shardCounts(keys.repartition(5), col("k"), 8)
      .collect().toSeq
    assert(a.map(_.toString).sorted == b.map(_.toString).sorted)
  }
}
