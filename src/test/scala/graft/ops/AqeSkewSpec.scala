package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkSpec

/** Evidence for the SCALE.md claim that AQE's skew-join split handles
  * discovered skew: a 90%-hot-key join, with the skew thresholds scaled
  * down to test size, must show a skew-split shuffle read in the final
  * adaptive plan (the mechanism that splits one hot partition across
  * many tasks at 100 TB). */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val s = spark.newSession()
    import s.implicits._
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")

    // 100k-row big side, 90% on key 0 (one hot shuffle partition);
    // payload pads the rows so the hot partition crosses the threshold
    val big = s.range(100000)
      .selectExpr("IF(id % 10 = 0, id, 0) AS k",
        "repeat('x', 64) AS pad")
    val dim = s.range(10000).selectExpr("id AS k", "id * 2 AS v")
    val joined = big.join(dim, "k")
    // execute THIS plan (count() would build a separate query execution
    // whose adaptive replanning this assertion wouldn't see)
    assert(joined.queryExecution.toRdd.count() > 0)

    val finalPlan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(finalPlan.toLowerCase.contains("skew"),
      "expected a skew-split shuffle read in the final AQE plan:\n" +
        finalPlan.take(1200))
  }
}
