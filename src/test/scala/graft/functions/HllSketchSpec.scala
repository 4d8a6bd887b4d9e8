package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("registers: deterministic, bounded by 2^p, rho within field width") {
    val vs = (1 to 5000).map(i => s"v$i").toDF("v")
    val r1 = HllSketch.registers(vs, col("v"), p = 6).orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val r2 = HllSketch.registers(vs.repartition(7), col("v"), p = 6)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(r1.sameElements(r2), "registers must not depend on partitioning")
    assert(r1.length <= 64)
    assert(r1.forall { case (b, rho) => b >= 0 && b < 64 && rho >= 1 && rho <= 55 })
  }

  test("registers merge: union-then-sketch == sketch-then-max") {
    val a = (1 to 1000).map(i => s"a$i").toDF("v")
    val b = (500 to 1500).map(i => s"a$i").toDF("v")
    val direct = HllSketch.registers(a.union(b), col("v"), p = 5)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    val merged = HllSketch.registers(a, col("v"), p = 5)
      .unionByName(HllSketch.registers(b, col("v"), p = 5))
      .groupBy(col("bucket")).agg(max(col("max_rho")).as("max_rho"))
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(direct.sameElements(merged), "HLL registers must be mergeable")
  }

  test("estimate: within the expected error envelope of true cardinality") {
    // p=8 -> 256 buckets, standard error ~1.04/sqrt(256) = 6.5%;
    // allow 4 sigma to keep the test noise-immune (the hash is fixed,
    // so this never flakes — the bound just documents the contract)
    val n = 20000
    val vs = (1 to n).map(i => s"item-$i").toDF("v")
    val est = HllSketch.estimate(HllSketch.registers(vs, col("v"), p = 8), 8)
    assert(math.abs(est - n) / n < 0.26, s"estimate $est vs true $n")
  }

  test("registersBy: per-group sketches equal the per-group global sketch; " +
      "roll-up re-aggregates to the ungrouped registers") {
    val d = ((1 to 800).map(i => ("a", s"x$i")) ++
      (1 to 300).map(i => ("b", s"y$i"))).toDF("g", "v")
    val grouped = HllSketch.registersBy(d, "g", col("v"), p = 5)
    val aOnly = HllSketch.registers(d.filter(col("g") === "a"), col("v"), p = 5)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    val aGrouped = grouped.filter(col("g") === "a")
      .select("bucket", "max_rho").orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(aOnly.sameElements(aGrouped))
    // roll-up: max over groups == the ungrouped sketch
    val rolled = grouped.groupBy("bucket").agg(max("max_rho").as("max_rho"))
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    val global = HllSketch.registers(d, col("v"), p = 5)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rolled.sameElements(global), "grouped sketches must roll up")
  }
}
