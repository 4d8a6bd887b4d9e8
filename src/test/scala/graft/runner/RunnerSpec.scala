package graft.runner

import org.apache.spark.sql.functions._
import graft.SparkSpec
import ModelRegistry._

/** EP3 registry semantics: initial full load, incremental merge on the
  * second run (watermark + dedup + upsert), error-row capture, view
  * materialization, topological ordering, audit-log appends — the
  * shapes of `dbt/dbt-project/models/silver/fact_orders.sql` and
  * `silver_error_orders.sql`. */
class RunnerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def models = Seq(
    Model("fact_orders", Seq("raw_orders"),
      IncrementalMerge(Seq("order_id"), "extracted_at"),
      (_, deps) => deps("raw_orders")
        .filter(col("order_id").isNotNull && col("customer_id").isNotNull)),
    Model("silver_error_orders", Seq("raw_orders"),
      IncrementalMerge(Seq("row_key"), "extracted_at"),
      (_, deps) => deps("raw_orders")
        .filter(col("order_id").isNull || col("customer_id").isNull)
        .withColumn("error_reason",
          when(col("order_id").isNull, "Missing ORDER_ID")
            .when(col("customer_id").isNull, "Missing CUSTOMER_ID")
            .otherwise("Unknown error"))
        .withColumn("row_key", coalesce(col("order_id"), col("amount").cast("string")))),
    Model("orders_by_customer", Seq("fact_orders"), View,
      (_, deps) => deps("fact_orders")
        .groupBy("customer_id").agg(count(lit(1)).as("n"))))

  test("registry: initial load, incremental merge, errors, audit") {
    val root = java.nio.file.Files.createTempDirectory("graft_wh_").toString
    val wh = new Warehouse(root, spark)

    // batch 1: two valid rows, one invalid
    wh.append("raw_orders", Seq(
      (Some("O1"), Some("C1"), 100.0, ts("2024-01-01 10:00:00")),
      (Some("O2"), Some("C2"), 200.0, ts("2024-01-01 11:00:00")),
      (None: Option[String], Some("C3"), 300.0, ts("2024-01-01 12:00:00"))
    ).toDF("order_id", "customer_id", "amount", "extracted_at"))

    val r1 = ModelRegistry.run(spark, wh, models, "run_1")
    assert(r1("fact_orders").count() == 2)
    assert(r1("silver_error_orders").select("error_reason").as[String]
      .collect().toSet == Set("Missing ORDER_ID"))

    // batch 2: update O2 (newer watermark), new O4, stale O1 (older
    // watermark -> filtered out), plus a dup of O4 (latest wins)
    wh.append("raw_orders", Seq(
      (Some("O2"), Some("C2"), 250.0, ts("2024-01-02 09:00:00")),
      (Some("O4"), Some("C4"), 400.0, ts("2024-01-02 10:00:00")),
      (Some("O4"), Some("C4"), 450.0, ts("2024-01-02 11:00:00")),
      (Some("O1"), Some("C1"), 999.0, ts("2023-12-31 00:00:00"))
    ).toDF("order_id", "customer_id", "amount", "extracted_at"))

    val r2 = ModelRegistry.run(spark, wh, models, "run_2")
    val fact = r2("fact_orders")
      .select("order_id", "amount").as[(String, Double)].collect().toMap
    assert(fact == Map("O1" -> 100.0, "O2" -> 250.0, "O4" -> 450.0))

    // view materialization resolves through the session catalog
    val v = spark.table("orders_by_customer")
    assert(v.count() == 3)

    // audit: 3 models x 2 runs
    val audit = wh.read("etl_audit_log")
    assert(audit.count() == 6)
    assert(audit.filter(col("run_id") === "run_2").count() == 3)
    assert(audit.select("status").distinct().as[String].collect().toSeq == Seq("SUCCESS"))
  }

  test("runParallel matches sequential results (dbt threads analog)") {
    val root = java.nio.file.Files.createTempDirectory("graft_whp_").toString
    val wh = new Warehouse(root, spark)
    wh.append("raw_orders", Seq(
      (Some("O1"), Some("C1"), 100.0, ts("2024-01-01 10:00:00")),
      (Some("O2"), Some("C2"), 200.0, ts("2024-01-01 11:00:00")),
      (None: Option[String], Some("C3"), 300.0, ts("2024-01-01 12:00:00"))
    ).toDF("order_id", "customer_id", "amount", "extracted_at"))

    val r = ModelRegistry.runParallel(spark, wh, models, "prun_1", threads = 3)
    assert(r("fact_orders").count() == 2)
    assert(r("silver_error_orders").count() == 1)
    assert(spark.table("orders_by_customer").count() == 2)
    val audit = wh.read("etl_audit_log").filter(col("run_id") === "prun_1")
    assert(audit.count() == 3)
  }

  test("registry: topological order and cycle detection") {
    val a = Model("a", Seq("b"), View, (_, d) => d("b"))
    val b = Model("b", Nil, View, (s, _) => { import s.implicits._; Seq(1).toDF("x") })
    assert(topoOrder(Seq(a, b)).map(_.name) == Seq("b", "a"))
    val c1 = Model("c1", Seq("c2"), View, (_, d) => d("c2"))
    val c2 = Model("c2", Seq("c1"), View, (_, d) => d("c1"))
    intercept[IllegalArgumentException](topoOrder(Seq(c1, c2)))
  }
}
