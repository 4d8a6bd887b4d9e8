package graft.silver

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.runner.ModelRegistry
import graft.domain.LogisticsAdapter

/** End-to-end dbt-project run: raw airbyte-shaped sources → 10 silver
  * incremental models + SCD2 snapshot + 8 gold views, twice (initial
  * load + incremental batch), with the audit log capturing every
  * model run. */
class LogisticsProjectSpec extends SparkSpec {
  import spark.implicits._

  test("full project: initial + incremental run over raw sources") {
    val root = java.nio.file.Files.createTempDirectory("graft_proj_").toString
    val wh = new ModelRegistry.Warehouse(root, spark)
    val sv = LogisticsAdapter.silver(spark, sf("sf0.001"))
    val t0 = lit("2024-01-01 00:00:00").cast("timestamp")

    // land airbyte-shaped raw sources (extract ts = t0)
    wh.append("raw_customers", sv.customers.withColumn("_airbyte_extracted_at", t0))
    wh.append("raw_couriers", sv.couriers.withColumn("_ab_cdc_updated_at", t0))
    wh.append("raw_inventory", sv.inventory.withColumn("_airbyte_extracted_at", t0))
    wh.append("raw_locations", sv.locations.withColumn("_airbyte_extracted_at", t0))
    wh.append("raw_orders", sv.orders.withColumn("_airbyte_extracted_at", t0))
    wh.append("raw_products", sv.products.withColumn("_airbyte_extracted_at", t0))
    wh.append("raw_sellers", sv.sellers.withColumn("_airbyte_extracted_at", t0))
    wh.overwrite("fact_shipments", sv.shipments)

    val r1 = ModelRegistry.run(spark, wh, LogisticsProject.models, "run_1")
    assert(r1("dim_customers").count() == sv.customers.count())
    assert(r1("fact_orders").count() == sv.orders.count())
    assert(r1("silver_error_orders").count() == 0)
    assert(r1("scd_customers").filter(col("is_current")).count() ==
      sv.customers.count())
    assert(r1("delivery_performance_by_courier").count() > 0)
    assert(r1("seller_product_profitability").count() > 0)

    // incremental batch: one changed customer (newer ts), one broken order
    val t1 = lit("2024-02-01 00:00:00").cast("timestamp")
    wh.append("raw_customers", sv.customers.filter($"customer_id" === 1)
      .withColumn("customer_segment", lit("CHANGED"))
      .withColumn("_airbyte_extracted_at", t1))
    wh.append("raw_orders", Seq(1).toDF("x").select(
      lit(null).cast("long").as("order_id"),
      lit(null).cast("timestamp").as("order_date"),
      lit(77L).as("product_id"), lit(1L).as("customer_id"),
      lit(10.0).as("total_amount"), lit("COD").as("payment_method"))
      .withColumn("_airbyte_extracted_at", t1))

    // second run exercises the level-parallel path (dbt threads analog)
    // over the real 19-model DAG — results must be identical to run()
    val r2 = ModelRegistry.runParallel(spark, wh, LogisticsProject.models,
      "run_2", threads = 3)
    // merged update, no row-count change
    assert(r2("dim_customers").count() == sv.customers.count())
    assert(r2("dim_customers").filter($"customer_id" === 1)
      .select("customer_segment").as[String].head() == "CHANGED")
    // broken order captured by the error model, not the fact
    assert(r2("fact_orders").count() == sv.orders.count())
    assert(r2("silver_error_orders").count() == 1)
    assert(r2("silver_error_orders").select("error_reason").as[String]
      .head() == "Missing ORDER_ID")
    // snapshot: customer 1 now has history (2 versions, 1 current)
    val hist = r2("scd_customers").filter($"customer_id" === 1)
    assert(hist.count() == 2)
    assert(hist.filter($"is_current").select("customer_segment")
      .as[String].head() == "CHANGED")
    // audit: 19 models x 2 runs
    assert(wh.read("etl_audit_log").count() == 38)
  }
}
