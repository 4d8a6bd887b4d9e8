package graft.silver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.runner.ModelRegistry._
import graft.gold.GoldModels
import graft.domain.LogisticsSchemas.Silver
import graft.ops.Upsert

/** The reference dbt project as a runnable registry instance: the 10
  * silver incremental-merge models (7 dims/facts + 3 error models,
  * `dbt/dbt-project/models/silver/`), the SCD2 customer snapshot
  * (`dbt/dbt-project/snapshots/customers/scd_customers.sql`), and the
  * dbt gold models as views — wired with the same dependency DAG dbt
  * derives from `ref()`/`source()`.
  *
  * Sources expected in the warehouse (airbyte-shaped, lower-case):
  * raw_customers raw_couriers raw_inventory raw_locations raw_orders
  * raw_products raw_sellers fact_shipments.
  */
object LogisticsProject {

  private val EX = "_airbyte_extracted_at"

  private def passthrough(src: String, cols: Seq[String],
      valid: DataFrame => DataFrame = identity) =
    (src, cols, valid)

  /** First-failing-reason error projection, the silver_error_* shape. */
  private def errorModel(name: String, src: String,
      reasons: Seq[(String, org.apache.spark.sql.Column)], key: String) =
    Model(name, Seq(src), IncrementalMerge(Seq(key), EX),
      (_, deps) => {
        val bad = reasons.map(_._2).reduce(_ || _)
        val reason = reasons.reverse
          .foldLeft(lit("Unknown error")) { case (tail, (r, c)) =>
            when(c, r).otherwise(tail)
          }
        deps(src).filter(bad)
          .withColumn("error_logged_at", current_timestamp())
          .withColumn("error_reason", reason)
      })

  def models: Seq[Model] = {
    val silver = Seq(
      Model("dim_customers", Seq("raw_customers"),
        IncrementalMerge(Seq("customer_id"), EX),
        (_, d) => d("raw_customers")
          .filter(col("customer_id").isNotNull && col("email").isNotNull)),
      Model("dim_couriers", Seq("raw_couriers"),
        IncrementalMerge(Seq("courier_id"), "_ab_cdc_updated_at"),
        (_, d) => d("raw_couriers")),
      Model("dim_locations", Seq("raw_locations"),
        IncrementalMerge(Seq("location_id"), EX),
        (_, d) => d("raw_locations")),
      Model("dim_products", Seq("raw_products"),
        IncrementalMerge(Seq("product_id"), EX),
        (_, d) => d("raw_products")),
      Model("dim_sellers", Seq("raw_sellers"),
        IncrementalMerge(Seq("seller_id"), EX),
        (_, d) => d("raw_sellers")),
      Model("fact_orders", Seq("raw_orders"),
        IncrementalMerge(Seq("order_id"), EX),
        (_, d) => d("raw_orders")
          .filter(col("order_id").isNotNull && col("order_date").isNotNull &&
            col("customer_id").isNotNull && col("product_id").isNotNull)),
      Model("fact_inventory", Seq("raw_inventory"),
        IncrementalMerge(Seq("id"), EX),
        (_, d) => d("raw_inventory")
          .filter(col("id").isNotNull && col("product_id").isNotNull &&
            col("seller_id").isNotNull && col("stock").isNotNull &&
            col("stock") > 20 && col("stock") <= 5000)),
      errorModel("silver_error_customers", "raw_customers", Seq(
        "Missing CUSTOMER_ID" -> col("customer_id").isNull,
        "Missing EMAIL" -> col("email").isNull), "customer_id"),
      errorModel("silver_error_orders", "raw_orders", Seq(
        "Missing ORDER_ID" -> col("order_id").isNull,
        "Missing ORDER_DATE" -> col("order_date").isNull,
        "Missing CUSTOMER_ID" -> col("customer_id").isNull,
        "Missing PRODUCT_ID" -> col("product_id").isNull), "order_id"),
      errorModel("silver_error_inventory", "raw_inventory", Seq(
        "Missing ID" -> col("id").isNull,
        "Missing PRODUCT_ID" -> col("product_id").isNull,
        "Missing SELLER_ID" -> col("seller_id").isNull,
        "Invalid STOCK" -> (col("stock").isNull ||
          col("stock") <= 20 || col("stock") > 5000)), "id"))

    // dbt snapshot: SCD2 over the raw customer changelog
    val snapshot = Model("scd_customers", Seq("raw_customers"), Table,
      (_, d) => Upsert.scd2FromChangelog(
        d("raw_customers")
          .filter(col("customer_id").isNotNull && col("email").isNotNull),
        keys = Seq("customer_id"),
        order = Seq(col(EX)),
        tracked = Seq("name", "email", "city", "state", "customer_segment")))

    // gold views over silver + the fact_shipments source
    def sv(d: Map[String, DataFrame]) = Silver(
      shipments = d("fact_shipments"), orders = d("fact_orders"),
      inventory = d("fact_inventory"), customers = d("dim_customers"),
      couriers = d("dim_couriers"), locations = d("dim_locations"),
      products = d("dim_products"), sellers = d("dim_sellers"),
      control = null)
    val goldDeps = Seq("fact_shipments", "fact_orders", "fact_inventory",
      "dim_customers", "dim_couriers", "dim_locations", "dim_products",
      "dim_sellers")
    val gold = Seq(
      Model("delivery_performance_by_courier", goldDeps, View,
        (_, d) => GoldModels.deliveryPerformanceByCourier(sv(d))),
      Model("delivery_sla_rootcause", goldDeps, View,
        (_, d) => GoldModels.deliverySlaRootcause(sv(d))),
      Model("seller_performance", goldDeps, View,
        (_, d) => GoldModels.sellerSummary(sv(d))),
      Model("seller_product_profitability", goldDeps, View,
        (_, d) => GoldModels.sellerProductProfitability(sv(d))),
      Model("order_to_delivery_lifecycle", goldDeps, View,
        (_, d) => GoldModels.orderDeliveryLifecycle(sv(d))),
      Model("dm_inventory_status", goldDeps, View,
        (_, d) => GoldModels.dmInventoryStatus(sv(d))),
      Model("dm_order_fulfillment", goldDeps, View,
        (_, d) => GoldModels.dmOrderFulfillment(sv(d))),
      Model("customer_experience_summary", goldDeps, View,
        (_, d) => GoldModels.customerExperienceSimple(sv(d))))

    silver ++ Seq(snapshot) ++ gold
  }
}
