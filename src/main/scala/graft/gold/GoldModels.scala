package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.domain.LogisticsSchemas.Silver

/** The reference's gold layer — every analytic view/model, re-expressed
  * as Spark transforms over the silver star. Sources:
  *  - 10 SQL views in `dags/logistics-gold-metrics-sql.py:24-197`
  *  - 8 dbt models under `dbt/dbt-project/models/gold/` (all .sql)
  * (the two sets overlap; distinct semantics are all here).
  *
  * As-written semantics preserved bit-for-bit (SURVEY §7 risk list):
  * fan-out joins feeding AVG/COUNT(*) (seller_summary), the
  * `p.PRODUCT_ID = s.SELLER_ID` join quirk (dm_order_fulfillment),
  * CASE branch order in root-cause bucketing, ROUND to 2 dp.
  *
  * Scale notes: every dim join here broadcasts (dims are small by
  * construction); fact⋈fact joins (orders⋈shipments on order_id)
  * shuffle on the key and are AQE-planned. Money aggregates run
  * through an exact DECIMAL(18,6) channel so results are identical on
  * any partitioning/summation order — required for the oracle gate and
  * the right call at 1000 executors too.
  */
object GoldModels {

  private val D = "decimal(18,6)"
  /** exact decimal sum of a double money column, surfaced as double */
  private def dsum(c: Column): Column = sum(c.cast(D)).cast("double")
  /** ROUND(x, n): floor-based half-up on the deterministic double —
    * `floor(x·10ⁿ + 0.5)/10ⁿ`. Spark's `round(double)` rounds the
    * SHORTEST DECIMAL REPR (BigDecimal.valueOf) while DuckDB rounds the
    * binary value, so they disagree whenever the repr is a tie
    * (x.xx5 — common for money derived via *0.005). This formulation is
    * pure IEEE arithmetic, bit-identical on any engine. */
  private def r(c: Column, n: Int): Column = {
    val p = math.pow(10.0, n)
    floor(c * p + 0.5).cast("double") / p
  }
  private def pct(num: Column, den: Column): Column =
    num.cast("double") * 100.0 / den.cast("double")

  /** gold.shipment_delay_summary (`logistics-gold-metrics-sql.py:24-35`):
    * last-30-days delay rates by courier × destination. */
  def shipmentDelaySummary(sv: Silver, asOf: Column): DataFrame =
    sv.shipments
      .filter(col("status_created_at") >= date_sub(asOf, 30))
      .groupBy(col("carrier_name").as("courier_name"),
        col("destination_city").as("delivery_zone"))
      .agg(
        count(lit(1)).as("total_shipments"),
        avg(datediff(col("status_delivered_at"), col("status_created_at")))
          .as("avg_delivery_days"),
        sum(when(col("delay_flag"), 1).otherwise(0)).as("delayed_shipments"))
      .withColumn("delay_rate_pct",
        r(pct(col("delayed_shipments"), col("total_shipments")), 2))

  /** gold.seller_performance (`logistics-gold-metrics-sql.py:43-56`). */
  def sellerRtoPerformance(sv: Silver): DataFrame =
    sv.shipments.join(broadcast(sv.sellers), Seq("seller_id"))
      .groupBy(col("seller_id"), col("seller_name"))
      .agg(
        count(lit(1)).as("total_orders"),
        r(avg(col("delivery_tat_days")), 2).as("avg_tat"),
        sum(when(col("rto_flag"), 1).otherwise(0)).as("rto_orders"),
        dsum(col("shipping_cost")).as("__ship"))
      .withColumn("rto_pct", r(pct(col("rto_orders"), col("total_orders")), 2))
      .withColumn("total_shipping_cost", r(col("__ship"), 2))
      .drop("__ship")

  /** gold.courier_sla_breach (`logistics-gold-metrics-sql.py:63-75`). */
  def courierSlaBreach(sv: Silver): DataFrame =
    sv.shipments.join(broadcast(sv.couriers),
        col("carrier_id") === col("courier_id"))
      .groupBy(col("name").as("courier_name"))
      .agg(
        count(lit(1)).as("total_shipments"),
        sum(when(col("delay_flag"), 1).otherwise(0)).as("sla_breaches"))
      .withColumn("breach_pct",
        r(pct(col("sla_breaches"), col("total_shipments")), 2))

  /** gold.delivery_performance_summary / dbt
    * delivery_performance_by_courier (golden unit test #1;
    * `dbt/.../delivery_performance_by_courier.sql:7-13` — the courier
    * join is a pure existence fan-in, metrics group on the fact's own
    * carrier_name; delay pct is the `calculate_delay_percentage`
    * macro, un-rounded). */
  def deliveryPerformanceByCourier(sv: Silver): DataFrame =
    sv.shipments.join(broadcast(sv.couriers),
        col("carrier_id") === col("courier_id"))
      .groupBy(col("carrier_name"))
      .agg(
        count(lit(1)).as("total_shipments"),
        avg(col("delivery_tat_days")).as("avg_delivery_days"),
        (sum(when(col("delay_flag"), 1).otherwise(0)) * 100.0 /
          count(lit(1))).as("delay_percentage"))

  /** gold.inventory_order_summary (`logistics-gold-metrics-sql.py:96-110`):
    * stock vs orders in the last 30 days (left join with range
    * predicate in the join condition — J3). */
  def inventoryOrderSummary(sv: Silver, asOf: Column): DataFrame =
    sv.inventory.as("i")
      .join(sv.orders.as("o"),
        col("i.product_id") === col("o.product_id") &&
          col("o.order_date") >= date_sub(asOf, 30), "left")
      .join(broadcast(sv.products).as("p"),
        col("i.product_id") === col("p.product_id"))
      .groupBy(col("i.product_id").as("product_id"), col("p.product_name"),
        col("i.stock"))
      .agg(count(col("o.order_id")).as("orders_last_30_days"))

  /** gold.shipment_cost_summary (`logistics-gold-metrics-sql.py:115-126`). */
  def shipmentCostSummary(sv: Silver): DataFrame = {
    val n = count(lit(1)).cast("double")
    sv.shipments
      .groupBy(col("carrier_name"))
      .agg(
        r(dsum(col("shipping_cost")) / n, 2).as("avg_shipping_cost"),
        r(dsum(col("fuel_surcharge")) / n, 2).as("avg_fuel_surcharge"),
        r(dsum(col("insurance")) / n, 2).as("avg_insurance"),
        r(dsum(col("cod_fee")) / n, 2).as("avg_cod_fee"))
  }

  /** gold.order_delivery_lifecycle (`logistics-gold-metrics-sql.py:131-146`,
    * dbt `order_to_delivery_lifecycle.sql`). */
  def orderDeliveryLifecycle(sv: Silver): DataFrame =
    sv.orders.as("o")
      .join(sv.shipments.as("s"), col("o.order_id") === col("s.order_id"))
      .filter(col("s.status") === "Delivered")
      .select(
        col("o.order_id"),
        col("o.order_date"),
        col("s.created_at").as("shipment_created_at"),
        col("s.delivered_at"),
        datediff(col("s.created_at"), col("o.order_date"))
          .as("order_to_shipment_days"),
        datediff(col("s.delivered_at"), col("s.created_at"))
          .as("shipment_to_delivery_days"),
        datediff(col("s.delivered_at"), col("o.order_date"))
          .as("total_fulfillment_days"))

  /** gold.seller_summary (`logistics-gold-metrics-sql.py:150-166`) ≙ dbt
    * seller_performance (golden unit test #3): the 4-way fan-out join
    * compensated by COUNT(DISTINCT) — A7 semantics kept exactly. */
  def sellerSummary(sv: Silver): DataFrame =
    sv.orders.as("o")
      .join(sv.shipments.as("shp"), col("o.order_id") === col("shp.order_id"))
      .join(sv.inventory.as("i"), col("o.product_id") === col("i.product_id"))
      .join(broadcast(sv.sellers).as("sel"),
        col("i.seller_id") === col("sel.seller_id"))
      .groupBy(col("i.seller_id").as("seller_id"), col("sel.seller_name"))
      .agg(
        countDistinct(col("o.order_id")).as("total_orders"),
        countDistinct(col("shp.shipment_id")).as("total_shipments"),
        avg(col("shp.delivery_tat_days")).as("avg_delivery_time"),
        (sum(when(col("shp.rto_flag"), 1).otherwise(0)) * 100.0 /
          count(lit(1))).as("rto_percentage"))

  /** gold.customer_experience_summary, SQL-DAG version
    * (`logistics-gold-metrics-sql.py:170-183`). */
  def customerExperienceSimple(sv: Silver): DataFrame =
    sv.orders.as("o")
      .join(sv.shipments.as("shp"), col("o.order_id") === col("shp.order_id"))
      .join(sv.customers.as("cust"),
        col("o.customer_id") === col("cust.customer_id"))
      .groupBy(col("cust.customer_id").as("customer_id"))
      .agg(
        countDistinct(col("o.order_id")).as("orders_count"),
        sum(when(col("shp.delay_flag"), 1).otherwise(0)).as("delayed_shipments"),
        r(avg(datediff(col("shp.delivered_at"), col("o.order_date"))), 2)
          .as("avg_delivery_time"))

  /** gold.geo_delivery_summary (`logistics-gold-metrics-sql.py:187-197`). */
  def geoDeliverySummary(sv: Silver): DataFrame =
    sv.shipments.as("s")
      .join(broadcast(sv.locations).as("l"),
        col("s.destination_pincode") === col("l.pincode"))
      .groupBy(col("s.destination_pincode").as("destination_pincode"),
        col("l.city"))
      .agg(
        count(lit(1)).as("shipment_count"),
        r(avg(col("s.delivery_tat_days")), 2).as("avg_delivery_days"),
        (sum(when(col("s.delay_flag"), 1).otherwise(0)) * 100.0 /
          count(lit(1))).as("delay_rate"))

  /** dbt delivery_sla_rootcause (golden unit test #2;
    * `dbt/.../delivery_sla_rootcause.sql`): delivered shipments joined
    * back to orders, lag decomposition, root-cause CASE (branch order
    * load-bearing), dim left-joins, grouped SLA rates. */
  def deliverySlaRootcause(sv: Silver): DataFrame = {
    val swo = sv.orders.as("o")
      .join(sv.shipments.as("s"), col("o.order_id") === col("s.order_id"))
      .filter(col("s.status") === "Delivered")
      .select(
        col("o.order_id"), col("s.shipment_id"), col("s.seller_id"),
        col("s.carrier_id"), col("s.destination_pincode"),
        col("s.delay_flag"),
        datediff(col("s.created_at"), col("o.order_date"))
          .as("fulfillment_delay_days"),
        datediff(col("s.delivered_at"), col("s.created_at"))
          .as("courier_delay_days"),
        datediff(col("s.delivered_at"), col("o.order_date"))
          .as("total_lag_days"))
    val joined = swo.as("sw")
      .join(broadcast(sv.sellers).as("seller"),
        col("sw.seller_id") === col("seller.seller_id"), "left")
      .join(broadcast(sv.couriers).as("carrier"),
        col("sw.carrier_id") === col("carrier.courier_id"), "left")
      .join(broadcast(sv.locations).as("loc"),
        col("sw.destination_pincode") === col("loc.pincode"), "left")
      .withColumn("root_cause",
        when(col("fulfillment_delay_days") > 1, "Seller")
          .when(col("courier_delay_days") > 2, "Courier")
          .otherwise("Unknown"))
    joined
      .groupBy(col("seller.seller_name"), col("carrier.name").as("carrier_name"),
        col("loc.city").as("destination_city"))
      .agg(
        count(lit(1)).as("total_deliveries"),
        sum(when(col("delay_flag"), 1).otherwise(0)).as("delayed_shipments"),
        r(avg(col("total_lag_days")), 2).as("avg_delivery_time"),
        r(avg(col("fulfillment_delay_days")), 2).as("avg_fulfillment_lag"),
        r(avg(col("courier_delay_days")), 2).as("avg_courier_lag"),
        count(when(col("root_cause") === "Seller", 1)).as("seller_root_causes"),
        count(when(col("root_cause") === "Courier", 1)).as("courier_root_causes"))
      .withColumn("delay_rate_percentage",
        when(col("total_deliveries") > 0,
          r(pct(col("delayed_shipments"), col("total_deliveries")), 2))
          .otherwise(lit(0.0)))

  }

  /** dbt seller_product_profitability (golden unit test #4): revenue /
    * logistics cost / gross profit / margin by seller × product ×
    * region, COALESCE'd cost components, NULLIF margin guard. */
  def sellerProductProfitability(sv: Silver): DataFrame = {
    val z = lit(0).cast(D)
    val logisticsCost =
      coalesce(col("s.shipping_cost").cast(D), z) +
      coalesce(col("s.fuel_surcharge").cast(D), z) +
      coalesce(col("s.cod_fee").cast(D), z) +
      coalesce(col("s.insurance").cast(D), z)
    val orderData = sv.orders.as("o")
      .join(sv.shipments.as("s"), col("o.order_id") === col("s.order_id"))
      .join(sv.inventory.as("inv"),
        col("o.product_id") === col("inv.product_id") &&
          col("s.seller_id") === col("inv.seller_id"), "left")
      .join(broadcast(sv.locations).as("c"),
        col("s.destination_pincode") === col("c.pincode"), "left")
      .join(broadcast(sv.products).as("p"),
        col("o.product_id") === col("p.product_id"), "left")
      .join(broadcast(sv.sellers).as("sel"),
        col("s.seller_id") === col("sel.seller_id"), "left")
      .select(
        col("o.order_id"), col("o.total_amount"),
        col("c.zone").as("region_name"),
        col("p.product_name"), col("p.category"), col("sel.seller_name"),
        logisticsCost.as("logistics_cost"),
        (col("o.total_amount").cast(D) - logisticsCost).as("gross_profit"))
    orderData
      .groupBy(col("seller_name"), col("category"), col("product_name"),
        col("region_name").as("delivery_region"))
      .agg(
        countDistinct(col("order_id")).as("total_orders"),
        r(dsum(col("total_amount")), 2).as("revenue"),
        r(sum(col("logistics_cost")).cast("double"), 2).as("logistics_expense"),
        r(sum(col("gross_profit")).cast("double"), 2).as("gross_profit"),
        (r(sum(col("gross_profit")).cast("double") /
            nullif(sum(col("total_amount").cast(D)).cast("double"), lit(0.0)), 4)
          * 100).as("gross_margin_pct"))
  }

  /** dbt dm_inventory_status: plain projection join. */
  def dmInventoryStatus(sv: Silver): DataFrame =
    sv.inventory.as("i")
      .join(broadcast(sv.products).as("p"),
        col("i.product_id") === col("p.product_id"))
      .join(broadcast(sv.sellers).as("s"),
        col("i.seller_id") === col("s.seller_id"))
      .select(col("i.product_id"), col("p.product_name"), col("i.seller_id"),
        col("s.seller_name"), col("i.stock"), col("i.last_updated"))

  /** dbt dm_order_fulfillment — including the as-written
    * `p.PRODUCT_ID = s.SELLER_ID` cross-domain join (J12, preserved
    * for parity; `dbt/.../dm_order_fulfillment.sql:13`). */
  def dmOrderFulfillment(sv: Silver): DataFrame =
    sv.orders.as("o")
      .join(sv.customers.as("c"),
        col("o.customer_id") === col("c.customer_id"))
      .join(broadcast(sv.products).as("p"),
        col("o.product_id") === col("p.product_id"))
      .join(broadcast(sv.sellers).as("s"),
        col("p.product_id") === col("s.seller_id"))
      .select(col("o.order_id"), col("o.order_date"), col("c.name"),
        col("c.city").as("customer_city"), col("p.product_name"),
        col("s.seller_name"), col("o.total_amount"), col("o.payment_method"))

  /** dbt customer_experience_summary (control-table-driven): excluded
    * customers exploded from the comma-packed config value and
    * anti-joined; timestamp + min-amount thresholds from the same
    * config row (P13/P14). */
  def customerExperienceControlled(sv: Silver): DataFrame = {
    val excluded = sv.control.select(
      explode(split(col("excluded_ids"), ",")).as("x"))
      .select(trim(col("x")).as("excluded_customer_id"))
    val thresholds = broadcast(sv.control.select(
      to_timestamp(col("last_loaded_at")).as("__last_loaded_at"),
      col("min_order_amount").cast("double").as("__min_order_amount")))
    val filtered = sv.orders.as("o")
      .join(broadcast(excluded),
        col("o.customer_id").cast("string") === col("excluded_customer_id"),
        "left_anti")
      .join(sv.customers.as("c"),
        col("o.customer_id") === col("c.customer_id"))
      .crossJoin(thresholds)
      .filter(col("o.order_date") > col("__last_loaded_at") &&
        col("o.total_amount") >= col("__min_order_amount"))
      .select(col("o.order_id"), col("o.customer_id"), col("o.order_date"))
    filtered.as("o")
      .join(sv.shipments.as("s"), col("o.order_id") === col("s.order_id"))
      .groupBy(col("o.customer_id").as("customer_id"))
      .agg(
        countDistinct(col("o.order_id")).as("orders_count"),
        sum(when(col("s.delay_flag"), 1).otherwise(0)).as("delayed_shipments"),
        r(avg(datediff(col("s.delivered_at"), col("o.order_date"))), 2)
          .as("avg_delivery_time"))
  }
}
