package graft.queries

import org.apache.spark.sql.functions._
import graft.domain.{LogisticsAdapter => LA}
import graft.gold.GoldModels

/** The reference's gold layer, oracle-checked end-to-end: each query
  * materializes the silver star from testdata via [[LA.silver]] and
  * runs one [[GoldModels]] model; the oracle prepends [[LA.duckPrelude]]
  * (the identical mapping in DuckDB SQL) to the reference query shape.
  */
object GoldQueries extends QueryPack {

  private def asOf = lit(LA.AS_OF).cast("date")
  private val W = s"WITH ${LA.duckPrelude}"

  val q34 = Q(
    "q34_gold_shipment_delay_summary",
    (s, dir) => GoldModels.shipmentDelaySummary(LA.silver(s, dir), asOf)
      .orderBy(col("courier_name"), col("delivery_zone")),
    Some(s"""$W
      SELECT carrier_name AS courier_name,
             destination_city AS delivery_zone,
             count(*) AS total_shipments,
             avg(datediff('day', CAST(status_created_at AS DATE),
                 CAST(status_delivered_at AS DATE))) AS avg_delivery_days,
             CAST(sum(CASE WHEN delay_flag THEN 1 ELSE 0 END) AS BIGINT) AS delayed_shipments,
             floor((CAST(sum(CASE WHEN delay_flag THEN 1 ELSE 0 END) AS DOUBLE) * 100.0
                   / CAST(count(*) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS delay_rate_pct
      FROM fact_shipments
      WHERE status_created_at >= DATE '${LA.AS_OF}' - 30
      GROUP BY 1, 2 ORDER BY courier_name, delivery_zone"""),
    covers = Seq("G-shipment_delay_summary", "A1", "A5", "A6", "P10"))

  val q35 = Q(
    "q35_gold_seller_rto",
    (s, dir) => GoldModels.sellerRtoPerformance(LA.silver(s, dir))
      .orderBy(col("seller_id")),
    Some(s"""$W
      SELECT f.seller_id, s.seller_name,
             count(*) AS total_orders,
             floor((avg(f.delivery_tat_days)) * 100.0 + 0.5) / 100.0 AS avg_tat,
             CAST(sum(CASE WHEN f.rto_flag THEN 1 ELSE 0 END) AS BIGINT) AS rto_orders,
             floor((CAST(sum(CASE WHEN f.rto_flag THEN 1 ELSE 0 END) AS DOUBLE) * 100.0
                   / CAST(count(*) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS rto_pct,
             floor((CAST(CAST(sum(CAST(f.shipping_cost AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total_shipping_cost
      FROM fact_shipments f JOIN dim_sellers s ON f.seller_id = s.seller_id
      GROUP BY 1, 2 ORDER BY f.seller_id"""),
    covers = Seq("G-seller_performance", "J1"))

  val q36 = Q(
    "q36_gold_courier_sla_breach",
    (s, dir) => GoldModels.courierSlaBreach(LA.silver(s, dir))
      .orderBy(col("courier_name")),
    Some(s"""$W
      SELECT c.name AS courier_name,
             count(*) AS total_shipments,
             CAST(sum(CASE WHEN f.delay_flag THEN 1 ELSE 0 END) AS BIGINT) AS sla_breaches,
             floor((CAST(sum(CASE WHEN f.delay_flag THEN 1 ELSE 0 END) AS DOUBLE) * 100.0
                   / CAST(count(*) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS breach_pct
      FROM fact_shipments f JOIN dim_couriers c ON f.carrier_id = c.courier_id
      GROUP BY 1 ORDER BY courier_name"""),
    covers = Seq("G-courier_sla_breach", "J2"))

  val q37 = Q(
    "q37_gold_delivery_performance",
    (s, dir) => GoldModels.deliveryPerformanceByCourier(LA.silver(s, dir))
      .orderBy(col("carrier_name")),
    Some(s"""$W
      SELECT f.carrier_name,
             count(*) AS total_shipments,
             avg(f.delivery_tat_days) AS avg_delivery_days,
             sum(CASE WHEN f.delay_flag THEN 1 ELSE 0 END) * 100.0 / count(*) AS delay_percentage
      FROM fact_shipments f JOIN dim_couriers c ON f.carrier_id = c.courier_id
      GROUP BY 1 ORDER BY carrier_name"""),
    covers = Seq("G-delivery_performance_by_courier", "J2", "A6"))

  val q38 = Q(
    "q38_gold_inventory_orders",
    (s, dir) => GoldModels.inventoryOrderSummary(LA.silver(s, dir), asOf)
      .orderBy(col("product_id")),
    Some(s"""$W
      SELECT i.product_id, p.product_name, i.stock,
             count(o.order_id) AS orders_last_30_days
      FROM fact_inventory i
      LEFT JOIN fact_orders o ON i.product_id = o.product_id
        AND o.order_date >= DATE '${LA.AS_OF}' - 30
      JOIN dim_products p ON i.product_id = p.product_id
      GROUP BY 1, 2, 3 ORDER BY i.product_id"""),
    covers = Seq("G-inventory_order_summary", "J3"))

  val q39 = Q(
    "q39_gold_cost_summary",
    (s, dir) => GoldModels.shipmentCostSummary(LA.silver(s, dir))
      .orderBy(col("carrier_name")),
    Some(s"""$W
      SELECT carrier_name,
             floor((CAST(CAST(sum(CAST(shipping_cost AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS avg_shipping_cost,
             floor((CAST(CAST(sum(CAST(fuel_surcharge AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS avg_fuel_surcharge,
             floor((CAST(CAST(sum(CAST(insurance AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS avg_insurance,
             floor((CAST(CAST(sum(CAST(cod_fee AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS avg_cod_fee
      FROM fact_shipments GROUP BY 1 ORDER BY carrier_name"""),
    covers = Seq("G-shipment_cost_summary", "A4"))

  val q40 = Q(
    "q40_gold_lifecycle",
    (s, dir) => GoldModels.orderDeliveryLifecycle(LA.silver(s, dir))
      .orderBy(col("order_id"), col("delivered_at")),
    Some(s"""$W
      SELECT o.order_id, o.order_date,
             s.created_at AS shipment_created_at,
             s.delivered_at,
             datediff('day', CAST(o.order_date AS DATE), CAST(s.created_at AS DATE)) AS order_to_shipment_days,
             datediff('day', CAST(s.created_at AS DATE), CAST(s.delivered_at AS DATE)) AS shipment_to_delivery_days,
             datediff('day', CAST(o.order_date AS DATE), CAST(s.delivered_at AS DATE)) AS total_fulfillment_days
      FROM fact_orders o JOIN fact_shipments s ON o.order_id = s.order_id
      WHERE s.status = 'Delivered'
      ORDER BY o.order_id, s.delivered_at"""),
    covers = Seq("G-order_delivery_lifecycle", "J4"))

  val q41 = Q(
    "q41_gold_seller_summary",
    (s, dir) => GoldModels.sellerSummary(LA.silver(s, dir))
      .orderBy(col("seller_id")),
    Some(s"""$W
      SELECT i.seller_id, sel.seller_name,
             count(DISTINCT o.order_id) AS total_orders,
             count(DISTINCT shp.shipment_id) AS total_shipments,
             avg(shp.delivery_tat_days) AS avg_delivery_time,
             sum(CASE WHEN shp.rto_flag THEN 1 ELSE 0 END) * 100.0 / count(*) AS rto_percentage
      FROM fact_orders o
      JOIN fact_shipments shp ON o.order_id = shp.order_id
      JOIN fact_inventory i ON o.product_id = i.product_id
      JOIN dim_sellers sel ON i.seller_id = sel.seller_id
      GROUP BY 1, 2 ORDER BY i.seller_id"""),
    covers = Seq("G-seller_summary", "J5", "A3", "A7"))

  val q42 = Q(
    "q42_gold_customer_experience",
    (s, dir) => GoldModels.customerExperienceSimple(LA.silver(s, dir))
      .orderBy(col("customer_id")),
    Some(s"""$W
      SELECT cust.customer_id,
             count(DISTINCT o.order_id) AS orders_count,
             CAST(sum(CASE WHEN shp.delay_flag THEN 1 ELSE 0 END) AS BIGINT) AS delayed_shipments,
             floor((avg(datediff('day', CAST(o.order_date AS DATE),
                   CAST(shp.delivered_at AS DATE)))) * 100.0 + 0.5) / 100.0 AS avg_delivery_time
      FROM fact_orders o
      JOIN fact_shipments shp ON o.order_id = shp.order_id
      JOIN dim_customers cust ON o.customer_id = cust.customer_id
      GROUP BY 1 ORDER BY cust.customer_id"""),
    covers = Seq("G-customer_experience_summary", "J6"))

  val q43 = Q(
    "q43_gold_geo_summary",
    (s, dir) => GoldModels.geoDeliverySummary(LA.silver(s, dir))
      .orderBy(col("destination_pincode"), col("city")),
    Some(s"""$W
      SELECT s.destination_pincode, l.city,
             count(*) AS shipment_count,
             floor((avg(s.delivery_tat_days)) * 100.0 + 0.5) / 100.0 AS avg_delivery_days,
             sum(CASE WHEN s.delay_flag THEN 1 ELSE 0 END) * 100.0 / count(*) AS delay_rate
      FROM fact_shipments s JOIN dim_locations l ON s.destination_pincode = l.pincode
      GROUP BY 1, 2 ORDER BY destination_pincode, city"""),
    covers = Seq("G-geo_delivery_summary", "J7"))

  val q44 = Q(
    "q44_gold_sla_rootcause",
    (s, dir) => GoldModels.deliverySlaRootcause(LA.silver(s, dir))
      .orderBy(col("seller_name"), col("carrier_name"), col("destination_city")),
    Some(s"""$W,
      shipments_with_order AS (
        SELECT o.order_id, s.shipment_id, s.seller_id, s.carrier_id,
               s.destination_pincode, s.delay_flag,
               datediff('day', CAST(o.order_date AS DATE), CAST(s.created_at AS DATE)) AS fulfillment_delay_days,
               datediff('day', CAST(s.created_at AS DATE), CAST(s.delivered_at AS DATE)) AS courier_delay_days,
               datediff('day', CAST(o.order_date AS DATE), CAST(s.delivered_at AS DATE)) AS total_lag_days
        FROM fact_orders o JOIN fact_shipments s ON o.order_id = s.order_id
        WHERE s.status = 'Delivered'),
      joined_with_dims AS (
        SELECT sw.*, seller.seller_name, carrier.name AS carrier_name,
               loc.city AS destination_city,
               CASE WHEN sw.fulfillment_delay_days > 1 THEN 'Seller'
                    WHEN sw.courier_delay_days > 2 THEN 'Courier'
                    ELSE 'Unknown' END AS root_cause
        FROM shipments_with_order sw
        LEFT JOIN dim_sellers seller ON sw.seller_id = seller.seller_id
        LEFT JOIN dim_couriers carrier ON sw.carrier_id = carrier.courier_id
        LEFT JOIN dim_locations loc ON sw.destination_pincode = loc.pincode)
      SELECT seller_name, carrier_name, destination_city,
             count(*) AS total_deliveries,
             CAST(sum(CASE WHEN delay_flag THEN 1 ELSE 0 END) AS BIGINT) AS delayed_shipments,
             floor((avg(total_lag_days)) * 100.0 + 0.5) / 100.0 AS avg_delivery_time,
             floor((avg(fulfillment_delay_days)) * 100.0 + 0.5) / 100.0 AS avg_fulfillment_lag,
             floor((avg(courier_delay_days)) * 100.0 + 0.5) / 100.0 AS avg_courier_lag,
             count(CASE WHEN root_cause = 'Seller' THEN 1 END) AS seller_root_causes,
             count(CASE WHEN root_cause = 'Courier' THEN 1 END) AS courier_root_causes,
             CASE WHEN count(*) > 0
                  THEN floor((CAST(sum(CASE WHEN delay_flag THEN 1 ELSE 0 END) AS DOUBLE) * 100.0
                             / CAST(count(*) AS DOUBLE)) * 100.0 + 0.5) / 100.0
                  ELSE 0 END AS delay_rate_percentage
      FROM joined_with_dims
      GROUP BY 1, 2, 3 ORDER BY seller_name, carrier_name, destination_city"""),
    covers = Seq("G-delivery_sla_rootcause", "J4", "J8", "A5"))

  val q45 = Q(
    "q45_gold_profitability",
    (s, dir) => GoldModels.sellerProductProfitability(LA.silver(s, dir))
      .orderBy(col("seller_name"), col("category"), col("product_name"),
        col("delivery_region")),
    Some(s"""$W,
      order_data AS (
        SELECT o.order_id, o.total_amount, c.zone AS region_name,
               p.product_name, p.category, sel.seller_name,
               COALESCE(CAST(s.shipping_cost AS DECIMAL(18,6)), 0) +
               COALESCE(CAST(s.fuel_surcharge AS DECIMAL(18,6)), 0) +
               COALESCE(CAST(s.cod_fee AS DECIMAL(18,6)), 0) +
               COALESCE(CAST(s.insurance AS DECIMAL(18,6)), 0) AS logistics_cost
        FROM fact_orders o
        JOIN fact_shipments s ON o.order_id = s.order_id
        LEFT JOIN fact_inventory inv ON o.product_id = inv.product_id
          AND s.seller_id = inv.seller_id
        LEFT JOIN dim_locations c ON s.destination_pincode = c.pincode
        LEFT JOIN dim_products p ON o.product_id = p.product_id
        LEFT JOIN dim_sellers sel ON s.seller_id = sel.seller_id)
      SELECT seller_name, category, product_name,
             region_name AS delivery_region,
             count(DISTINCT order_id) AS total_orders,
             floor((CAST(CAST(sum(CAST(total_amount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
             floor((CAST(sum(logistics_cost) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS logistics_expense,
             floor((CAST(CAST(sum(CAST(total_amount AS DECIMAL(18,6)) - logistics_cost) AS VARCHAR) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS gross_profit,
             floor((CAST(CAST(sum(CAST(total_amount AS DECIMAL(18,6)) - logistics_cost) AS VARCHAR) AS DOUBLE)
                   / nullif(CAST(CAST(sum(CAST(total_amount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE), 0.0)) * 10000.0 + 0.5) / 10000.0
               * 100 AS gross_margin_pct
      FROM order_data
      GROUP BY 1, 2, 3, 4
      ORDER BY seller_name, category, product_name, delivery_region"""),
    covers = Seq("G-seller_product_profitability", "J4", "A6"))

  val q46 = Q(
    "q46_dm_inventory_status",
    (s, dir) => GoldModels.dmInventoryStatus(LA.silver(s, dir))
      .orderBy(col("product_id")),
    Some(s"""$W
      SELECT i.product_id, p.product_name, i.seller_id, s.seller_name,
             i.stock, i.last_updated
      FROM fact_inventory i
      JOIN dim_products p ON i.product_id = p.product_id
      JOIN dim_sellers s ON i.seller_id = s.seller_id
      ORDER BY i.product_id"""),
    covers = Seq("G-dm_inventory_status", "J11"))

  val q47 = Q(
    "q47_dm_order_fulfillment",
    (s, dir) => GoldModels.dmOrderFulfillment(LA.silver(s, dir))
      .orderBy(col("order_id")),
    Some(s"""$W
      SELECT o.order_id, o.order_date, c.name,
             c.city AS customer_city, p.product_name, s.seller_name,
             o.total_amount, o.payment_method
      FROM fact_orders o
      JOIN dim_customers c ON o.customer_id = c.customer_id
      JOIN dim_products p ON o.product_id = p.product_id
      JOIN dim_sellers s ON p.product_id = s.seller_id
      ORDER BY order_id"""),
    covers = Seq("G-dm_order_fulfillment", "J12"))

  val q48 = Q(
    "q48_gold_customer_experience_controlled",
    (s, dir) => GoldModels.customerExperienceControlled(LA.silver(s, dir))
      .orderBy(col("customer_id")),
    Some(s"""$W,
      excluded_customers AS (
        SELECT trim(x) AS customer_id
        FROM control_values, unnest(string_split(excluded_ids, ',')) t(x)),
      filtered_orders AS (
        SELECT o.order_id, o.customer_id, o.order_date
        FROM fact_orders o
        LEFT JOIN excluded_customers ec
          ON CAST(o.customer_id AS VARCHAR) = ec.customer_id
        JOIN dim_customers c ON o.customer_id = c.customer_id
        WHERE ec.customer_id IS NULL
          AND o.order_date > (SELECT CAST(last_loaded_at AS TIMESTAMP) FROM control_values)
          AND o.total_amount >= (SELECT CAST(min_order_amount AS DOUBLE) FROM control_values))
      SELECT o.customer_id,
             count(DISTINCT o.order_id) AS orders_count,
             CAST(sum(CASE WHEN s.delay_flag THEN 1 ELSE 0 END) AS BIGINT) AS delayed_shipments,
             floor((avg(datediff('day', CAST(o.order_date AS DATE),
                   CAST(s.delivered_at AS DATE)))) * 100.0 + 0.5) / 100.0 AS avg_delivery_time
      FROM filtered_orders o
      JOIN fact_shipments s ON o.order_id = s.order_id
      GROUP BY 1 ORDER BY customer_id"""),
    covers = Seq("G-customer_experience_controlled", "P13", "P14", "J9"))

  override def queries: Seq[Q] = Seq(q34, q35, q36, q37, q38, q39, q40,
    q41, q42, q43, q44, q45, q46, q47, q48)
}
