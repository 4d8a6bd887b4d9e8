package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import LogisticsSchemas.Silver

/** Deterministic mapping of the driver testdata (TPC-H-ish star, see
  * TESTDATA.md) onto the reference's logistics silver star (SURVEY
  * §1.3), so every gold model (`graft.gold.GoldModels`) runs — and is
  * oracle-checked — on real data, not only on fixture rows.
  *
  * The SAME mapping exists twice in this file: once as Spark
  * DataFrames, once as a DuckDB `WITH` prelude ([[duckPrelude]]) that
  * gold-query oracles prepend. Keep them in lockstep.
  *
  * Mapping (pure column arithmetic, no randomness):
  *  - fact_shipments  = lineitem ⋈ orders (one row per lineitem)
  *  - fact_orders     = orders + min(l_partkey) as the ordered product
  *  - fact_inventory  = per-part stock with seller = min supplying key
  *  - dim_sellers/couriers = supplier; dim_products = part
  *  - dim_customers   = customer; dim_locations = 50 synthetic pincodes
  */
object LogisticsAdapter {

  /** Shared literal "today" for CURRENT_DATE-relative predicates, so
    * results are reproducible and oracle-comparable (data spans
    * 1992-1998). */
  val AS_OF = "1998-08-01"

  def silver(s: SparkSession, dir: String): Silver = {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
    val o = Tables(s, dir, "orders")
    val supp = Tables(s, dir, "supplier")
    val part = Tables(s, dir, "part")
    val cust = Tables(s, dir, "customer")

    val shipments = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .select(
        ($"l_orderkey" * 10 + $"l_linenumber").as("shipment_id"),
        $"l_suppkey".as("carrier_id"),
        concat(lit("CARRIER_"), ($"l_suppkey" % 25).cast("string"))
          .as("carrier_name"),
        concat(lit("city_"), ($"l_partkey" % 50).cast("string"))
          .as("origin_city"),
        (lit(400000) + $"l_partkey" % 50).cast("string").as("origin_pincode"),
        concat(lit("WH_"), ($"l_suppkey" % 10).cast("string")).as("warehouse_id"),
        concat(lit("city_"), ($"l_orderkey" % 40).cast("string"))
          .as("destination_city"),
        (lit(560000) + $"l_orderkey" % 50).cast("string")
          .as("destination_pincode"),
        when($"l_linenumber" % 2 === 0, "Home").otherwise("Office")
          .as("customer_address_type"),
        $"l_orderkey".as("order_id"),
        $"l_suppkey".as("seller_id"),
        when($"l_linenumber" % 2 === 0, "App").otherwise("Web").as("channel"),
        ($"l_extendedprice" * 0.05).as("shipping_cost"),
        ($"l_extendedprice" * 0.01).as("fuel_surcharge"),
        ($"l_extendedprice" * 0.005).as("insurance"),
        when($"l_orderkey" % 2 === 0, $"l_tax" * 100.0).otherwise(0.0)
          .as("cod_fee"),
        when($"l_returnflag" === "R", "RTO")
          .when($"l_linestatus" === "F", "Delivered")
          .otherwise("In Transit").as("status"),
        ($"l_returnflag" === "R").as("rto_flag"),
        ($"l_quantity" > 30).as("delay_flag"),
        datediff($"l_shipdate", $"o_orderdate").as("delivery_tat_days"),
        $"o_orderdate".as("created_at"),
        $"l_shipdate".as("delivered_at"),
        $"o_orderdate".as("status_created_at"),
        $"l_shipdate".as("status_delivered_at"))

    val orders = o
      .join(li.groupBy($"l_orderkey").agg(min($"l_partkey").as("product_id")),
        o("o_orderkey") === li("l_orderkey"))
      .select(
        $"o_orderkey".as("order_id"),
        $"o_orderdate".as("order_date"),
        $"product_id",
        $"o_custkey".as("customer_id"),
        $"o_totalprice".as("total_amount"),
        when($"o_orderkey" % 2 === 0, "COD").otherwise("Prepaid")
          .as("payment_method"))

    val inventory = li.groupBy($"l_partkey")
      .agg(min($"l_suppkey").as("seller_id"), max($"l_shipdate").as("last_updated"))
      .join(part, li("l_partkey") === part("p_partkey"))
      .select(
        $"p_partkey".as("id"),
        ($"p_size" * 10 + 21).as("stock"),
        $"seller_id",
        $"p_partkey".as("product_id"),
        $"last_updated")

    val customers = cust.select(
      $"c_custkey".as("customer_id"),
      $"c_name".as("name"),
      concat($"c_name", lit("@example.com")).as("email"),
      concat(lit("city_"), ($"c_custkey" % 40).cast("string")).as("city"),
      concat(lit("state_"), ($"c_nationkey" % 10).cast("string")).as("state"),
      when($"c_custkey" % 2 === 0, "F").otherwise("M").as("gender"),
      $"c_mktsegment".as("customer_segment"))

    val couriers = supp.select(
      $"s_suppkey".as("courier_id"),
      $"s_name".as("name"),
      concat(lit("support_"), $"s_suppkey".cast("string")).as("support_contact"))

    val locations = s.range(50).select(
      $"id".as("location_id"),
      concat(lit("city_"), ($"id" % 40).cast("string")).as("city"),
      when($"id" % 4 === 0, "North").when($"id" % 4 === 1, "South")
        .when($"id" % 4 === 2, "East").otherwise("West").as("zone"),
      concat(lit("state_"), ($"id" % 10).cast("string")).as("state"),
      (lit(560000) + $"id").cast("string").as("pincode"))

    val products = part.select(
      $"p_partkey".as("product_id"),
      $"p_name".as("product_name"),
      $"p_brand".as("category"),
      $"p_retailprice".as("price"))

    val sellers = supp.select(
      $"s_suppkey".as("seller_id"),
      $"s_name".as("seller_name"),
      concat(lit("GST"), $"s_suppkey".cast("string")).as("gst_number"),
      concat(lit("WH_"), ($"s_suppkey" % 10).cast("string"))
        .as("warehouse_location"))

    // the dbt seed control_table, pivoted to the one config row the
    // customer_experience_summary model consumes
    val control = s.range(1).select(
      lit("1995-01-01 00:00:00").as("last_loaded_at"),
      lit("true").as("enable_delay_metrics"),
      lit("1,3,5,7").as("excluded_ids"),
      lit("50000").as("min_order_amount"),
      lit("true").as("only_registered_customers"),
      lit("North,South").as("region_filter"))

    Silver(shipments, orders, inventory, customers, couriers, locations,
      products, sellers, control)
  }

  /** DuckDB mirror of [[silver]]; gold oracles are
    * `WITH $duckPrelude <gold SQL over these CTEs>`. */
  val duckPrelude: String = """
      fact_shipments AS (
        SELECT l_orderkey*10 + l_linenumber AS shipment_id,
               l_suppkey AS carrier_id,
               'CARRIER_' || CAST(l_suppkey % 25 AS VARCHAR) AS carrier_name,
               'city_' || CAST(l_partkey % 50 AS VARCHAR) AS origin_city,
               CAST(400000 + l_partkey % 50 AS VARCHAR) AS origin_pincode,
               'WH_' || CAST(l_suppkey % 10 AS VARCHAR) AS warehouse_id,
               'city_' || CAST(l_orderkey % 40 AS VARCHAR) AS destination_city,
               CAST(560000 + l_orderkey % 50 AS VARCHAR) AS destination_pincode,
               CASE WHEN l_linenumber % 2 = 0 THEN 'Home' ELSE 'Office' END AS customer_address_type,
               l_orderkey AS order_id,
               l_suppkey AS seller_id,
               CASE WHEN l_linenumber % 2 = 0 THEN 'App' ELSE 'Web' END AS channel,
               l_extendedprice * 0.05 AS shipping_cost,
               l_extendedprice * 0.01 AS fuel_surcharge,
               l_extendedprice * 0.005 AS insurance,
               CASE WHEN l_orderkey % 2 = 0 THEN l_tax * 100.0 ELSE 0.0 END AS cod_fee,
               CASE WHEN l_returnflag = 'R' THEN 'RTO'
                    WHEN l_linestatus = 'F' THEN 'Delivered'
                    ELSE 'In Transit' END AS status,
               l_returnflag = 'R' AS rto_flag,
               l_quantity > 30 AS delay_flag,
               datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS delivery_tat_days,
               o_orderdate AS created_at,
               l_shipdate AS delivered_at,
               o_orderdate AS status_created_at,
               l_shipdate AS status_delivered_at
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      fact_orders AS (
        SELECT o_orderkey AS order_id, o_orderdate AS order_date, product_id,
               o_custkey AS customer_id, o_totalprice AS total_amount,
               CASE WHEN o_orderkey % 2 = 0 THEN 'COD' ELSE 'Prepaid' END AS payment_method
        FROM orders JOIN (SELECT l_orderkey, min(l_partkey) AS product_id
                          FROM lineitem GROUP BY l_orderkey) ON o_orderkey = l_orderkey),
      fact_inventory AS (
        SELECT p_partkey AS id, p_size*10 + 21 AS stock, seller_id,
               p_partkey AS product_id, last_updated
        FROM part JOIN (SELECT l_partkey, min(l_suppkey) AS seller_id,
                               max(l_shipdate) AS last_updated
                        FROM lineitem GROUP BY l_partkey) ON l_partkey = p_partkey),
      dim_customers AS (
        SELECT c_custkey AS customer_id, c_name AS name,
               c_name || '@example.com' AS email,
               'city_' || CAST(c_custkey % 40 AS VARCHAR) AS city,
               'state_' || CAST(c_nationkey % 10 AS VARCHAR) AS state,
               CASE WHEN c_custkey % 2 = 0 THEN 'F' ELSE 'M' END AS gender,
               c_mktsegment AS customer_segment
        FROM customer),
      dim_couriers AS (
        SELECT s_suppkey AS courier_id, s_name AS name,
               'support_' || CAST(s_suppkey AS VARCHAR) AS support_contact
        FROM supplier),
      dim_locations AS (
        SELECT i AS location_id,
               'city_' || CAST(i % 40 AS VARCHAR) AS city,
               CASE WHEN i % 4 = 0 THEN 'North' WHEN i % 4 = 1 THEN 'South'
                    WHEN i % 4 = 2 THEN 'East' ELSE 'West' END AS zone,
               'state_' || CAST(i % 10 AS VARCHAR) AS state,
               CAST(560000 + i AS VARCHAR) AS pincode
        FROM range(0, 50) t(i)),
      dim_products AS (
        SELECT p_partkey AS product_id, p_name AS product_name,
               p_brand AS category, p_retailprice AS price
        FROM part),
      dim_sellers AS (
        SELECT s_suppkey AS seller_id, s_name AS seller_name,
               'GST' || CAST(s_suppkey AS VARCHAR) AS gst_number,
               'WH_' || CAST(s_suppkey % 10 AS VARCHAR) AS warehouse_location
        FROM supplier),
      control_values AS (
        SELECT '1995-01-01 00:00:00' AS last_loaded_at,
               'true' AS enable_delay_metrics,
               '1,3,5,7' AS excluded_ids,
               '50000' AS min_order_amount,
               'true' AS only_registered_customers,
               'North,South' AS region_filter)"""
}
