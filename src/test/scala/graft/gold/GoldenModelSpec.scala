package graft.gold

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.domain.LogisticsSchemas.Silver

/** The reference's four dbt unit tests, ported verbatim (fixture rows
  * AND expected rows) from:
  *  - `dbt/dbt-project/tests/test__delivery_performance_by_courier.yml:1-23`
  *  - `dbt/dbt-project/tests/unit_tests/test__delivery_sla_rootcause.yml:1-45`
  *  - `dbt/dbt-project/tests/unit_tests/test__seller_performance.yml:1-27`
  *  - `dbt/dbt-project/tests/unit_tests/test__seller_product_profitability.yml:1-47`
  * These are the richest executable specs of the reference's gold
  * query semantics (SURVEY §5.2).
  */
class GoldenModelSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.types._

  private def df(schema: String, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  private val empty = spark.emptyDataFrame

  private def silver(
      shipments: DataFrame = empty, orders: DataFrame = empty,
      inventory: DataFrame = empty, customers: DataFrame = empty,
      couriers: DataFrame = empty, locations: DataFrame = empty,
      products: DataFrame = empty, sellers: DataFrame = empty): Silver =
    Silver(shipments, orders, inventory, customers, couriers, locations,
      products, sellers, empty)

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(if (s.length == 10) s + " 00:00:00" else s)

  private def assertRows(got: DataFrame, expected: Seq[Map[String, Any]]): Unit = {
    val rows = got.collect()
    assert(rows.length == expected.length,
      s"row count ${rows.length} != ${expected.length}\n${rows.mkString("\n")}")
    val byKey = rows.map(r => r.getValuesMap[Any](got.columns.toIndexedSeq))
    expected.foreach { e =>
      val m = byKey.find(r => e.headOption.forall { case (k, v) => r(k) == v })
      assert(m.isDefined, s"no row matching ${e.headOption}")
      e.foreach { case (k, v) =>
        (v, m.get(k)) match {
          case (d: Double, g: Double) =>
            assert(math.abs(d - g) < 1e-9, s"$k: expected $d got $g")
          case (exp, g) => assert(g == exp, s"$k: expected $exp got $g")
        }
      }
    }
  }

  test("golden: delivery_performance_by_courier") {
    val shipments = df(
      "carrier_id STRING, carrier_name STRING, delivery_tat_days INT, delay_flag BOOLEAN",
      Seq(
        Row("C001", "Delhivery", 2, true),
        Row("C001", "Delhivery", 3, false),
        Row("C002", "BlueDart", 5, true)))
    val couriers = df("courier_id STRING, name STRING",
      Seq(Row("C001", "Delhivery"), Row("C002", "BlueDart")))
    val out = GoldModels.deliveryPerformanceByCourier(
      silver(shipments = shipments, couriers = couriers))
    assertRows(out, Seq(
      Map("carrier_name" -> "Delhivery", "total_shipments" -> 2L,
        "avg_delivery_days" -> 2.5, "delay_percentage" -> 50.0),
      Map("carrier_name" -> "BlueDart", "total_shipments" -> 1L,
        "avg_delivery_days" -> 5.0, "delay_percentage" -> 100.0)))
  }

  test("golden: delivery_sla_rootcause") {
    val orders = df(
      "order_id STRING, order_date TIMESTAMP, product_id STRING, customer_id STRING, total_amount DOUBLE, payment_method STRING",
      Seq(
        Row("O1", ts("2024-01-01"), "P1", "C1", 500.0, "COD"),
        Row("O2", ts("2024-01-02"), "P1", "C2", 700.0, "Prepaid")))
    val shipments = df(
      "shipment_id STRING, order_id STRING, seller_id STRING, carrier_id STRING, channel STRING, " +
        "created_at TIMESTAMP, delivered_at TIMESTAMP, delivery_tat_days INT, delay_flag BOOLEAN, " +
        "rto_flag BOOLEAN, destination_pincode STRING, status STRING",
      Seq(
        Row("S1", "O1", "S001", "C100", "App", ts("2024-01-02"),
          ts("2024-01-05"), 2, true, true, "560001", "Delivered"),
        Row("S2", "O2", "S001", "C100", "Web", ts("2024-01-03"),
          ts("2024-01-04"), 2, false, false, "560001", "Delivered")))
    val sellers = df("seller_id STRING, seller_name STRING",
      Seq(Row("S001", "ShopX")))
    val couriers = df("courier_id STRING, name STRING",
      Seq(Row("C100", "Delhivery")))
    val locations = df("pincode STRING, city STRING",
      Seq(Row("560001", "Bangalore")))
    val out = GoldModels.deliverySlaRootcause(silver(
      shipments = shipments, orders = orders, sellers = sellers,
      couriers = couriers, locations = locations))
    assertRows(out, Seq(Map(
      "seller_name" -> "ShopX", "carrier_name" -> "Delhivery",
      "destination_city" -> "Bangalore", "total_deliveries" -> 2L,
      "delayed_shipments" -> 1L, "avg_delivery_time" -> 3.0,
      "avg_fulfillment_lag" -> 1.0, "avg_courier_lag" -> 2.0,
      "seller_root_causes" -> 0L, "courier_root_causes" -> 1L,
      "delay_rate_percentage" -> 50.0)))
  }

  test("golden: seller_performance (seller_summary)") {
    val orders = df("order_id STRING, product_id STRING",
      Seq(Row("O1", "P1"), Row("O2", "P1")))
    val shipments = df(
      "shipment_id STRING, order_id STRING, delivery_tat_days INT, rto_flag BOOLEAN",
      Seq(Row("S1", "O1", 2, true), Row("S2", "O2", 3, false)))
    val inventory = df("product_id STRING, seller_id STRING",
      Seq(Row("P1", "S001")))
    val sellers = df("seller_id STRING, seller_name STRING",
      Seq(Row("S001", "ShopX")))
    val out = GoldModels.sellerSummary(silver(
      shipments = shipments, orders = orders, inventory = inventory,
      sellers = sellers))
    assertRows(out, Seq(Map(
      "seller_id" -> "S001", "seller_name" -> "ShopX",
      "total_orders" -> 2L, "total_shipments" -> 2L,
      "avg_delivery_time" -> 2.5, "rto_percentage" -> 50.0)))
  }

  test("golden: seller_product_profitability") {
    val orders = df(
      "order_id STRING, order_date TIMESTAMP, product_id STRING, customer_id STRING, total_amount DOUBLE, payment_method STRING",
      Seq(
        Row("O1", ts("2024-06-01"), "P1", "C1", 1000.0, "COD"),
        Row("O2", ts("2024-06-02"), "P1", "C2", 500.0, "Prepaid")))
    val shipments = df(
      "shipment_id STRING, order_id STRING, seller_id STRING, carrier_id STRING, channel STRING, " +
        "shipping_cost DOUBLE, fuel_surcharge DOUBLE, cod_fee DOUBLE, insurance DOUBLE, " +
        "delay_flag BOOLEAN, rto_flag BOOLEAN, delivery_tat_days INT, delivered_at TIMESTAMP, " +
        "destination_pincode STRING, status STRING",
      Seq(
        Row("S1", "O1", "S001", "C001", "Web", 50.0, 20.0, 10.0, 5.0,
          false, false, 2, ts("2024-06-04"), "560001", "Delivered"),
        Row("S2", "O2", "S001", "C001", "App", 30.0, 10.0, 0.0, 5.0,
          false, false, 2, ts("2024-06-03"), "560001", "Delivered")))
    val inventory = df(
      "id INT, product_id STRING, seller_id STRING, stock INT, last_updated TIMESTAMP",
      Seq(Row(1, "P1", "S001", 50, ts("2024-06-01"))))
    val sellers = df("seller_id STRING, seller_name STRING",
      Seq(Row("S001", "MegaStore")))
    val products = df("product_id STRING, product_name STRING, category STRING",
      Seq(Row("P1", "Smartwatch", "Electronics")))
    val locations = df("pincode STRING, city STRING, state STRING, zone STRING",
      Seq(Row("560001", "Bangalore", "Karnataka", "South")))
    val out = GoldModels.sellerProductProfitability(silver(
      shipments = shipments, orders = orders, inventory = inventory,
      sellers = sellers, products = products, locations = locations))
    assertRows(out, Seq(Map(
      "seller_name" -> "MegaStore", "category" -> "Electronics",
      "product_name" -> "Smartwatch", "delivery_region" -> "South",
      "total_orders" -> 2L, "revenue" -> 1500.0,
      "logistics_expense" -> 130.0, "gross_profit" -> 1370.0,
      "gross_margin_pct" -> 91.33)))
  }
}
