package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Typed schemas of the logistics star (SURVEY §1.3, FIXTURES.md).
  * Silver/gold schemas are fixed & explicit (reference declares every
  * MERGE column list); bronze JSON is schema-on-read via `shipmentJson`.
  * Timestamps carry NTZ semantics: session TZ is pinned to UTC.
  */
object LogisticsSchemas {

  /** bronze shipment JSON object (`dags/2_logistics-shipment-dag.py:100-146`,
    * FIXTURES §5). */
  val shipmentJson: StructType = StructType(Seq(
    StructField("shipment_id", StringType),
    StructField("carrier", StructType(Seq(
      StructField("carrier_id", StringType),
      StructField("carrier_name", StringType)))),
    StructField("route", StructType(Seq(
      StructField("origin", StructType(Seq(
        StructField("city", StringType),
        StructField("pincode", StringType),
        StructField("warehouse_id", StringType)))),
      StructField("destination", StructType(Seq(
        StructField("city", StringType),
        StructField("pincode", StringType),
        StructField("customer_address_type", StringType))))))),
    StructField("order_reference", StructType(Seq(
      StructField("order_id", StringType),
      StructField("seller_id", StringType),
      StructField("channel", StringType)))),
    StructField("charges", StructType(Seq(
      StructField("shipping_cost", DoubleType),
      StructField("fuel_surcharge", DoubleType),
      StructField("insurance", DoubleType),
      StructField("cod_fee", DoubleType)))),
    StructField("shipment_details", StructType(Seq(
      StructField("status", StringType),
      StructField("rto_flag", BooleanType),
      StructField("delay_flag", BooleanType),
      StructField("delivery_tat_days", IntegerType),
      StructField("created_at", StringType),
      StructField("delivered_at", StringType),
      StructField("status_tracking", ArrayType(StructType(Seq(
        StructField("status", StringType),
        StructField("timestamp", StringType))))))))))


  /** silver.FACT_SHIPMENTS (`dags/2_logistics-shipment-dag.py:190-197`). */
  val factShipments: StructType = StructType(Seq(
    StructField("shipment_id", StringType),
    StructField("carrier_id", StringType),
    StructField("carrier_name", StringType),
    StructField("origin_city", StringType),
    StructField("origin_pincode", StringType),
    StructField("warehouse_id", StringType),
    StructField("destination_city", StringType),
    StructField("destination_pincode", StringType),
    StructField("customer_address_type", StringType),
    StructField("order_id", StringType),
    StructField("seller_id", StringType),
    StructField("channel", StringType),
    StructField("shipping_cost", DoubleType),
    StructField("fuel_surcharge", DoubleType),
    StructField("insurance", DoubleType),
    StructField("cod_fee", DoubleType),
    StructField("status", StringType),
    StructField("rto_flag", BooleanType),
    StructField("delay_flag", BooleanType),
    StructField("delivery_tat_days", IntegerType),
    StructField("created_at", TimestampType),
    StructField("delivered_at", TimestampType),
    StructField("status_created_at", TimestampType),
    StructField("status_delivered_at", TimestampType)))

  /** The silver star as a bundle of DataFrames — the input contract of
    * every gold model. */
  final case class Silver(
      shipments: DataFrame,
      orders: DataFrame,
      inventory: DataFrame,
      customers: DataFrame,
      couriers: DataFrame,
      locations: DataFrame,
      products: DataFrame,
      sellers: DataFrame,
      control: DataFrame)
}
