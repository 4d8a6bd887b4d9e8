package graft.silver

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.domain.LogisticsSchemas
import graft.ops.Upsert

/** The reference's flagship flow (`dags/2_logistics-shipment-dag.py`):
  * staged shipment JSON → flatten the nested VARIANT (route/carrier/
  * charges/shipment_details) → derive status_created_at /
  * status_delivered_at from the status_tracking array (LATERAL
  * FLATTEN + QUALIFY, lines 103-121) → dedupe latest per business key
  * (149-160) → MERGE into silver.fact_shipments (163-205).
  *
  * One pass, fully declarative: the array derivation uses
  * `filter`+`array_max` over the exploded-free array (no join back,
  * unlike the reference's two LEFT JOINs to flattened CTEs — same
  * result, one less shuffle).
  */
object ShipmentPipeline {

  /** Bronze: parse a raw JSON-string column with the declared schema
    * (schema-on-read; `COPY INTO` lands the string, the silver query
    * applies paths + casts). */
  def parseBronze(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.select(from_json(col(jsonCol), LogisticsSchemas.shipmentJson).as("j"))
      .filter(col("j").isNotNull)

  /** Silver projection: the exact column set of FACT_SHIPMENTS
    * (`dags/2_logistics-shipment-dag.py:125-146`), incl. the
    * status-array timestamps. */
  def flatten(bronze: DataFrame): DataFrame = {
    def statusTs(status: String) = array_max(filter(
      col("j.shipment_details.status_tracking"),
      e => e.getField("status") === status))
      .getField("timestamp").cast("timestamp")
    bronze.select(
      col("j.shipment_id").as("shipment_id"),
      col("j.carrier.carrier_id").as("carrier_id"),
      col("j.carrier.carrier_name").as("carrier_name"),
      col("j.route.origin.city").as("origin_city"),
      col("j.route.origin.pincode").as("origin_pincode"),
      col("j.route.origin.warehouse_id").as("warehouse_id"),
      col("j.route.destination.city").as("destination_city"),
      col("j.route.destination.pincode").as("destination_pincode"),
      col("j.route.destination.customer_address_type").as("customer_address_type"),
      col("j.order_reference.order_id").as("order_id"),
      col("j.order_reference.seller_id").as("seller_id"),
      col("j.order_reference.channel").as("channel"),
      col("j.charges.shipping_cost").as("shipping_cost"),
      col("j.charges.fuel_surcharge").as("fuel_surcharge"),
      col("j.charges.insurance").as("insurance"),
      col("j.charges.cod_fee").as("cod_fee"),
      col("j.shipment_details.status").as("status"),
      col("j.shipment_details.rto_flag").as("rto_flag"),
      col("j.shipment_details.delay_flag").as("delay_flag"),
      col("j.shipment_details.delivery_tat_days").as("delivery_tat_days"),
      col("j.shipment_details.created_at").cast("timestamp").as("created_at"),
      col("j.shipment_details.delivered_at").cast("timestamp").as("delivered_at"),
      statusTs("Created").as("status_created_at"),
      statusTs("Delivered").as("status_delivered_at"))
  }

  /** Full run: bronze JSON strings → dedupe (latest per
    * (order_id, carrier_id, seller_id) by created_at, W1) → MERGE into
    * the parquet target. Returns the merged table. */
  def run(spark: SparkSession, raw: DataFrame, targetPath: String): DataFrame = {
    val flat = flatten(parseBronze(raw))
    val deduped = Upsert.dedupLatest(flat,
      keys = Seq("order_id", "carrier_id", "seller_id"),
      order = Seq(col("created_at"), col("shipment_id")))
    // crash-recovering read: rolls an interrupted atomic swap forward
    // before deciding the target is empty (see Upsert.readRecovered)
    val target = Upsert.readRecovered(spark, targetPath)
      .getOrElse(deduped.limit(0))
    val merged = Upsert.upsert(target, deduped,
      keys = Seq("order_id", "carrier_id", "seller_id"))
    Upsert.overwriteAtomic(merged, targetPath)
    graft.ops.MetaIO.readParquet(spark, targetPath)
  }
}
