package graft.silver

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.gold.GoldModels
import graft.domain.LogisticsSchemas.Silver

/** Flagship slice end-to-end (SURVEY §7 step 2): raw nested shipment
  * JSON → flatten + status-array timestamps → dedupe → MERGE →
  * gold.shipment_delay_summary. Two runs: the second batch updates one
  * shipment (last-writer-wins) and inserts another. */
class ShipmentPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def shipment(id: String, order: String, created: String,
      delivered: String, delay: Boolean, city: String = "Bangalore"): String =
    s"""{"shipment_id":"$id","carrier":{"carrier_id":"C1","carrier_name":"Delhivery"},
       |"route":{"origin":{"city":"Mumbai","pincode":"400001","warehouse_id":"W1"},
       |"destination":{"city":"$city","pincode":"560001","customer_address_type":"Home"}},
       |"order_reference":{"order_id":"$order","seller_id":"S1","channel":"App"},
       |"charges":{"shipping_cost":50.0,"fuel_surcharge":10.0,"insurance":5.0,"cod_fee":0.0},
       |"shipment_details":{"status":"Delivered","rto_flag":false,"delay_flag":$delay,
       |"delivery_tat_days":3,"created_at":"$created","delivered_at":"$delivered",
       |"status_tracking":[{"status":"Created","timestamp":"$created"},
       |{"status":"Delivered","timestamp":"$delivered"}]}}""".stripMargin
      .replaceAll("\n", "")

  test("bronze JSON -> silver merge -> gold delay summary") {
    val target = java.nio.file.Files
      .createTempDirectory("graft_ship_").toString + "/fact_shipments"

    val batch1 = Seq(
      shipment("SH1", "O1", "2024-01-01 08:00:00", "2024-01-04 10:00:00", delay = true),
      shipment("SH2", "O2", "2024-01-02 08:00:00", "2024-01-03 10:00:00", delay = false),
      // duplicate of O1's key with older created_at -> loses dedup
      shipment("SH0", "O1", "2023-12-31 08:00:00", "2024-01-02 10:00:00", delay = false)
    ).toDF("value")
    val t1 = ShipmentPipeline.run(spark, batch1, target)
    assert(t1.count() == 2)
    val sh1 = t1.filter($"order_id" === "O1")
    assert(sh1.select("shipment_id").as[String].head() == "SH1")
    // status-array timestamps extracted correctly
    assert(sh1.select(date_format($"status_delivered_at", "yyyy-MM-dd HH:mm:ss"))
      .as[String].head() == "2024-01-04 10:00:00")

    // batch 2: newer version of O1 (update), new O3 (insert)
    val batch2 = Seq(
      shipment("SH9", "O1", "2024-02-01 08:00:00", "2024-02-02 10:00:00", delay = false),
      shipment("SH3", "O3", "2024-02-01 09:00:00", "2024-02-05 10:00:00", delay = true)
    ).toDF("value")
    val t2 = ShipmentPipeline.run(spark, batch2, target)
    assert(t2.count() == 3)
    assert(t2.filter($"order_id" === "O1").select("shipment_id")
      .as[String].head() == "SH9")

    // gold over the merged silver (as-of inside the data's window)
    val sv = Silver(t2, null, null, null, null, null, null, null, null)
    val gold = GoldModels.shipmentDelaySummary(sv, lit("2024-02-10").cast("date"))
      .filter($"courier_name" === "Delhivery")
    val row = gold.collect().head
    // only O1(SH9) and O3 fall in the 30-day window; one delayed
    assert(row.getAs[Long]("total_shipments") == 2)
    assert(row.getAs[Long]("delayed_shipments") == 1)
    assert(row.getAs[Double]("delay_rate_pct") == 50.0)
  }
}
