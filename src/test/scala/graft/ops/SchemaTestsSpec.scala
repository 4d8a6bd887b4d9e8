package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.domain.LogisticsAdapter

/** The reference's declarative dbt data-test suite
  * (`dbt/dbt-project/models/schema.yml:3-107` — not_null / unique /
  * relationships / strict range on STOCK), executed in full against the
  * silver star. One aggregate pass per table (Quality.runChecks), one
  * anti-join per relationship — the 24-test run that takes the
  * reference 30–65 s on Snowflake (BASELINE.md) runs here in seconds
  * inside the suite. */
class SchemaTestsSpec extends SparkSpec {
  import spark.implicits._

  test("full dbt schema-test suite passes on the silver star") {
    val sv = LogisticsAdapter.silver(spark, sf("sf0.001"))
    import Quality._

    def rel(child: DataFrame, ck: String, parent: DataFrame, pk: String,
        name: String): DataFrame =
      relationshipViolations(child, ck, parent, pk)
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"),
          (col("n_violations") === 0).as("passed"))

    val perTable =
      runChecks(sv.customers, Seq(
        notNull("customer_id"), unique(Seq("customer_id")), notNull("email")))
        .unionByName(runChecks(sv.couriers, Seq(
          notNull("courier_id"), unique(Seq("courier_id")), notNull("name"))))
        .unionByName(runChecks(sv.inventory, Seq(
          notNull("id"), unique(Seq("id")), notNull("product_id"),
          notNull("seller_id"), between("stock", 0, 5000))))
        .unionByName(runChecks(sv.locations, Seq(
          notNull("location_id"), unique(Seq("location_id")), notNull("pincode"))))
        .unionByName(runChecks(sv.orders, Seq(
          notNull("order_id"), unique(Seq("order_id")), notNull("customer_id"),
          notNull("product_id"))))
        .unionByName(runChecks(sv.products, Seq(
          notNull("product_id"), unique(Seq("product_id")), notNull("product_name"))))
        .unionByName(runChecks(sv.sellers, Seq(
          notNull("seller_id"), unique(Seq("seller_id")), notNull("seller_name"))))

    val rels = Seq(
      rel(sv.inventory, "product_id", sv.products, "product_id",
        "inventory_product_id_relationship"),
      rel(sv.inventory, "seller_id", sv.sellers, "seller_id",
        "inventory_seller_id_relationship"),
      rel(sv.orders, "customer_id", sv.customers, "customer_id",
        "orders_customer_id_relationship"),
      rel(sv.orders, "product_id", sv.products, "product_id",
        "orders_product_id_relationship")).reduce(_.unionByName(_))

    val all = perTable.unionByName(rels).cache()
    val failed = all.filter(!col("passed"))
      .select("check_name", "n_violations").collect()
    assert(all.count() == 28)
    assert(failed.isEmpty, s"failing checks: ${failed.mkString(", ")}")
  }
}
