package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PartitionedSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned layout prunes; dynamic overwrite replaces only touched partitions") {
    val base = java.nio.file.Files.createTempDirectory("graft_part_").toString
    val path = s"$base/orders"
    val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
      .withColumn("order_year", year($"o_orderdate"))

    Partitioned.writePartitioned(orders, path, Seq("order_year"))
    val all = Partitioned.read(spark, path)
    val years = all.select("order_year").distinct().count()
    assert(years > 1)

    // partition pruning: filtering one year must scan a strict subset
    val oneYear = all.filter($"order_year" === 1997)
    assert(Partitioned.scannedFiles(oneYear) < Partitioned.scannedFiles(all))
    assert(oneYear.count() ==
      orders.filter($"order_year" === 1997).count())

    // dynamic overwrite: rewrite ONLY 1997 with a 1-row batch; other
    // years keep their data
    val batch = Seq((999999L, 1L, "O", 1.0,
        java.sql.Timestamp.valueOf("1997-06-01 00:00:00"), "1-URGENT", 1997))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority", "order_year")
    Partitioned.overwriteDynamic(batch, path, Seq("order_year"))
    val after = Partitioned.read(spark, path)
    assert(after.filter($"order_year" === 1997).count() == 1)
    assert(after.filter($"order_year" =!= 1997).count() ==
      orders.filter($"order_year" =!= 1997).count())
  }
}
