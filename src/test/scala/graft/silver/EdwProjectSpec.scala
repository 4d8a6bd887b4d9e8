package graft.silver

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import graft.runner.ModelRegistry

/** The EDW star DAG through the registry: dims → materialized fact →
  * golds reading the fact table; results equal the standalone contract
  * queries over the same data. */
class EdwProjectSpec extends SparkSpec {
  import spark.implicits._

  test("registry DAG: fact grain = lineitem, golds equal contract queries") {
    val dir = sf("sf0.001")
    val wh = new ModelRegistry.Warehouse(
      Files.createTempDirectory("graft_edw_wh_").toString, spark)
    Seq("customer", "part", "orders", "lineitem").foreach { t =>
      graft.ops.Upsert.overwriteAtomic(Tables(spark, dir, t), s"${wh.root}/$t")
    }

    val res = ModelRegistry.runParallel(spark, wh, EdwProject.models(), "r1",
      auditTable = Some("etl_audit_log"))

    // fact grain: one row per lineitem (deduped dims cannot fan out)
    assert(res("edw_fact_sales").count() ==
      Tables(spark, dir, "lineitem").count())

    // each gold equals its standalone contract query (modulo order)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(sorted(res("edw_gold_customer_sales_agg")) ==
      sorted(graft.SparkEntry.queries("q63_edw_customer_sales_agg")(spark, dir)))
    assert(sorted(res("edw_gold_sales_by_day")) ==
      sorted(graft.SparkEntry.queries("q64_edw_sales_by_day")(spark, dir)))
    assert(sorted(res("edw_gold_product_sales")) ==
      sorted(graft.SparkEntry.queries("q65_edw_product_sales")(spark, dir)))

    // audit hook recorded one row per model
    assert(wh.read("etl_audit_log").count() == EdwProject.models().size)
  }
}
