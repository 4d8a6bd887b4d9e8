package graft.silver

import graft.queries.EdwQueries
import graft.runner.ModelRegistry.{Model, Table}

/** The EDW sales-star DAG (`dags/snowflake-EDW-ETL-dag.py`) as registry
  * models, mirroring the reference's task graph: raw sources →
  * DIM_CUSTOMER / DIM_PRODUCT / DIM_DATE → FACT_SALES → the three
  * SALES_GOLD serving tables. The golds read the MATERIALIZED fact, as
  * in the reference — they never re-run the star join. The q51/q63–q65
  * contract queries use the same shape in-session via the shared
  * persisted star (`EdwQueries.star`), so the 4-way base join runs once
  * per session there too.
  *
  * Sources `customer part orders lineitem` are warehouse tables
  * (unregistered deps resolve to warehouse reads).
  */
object EdwProject {

  def models(): Seq[Model] = Seq(
    Model("edw_dim_customer", Seq("customer"), Table,
      (_, d) => EdwQueries.dimCustomerFrom(d("customer"))),
    Model("edw_dim_product", Seq("part"), Table,
      (_, d) => EdwQueries.dimProductFrom(d("part"))),
    Model("edw_dim_date", Seq("orders"), Table,
      (_, d) => EdwQueries.dimDateFrom(d("orders"))),
    Model("edw_fact_sales", Seq("lineitem", "orders", "customer", "part",
        "edw_dim_customer", "edw_dim_date", "edw_dim_product"), Table,
      (_, d) => EdwQueries.factSalesJoin(
        d("lineitem"), d("orders"), d("customer"), d("part"),
        d("edw_dim_customer"), d("edw_dim_date"), d("edw_dim_product"))),
    Model("edw_gold_customer_sales_agg",
      Seq("edw_fact_sales", "edw_dim_customer", "edw_dim_date"), Table,
      (_, d) => EdwQueries.customerSalesAggFrom(
        d("edw_fact_sales"), d("edw_dim_customer"), d("edw_dim_date"))),
    Model("edw_gold_sales_by_day", Seq("edw_fact_sales", "edw_dim_date"), Table,
      (_, d) => EdwQueries.salesByDayFrom(
        d("edw_fact_sales"), d("edw_dim_date"))),
    Model("edw_gold_product_sales", Seq("edw_fact_sales", "edw_dim_product"), Table,
      (_, d) => EdwQueries.productSalesFrom(
        d("edw_fact_sales"), d("edw_dim_product"))))
}
