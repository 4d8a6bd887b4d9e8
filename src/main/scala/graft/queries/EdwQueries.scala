package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The EDW sales-star pipeline (`dags/snowflake-EDW-ETL-dag.py`):
  * TRY_CAST positional validation (P3/P4/P5), DIM_DATE derivation with
  * QUALIFY-dedup (W2 + §2.10 date/string functions), and the
  * surrogate-key FACT_SALES build (J11, NULLIF, line-total
  * arithmetic). Stage strings are simulated by stringifying testdata
  * columns (with deterministically injected junk) so the TRY_CAST path
  * is genuinely exercised.
  */
object EdwQueries extends QueryPack {

  /** P3: TRY_CAST validation of string-typed stage columns with the
    * EDW view's predicate shape (`snowflake-EDW-ETL-dag.py:74-96`);
    * rows with junk in numeric/date fields fall out as NULLs and fail
    * validation. Aggregated to a compact validity census. */
  val q49 = Q(
    "q49_edw_try_cast_validation",
    (s, dir) => {
      import s.implicits._
      val staged = Tables(s, dir, "lineitem").select(
        $"l_orderkey".cast("string").as("c1"),
        when($"l_orderkey" % 97 === 0, "NaN-line")
          .otherwise($"l_linenumber".cast("string")).as("c2"),
        when($"l_orderkey" % 89 === 0, "not-a-date")
          .otherwise(date_format($"l_shipdate", "yyyy-MM-dd")).as("c3"),
        $"l_quantity".cast("string").as("c7"),
        when($"l_orderkey" % 83 === 0, "??")
          .otherwise($"l_extendedprice".cast("string")).as("c8"),
        $"l_tax".cast("string").as("c9"))
      staged.select(
          expr("try_cast(c1 AS BIGINT)").as("sales_order_number"),
          expr("try_cast(c2 AS INT)").as("linenumber"),
          expr("try_cast(c3 AS DATE)").as("order_date"),
          expr("try_cast(c7 AS DOUBLE)").as("quantity"),
          expr("try_cast(c8 AS DOUBLE)").as("unitprice"),
          expr("try_cast(c9 AS DOUBLE)").as("tax"))
        .withColumn("is_valid", coalesce(
          $"sales_order_number".isNotNull && $"linenumber".isNotNull &&
            $"order_date".isNotNull && $"quantity" > 0 &&
            $"unitprice" >= 0 && $"tax" > 0, lit(false)))
        .withColumn("error_reason",
          when($"linenumber".isNull, "Invalid LINENUMBER")
            .when($"order_date".isNull, "Invalid ORDER_DATE")
            .when($"unitprice".isNull, "Invalid UNITPRICE")
            .when(!($"tax" > 0), "Invalid TAX")
            .otherwise("ok"))
        .groupBy($"is_valid", $"error_reason")
        .agg(count(lit(1)).as("n_rows"),
          sum($"quantity".cast("decimal(18,6)")).cast("double").as("sum_qty"))
        .orderBy($"is_valid", $"error_reason")
    },
    Some("""
      WITH staged AS (
        SELECT CAST(l_orderkey AS VARCHAR) AS c1,
               CASE WHEN l_orderkey % 97 = 0 THEN 'NaN-line'
                    ELSE CAST(l_linenumber AS VARCHAR) END AS c2,
               CASE WHEN l_orderkey % 89 = 0 THEN 'not-a-date'
                    ELSE strftime(l_shipdate, '%Y-%m-%d') END AS c3,
               CAST(l_quantity AS VARCHAR) AS c7,
               CASE WHEN l_orderkey % 83 = 0 THEN '??'
                    ELSE CAST(l_extendedprice AS VARCHAR) END AS c8,
               CAST(l_tax AS VARCHAR) AS c9
        FROM lineitem),
      casted AS (
        SELECT TRY_CAST(c1 AS BIGINT) AS sales_order_number,
               TRY_CAST(c2 AS INT) AS linenumber,
               TRY_CAST(c3 AS DATE) AS order_date,
               TRY_CAST(c7 AS DOUBLE) AS quantity,
               TRY_CAST(c8 AS DOUBLE) AS unitprice,
               TRY_CAST(c9 AS DOUBLE) AS tax
        FROM staged)
      SELECT COALESCE(sales_order_number IS NOT NULL AND linenumber IS NOT NULL
               AND order_date IS NOT NULL AND quantity > 0
               AND unitprice >= 0 AND tax > 0, FALSE) AS is_valid,
             CASE WHEN linenumber IS NULL THEN 'Invalid LINENUMBER'
                  WHEN order_date IS NULL THEN 'Invalid ORDER_DATE'
                  WHEN unitprice IS NULL THEN 'Invalid UNITPRICE'
                  WHEN NOT COALESCE(tax > 0, FALSE) THEN 'Invalid TAX'
                  ELSE 'ok' END AS error_reason,
             count(*) AS n_rows,
             CAST(CAST(sum(CAST(quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
      FROM casted GROUP BY 1, 2 ORDER BY is_valid, error_reason"""),
    covers = Seq("P3", "P4", "P5", "S6"))

  /** DIM_DATE build (`snowflake-EDW-ETL-dag.py:321-339`): per-date row
    * with yyyymmdd id via TO_CHAR/REPLACE/SUBSTRING, QUALIFY
    * row_number = 1 dedup (W2). */
  val q50 = Q(
    "q50_edw_dim_date",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"order_date").orderBy($"order_date")
      Tables(s, dir, "orders")
        .select($"o_orderdate".cast("date").as("order_date"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select(
          regexp_replace(date_format($"order_date", "yyyy-MM-dd"), "-", "")
            .cast("int").as("order_date_id"),
          $"order_date",
          year($"order_date").as("year"),
          month($"order_date").as("month"),
          dayofmonth($"order_date").as("day"),
          substring(regexp_replace(
            date_format($"order_date", "yyyy-MM-dd"), "-", ""), 1, 6)
            .as("yyyymm"))
        .orderBy($"order_date_id")
    },
    Some("""
      SELECT CAST(replace(strftime(order_date, '%Y-%m-%d'), '-', '') AS INT) AS order_date_id,
             order_date,
             CAST(year(order_date) AS INT) AS year,
             CAST(month(order_date) AS INT) AS month,
             CAST(day(order_date) AS INT) AS day,
             substring(replace(strftime(order_date, '%Y-%m-%d'), '-', ''), 1, 6) AS yyyymm
      FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_date FROM orders)
      ORDER BY order_date_id"""),
    covers = Seq("W2", "F-scalar", "S12"))

  /** FACT_SALES surrogate-key build (`snowflake-EDW-ETL-dag.py:425-471`):
    * processed sales left-join three dims (customer by email, date by
    * order_date, product by item name), NULLIF(-1) guards, line total
    * = qty*price+tax (exact decimal channel). */
  val q51 = Q(
    "q51_edw_fact_sales",
    (s, dir) => {
      import s.implicits._
      val cust = Tables(s, dir, "customer")
      val part = Tables(s, dir, "part")
      val orders = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      val dimCustomer = cust.select($"c_custkey".as("customer_id"),
        concat($"c_name", lit("@example.com")).as("email"))
      val dimProduct = part.select($"p_partkey".as("item_id"),
        $"p_name".as("item_name"))
      val dimDate = orders.select($"o_orderdate".cast("date").as("dd_date"))
        .distinct()
        .select(regexp_replace(date_format($"dd_date", "yyyy-MM-dd"), "-", "")
          .cast("int").as("order_date_id"), $"dd_date")
      val processed = li
        .join(orders, li("l_orderkey") === orders("o_orderkey"))
        .join(cust, orders("o_custkey") === cust("c_custkey"))
        .join(part, li("l_partkey") === part("p_partkey"))
        .select(
          $"l_orderkey".as("sales_order_number"),
          $"l_linenumber".as("linenumber"),
          concat($"c_name", lit("@example.com")).as("email"),
          $"p_name".as("item"),
          $"o_orderdate".cast("date").as("order_date"),
          $"l_quantity".as("quantity"),
          $"l_extendedprice".as("unitprice"),
          $"l_tax".as("tax"))
      processed.as("fs")
        .join(broadcast(dimCustomer).as("dc"), $"dc.email" === $"fs.email", "left")
        .join(broadcast(dimDate).as("dd"), $"fs.order_date" === $"dd.dd_date", "left")
        .join(broadcast(dimProduct).as("dp"), $"dp.item_name" === $"fs.item", "left")
        .select(
          $"fs.sales_order_number",
          $"fs.linenumber",
          nullif($"dc.customer_id", lit(-1L)).as("customer_id"),
          nullif($"dp.item_id", lit(-1L)).as("item_id"),
          nullif($"dd.order_date_id", lit(-1)).as("order_date_id"),
          $"fs.quantity",
          $"fs.unitprice",
          $"fs.tax",
          ($"fs.quantity".cast("decimal(18,6)") *
            $"fs.unitprice".cast("decimal(18,6)") +
            $"fs.tax".cast("decimal(18,6)")).cast("double")
            .as("total_sales_amount"))
        .orderBy($"sales_order_number", $"linenumber")
    },
    Some("""
      WITH dim_customer AS (
        SELECT c_custkey AS customer_id, c_name || '@example.com' AS email
        FROM customer),
      dim_product AS (
        SELECT p_partkey AS item_id, p_name AS item_name FROM part),
      dim_date AS (
        SELECT CAST(replace(strftime(d, '%Y-%m-%d'), '-', '') AS INT) AS order_date_id, d
        FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)),
      processed AS (
        SELECT l_orderkey AS sales_order_number, l_linenumber AS linenumber,
               c_name || '@example.com' AS email, p_name AS item,
               CAST(o_orderdate AS DATE) AS order_date,
               l_quantity AS quantity, l_extendedprice AS unitprice, l_tax AS tax
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN part ON l_partkey = p_partkey)
      SELECT fs.sales_order_number, fs.linenumber,
             NULLIF(dc.customer_id, -1) AS customer_id,
             NULLIF(dp.item_id, -1) AS item_id,
             NULLIF(dd.order_date_id, -1) AS order_date_id,
             fs.quantity, fs.unitprice, fs.tax,
             CAST(CAST(CAST(fs.quantity AS DECIMAL(28,6)) * CAST(fs.unitprice AS DECIMAL(28,6))
                  + CAST(fs.tax AS DECIMAL(28,6)) AS VARCHAR) AS DOUBLE) AS total_sales_amount
      FROM processed fs
      LEFT JOIN dim_customer dc ON dc.email = fs.email
      LEFT JOIN dim_date dd ON fs.order_date = dd.d
      LEFT JOIN dim_product dp ON dp.item_name = fs.item
      ORDER BY fs.sales_order_number, fs.linenumber"""),
    covers = Seq("J11", "J10", "F-scalar", "A4"))

  override def queries: Seq[Q] = Seq(q49, q50, q51)
}
