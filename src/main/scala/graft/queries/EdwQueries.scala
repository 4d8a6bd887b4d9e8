package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The EDW sales-star pipeline (`dags/snowflake-EDW-ETL-dag.py`):
  * TRY_CAST positional validation (P3/P4/P5), DIM_DATE derivation with
  * QUALIFY-dedup (W2 + §2.10 date/string functions), the surrogate-key
  * FACT_SALES build (J11, NULLIF, line-total arithmetic), and the three
  * SALES_GOLD serving aggregates (`:479-533`). Stage strings are
  * simulated by stringifying testdata columns (with deterministically
  * injected junk) so the TRY_CAST path is genuinely exercised.
  */
object EdwQueries extends QueryPack {

  // ---- shared star-schema builders (DIM_CUSTOMER / DIM_PRODUCT /
  // DIM_DATE / FACT_SALES), reused by q51 and the gold aggregates ----

  /** DIM_CUSTOMER (`snowflake-EDW-ETL-dag.py:358-377`): ONE ROW PER
    * EMAIL, like the reference's `GROUP BY FS.EMAIL` + MAX(name) MERGE
    * source — the natural key MUST be unique or every fact join fans
    * out (at sf0.1 duplicate c_names blew the fact to ~10× lineitem).
    * Surrogate id stood in deterministically by min c_custkey. */
  private[graft] def dimCustomerFrom(customer: DataFrame): DataFrame =
    customer
      .select(col("c_custkey"), col("c_name"),
        concat(col("c_name"), lit("@example.com")).as("email"))
      .groupBy(col("email"))
      .agg(min(col("c_custkey")).as("customer_id"),
        max(col("c_name")).as("customer_name"))
      .select(col("customer_id"), col("customer_name"), col("email"))

  private def dimCustomer(s: SparkSession, dir: String): DataFrame =
    dimCustomerFrom(Tables(s, dir, "customer"))

  /** The DIM_PRODUCT ILIKE categorization chain
    * (`snowflake-EDW-ETL-dag.py:385-399`), branch order preserved. */
  private def categoryOf(item: Column): Column =
    when(item.ilike("%Laptop%") || item.ilike("%MacBook%"), "Electronics")
      .when(item.ilike("%Phone%") || item.ilike("%iPhone%") ||
        item.ilike("%Samsung%"), "Mobile Devices")
      .when(item.ilike("%Shoes%") || item.ilike("%Sneakers%"), "Footwear")
      .when(item.ilike("%T-shirt%") || item.ilike("%Jacket%") ||
        item.ilike("%Jeans%"), "Clothing")
      .when(item.ilike("%Refrigerator%") || item.ilike("%Microwave%"),
        "Home Appliances")
      .when(item.ilike("%Table%") || item.ilike("%Chair%"), "Furniture")
      .when(item.ilike("%TV%") || item.ilike("%Television%"), "Entertainment")
      .when(item.ilike("%Headphones%") || item.ilike("%Earbuds%"),
        "Accessories")
      .otherwise("Others")

  /** DIM_PRODUCT (`snowflake-EDW-ETL-dag.py:383-400`): `SELECT
    * DISTINCT ITEM` in the reference — one row per item_name (same
    * uniqueness argument as dimCustomer); min p_partkey as surrogate. */
  private[graft] def dimProductFrom(part: DataFrame): DataFrame =
    part
      .groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("item_id"))
      .select(col("item_id"), col("p_name").as("item_name"),
        categoryOf(col("p_name")).as("category"))

  private def dimProduct(s: SparkSession, dir: String): DataFrame =
    dimProductFrom(Tables(s, dir, "part"))

  /** DIM_DATE (`snowflake-EDW-ETL-dag.py:321-339`) as a reusable
    * builder: one row per distinct order date with the yyyymmdd id. */
  private[graft] def dimDateFrom(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderdate").cast("date").as("order_date"))
      .distinct()
      .select(
        regexp_replace(date_format(col("order_date"), "yyyy-MM-dd"), "-", "")
          .cast("int").as("order_date_id"),
        col("order_date"),
        year(col("order_date")).as("year"),
        month(col("order_date")).as("month"),
        substring(regexp_replace(
          date_format(col("order_date"), "yyyy-MM-dd"), "-", ""), 1, 6)
          .as("yyyymm"))

  private def dimDate(s: SparkSession, dir: String): DataFrame =
    dimDateFrom(Tables(s, dir, "orders"))

  /** FACT_SALES (`snowflake-EDW-ETL-dag.py:425-471`), unsorted: the
    * processed stage rows left-join the three dims on their natural
    * keys, NULLIF(-1) surrogate guards, exact decimal line total.
    * No broadcast hints on customer/product: those "dims" are derived
    * from full base tables and grow with the data (multi-GB at 100×) —
    * AQE broadcasts them only while genuinely small. dim_date is
    * calendar-bounded (~2.4k rows) and stays explicitly broadcast. */
  private[graft] def factSalesFrom(li: DataFrame, orders: DataFrame,
      cust: DataFrame, part: DataFrame): DataFrame =
    factSalesJoin(li, orders, cust, part,
      dimCustomerFrom(cust), dimDateFrom(orders), dimProductFrom(part))

  /** [[factSalesFrom]] with the dims passed in — so callers that hold
    * MATERIALIZED dims (the registry DAG, the shared [[star]]) join
    * against those instead of re-deriving each dim from its base
    * table inside the fact plan. */
  private[graft] def factSalesJoin(li: DataFrame, orders: DataFrame,
      cust: DataFrame, part: DataFrame,
      dimC: DataFrame, dimD: DataFrame, dimP: DataFrame): DataFrame = {
    val processed = li
      .join(orders, li("l_orderkey") === orders("o_orderkey"))
      .join(cust, orders("o_custkey") === cust("c_custkey"))
      .join(part, li("l_partkey") === part("p_partkey"))
      .select(
        col("l_orderkey").as("sales_order_number"),
        col("l_linenumber").as("linenumber"),
        concat(col("c_name"), lit("@example.com")).as("email"),
        col("p_name").as("item"),
        col("o_orderdate").cast("date").as("order_date"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("unitprice"),
        col("l_tax").as("tax"))
    processed.as("fs")
      .join(dimC.as("dc"),
        col("dc.email") === col("fs.email"), "left")
      .join(broadcast(dimD.select(
          col("order_date_id"), col("order_date").as("dd_date"))).as("dd"),
        col("fs.order_date") === col("dd.dd_date"), "left")
      .join(dimP.as("dp"),
        col("dp.item_name") === col("fs.item"), "left")
      .select(
        col("fs.sales_order_number"),
        col("fs.linenumber"),
        nullif(col("dc.customer_id"), lit(-1L)).as("customer_id"),
        nullif(col("dp.item_id"), lit(-1L)).as("item_id"),
        nullif(col("dd.order_date_id"), lit(-1)).as("order_date_id"),
        col("fs.quantity"),
        col("fs.unitprice"),
        col("fs.tax"),
        (col("fs.quantity").cast("decimal(18,6)") *
          col("fs.unitprice").cast("decimal(18,6)") +
          col("fs.tax").cast("decimal(18,6)")).cast("double")
          .as("total_sales_amount"))
  }

  private[graft] def factSales(s: SparkSession, dir: String): DataFrame =
    factSalesFrom(Tables(s, dir, "lineitem"), Tables(s, dir, "orders"),
      Tables(s, dir, "customer"), Tables(s, dir, "part"))

  /** The materialized star: dims + fact, each persisted once. */
  private[graft] final case class Star(dimCustomer: DataFrame,
      dimProduct: DataFrame, dimDate: DataFrame, fact: DataFrame)

  /** Materialize-once EDW star, shared by every contract query that
    * serves from it (q51, q63, q64, q65) — the in-session analog of the
    * reference's materialized FACT_SALES table
    * (`snowflake-EDW-ETL-dag.py:425-533`: the golds read the TABLE, they
    * never re-run the star join; `EdwProject` is the registry form that
    * writes real parquet). Keyed by (session, sf dir); persisted
    * MEMORY_AND_DISK so the 4-way base join runs once per session and
    * every serving aggregate starts from the cached fact — on a cluster
    * the same plan shape reads the bucketed fact table. Entries of
    * stopped sessions are evicted on access so a long-lived JVM running
    * many test sessions doesn't pin dead cached plans. */
  private val starCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Star]()

  private[graft] def star(s: SparkSession, dir: String): Star = {
    starCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    starCache.computeIfAbsent((s, dir), { _ =>
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val dimC = dimCustomer(s, dir).persist(lvl)
      val dimP = dimProduct(s, dir).persist(lvl)
      val dimD = dimDate(s, dir).persist(lvl)
      val fact = factSalesJoin(
        Tables(s, dir, "lineitem"), Tables(s, dir, "orders"),
        Tables(s, dir, "customer"), Tables(s, dir, "part"),
        dimC, dimD, dimP).persist(lvl)
      Star(dimC, dimP, dimD, fact)
    })
  }

  // ---- gold serving aggregates as DataFrame->DataFrame builders,
  // shared by the q63-q65 contract queries and the EdwProject DAG ----

  private[graft] def customerSalesAggFrom(fact: DataFrame, dimC: DataFrame,
      dimD: DataFrame): DataFrame =
    fact.as("f")
      .join(dimC.as("c"), col("f.customer_id") === col("c.customer_id"))
      .join(broadcast(dimD).as("d"),
        col("f.order_date_id") === col("d.order_date_id"))
      .groupBy(col("c.customer_id"), col("c.customer_name"),
        col("d.year"), col("d.month"), col("d.yyyymm"))
      .agg(
        sum(col("f.quantity").cast("decimal(18,6)")).cast("double")
          .as("total_quantity"),
        sum(col("f.total_sales_amount").cast("decimal(28,6)")).cast("double")
          .as("total_revenue"),
        countDistinct(col("d.order_date")).as("active_days"))

  private[graft] def salesByDayFrom(fact: DataFrame, dimD: DataFrame): DataFrame =
    fact.as("fs")
      .join(broadcast(dimD).as("d"),
        col("fs.order_date_id") === col("d.order_date_id"))
      .groupBy(col("d.order_date"))
      .agg(
        sum(col("fs.total_sales_amount").cast("decimal(28,6)")).cast("double")
          .as("total_sales"),
        sum(col("fs.quantity").cast("decimal(18,6)")).cast("double")
          .as("total_units_sold"),
        countDistinct(col("fs.sales_order_number")).as("total_orders"))

  private[graft] def productSalesFrom(fact: DataFrame, dimP: DataFrame): DataFrame =
    fact.as("fs")
      .join(dimP.as("p"), col("fs.item_id") === col("p.item_id"))
      .groupBy(col("p.item_id"), col("p.item_name"), col("p.category"))
      .agg(
        sum(col("fs.quantity").cast("decimal(18,6)")).cast("double")
          .as("units_sold"),
        sum(col("fs.total_sales_amount").cast("decimal(28,6)")).cast("double")
          .as("revenue"),
        countDistinct(col("fs.sales_order_number")).as("order_count"))

  /** Shared oracle CTE block: dims + processed + fact, the DuckDB twin
    * of the builders above. */
  private val oracleStar = """
      dim_customer AS (
        SELECT MIN(c_custkey) AS customer_id, MAX(c_name) AS customer_name,
               c_name || '@example.com' AS email
        FROM customer GROUP BY c_name || '@example.com'),
      dim_product AS (
        SELECT MIN(p_partkey) AS item_id, p_name AS item_name,
          CASE WHEN p_name ILIKE '%Laptop%' OR p_name ILIKE '%MacBook%' THEN 'Electronics'
               WHEN p_name ILIKE '%Phone%' OR p_name ILIKE '%iPhone%' OR p_name ILIKE '%Samsung%' THEN 'Mobile Devices'
               WHEN p_name ILIKE '%Shoes%' OR p_name ILIKE '%Sneakers%' THEN 'Footwear'
               WHEN p_name ILIKE '%T-shirt%' OR p_name ILIKE '%Jacket%' OR p_name ILIKE '%Jeans%' THEN 'Clothing'
               WHEN p_name ILIKE '%Refrigerator%' OR p_name ILIKE '%Microwave%' THEN 'Home Appliances'
               WHEN p_name ILIKE '%Table%' OR p_name ILIKE '%Chair%' THEN 'Furniture'
               WHEN p_name ILIKE '%TV%' OR p_name ILIKE '%Television%' THEN 'Entertainment'
               WHEN p_name ILIKE '%Headphones%' OR p_name ILIKE '%Earbuds%' THEN 'Accessories'
               ELSE 'Others' END AS category
        FROM part GROUP BY p_name),
      dim_date AS (
        SELECT CAST(replace(strftime(d, '%Y-%m-%d'), '-', '') AS INT) AS order_date_id,
               d AS order_date,
               CAST(year(d) AS INT) AS year,
               CAST(month(d) AS INT) AS month,
               substring(replace(strftime(d, '%Y-%m-%d'), '-', ''), 1, 6) AS yyyymm
        FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)),
      processed AS (
        SELECT l_orderkey AS sales_order_number, l_linenumber AS linenumber,
               c_name || '@example.com' AS email, p_name AS item,
               CAST(o_orderdate AS DATE) AS order_date,
               l_quantity AS quantity, l_extendedprice AS unitprice, l_tax AS tax
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN part ON l_partkey = p_partkey),
      fact AS (
        SELECT fs.sales_order_number, fs.linenumber,
               NULLIF(dc.customer_id, -1) AS customer_id,
               NULLIF(dp.item_id, -1) AS item_id,
               NULLIF(dd.order_date_id, -1) AS order_date_id,
               fs.quantity, fs.unitprice, fs.tax,
               CAST(CAST(CAST(fs.quantity AS DECIMAL(28,6)) * CAST(fs.unitprice AS DECIMAL(28,6))
                    + CAST(fs.tax AS DECIMAL(28,6)) AS VARCHAR) AS DOUBLE) AS total_sales_amount
        FROM processed fs
        LEFT JOIN dim_customer dc ON dc.email = fs.email
        LEFT JOIN dim_date dd ON fs.order_date = dd.order_date
        LEFT JOIN dim_product dp ON dp.item_name = fs.item)"""

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
    (s, dir) => star(s, dir).fact
      .orderBy(col("sales_order_number"), col("linenumber")),
    Some(s"""
      WITH $oracleStar
      SELECT * FROM fact
      ORDER BY sales_order_number, linenumber"""),
    covers = Seq("J11", "J10", "F-scalar", "A4"))

  /** FACT_CUSTOMER_SALES_AGG (`snowflake-EDW-ETL-dag.py:482-495`):
    * fact ⋈ dim_customer ⋈ dim_date, grouped to customer × month.
    * Exact decimal channel for the double sums (driver hash gate). */
  val q63 = Q(
    "q63_edw_customer_sales_agg",
    (s, dir) => {
      val st = star(s, dir)
      customerSalesAggFrom(st.fact, st.dimCustomer, st.dimDate)
        .orderBy(col("customer_id"), col("yyyymm"))
    },
    Some(s"""
      WITH $oracleStar
      SELECT c.customer_id, c.customer_name, d.year, d.month, d.yyyymm,
             CAST(CAST(SUM(CAST(f.quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_quantity,
             CAST(CAST(SUM(CAST(f.total_sales_amount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS total_revenue,
             COUNT(DISTINCT d.order_date) AS active_days
      FROM fact f
      JOIN dim_customer c ON f.customer_id = c.customer_id
      JOIN dim_date d ON f.order_date_id = d.order_date_id
      GROUP BY c.customer_id, c.customer_name, d.year, d.month, d.yyyymm
      ORDER BY c.customer_id, d.yyyymm"""),
    covers = Seq("J14", "A1", "A3", "A4"))

  /** sales_summary_by_day (`snowflake-EDW-ETL-dag.py:503-511`). */
  val q64 = Q(
    "q64_edw_sales_by_day",
    (s, dir) => {
      val st = star(s, dir)
      salesByDayFrom(st.fact, st.dimDate).orderBy(col("order_date"))
    },
    Some(s"""
      WITH $oracleStar
      SELECT d.order_date,
             CAST(CAST(SUM(CAST(fs.total_sales_amount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS total_sales,
             CAST(CAST(SUM(CAST(fs.quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_units_sold,
             COUNT(DISTINCT fs.sales_order_number) AS total_orders
      FROM fact fs
      JOIN dim_date d ON fs.order_date_id = d.order_date_id
      GROUP BY d.order_date
      ORDER BY d.order_date"""),
    covers = Seq("J14", "A1", "A3", "A4"))

  /** product_sales_summary (`snowflake-EDW-ETL-dag.py:520-530`):
    * per-product rollup incl. the ILIKE category chain. */
  val q65 = Q(
    "q65_edw_product_sales",
    (s, dir) => {
      val st = star(s, dir)
      productSalesFrom(st.fact, st.dimProduct).orderBy(col("item_id"))
    },
    Some(s"""
      WITH $oracleStar
      SELECT p.item_id, p.item_name, p.category,
             CAST(CAST(SUM(CAST(fs.quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS units_sold,
             CAST(CAST(SUM(CAST(fs.total_sales_amount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
             COUNT(DISTINCT fs.sales_order_number) AS order_count
      FROM fact fs
      JOIN dim_product p ON fs.item_id = p.item_id
      GROUP BY p.item_id, p.item_name, p.category
      ORDER BY p.item_id"""),
    covers = Seq("J14", "A1", "A3", "A4"))

  /** q64's COUNT(DISTINCT sales_order_number) is the one exact
    * high-cardinality distinct the EDW serving layer pays for
    * (expand + full reshuffle of the distinct keys at scale). This twin
    * runs the SAME grouping (month grain, where group cardinality
    * exceeds the sketch size) with BOTH the exact count and the
    * kmv_distinct sketch side by side — the bounded-memory, mergeable,
    * deterministic alternative a 100 TB deployment opts into — and the
    * sketch estimate itself is oracle-checked bit-for-bit (md5-derived
    * hashes, same k-th minimum in DuckDB). Crossover argument: SCALE.md
    * §"Exact vs sketch distincts". */
  val q78 = Q(
    "q78_edw_orders_kmv",
    (s, dir) => {
      import graft.functions.{TextFunctions => T}
      val st = star(s, dir)
      val kmv = udaf(graft.functions.KmvSketch(64))
      st.fact.as("fs")
        .join(broadcast(st.dimDate).as("d"),
          col("fs.order_date_id") === col("d.order_date_id"))
        .select(col("d.yyyymm"), col("fs.sales_order_number"),
          T.hash60(col("fs.sales_order_number").cast("string"), 0).as("hv"))
        .groupBy(col("yyyymm"))
        .agg(
          countDistinct(col("sales_order_number")).as("exact_orders"),
          kmv(col("hv")).as("kmv_orders"))
        .orderBy(col("yyyymm"))
    },
    Some(s"""
      WITH $oracleStar,
      joined AS (
        SELECT d.yyyymm, fs.sales_order_number
        FROM fact fs JOIN dim_date d ON fs.order_date_id = d.order_date_id),
      ex AS (
        SELECT yyyymm, count(DISTINCT sales_order_number) AS exact_orders
        FROM joined GROUP BY yyyymm),
      h AS (
        SELECT DISTINCT yyyymm,
               CAST(('0x'||substr(md5('0|'||CAST(sales_order_number AS VARCHAR)),1,15)) AS BIGINT) AS hv
        FROM joined),
      r AS (
        SELECT yyyymm, hv,
               row_number() OVER (PARTITION BY yyyymm ORDER BY hv) AS rn,
               count(*) OVER (PARTITION BY yyyymm) AS nd
        FROM h),
      est AS (
        SELECT yyyymm,
               CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
                    ELSE 63.0 / (CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE)
                                 / power(2.0, 60)) END AS kmv_orders
        FROM r GROUP BY yyyymm)
      SELECT ex.yyyymm, ex.exact_orders, est.kmv_orders
      FROM ex JOIN est USING (yyyymm)
      ORDER BY yyyymm"""),
    covers = Seq("A-sketch-kmv", "A3"))

  override def queries: Seq[Q] = Seq(q49, q50, q51, q63, q64, q65, q78)
}
