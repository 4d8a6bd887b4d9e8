package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational core: the SURVEY §2 operator inventory re-expressed over
  * the driver testdata schema (TPC-H-ish). Each query cites the
  * reference operators it reproduces (e.g. A5 = conditional aggregate,
  * `dags/logistics-gold-metrics-sql.py:30-31`).
  *
  * Scale notes (100 TB posture):
  *  - genuinely small dims (region 5 rows, nation 25 rows) are joined
  *    with an explicit `broadcast()`;
  *  - customer/orders/lineitem joins are left to Catalyst + AQE — at
  *    cluster scale they become shuffled hash / sort-merge joins keyed
  *    on the join column, which is the right plan;
  *  - aggregates are hash aggregations with map-side partial
  *    aggregation (free in Spark for all `groupBy().agg()` below).
  */
object Relational extends QueryPack {

  private val D = "decimal(18,6)" // exact channel for double-typed money/qty

  /** A1 A2 A4 A5 A6 P9 O1 — pricing summary in the shape of the gold
    * shipment_delay_summary view (`dags/logistics-gold-metrics-sql.py:24-35`):
    * multi-key group, count, exact sums, avg, conditional agg, pct ratio. */
  val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          count(lit(1)).as("n_rows"),
          sum($"l_quantity".cast(D)).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast(D)).cast("double").as("sum_price"),
          sum(($"l_extendedprice".cast(D) *
            (lit(1).cast("decimal(3,2)") - $"l_discount".cast(D))))
            .cast("double").as("sum_disc_price"),
          sum(when($"l_quantity" > 25, 1).otherwise(0)).cast("long").as("n_big"))
        .withColumn("avg_qty", $"sum_qty" / $"n_rows".cast("double"))
        .withColumn("pct_big",
          $"n_big".cast("double") * lit(100.0) / $"n_rows".cast("double"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             count(*) AS n_rows,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_price,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
             CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
             CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS DOUBLE) * 100.0
               / CAST(count(*) AS DOUBLE) AS pct_big
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    covers = Seq("A1", "A2", "A4", "A5", "A6", "P9", "P10", "O1"))

  /** P1 P3 P6 P7 P10 — projection + rename + range/date filters, the
    * silver validity-filter shape (`dags/snowflake-EDW-ETL-dag.py:90-96`). */
  val q02 = Q(
    "q02_filter_project",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter(
          $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_quantity" > 10 && $"l_quantity" <= 30 &&
          $"l_returnflag" === "R" && $"l_orderkey".isNotNull)
        .select(
          $"l_orderkey".as("orderkey"),
          $"l_linenumber".as("linenumber"),
          $"l_quantity".as("qty"),
          $"l_extendedprice".as("price"),
          $"l_discount".as("disc"))
        .orderBy($"orderkey", $"linenumber")
    },
    Some("""
      SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
             l_quantity AS qty, l_extendedprice AS price, l_discount AS disc
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_quantity > 10 AND l_quantity <= 30
        AND l_returnflag = 'R' AND l_orderkey IS NOT NULL
      ORDER BY orderkey, linenumber"""),
    covers = Seq("P1", "P3", "P6", "P7", "P10"))

  /** J6 A1 A3 A4 — orders ⋈ customer per-segment rollup
    * (`dags/logistics-gold-metrics-sql.py:176-179` shape). */
  val q03 = Q(
    "q03_segment_rollup",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct($"o_custkey").as("n_customers"),
          sum($"o_totalprice".cast(D)).cast("double").as("revenue"))
        .withColumn("avg_order_value",
          $"revenue" / $"n_orders".cast("double"))
        .orderBy($"c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment,
             count(*) AS n_orders,
             count(DISTINCT o_custkey) AS n_customers,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_order_value
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
    covers = Seq("J6", "A1", "A3", "A4"))

  /** J5 J1 J2 — 4-way join chain with broadcast dims (region 5 rows,
    * nation 25 rows), revenue per region (`seller_performance.sql:9-12`
    * chain shape). `broadcast()` is the explicit hint; at 100 TB the two
    * dims stay broadcastable while customer⋈orders shuffles on the key. */
  val q04 = Q(
    "q04_region_revenue",
    (s, dir) => {
      import s.implicits._
      val r = Tables(s, dir, "region")
      val n = Tables(s, dir, "nation")
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name")
        .agg(
          count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast(D)).cast("double").as("revenue"),
          countDistinct($"c_custkey").as("n_customers"))
        .orderBy($"r_name")
    },
    Some("""
      SELECT r_name,
             count(*) AS n_orders,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
             count(DISTINCT c_custkey) AS n_customers
      FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name"""),
    covers = Seq("J5", "J1", "J2", "A1", "A3", "A4"))

  /** J3 — left outer join with an extra range predicate in the join
    * condition (`dags/logistics-gold-metrics-sql.py:102-106`): inventory
    * LEFT JOIN recent orders ≙ part LEFT JOIN recent lineitems. */
  val q05 = Q(
    "q05_left_range_join",
    (s, dir) => {
      import s.implicits._
      val p = Tables(s, dir, "part")
      val l = Tables(s, dir, "lineitem")
      p.join(l,
          p("p_partkey") === l("l_partkey") &&
          l("l_shipdate") >= lit("2001-01-01").cast("timestamp"),
          "left")
        .groupBy($"p_brand")
        .agg(
          count($"l_orderkey").as("n_recent_lines"),
          count(lit(1)).as("n_rows"),
          sum(coalesce($"l_quantity".cast(D), lit(0).cast(D)))
            .cast("double").as("recent_qty"))
        .orderBy($"p_brand")
    },
    Some("""
      SELECT p_brand,
             count(l_orderkey) AS n_recent_lines,
             count(*) AS n_rows,
             CAST(CAST(sum(COALESCE(CAST(l_quantity AS DECIMAL(18,6)),
                               CAST(0 AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE) AS recent_qty
      FROM part LEFT JOIN lineitem
        ON p_partkey = l_partkey
       AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
      GROUP BY p_brand
      ORDER BY p_brand"""),
    covers = Seq("J3", "A2"))

  /** W1 W2 — the load-bearing dedup pattern of the reference
    * (`dags/2_logistics-shipment-dag.py:149-160`): latest row per key via
    * row_number over (partition by key order by ts desc), rn = 1. */
  val q06 = Q(
    "q06_latest_event_per_user",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"event_id".desc)
      Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id", $"event_type", $"value")
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, event_id, event_type, value
      FROM (SELECT *, row_number() OVER
              (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
      ORDER BY user_id"""),
    covers = Seq("W1", "W2"))

  /** J9 P13 — exclusion anti-join
    * (`dbt/.../customer_experience_summary.sql:28-30`): customers with
    * no URGENT order, as a true left_anti join. */
  val q07 = Q(
    "q07_anti_join",
    (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer")
      val urgent = Tables(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment", $"c_acctbal")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment, c_acctbal
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""),
    covers = Seq("J9", "P13", "P9"))

  /** Semi join (EXISTS) — complement of J9; Spark left_semi. */
  val q08 = Q(
    "q08_semi_join",
    (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer")
      val f = Tables(s, dir, "orders")
        .filter($"o_orderstatus" === "F" && $"o_totalprice" > 40000.0)
        .select($"o_custkey")
      c.join(f, c("c_custkey") === f("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_mktsegment
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'F' AND o.o_totalprice > 40000.0)
      ORDER BY c_custkey"""),
    covers = Seq("J9", "P9"))

  /** W4 — DISTINCT (`dags/snowflake-EDW-ETL-dag.py:390`). */
  val q09 = Q(
    "q09_distinct",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select($"o_orderstatus", $"o_orderpriority")
        .distinct()
        .orderBy($"o_orderstatus", $"o_orderpriority")
    },
    Some("""
      SELECT DISTINCT o_orderstatus, o_orderpriority
      FROM orders ORDER BY o_orderstatus, o_orderpriority"""),
    covers = Seq("W4"))

  /** O1 O2 O3 — global top-k: TakeOrderedAndProject, no full sort at
    * scale (`email_utils.py:29-31` top-5 report shape). */
  val q10 = Q(
    "q10_topk_orders",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""),
    covers = Seq("O1", "O2", "O3"))

  /** A8 — group-by then CASE classification over the aggregates
    * (`dags/snowflake-EDW-ETL-dag.py:354-367`). Branch order is
    * load-bearing (SURVEY §7 risk note): a customer matching both the
    * 2nd and 3rd rule must take the 2nd. */
  val q11 = Q(
    "q11_customer_segments",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(
          count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast(D)).cast("double").as("total_spend"),
          max($"o_orderdate").cast("date").as("last_order_date"))
        .withColumn("segment",
          when($"n_orders" >= 20, "wholesale")
            .when($"total_spend" > 400000.0, "vip")
            .when($"n_orders" >= 10, "returning")
            .when($"n_orders" >= 1, "active")
            .otherwise("dormant"))
        .orderBy($"o_custkey")
    },
    Some("""
      SELECT o_custkey,
             count(*) AS n_orders,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_spend,
             CAST(max(o_orderdate) AS DATE) AS last_order_date,
             CASE WHEN count(*) >= 20 THEN 'wholesale'
                  WHEN CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) > 400000.0 THEN 'vip'
                  WHEN count(*) >= 10 THEN 'returning'
                  WHEN count(*) >= 1 THEN 'active'
                  ELSE 'dormant' END AS segment
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""),
    covers = Seq("A8", "A4"))

  /** P12 A9 — high-watermark incremental filter with scalar subquery
    * (`dags/logistics-airbyte-sql.py:35-38`), via spark.sql to exercise
    * the EP1 raw-SQL entry point end-to-end through Catalyst. */
  val q12 = Q(
    "q12_watermark_filter",
    (s, dir) => {
      Tables.views(s, dir)
      s.sql("""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderdate > COALESCE(
          (SELECT max(o_orderdate) FROM orders WHERE o_orderstatus = 'F'),
          TIMESTAMP '2000-01-01 00:00:00')
        ORDER BY o_orderkey""")
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders
      WHERE o_orderdate > COALESCE(
        (SELECT max(o_orderdate) FROM orders WHERE o_orderstatus = 'F'),
        TIMESTAMP '2000-01-01 00:00:00')
      ORDER BY o_orderkey"""),
    covers = Seq("P12", "A9"))

  override def queries: Seq[Q] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12)
}
