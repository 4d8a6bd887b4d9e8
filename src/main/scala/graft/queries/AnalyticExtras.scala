package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Analytic-surface completions beyond the reference (SURVEY §2.4
  * "no grouping sets / cube / rollup", §2.5 "no lead/lag, no frame
  * specs"): verified affirmatively so a reference user gains them on
  * switch, not just the parity set. */
object AnalyticExtras extends QueryPack {

  private val D = "decimal(18,6)"

  /** ROLLUP with grouping indicators: revenue by (segment, status),
    * per-segment subtotals, grand total. */
  val q60 = Q(
    "q60_rollup",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .rollup($"c_mktsegment", $"o_orderstatus")
        .agg(
          count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast(D)).cast("double").as("revenue"),
          (grouping($"o_orderstatus") === 1).as("is_segment_total"),
          (grouping($"c_mktsegment") === 1).as("is_grand_total"))
        .orderBy($"c_mktsegment".asc_nulls_last, $"o_orderstatus".asc_nulls_last)
    },
    Some("""
      SELECT c_mktsegment, o_orderstatus,
             count(*) AS n_orders,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
             grouping(o_orderstatus) = 1 AS is_segment_total,
             grouping(c_mktsegment) = 1 AS is_grand_total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
      ORDER BY c_mktsegment ASC NULLS LAST, o_orderstatus ASC NULLS LAST"""),
    covers = Seq("A-rollup", "A-grouping-sets"))

  /** Window frames: running revenue (rowsBetween unbounded..current),
    * previous-order gap via lag, next order date via lead — per
    * customer over order time. */
  val q61 = Q(
    "q61_window_frames",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .filter($"o_custkey" % 10 === 0)
        .select(
          $"o_custkey", $"o_orderkey", $"o_orderdate",
          sum($"o_totalprice".cast(D)).over(frame).cast("double")
            .as("running_revenue"),
          datediff($"o_orderdate",
            lag($"o_orderdate", 1).over(w)).as("days_since_prev"),
          lead($"o_orderdate", 1).over(w).as("next_order_date"),
          row_number().over(w).as("order_seq"))
        .orderBy($"o_custkey", $"order_seq")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
               AS running_revenue,
             datediff('day',
               CAST(lag(o_orderdate, 1) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
               CAST(o_orderdate AS DATE)) AS days_since_prev,
             lead(o_orderdate, 1) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS next_order_date,
             CAST(row_number() OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT)
               AS order_seq
      FROM orders WHERE o_custkey % 10 = 0
      ORDER BY o_custkey, order_seq"""),
    covers = Seq("W-lead-lag", "W-frames", "W-running-total"))

  /** Exact discrete percentiles (percentile_disc WITHIN GROUP — the
    * ordered-set aggregate surface): returns ACTUAL data values
    * (smallest value with cume_dist >= p), so results are
    * engine-exact with no float-interpolation channel needed. */
  val q71 = Q(
    "q71_percentiles",
    (s, dir) => {
      import s.implicits._
      graft.Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)")
            .as("p25"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
            .as("p50"),
          expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice)")
            .as("p75"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             count(*) AS n_rows,
             quantile_disc(l_extendedprice, 0.25) AS p25,
             quantile_disc(l_extendedprice, 0.5) AS p50,
             quantile_disc(l_extendedprice, 0.75) AS p75
      FROM lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
    covers = Seq("A-percentile"))

  /** KMV distinct-count sketch next to the exact count: bounded-memory
    * mergeable cardinality estimation whose approximate answer is
    * itself deterministic (md5-hash KMV) and therefore oracle-checked
    * bit-for-bit — the cross-engine-reproducible alternative to HLL. */
  val q74 = Q(
    "q74_kmv_distinct",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{TextFunctions => T}
      val kmv = udaf(graft.functions.KmvSketch(64))
      graft.Tables(s, dir, "events")
        .select($"event_type", $"user_id",
          T.hash60($"user_id".cast("string"), 0).as("hv"))
        .groupBy($"event_type")
        .agg(
          countDistinct($"user_id").as("exact_distinct"),
          kmv($"hv").as("kmv_estimate"))
        .orderBy($"event_type")
    },
    Some("""
      WITH ex AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY event_type),
      h AS (
        SELECT DISTINCT event_type,
               CAST(('0x'||substr(md5('0|'||CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS hv
        FROM events),
      r AS (
        SELECT event_type, hv,
               row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
               count(*) OVER (PARTITION BY event_type) AS nd
        FROM h),
      est AS (
        SELECT event_type,
               CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
                    ELSE 63.0 / (CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE)
                                 / power(2.0, 60)) END AS kmv_estimate
        FROM r GROUP BY event_type)
      SELECT ex.event_type, ex.exact_distinct, est.kmv_estimate
      FROM ex JOIN est USING (event_type)
      ORDER BY event_type"""),
    covers = Seq("A-sketch-kmv"))

  /** Ranking-function family (ntile / percent_rank / cume_dist /
    * dense_rank — SURVEY §2.5 lists none in the reference; affirmative
    * beyond-parity coverage). The window order is made total by the
    * (price, orderkey) tie-break, so every rank value is
    * engine-deterministic; percent_rank/cume_dist are single double
    * divisions of exact integer ranks. */
  val q81 = Q(
    "q81_rank_family",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
      val o = Tables(s, dir, "orders").filter($"o_custkey" % 50 === 0)
      val c = Tables(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(
          $"c_mktsegment", $"o_orderkey", $"o_totalprice",
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          dense_rank().over(w).as("drank"))
        .orderBy($"c_mktsegment", $"o_orderkey")
    },
    Some("""
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             CAST(ntile(4) OVER w AS INT) AS quartile,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume,
             CAST(dense_rank() OVER w AS INT) AS drank
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_custkey % 50 = 0
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY o_totalprice ASC, o_orderkey ASC)
      ORDER BY c_mktsegment, o_orderkey"""),
    covers = Seq("W-rank-family"))

  /** Bottom-k sample-sketch quantiles next to the exact percentiles
    * (q71's bounded-memory twin, as q74 is to q63's exact distinct):
    * per group, the k=64 rows with smallest seeded md5 hash form a
    * deterministic uniform sample; quantiles are read off the sorted
    * sample at ⌊q·(m−1)⌋ — exact integer indexing, so the approximate
    * answer itself is oracle-checked bit-for-bit. */
  val q91 = Q(
    "q91_quantile_sketch",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{TextFunctions => T}
      val bk = udaf(graft.functions.BottomKSample(64))
      def at(q: Double, vs: Column): Column =
        element_at(vs,
          (floor(lit(q) * (size(vs) - 1).cast("double")) + 1).cast("int"))
      graft.Tables(s, dir, "events")
        .select($"event_type", $"value",
          T.hash60($"event_id".cast("string"), 13).as("hv"))
        .groupBy($"event_type")
        .agg(bk($"hv", $"value").as("vs"))
        .select($"event_type",
          size($"vs").as("sample_size"),
          at(0.5, $"vs").as("p50"),
          at(0.9, $"vs").as("p90"),
          at(0.99, $"vs").as("p99"))
        .orderBy($"event_type")
    },
    Some("""
      WITH h AS (
        SELECT event_type, value,
               CAST(('0x'||substr(md5('13|'||CAST(event_id AS VARCHAR)),1,15)) AS BIGINT) AS hv
        FROM events),
      rk AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY hv) AS r
        FROM h),
      arr AS (
        SELECT event_type, list_sort(list(value)) AS vs
        FROM rk WHERE r <= 64 GROUP BY 1)
      SELECT event_type,
             CAST(len(vs) AS INT) AS sample_size,
             vs[CAST(floor(CAST(0.5 AS DOUBLE) * (len(vs)-1)) AS BIGINT) + 1] AS p50,
             vs[CAST(floor(CAST(0.9 AS DOUBLE) * (len(vs)-1)) AS BIGINT) + 1] AS p90,
             vs[CAST(floor(CAST(0.99 AS DOUBLE) * (len(vs)-1)) AS BIGINT) + 1] AS p99
      FROM arr ORDER BY event_type"""),
    covers = Seq("A-sketch-quantile"))

  /** LISTAGG / string_agg (ordered string aggregation — absent from
    * the reference's SQL surface, present in every warehouse it
    * targets). Determinism: the aggregated list is fully ordered by
    * the aggregated value itself (binary collation in both engines),
    * so the concatenated string is engine-exact. Scale note: bounded
    * output per group (high-balance filter first, pushed to the scan),
    * one partial-aggregated shuffle — collect_list's partial buffers
    * merge associatively, order imposed once at the end. */
  val q96 = Q(
    "q96_listagg",
    (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      c.filter($"c_acctbal" > 9000)
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_mktsegment", $"n_name")
        .agg(
          count(lit(1)).as("n_high_value"),
          concat_ws(",", array_sort(collect_list($"c_name")))
            .as("customer_names"))
        .orderBy($"c_mktsegment", $"n_name")
    },
    Some("""
      SELECT c_mktsegment, n_name, count(*) AS n_high_value,
             string_agg(c_name, ',' ORDER BY c_name) AS customer_names
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE c_acctbal > 9000
      GROUP BY 1, 2 ORDER BY 1, 2"""),
    covers = Seq("A-listagg"))

  /** Second-moment statistics (corr / covar_samp / var_samp /
    * stddev_samp) computed from EXACT decimal power sums, then combined
    * in double with an identical expression shape on both engines —
    * the only float ops are products, differences, divisions and
    * sqrt of identical operand bits (all exactly rounded per IEEE-754),
    * so even corr is hash-checkable bit-for-bit. Native corr()/stddev()
    * would be order-dependent in partial-merge order; the power-sum
    * formulation is associative and therefore shuffle-plan-independent
    * — the property that makes it safe on 1000 executors too. */
  val q97 = Q(
    "q97_stats_moments",
    (s, dir) => {
      import s.implicits._
      val x = $"l_quantity".cast(D)
      val y = $"l_extendedprice".cast(D)
      val big = "decimal(38,12)"
      val g = Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum((x * y).cast(big)).cast("double").as("sxy"),
          sum((x * x).cast(big)).cast("double").as("sxx"),
          sum((y * y).cast(big)).cast("double").as("syy"))
      g.select(
          $"l_returnflag",
          $"n".cast("long").as("n_rows"),
          (($"n" * $"sxy" - $"sx" * $"sy") /
            sqrt(($"n" * $"sxx" - $"sx" * $"sx") *
                 ($"n" * $"syy" - $"sy" * $"sy"))).as("corr_qty_price"),
          (($"n" * $"sxx" - $"sx" * $"sx") / ($"n" * ($"n" - 1)))
            .as("var_qty"),
          sqrt(($"n" * $"syy" - $"sy" * $"sy") / ($"n" * ($"n" - 1)))
            .as("stddev_price"),
          (($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * ($"n" - 1)))
            .as("covar_qty_price"))
        .orderBy($"l_returnflag")
    },
    Some(s"""
      WITH g AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sxy,
               CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS syy
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag,
             CAST(n AS BIGINT) AS n_rows,
             (n * sxy - sx * sy) /
               sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qty_price,
             (n * sxx - sx * sx) / (n * (n - 1)) AS var_qty,
             sqrt((n * syy - sy * sy) / (n * (n - 1))) AS stddev_price,
             (n * sxy - sx * sy) / (n * (n - 1)) AS covar_qty_price
      FROM g ORDER BY l_returnflag"""),
    covers = Seq("A-stats-moments"))

  /** Equi-width histogram: 20 buckets over the observed [min, max]
    * price range (the range comes from a broadcast scalar aggregate,
    * not a driver collect). Bucket arithmetic is pure IEEE double with
    * identical shape on both engines; the top edge folds into the last
    * bucket via least(). One scan + one tiny broadcast + one
    * aggregation — the 100 TB plan is the same three stages. */
  val q98 = Q(
    "q98_histogram",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
      val bounds = o.agg(
        min($"o_totalprice").as("lo"), max($"o_totalprice").as("hi"))
      o.crossJoin(broadcast(bounds))
        .select(
          least(floor(($"o_totalprice" - $"lo") /
            (($"hi" - $"lo") / 20.0)), lit(19.0)).cast("int").as("bucket"),
          $"o_totalprice")
        .groupBy($"bucket")
        .agg(
          count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast(D)).cast("double").as("bucket_revenue"))
        .orderBy($"bucket")
    },
    Some("""
      WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                 FROM orders),
      x AS (SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 20.0)),
                              19.0) AS INT) AS bucket,
                   o_totalprice
            FROM orders, b)
      SELECT bucket, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS bucket_revenue
      FROM x GROUP BY 1 ORDER BY 1"""),
    covers = Seq("A-histogram"))

  override def queries: Seq[Q] =
    Seq(q60, q61, q71, q74, q81, q91, q96, q97, q98)
}
