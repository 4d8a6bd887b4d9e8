package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Remaining SQL-surface operators of SURVEY §2: the scalar function
  * inventory (§2.10), key-value pivot (A10,
  * `dbt/dbt-project/macros/control_table_filters.sql:2-10`), comma-list
  * explode + exclusion filter (P13/P14,
  * `dbt/.../customer_experience_summary.sql:13-33`) and JSON path
  * extraction / LATERAL FLATTEN (P11/S3,
  * `dags/2_logistics-shipment-dag.py:100-146`).
  *
  * All of these stay inside whole-stage codegen: built-in functions
  * only, no UDFs (builder brief "Functions, not UDFs").
  */
object SqlSurface extends QueryPack {

  private val D = "decimal(18,6)"

  /** §2.10 scalar inventory in one pass over orders: DATEDIFF, DATEADD,
    * YEAR/MONTH/DAY, TO_CHAR, REPLACE, SUBSTRING, TRIM, ILIKE, ROUND,
    * COALESCE, NULLIF, CASE WHEN — each mapped to the codegen'd Spark
    * builtin (`dags/snowflake-EDW-ETL-dag.py:325-329,354-367`). */
  val q29 = Q(
    "q29_scalar_functions",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .filter($"o_orderkey" % 20 === 0)
        .select(
          $"o_orderkey",
          datediff(lit("1998-12-31").cast("date"), $"o_orderdate")
            .as("days_to_eoy"),
          date_add($"o_orderdate".cast("date"), 30).as("due_date"),
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("d"),
          date_format($"o_orderdate", "yyyy-MM-dd").as("order_day"),
          regexp_replace($"o_orderpriority", "-", "_").as("prio_norm"),
          substring($"o_orderpriority", 1, 1).as("prio_rank"),
          trim(lower($"o_orderstatus")).as("status_lc"),
          $"o_orderpriority".ilike("%URGENT%").as("is_urgent"),
          round($"o_totalprice".cast(D), 1).cast("double").as("price_r1"),
          coalesce(nullif($"o_orderstatus", lit("O")), lit("open"))
            .as("status_or_open"),
          when($"o_totalprice" > 250000.0, "high")
            .when($"o_totalprice" > 100000.0, "mid")
            .otherwise("low").as("price_band"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
             datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
             CAST(o_orderdate AS DATE) + 30 AS due_date,
             CAST(year(o_orderdate) AS INT) AS y,
             CAST(month(o_orderdate) AS INT) AS m,
             CAST(day(o_orderdate) AS INT) AS d,
             strftime(o_orderdate, '%Y-%m-%d') AS order_day,
             replace(o_orderpriority, '-', '_') AS prio_norm,
             substring(o_orderpriority, 1, 1) AS prio_rank,
             trim(lower(o_orderstatus)) AS status_lc,
             o_orderpriority ILIKE '%URGENT%' AS is_urgent,
             CAST(CAST(round(CAST(o_totalprice AS DECIMAL(18,6)), 1) AS VARCHAR) AS DOUBLE) AS price_r1,
             COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
             CASE WHEN o_totalprice > 250000.0 THEN 'high'
                  WHEN o_totalprice > 100000.0 THEN 'mid'
                  ELSE 'low' END AS price_band
      FROM orders WHERE o_orderkey % 20 = 0
      ORDER BY o_orderkey"""),
    covers = Seq("F-scalar", "P8"))

  /** A10 key-value pivot: events pivoted to one row per user with one
    * column per event_type — the control-table `MAX(CASE WHEN key=...)`
    * manual pivot, via Spark's native `pivot` (explicit value list so
    * no extra distinct pass runs at scale). */
  val q30 = Q(
    "q30_pivot_events",
    (s, dir) => {
      import s.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables(s, dir, "events")
        .filter($"user_id" < 100)
        .groupBy($"user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      types.foldLeft(p)((df, t) =>
          df.withColumn(t, coalesce(col(t), lit(0L)).cast("long")))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events WHERE user_id < 100
      GROUP BY user_id ORDER BY user_id"""),
    covers = Seq("A10"))

  /** P13/P14 config-driven exclusion: a comma-packed config string is
    * split + exploded (SPLIT_TO_TABLE) and the fact is anti-joined
    * against it; the numeric threshold comes from the same config row
    * (`dbt/.../customer_experience_summary.sql:13-33`). */
  val q31 = Q(
    "q31_config_exclusion",
    (s, dir) => {
      import s.implicits._
      // one-row config table, as the dbt seed control_table pivots to
      val config = s.range(1).select(
        lit("click,error").as("excluded_event_types"),
        lit("0.5").as("min_value"))
      val excluded = config.select(
        explode(split(trim($"excluded_event_types"), ",")).as("event_type"))
      val minValue = lit(0.5) // P14: threshold injected as a literal
      Tables(s, dir, "events")
        .filter($"value" >= minValue)
        .join(excluded, Seq("event_type"), "left_anti")
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum($"value".cast(D)).cast("double").as("sum_value"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type,
             count(*) AS n_events,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
      FROM events
      WHERE value >= 0.5
        AND event_type NOT IN
          (SELECT trim(x) FROM unnest(string_split('click,error', ',')) t(x))
      GROUP BY event_type ORDER BY event_type"""),
    covers = Seq("P13", "P14", "S10"))

  /** P11 + S3: VARIANT-style JSON path access. Orders are serialized to
    * a JSON string (the bronze shape), then read back both ways the
    * reference uses: `get_json_object` path access with `::` casts, and
    * typed `from_json` + dotted field access. Extracted values must
    * round-trip exactly — the oracle is the plain projection. */
  val q32 = Q(
    "q32_json_roundtrip",
    (s, dir) => {
      import s.implicits._
      val schema = StructType(Seq(
        StructField("order", StructType(Seq(
          StructField("id", LongType),
          StructField("status", StringType),
          StructField("price", DoubleType))))))
      Tables(s, dir, "orders")
        .filter($"o_orderkey" % 50 === 0)
        .select($"o_orderkey", to_json(struct(struct(
          $"o_orderkey".as("id"), $"o_orderstatus".as("status"),
          $"o_totalprice".as("price")).as("order"))).as("j"))
        .select(
          $"o_orderkey",
          get_json_object($"j", "$.order.id").cast("long").as("id_by_path"),
          from_json($"j", schema).getField("order").getField("status")
            .as("status_typed"),
          get_json_object($"j", "$.order.price").cast("double")
            .as("price_by_path"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
             o_orderkey AS id_by_path,
             o_orderstatus AS status_typed,
             o_totalprice AS price_by_path
      FROM orders WHERE o_orderkey % 50 = 0
      ORDER BY o_orderkey"""),
    covers = Seq("P11", "S3"))

  /** LATERAL FLATTEN over an array-of-structs
    * (`dags/2_logistics-shipment-dag.py:110-121` status_tracking): each
    * order emits a packed array of (attr, value) structs which is
    * exploded back to rows — the exact explode path a 100 TB run takes
    * (generator inside whole-stage codegen, no shuffle). */
  val q33 = Q(
    "q33_flatten_array",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .filter($"o_orderkey" % 100 === 0)
        .select($"o_orderkey", explode(array(
          struct(lit("status").as("attr"), $"o_orderstatus".as("value")),
          struct(lit("priority").as("attr"), $"o_orderpriority".as("value"))))
          .as("kv"))
        .select($"o_orderkey", $"kv.attr".as("attr"), $"kv.value".as("value"))
        .orderBy($"o_orderkey", $"attr")
    },
    Some("""
      SELECT o_orderkey, 'status' AS attr, o_orderstatus AS value
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL
      SELECT o_orderkey, 'priority', o_orderpriority
      FROM orders WHERE o_orderkey % 100 = 0
      ORDER BY o_orderkey, attr"""),
    covers = Seq("P11", "S3", "W-flatten"))

  /** S2/S5 weather pipeline end-to-end (`dags/weather_util.py:8-87`,
    * `dags/weather_api_dag.py:59-68`): a deterministic "API extract"
    * derived from events is landed as `weather_*.csv` files (plus a
    * decoy the COPY PATTERN must ignore), bulk-read through
    * WeatherPipeline.bronze, typed by silver, and aggregated per city.
    * Numeric fields travel as DECIMAL(18,6) strings so the CSV
    * round-trip is bit-exact; the oracle recomputes from events. */
  val q67 = Q(
    "q67_weather_pipeline",
    (s, dir) => {
      import s.implicits._
      val extract = Tables(s, dir, "events").filter($"user_id" < 200)
        .select(
          concat(lit("city_"), ($"user_id" % 7).cast("string")).as("city"),
          unix_timestamp($"ts").as("timestamp"),
          $"event_type".as("weather_main"),
          concat($"event_type", lit(" sky")).as("weather_description"),
          $"value".cast(D).cast("string").as("temp"),
          ($"value".cast(D) + lit(1).cast(D)).cast("string").as("feels_like"),
          ($"user_id" % 100).cast("long").as("humidity"),
          ($"value".cast(D) * lit(2).cast(D)).cast("string").as("wind_speed"),
          ($"user_id" % 101).cast("long").as("clouds"))
      val landing = java.nio.file.Files
        .createTempDirectory("graft_weather_").toString
      extract.coalesce(4).write.option("header", true)
        .mode("overwrite").csv(landing)
      val fs = new org.apache.hadoop.fs.Path(landing)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(landing))
        .filter(f => f.getPath.getName.startsWith("part-") &&
          f.getPath.getName.endsWith(".csv"))
        .zipWithIndex.foreach { case (f, i) =>
          fs.rename(f.getPath, new org.apache.hadoop.fs.Path(landing,
            f"weather_20240101000$i%03d.csv"))
        }
      // decoy: present in the landing dir, excluded by the PATTERN
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(landing, "other_data.csv"), "city,x\nzz,1\n")
      graft.silver.WeatherPipeline
        .silver(graft.silver.WeatherPipeline.bronze(s, landing))
        .groupBy($"city")
        .agg(
          count(lit(1)).as("n_obs"),
          sum($"temp".cast(D)).cast("double").as("sum_temp"),
          max($"humidity").as("max_humidity"),
          countDistinct($"weather_main").as("n_conditions"))
        .orderBy($"city")
    },
    Some("""
      SELECT 'city_' || CAST(user_id % 7 AS VARCHAR) AS city,
             count(*) AS n_obs,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_temp,
             MAX(CAST(user_id % 100 AS BIGINT)) AS max_humidity,
             COUNT(DISTINCT event_type) AS n_conditions
      FROM events WHERE user_id < 200
      GROUP BY 1 ORDER BY city"""),
    covers = Seq("S2", "S5", "S7"))

  /** UNPIVOT (stack) — the inverse of the A10 key-value pivot: a wide
    * per-flag metrics row melts into (flag, metric, value) tuples, the
    * melt step every metrics/feature pipeline needs. Exact decimal
    * channel on the summed doubles. */
  val q73 = Q(
    "q73_unpivot",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          sum($"l_quantity".cast(D)).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast(D)).cast("double").as("sum_price"),
          sum($"l_discount".cast(D)).cast("double").as("sum_disc"))
        .selectExpr("l_returnflag",
          "stack(3, 'sum_disc', sum_disc, 'sum_price', sum_price, " +
            "'sum_qty', sum_qty) AS (metric, value)")
        .orderBy($"l_returnflag", $"metric")
    },
    Some("""
      WITH wide AS (
        SELECT l_returnflag,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_price,
               CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, metric, value FROM (
        SELECT l_returnflag, 'sum_disc' AS metric, sum_disc AS value FROM wide
        UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM wide
        UNION ALL SELECT l_returnflag, 'sum_qty', sum_qty FROM wide)
      ORDER BY l_returnflag, metric"""),
    covers = Seq("A10-unpivot"))

  /** EP1 parity ([[graft.sql.GraftSqlParser]], round-13 headline #2):
    * the WHOLE table-format lifecycle driven purely through
    * `spark.sql(...)` STATEMENT TEXT — the reference's dominant entry
    * point is raw SQL strings (`dags/logistics-airbyte-sql.py:25-49`:
    * MERGE INTO … USING (subquery) AS src ON … WHEN MATCHED THEN
    * UPDATE SET col = src.col … WHEN NOT MATCHED THEN INSERT (cols)
    * VALUES (src.cols); `dags/snowflake-EDW-ETL-dag.py:188-256`). A
    * bootstrap MERGE commits the target, a second MERGE in the
    * reference's exact clause shape applies updates+inserts, then
    * UPDATE and DELETE statement text (CoW DML), with DESCRIBE
    * HISTORY proving the op trail — all against the same kernels the
    * Scala API uses, same oracle algebra as q13/q223. */
  val q241 = Q(
    "q241_sql_text_dml",
    (s, dir) => {
      import s.implicits._
      import graft.ops.ManifestTable
      val orders = Tables(s, dir, "orders")
      val cut = lit("1999-01-01").cast("timestamp")
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val root = java.nio.file.Files
        .createTempDirectory("graft_q241_").toString + "/orders_tbl"
      orders.filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
        .createOrReplaceTempView(s"q241_target_$tag")
      orders.createOrReplaceTempView(s"q241_orders_$tag")
      // v1: bootstrap — first MERGE on an empty root inserts the view
      s.sql(s"""MERGE INTO graft.`$root` USING q241_target_$tag AS src
        ON o_orderkey = o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      // v2: the reference's exact MERGE shape — subquery USING with a
      // WHERE and CASE (must not fool the clause splitter), aliases,
      // per-column SET and INSERT lists, trailing semicolon
      s.sql(s"""
        -- CDC upsert (reference statement shape)
        MERGE INTO graft.`$root` AS tgt
        USING (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CASE WHEN o_orderdate < TIMESTAMP '1999-01-01'
                        THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice
            FROM q241_orders_$tag
            WHERE (o_orderdate < TIMESTAMP '1999-01-01'
                   AND o_custkey % 10 = 0)
               OR o_orderdate >= TIMESTAMP '1999-01-01'
        ) AS src
        ON tgt.o_orderkey = src.o_orderkey
        WHEN MATCHED THEN UPDATE SET
            o_custkey = src.o_custkey,
            o_orderstatus = src.o_orderstatus,
            o_totalprice = src.o_totalprice
        WHEN NOT MATCHED THEN INSERT (
            o_orderkey, o_custkey, o_orderstatus, o_totalprice
        ) VALUES (
            src.o_orderkey, src.o_custkey, src.o_orderstatus,
            src.o_totalprice
        );
      """)
      // v3: UPDATE statement text (single-projection pre-update SET)
      s.sql(s"""UPDATE graft.`$root`
        SET o_totalprice = o_totalprice * 0.5
        WHERE o_orderstatus = 'F' AND o_custkey % 5 = 0""")
      // v4: DELETE statement text (NULL predicate = kept)
      s.sql(s"DELETE FROM graft.`$root` WHERE o_totalprice < 10000")
      val histOk = s.sql(s"DESCRIBE HISTORY graft.`$root`")
        .select($"operation").as[String].collect().toSeq ==
        Seq("MERGE", "MERGE", "UPDATE", "DELETE")
      // even the READ goes through SQL: the graft_table table-valued
      // function splices the same plan the Scala API builds
      s.sql(s"SELECT * FROM graft_table('$root')")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast(D)).cast("double").as("sum_price"))
        .withColumn("hist_ok", lit(histOk))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      src AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
                    THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE (o_orderdate < TIMESTAMP '1999-01-01 00:00:00' AND o_custkey % 10 = 0)
           OR o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
      merged AS (
        SELECT * FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
        UNION ALL SELECT * FROM src),
      updated AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderstatus = 'F' AND o_custkey % 5 = 0
                    THEN o_totalprice * 0.5 ELSE o_totalprice END
                 AS o_totalprice
        FROM merged),
      final AS (
        SELECT * FROM updated WHERE NOT (o_totalprice < 10000))
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS hist_ok
      FROM final GROUP BY 1 ORDER BY 1"""),
    covers = Seq("M1-merge", "TD-sql-text-dml"))

  override def queries: Seq[Q] =
    Seq(q29, q30, q31, q32, q33, q67, q73, q241)
}
