package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Quality, Upsert}

/** The MERGE/validation operator family (SURVEY §2.8, P4/P5, dbt data
  * tests) exercised through the real `graft.ops` kernels, with SQL
  * oracles expressing the same semantics relationally.
  */
object OpsQueries extends QueryPack {

  /** §2.8 MERGE: target = pre-1999 orders, source = those same orders
    * for customers with custkey % 10 == 0 but with doubled totalprice
    * (MATCHED -> UPDATE), plus all post-1999 orders (NOT MATCHED ->
    * INSERT). Oracle mirrors the anti-join ∪ update ∪ insert algebra. */
  val q13 = Q(
    "q13_merge_upsert",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      val cut = lit("1999-01-01").cast("timestamp")
      val target = Tables(s, dir, "orders")
        .filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      val source = Tables(s, dir, "orders")
        .filter(($"o_orderdate" < cut && $"o_custkey" % 10 === 0) ||
                $"o_orderdate" >= cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          when($"o_orderdate" < cut, $"o_totalprice" * 2)
            .otherwise($"o_totalprice").as("o_totalprice"))
      // through the TRANSACTIONAL manifest path (round-8 VERDICT ask
      // #6): the target commits as version 1 of a manifest table, the
      // MERGE (same Upsert.upsert kernel) commits as version 2, and
      // the result is read back from the committed version — so this
      // row also gates the commit protocol end to end
      val root = java.nio.file.Files
        .createTempDirectory("graft_q13_").toString + "/orders_tbl"
      graft.ops.ManifestTable.commit(target, root)
      graft.ops.ManifestTable.merge(s, root, source, Seq("o_orderkey"))
        .orderBy($"o_orderkey")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      source AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
                    THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE (o_orderdate < TIMESTAMP '1999-01-01 00:00:00' AND o_custkey % 10 = 0)
           OR o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, t.o_totalprice
      FROM target t WHERE NOT EXISTS
        (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
      UNION ALL
      SELECT t.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice
      FROM target t JOIN source s ON t.o_orderkey = s.o_orderkey
      UNION ALL
      SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice
      FROM source s WHERE NOT EXISTS
        (SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey)
      ORDER BY o_orderkey"""),
    covers = Seq("M1-merge", "J10"))

  /** dbt SCD2 snapshot semantics over the events changelog: per user,
    * one row per consecutive run of the same event_type with the dbt
    * snapshot's column names dbt_valid_from / dbt_valid_to (+
    * is_current convenience). ts is compared at µs precision on both
    * sides (events nanos are floored by Tables). */
  val q14 = Q(
    "q14_scd2_history",
    (s, dir) => {
      import s.implicits._
      Upsert.scd2FromChangelog(
          Tables(s, dir, "events").filter($"user_id" < 20),
          keys = Seq("user_id"),
          order = Seq($"ts", $"event_id"),
          tracked = Seq("event_type"))
        .select($"user_id", $"event_type", $"dbt_valid_from",
          $"dbt_valid_to", $"is_current")
        .orderBy($"user_id", $"dbt_valid_from")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
               CASE WHEN event_type IS DISTINCT FROM
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 THEN 1 ELSE 0 END AS chg
        FROM events WHERE user_id < 20),
      v AS (
        SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
        FROM e),
      g AS (
        SELECT user_id, version, min(ts) AS dbt_valid_from,
               min(event_type) AS event_type
        FROM v GROUP BY user_id, version)
      SELECT user_id, event_type, dbt_valid_from,
             lead(dbt_valid_from) OVER (PARTITION BY user_id ORDER BY version) AS dbt_valid_to,
             lead(dbt_valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS is_current
      FROM g ORDER BY user_id, dbt_valid_from"""),
    covers = Seq("M2-scd2", "W1"))

  /** P5: first-failing-rule error split over lineitem, both branches in
    * one output (error_reason null = valid row), reason order exactly
    * the rule order. */
  val q15 = Q(
    "q15_error_split",
    (s, dir) => {
      import s.implicits._
      val rules = Seq(
        Quality.Rule("invalid_quantity", $"l_quantity" > 5 && $"l_quantity" <= 45),
        Quality.Rule("invalid_discount", $"l_discount" >= 0.0 && $"l_discount" <= 0.08),
        Quality.Rule("invalid_price", $"l_extendedprice" > 1000.0))
      Quality.withErrorReason(Tables(s, dir, "lineitem"), rules)
        .groupBy(coalesce($"error_reason", lit("ok")).as("reason"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum($"l_quantity".cast("decimal(18,6)")).cast("double").as("sum_qty"))
        .orderBy($"reason")
    },
    Some("""
      SELECT COALESCE(CASE
               WHEN NOT COALESCE(l_quantity > 5 AND l_quantity <= 45, FALSE)
                 THEN 'invalid_quantity'
               WHEN NOT COALESCE(l_discount >= 0.0 AND l_discount <= 0.08, FALSE)
                 THEN 'invalid_discount'
               WHEN NOT COALESCE(l_extendedprice > 1000.0, FALSE)
                 THEN 'invalid_price' END, 'ok') AS reason,
             count(*) AS n_rows,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY 1 ORDER BY reason"""),
    covers = Seq("P4", "P5"))

  /** The dbt data-test suite shape (24 declarative checks) as a single
    * result table: not_null / unique / relationships / range, one scan
    * per source table. */
  val q16 = Q(
    "q16_dq_checks",
    (s, dir) => {
      import s.implicits._
      val orders = Tables(s, dir, "orders")
      val customer = Tables(s, dir, "customer")
      val lineitem = Tables(s, dir, "lineitem")
      val perTable = Quality.runChecks(orders, Seq(
          Quality.notNull("o_orderkey"),
          Quality.notNull("o_custkey"),
          Quality.unique(Seq("o_orderkey"))))
        .unionByName(Quality.runChecks(customer, Seq(
          Quality.notNull("c_custkey"),
          Quality.unique(Seq("c_custkey")),
          Quality.between("c_acctbal", -1000.0, 10000.0))))
        .unionByName(Quality.runChecks(lineitem, Seq(
          Quality.unique(Seq("l_orderkey", "l_linenumber")),
          Quality.between("l_quantity", 0.0, 50.0))))
      val rel = Quality.relationshipViolations(
          orders, "o_custkey", customer, "c_custkey")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("o_custkey_relationship_c_custkey").as("check_name"),
          $"n_violations", ($"n_violations" === 0).as("passed"))
      perTable.unionByName(rel).orderBy($"check_name")
    },
    Some("""
      WITH checks(check_name, n_violations) AS (
        SELECT 'o_orderkey_not_null' AS check_name,
               CAST(count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'o_custkey_not_null',
               CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'o_orderkey_unique',
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
        UNION ALL
        SELECT 'c_custkey_not_null',
               CAST(count(CASE WHEN c_custkey IS NULL THEN 1 END) AS BIGINT)
        FROM customer
        UNION ALL
        SELECT 'c_custkey_unique',
               CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) FROM customer
        UNION ALL
        SELECT 'c_acctbal_between',
               CAST(count(CASE WHEN c_acctbal IS NULL OR c_acctbal <= -1000.0
                               OR c_acctbal > 10000.0 THEN 1 END) AS BIGINT)
        FROM customer
        UNION ALL
        SELECT 'l_orderkey_l_linenumber_unique',
               CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity_between',
               CAST(count(CASE WHEN l_quantity IS NULL OR l_quantity <= 0.0
                               OR l_quantity > 50.0 THEN 1 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'o_custkey_relationship_c_custkey',
               (SELECT CAST(count(*) AS BIGINT) FROM orders o
                WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
                  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      )
      SELECT check_name, n_violations, n_violations = 0 AS passed
      FROM checks ORDER BY check_name"""),
    covers = Seq("T1-dq"))

  /** W3: dropDuplicates(subset) — arbitrary-survivor dedupe made
    * deterministic for the oracle by keying on min(event_id). */
  val q17 = Q(
    "q17_drop_duplicates",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"user_id", $"event_type")
        .agg(min($"event_id").as("event_id"))
        .orderBy($"user_id", $"event_type")
    },
    Some("""
      SELECT user_id, event_type, min(event_id) AS event_id
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id, event_type"""),
    covers = Seq("W3"))

  /** Salted two-phase aggregation (Skew.saltedCountSum) through the
    * driver contract: the hot-group mitigation is EXACT — partial
    * (key, salt) aggregation then a key-level merge reproduces the
    * plain group-by bit-for-bit (decimal channel keeps the double sum
    * order-independent), which is exactly what the oracle checks. */
  val q72 = Q(
    "q72_salted_agg",
    (s, dir) => {
      import s.implicits._
      graft.ops.Skew.saltedCountSum(Tables(s, dir, "events"),
          "event_type", $"value".cast("decimal(18,6)"), buckets = 8)
        .withColumn("sum_value", col("sum_value").cast("double"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n_rows,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY event_type ORDER BY event_type"""),
    covers = Seq("SK-salted-agg"))

  /** M2 incremental depth: TWO consecutive dbt snapshot runs
    * (Upsert.scd2Merge) over the event stream, split at a mid-month
    * cutoff — run 1 snapshots each user's latest pre-cutoff state, run
    * 2 closes out changed users (dbt_valid_to = the new state's ts,
    * chaining exactly to the successor row's dbt_valid_from), passes
    * unchanged users through untouched, and opens rows for new users.
    * The oracle restates the two-run outcome declaratively from the
    * two per-batch latest-state relations. */
  val q104 = Q(
    "q104_scd2_merge",
    (s, dir) => {
      import s.implicits._
      val cut = lit("2024-01-16").cast("timestamp")
      val ev = Tables(s, dir, "events")
        .select($"user_id", $"event_type", $"ts", $"event_id")
      def state(df: org.apache.spark.sql.DataFrame) =
        Upsert.dedupLatest(df, Seq("user_id"), Seq($"ts", $"event_id"))
          .select($"user_id", $"event_type", $"ts")
      // each snapshot run COMMITS to a manifest table and the next run
      // reads the committed version back — the real dbt-snapshot
      // lifecycle on the transactional store (round-8 VERDICT ask #6)
      val root = java.nio.file.Files
        .createTempDirectory("graft_q104_").toString + "/scd2_tbl"
      import graft.ops.ManifestTable
      val run1 = Upsert.scd2Merge(None, state(ev.filter($"ts" < cut)),
        Seq("user_id"), "ts", Seq("event_type"))
      ManifestTable.commit(run1, root)
      val run2 = Upsert.scd2Merge(
        Some(ManifestTable.read(s, root).get),
        state(ev.filter($"ts" >= cut)),
        Seq("user_id"), "ts", Seq("event_type"))
      ManifestTable.commit(run2, root)
      ManifestTable.read(s, root).get
        .orderBy($"user_id", $"dbt_valid_from")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        FROM events),
      a AS (SELECT user_id, event_type, ts FROM (
          SELECT user_id, event_type, ts, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM e WHERE ts < TIMESTAMP '2024-01-16 00:00:00') WHERE rn = 1),
      b AS (SELECT user_id, event_type, ts FROM (
          SELECT user_id, event_type, ts, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM e WHERE ts >= TIMESTAMP '2024-01-16 00:00:00') WHERE rn = 1),
      chg AS (SELECT a.user_id, a.event_type AS old_t, a.ts AS old_ts,
                     b.event_type AS new_t, b.ts AS new_ts
              FROM a JOIN b ON a.user_id = b.user_id)
      SELECT user_id, old_t AS event_type, old_ts AS dbt_valid_from,
             new_ts AS dbt_valid_to, FALSE AS is_current
      FROM chg WHERE old_t IS DISTINCT FROM new_t
      UNION ALL
      SELECT user_id, new_t, new_ts, CAST(NULL AS TIMESTAMP), TRUE
      FROM chg WHERE old_t IS DISTINCT FROM new_t
      UNION ALL
      SELECT user_id, old_t, old_ts, CAST(NULL AS TIMESTAMP), TRUE
      FROM chg WHERE old_t IS NOT DISTINCT FROM new_t
      UNION ALL
      SELECT user_id, event_type, ts, CAST(NULL AS TIMESTAMP), TRUE
      FROM a WHERE user_id NOT IN (SELECT user_id FROM b)
      UNION ALL
      SELECT user_id, event_type, ts, CAST(NULL AS TIMESTAMP), TRUE
      FROM b WHERE user_id NOT IN (SELECT user_id FROM a)
      ORDER BY user_id, dbt_valid_from"""),
    covers = Seq("M2-scd2", "ST1"))

  /** Time-travel read over the transactional manifest store — the
    * versioned-read capability that makes a training snapshot
    * reproducible (Delta/Iceberg `VERSION AS OF`, on the native
    * manifest-commit table [[graft.ops.ManifestTable]]): q13's MERGE
    * lifecycle commits the target as version 1 and the merged state as
    * version 2, BOTH versions stay independently readable afterwards,
    * and the query reads them back and classifies every key — carried
    * unchanged, updated in place, or inserted by the MERGE. This is
    * the audit a pipeline runs after every transactional write ("what
    * did that commit actually change?") and the reason versioned reads
    * exist: yesterday's training run can be re-materialized from
    * version 1 while version 2 serves. ONE full-outer hash join on the
    * key; all counts exact. Oracle: q13's target/source/merged algebra
    * re-joined declaratively. */
  val q207 = Q(
    "q207_time_travel_diff",
    (s, dir) => {
      import s.implicits._
      val cut = lit("1999-01-01").cast("timestamp")
      val target = Tables(s, dir, "orders")
        .filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val source = Tables(s, dir, "orders")
        .filter(($"o_orderdate" < cut && $"o_custkey" % 10 === 0) ||
                $"o_orderdate" >= cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          when($"o_orderdate" < cut, $"o_totalprice" * 2)
            .otherwise($"o_totalprice").as("o_totalprice"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q207_").toString + "/orders_tbl"
      import graft.ops.ManifestTable
      ManifestTable.commit(target, root)                      // version 1
      ManifestTable.merge(s, root, source, Seq("o_orderkey")) // version 2
      val v1 = ManifestTable.readVersion(s, root, 1L)
        .select($"o_orderkey", $"o_totalprice".as("p1"))
      val v2 = ManifestTable.readVersion(s, root, 2L)
        .select($"o_orderkey", $"o_totalprice".as("p2"))
      v1.join(v2, Seq("o_orderkey"), "full_outer")
        .agg(
          count(when($"p1".isNotNull, 1)).as("rows_v1"),
          count(when($"p2".isNotNull, 1)).as("rows_v2"),
          count(when($"p1".isNull && $"p2".isNotNull, 1)).as("n_inserted"),
          count(when($"p1".isNotNull && $"p2".isNotNull &&
            $"p1" =!= $"p2", 1)).as("n_updated"),
          count(when($"p1".isNotNull && $"p2".isNotNull &&
            $"p1" === $"p2", 1)).as("n_carried"))
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      source AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
                    THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE (o_orderdate < TIMESTAMP '1999-01-01 00:00:00' AND o_custkey % 10 = 0)
           OR o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
      merged AS (
        SELECT t.o_orderkey, t.o_totalprice
        FROM target t WHERE NOT EXISTS
          (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
        UNION ALL
        SELECT t.o_orderkey, s.o_totalprice
        FROM target t JOIN source s ON t.o_orderkey = s.o_orderkey
        UNION ALL
        SELECT s.o_orderkey, s.o_totalprice
        FROM source s WHERE NOT EXISTS
          (SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey)),
      j AS (SELECT t.o_orderkey IS NOT NULL AS in1,
                   m.o_orderkey IS NOT NULL AS in2,
                   t.o_totalprice AS p1, m.o_totalprice AS p2
            FROM target t FULL JOIN merged m
              ON t.o_orderkey = m.o_orderkey)
      SELECT count(*) FILTER (WHERE in1) AS rows_v1,
             count(*) FILTER (WHERE in2) AS rows_v2,
             count(*) FILTER (WHERE NOT in1 AND in2) AS n_inserted,
             count(*) FILTER (WHERE in1 AND in2 AND p1 <> p2) AS n_updated,
             count(*) FILTER (WHERE in1 AND in2 AND p1 = p2) AS n_carried
      FROM j"""),
    covers = Seq("M1-merge", "TD-time-travel"))


  /** Change-data-feed between manifest versions
    * ([[graft.ops.ManifestTable.changes]] — Delta CDF vocabulary on
    * the native commit protocol): the q207 MERGE lifecycle leaves
    * versions 1 and 2; the feed returns exactly the rows an
    * incremental consumer that processed v1 must apply to reach v2 —
    * one `insert` per MERGE-inserted key, an `update_preimage` +
    * `update_postimage` pair per updated key (full row values both
    * sides), zero rows for carried keys. At 100 TB this IS how
    * downstream jobs consume a MERGE: the feed, never a rescan.
    * Oracle: the same target/merged algebra, re-classified
    * declaratively with full row values. */
  val q218 = Q(
    "q218_manifest_change_feed",
    (s, dir) => {
      import s.implicits._
      val cut = lit("1999-01-01").cast("timestamp")
      val target = Tables(s, dir, "orders")
        .filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val source = Tables(s, dir, "orders")
        .filter(($"o_orderdate" < cut && $"o_custkey" % 10 === 0) ||
                $"o_orderdate" >= cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          when($"o_orderdate" < cut, $"o_totalprice" * 2)
            .otherwise($"o_totalprice").as("o_totalprice"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q218_").toString + "/orders_tbl"
      import graft.ops.ManifestTable
      ManifestTable.commit(target, root)                      // version 1
      ManifestTable.merge(s, root, source, Seq("o_orderkey")) // version 2
      ManifestTable.changes(s, root, 1L, 2L, Seq("o_orderkey"))
        .orderBy($"o_orderkey", $"_change_type")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      source AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
                    THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE (o_orderdate < TIMESTAMP '1999-01-01 00:00:00' AND o_custkey % 10 = 0)
           OR o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
      merged AS (
        SELECT t.* FROM target t WHERE NOT EXISTS
          (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
        UNION ALL
        SELECT s.* FROM target t JOIN source s ON t.o_orderkey = s.o_orderkey
        UNION ALL
        SELECT s.* FROM source s WHERE NOT EXISTS
          (SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey)),
      ins AS (
        SELECT m.*, 'insert' AS _change_type FROM merged m
        WHERE NOT EXISTS
          (SELECT 1 FROM target t WHERE t.o_orderkey = m.o_orderkey)),
      del AS (
        SELECT t.*, 'delete' AS _change_type FROM target t
        WHERE NOT EXISTS
          (SELECT 1 FROM merged m WHERE m.o_orderkey = t.o_orderkey)),
      chg AS (
        SELECT t.o_orderkey,
               t.o_custkey AS pk, t.o_orderstatus AS ps, t.o_totalprice AS pp,
               m.o_custkey AS nk, m.o_orderstatus AS ns, m.o_totalprice AS np
        FROM target t JOIN merged m ON t.o_orderkey = m.o_orderkey
        WHERE t.o_custkey IS DISTINCT FROM m.o_custkey
           OR t.o_orderstatus IS DISTINCT FROM m.o_orderstatus
           OR t.o_totalprice IS DISTINCT FROM m.o_totalprice)
      SELECT * FROM (
        SELECT * FROM ins
        UNION ALL
        SELECT * FROM del
        UNION ALL
        SELECT o_orderkey, pk AS o_custkey, ps AS o_orderstatus,
               pp AS o_totalprice, 'update_preimage' AS _change_type
        FROM chg
        UNION ALL
        SELECT o_orderkey, nk, ns, np, 'update_postimage' FROM chg)
      ORDER BY o_orderkey, _change_type"""),
    covers = Seq("M1-merge", "TD-time-travel", "TD-change-feed"))

  /** END-TO-END CDC: a downstream grouped aggregate maintained PURELY
    * from [[graft.ops.ManifestTable.changes]] deltas across a
    * multi-version MERGE history ([[graft.ops.ChangeFeed]]) — the
    * consumer computes its full aggregate ONCE at version 1, then
    * applies only the signed change rows of v1→v2 and v2→v3; the
    * oracle recomputes the v3 aggregate from scratch, so the check IS
    * "incremental ≡ full recompute". Sums ride the DECIMAL channel so
    * the ±pre/post cancellation is exact, not float-drifty. At 100 TB
    * this closes the CDC loop q218 opened: a MERGE that touched 0.1%
    * of rows costs every downstream aggregate 0.1%, never a rescan. */
  val q219 = Q(
    "q219_change_feed_consumer",
    (s, dir) => {
      import s.implicits._
      val cut = lit("1999-01-01").cast("timestamp")
      val D = "decimal(18,6)"
      val orders = Tables(s, dir, "orders")
      val target = orders.filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val source1 = orders
        .filter(($"o_orderdate" < cut && $"o_custkey" % 10 === 0) ||
                $"o_orderdate" >= cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          when($"o_orderdate" < cut, $"o_totalprice" * 2)
            .otherwise($"o_totalprice").as("o_totalprice"))
      val source2 = orders.filter($"o_custkey" % 7 === 0)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          ($"o_totalprice" * 3).as("o_totalprice"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q219_").toString + "/orders_tbl"
      import graft.ops.{ChangeFeed, ManifestTable}
      ManifestTable.commit(target, root)                       // v1
      ManifestTable.merge(s, root, source1, Seq("o_orderkey")) // v2
      ManifestTable.merge(s, root, source2, Seq("o_orderkey")) // v3
      // the consumer's ONLY full read: the version it starts from
      var state = ManifestTable.readVersion(s, root, 1L)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast(D)).as("sum_price"))
      (1L to 2L).foreach { v =>
        val feed = ManifestTable.changes(s, root, v, v + 1,
          Seq("o_orderkey"))
        state = ChangeFeed.applyDelta(state,
          ChangeFeed.deltaAgg(feed, Seq("o_orderstatus"),
            col("o_totalprice").cast(D), "sum_price"),
          Seq("o_orderstatus"), "sum_price")
          // pin the decimal shape per round (same scale — a pure
          // precision-header widen, no value change) so repeated
          // applies never push precision into Spark's 38-cap
          // scale-reduction
          .withColumn("sum_price", col("sum_price").cast("decimal(30,6)"))
      }
      state.select($"o_orderstatus", $"n_rows",
        $"sum_price".cast("double").as("sum_price"))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      source1 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
                    THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE (o_orderdate < TIMESTAMP '1999-01-01 00:00:00' AND o_custkey % 10 = 0)
           OR o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
      merged AS (
        SELECT t.* FROM target t WHERE NOT EXISTS
          (SELECT 1 FROM source1 s WHERE s.o_orderkey = t.o_orderkey)
        UNION ALL
        SELECT s.* FROM target t JOIN source1 s ON t.o_orderkey = s.o_orderkey
        UNION ALL
        SELECT s.* FROM source1 s WHERE NOT EXISTS
          (SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey)),
      source2 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * 3 AS o_totalprice
        FROM orders WHERE o_custkey % 7 = 0),
      merged2 AS (
        SELECT m.* FROM merged m WHERE NOT EXISTS
          (SELECT 1 FROM source2 s WHERE s.o_orderkey = m.o_orderkey)
        UNION ALL
        SELECT s.* FROM merged m JOIN source2 s ON m.o_orderkey = s.o_orderkey
        UNION ALL
        SELECT s.* FROM source2 s WHERE NOT EXISTS
          (SELECT 1 FROM merged m WHERE m.o_orderkey = s.o_orderkey))
      SELECT o_orderstatus, count(*) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
                  AS DOUBLE) AS sum_price
      FROM merged2 GROUP BY 1 ORDER BY 1"""),
    covers = Seq("M1-merge", "TD-change-feed", "TD-cdc-consumer"))

  /** Per-COMMIT change history ([[graft.ops.ManifestTable
    * .changesPerVersion]] — Delta CDF's `_commit_version` form): the
    * q219 lifecycle's two MERGE steps produce one classified diff PER
    * commit, each row tagged with the version that introduced it — the
    * ordered/audit shape (per-commit triggers, compliance trails,
    * replaying a MERGE sequence elsewhere IN ORDER), where the q218
    * net feed would collapse a twice-touched key to one pair. A key
    * updated by both MERGEs appears here at versions 2 AND 3. Oracle:
    * both steps' classification re-derived declaratively and unioned
    * with version literals. */
  val q222 = Q(
    "q222_change_feed_history",
    (s, dir) => {
      import s.implicits._
      val cut = lit("1999-01-01").cast("timestamp")
      val orders = Tables(s, dir, "orders")
      val target = orders.filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val source1 = orders
        .filter(($"o_orderdate" < cut && $"o_custkey" % 10 === 0) ||
                $"o_orderdate" >= cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          when($"o_orderdate" < cut, $"o_totalprice" * 2)
            .otherwise($"o_totalprice").as("o_totalprice"))
      val source2 = orders.filter($"o_custkey" % 7 === 0)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          ($"o_totalprice" * 3).as("o_totalprice"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q222_").toString + "/orders_tbl"
      import graft.ops.ManifestTable
      ManifestTable.commit(target, root)                       // v1
      ManifestTable.merge(s, root, source1, Seq("o_orderkey")) // v2
      ManifestTable.merge(s, root, source2, Seq("o_orderkey")) // v3
      ManifestTable.changesPerVersion(s, root, 1L, 3L, Seq("o_orderkey"))
        .orderBy($"_commit_version", $"o_orderkey", $"_change_type")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      source1 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
                    THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE (o_orderdate < TIMESTAMP '1999-01-01 00:00:00' AND o_custkey % 10 = 0)
           OR o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
      merged AS (
        SELECT t.* FROM target t WHERE NOT EXISTS
          (SELECT 1 FROM source1 s WHERE s.o_orderkey = t.o_orderkey)
        UNION ALL
        SELECT s.* FROM target t JOIN source1 s ON t.o_orderkey = s.o_orderkey
        UNION ALL
        SELECT s.* FROM source1 s WHERE NOT EXISTS
          (SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey)),
      source2 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * 3 AS o_totalprice
        FROM orders WHERE o_custkey % 7 = 0),
      merged2 AS (
        SELECT m.* FROM merged m WHERE NOT EXISTS
          (SELECT 1 FROM source2 s WHERE s.o_orderkey = m.o_orderkey)
        UNION ALL
        SELECT s.* FROM merged m JOIN source2 s ON m.o_orderkey = s.o_orderkey
        UNION ALL
        SELECT s.* FROM source2 s WHERE NOT EXISTS
          (SELECT 1 FROM merged m WHERE m.o_orderkey = s.o_orderkey)),
      step1 AS (
        SELECT m.*, 'insert' AS _change_type FROM merged m
        WHERE NOT EXISTS
          (SELECT 1 FROM target t WHERE t.o_orderkey = m.o_orderkey)
        UNION ALL
        SELECT t.*, 'delete' FROM target t WHERE NOT EXISTS
          (SELECT 1 FROM merged m WHERE m.o_orderkey = t.o_orderkey)
        UNION ALL
        SELECT t.*, 'update_preimage'
        FROM target t JOIN merged m ON t.o_orderkey = m.o_orderkey
        WHERE t.o_custkey IS DISTINCT FROM m.o_custkey
           OR t.o_orderstatus IS DISTINCT FROM m.o_orderstatus
           OR t.o_totalprice IS DISTINCT FROM m.o_totalprice
        UNION ALL
        SELECT m.*, 'update_postimage'
        FROM target t JOIN merged m ON t.o_orderkey = m.o_orderkey
        WHERE t.o_custkey IS DISTINCT FROM m.o_custkey
           OR t.o_orderstatus IS DISTINCT FROM m.o_orderstatus
           OR t.o_totalprice IS DISTINCT FROM m.o_totalprice),
      step2 AS (
        SELECT b.*, 'insert' AS _change_type FROM merged2 b
        WHERE NOT EXISTS
          (SELECT 1 FROM merged m WHERE m.o_orderkey = b.o_orderkey)
        UNION ALL
        SELECT m.*, 'delete' FROM merged m WHERE NOT EXISTS
          (SELECT 1 FROM merged2 b WHERE b.o_orderkey = m.o_orderkey)
        UNION ALL
        SELECT m.*, 'update_preimage'
        FROM merged m JOIN merged2 b ON m.o_orderkey = b.o_orderkey
        WHERE m.o_custkey IS DISTINCT FROM b.o_custkey
           OR m.o_orderstatus IS DISTINCT FROM b.o_orderstatus
           OR m.o_totalprice IS DISTINCT FROM b.o_totalprice
        UNION ALL
        SELECT b.*, 'update_postimage'
        FROM merged m JOIN merged2 b ON m.o_orderkey = b.o_orderkey
        WHERE m.o_custkey IS DISTINCT FROM b.o_custkey
           OR m.o_orderstatus IS DISTINCT FROM b.o_orderstatus
           OR m.o_totalprice IS DISTINCT FROM b.o_totalprice)
      SELECT * FROM (
        SELECT s1.*, CAST(2 AS BIGINT) AS _commit_version FROM step1 s1
        UNION ALL
        SELECT s2.*, CAST(3 AS BIGINT) FROM step2 s2)
      ORDER BY _commit_version, o_orderkey, _change_type"""),
    covers = Seq("M1-merge", "TD-change-feed", "TD-cdc-audit"))

  /** DELETE + UPDATE DML on the manifest store, observed through the
    * change feed ([[graft.ops.ManifestTable.deleteWhere]] /
    * [[graft.ops.ManifestTable.updateWhere]]) — the DML triangle's
    * missing two sides (MERGE has q13/q207): v1 commits the pre-cut
    * orders, v2 DELETEs every %3 customer's rows, v3 UPDATEs surviving
    * %5 customers' priority + 10% price bump; the per-commit history
    * then shows EXACT `delete` rows (the retraction values a consumer
    * applies) at v2 and pre/post pairs at v3 — the first oracle-backed
    * DELETE path in the CDF suite (q218/q222's MERGEs never delete).
    * Oracle: both steps re-derived declaratively. */
  val q223 = Q(
    "q223_manifest_dml_feed",
    (s, dir) => {
      import s.implicits._
      val cut = lit("1999-01-01").cast("timestamp")
      val target = Tables(s, dir, "orders")
        .filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val root = java.nio.file.Files
        .createTempDirectory("graft_q223_").toString + "/orders_tbl"
      import graft.ops.ManifestTable
      ManifestTable.commit(target, root)                          // v1
      ManifestTable.deleteWhere(s, root, $"o_custkey" % 3 === 0)  // v2
      ManifestTable.updateWhere(s, root, $"o_custkey" % 5 === 0,  // v3
        Map("o_orderstatus" -> lit("U"),
          "o_totalprice" -> ($"o_totalprice" * 1.1)))
      ManifestTable.changesPerVersion(s, root, 1L, 3L, Seq("o_orderkey"))
        .orderBy($"_commit_version", $"o_orderkey", $"_change_type")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      survivors AS (SELECT * FROM target WHERE o_custkey % 3 <> 0),
      step1 AS (
        SELECT t.*, 'delete' AS _change_type FROM target t
        WHERE o_custkey % 3 = 0),
      step2 AS (
        SELECT s.*, 'update_preimage' AS _change_type FROM survivors s
        WHERE o_custkey % 5 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               o_totalprice * 1.1 AS o_totalprice, 'update_postimage'
        FROM survivors WHERE o_custkey % 5 = 0)
      SELECT * FROM (
        SELECT s1.*, CAST(2 AS BIGINT) AS _commit_version FROM step1 s1
        UNION ALL
        SELECT s2.*, CAST(3 AS BIGINT) FROM step2 s2)
      ORDER BY _commit_version, o_orderkey, _change_type"""),
    covers = Seq("M1-merge", "TD-change-feed", "TD-dml-delete-update"))

  /** COMMITTED data skipping ([[graft.ops.ZTable.optimizeZOrder]] —
    * round-11 VERDICT ask #2, closing the q220/q221 gap): the z-order
    * rewrite commits per-file min/max stats AND per-file Bloom
    * registers INTO the transactional version (the IndexStore
    * multi-frame precedent; Delta per-file stats / Snowflake
    * micro-partition metadata), so a RESTARTED session prunes off
    * committed metadata — no session state, no rebuild, and the
    * layout can never drift from the table version. The commit is
    * dataChange-false: the change feed across it is EMPTY
    * (`feed_empty_across_optimize`, hash-checked). The read half
    * proves both prunings in-band: `range_pruned` (the x-range scan
    * opened strictly fewer files than the version has) and
    * `bloom_pruned` (the committed registers shortlisted strictly
    * fewer files for a point key), while `n_rows`/`sum_price`/
    * `n_bloom_rows_found` pin the pruned reads' CORRECTNESS against
    * the raw table — a pruner that dropped a matching file
    * hash-mismatches. Exact file counts are spec-locked (`ZTableSpec`
    * — the sampled range shuffle's boundaries are deterministic for a
    * fixed input but not expressible in ANSI SQL). */
  val q224 = Q(
    "q224_committed_skipping",
    (s, dir) => {
      import s.implicits._
      import graft.ops.{ManifestTable, ZTable}
      val cut = lit("1999-01-01").cast("timestamp")
      val target = Tables(s, dir, "orders")
        .filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice",
          // 32-slot date bucket as the SECONDARY cluster dim: the
          // z-curve then spends its high bits on o_custkey — the
          // dimension the predicates prune on — at EVERY scale factor
          // (a full-width day offset out-bits custkey at small SFs and
          // starves the custkey ranges of their clustering)
          (datediff($"o_orderdate".cast("date"), lit("1995-01-01")) % 32)
            .cast("long").as("o_day_slot"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q224_").toString + "/orders_tbl"
      ManifestTable.commit(target, root)                            // v1
      ZTable.optimizeZOrder(s, root, "o_custkey", "o_day_slot",
        "o_orderkey", nFiles = 16, bloomCol = Some("o_orderkey"))   // v2
      val feedEmpty =
        ManifestTable.changes(s, root, 1L, 2L, Seq("o_orderkey")).isEmpty
      // ---- read half: everything below resolves from COMMITTED
      // metadata only (restart-safe by construction) ----
      val nTotal = ZTable.stats(s, root, 2L).count()
      val scan = ZTable.scanXRange(s, root, 100L, 150L)
      val nRead = scan.inputFiles.length.toLong
      // committed-Bloom point lookup: smallest real key, then verify
      // by actually reading ONLY the candidate files
      val probeKey = target.agg(min($"o_orderkey")).head().getLong(0)
      val cand = ZTable.bloomCandidateFiles(s, root, lit(probeKey))
      val found = graft.ops.MetaIO.readParquet(s, cand.map(p => s"$root/$p"))
        .filter($"o_orderkey" === probeKey).count()
      scan.agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("range_pruned", lit(nRead < nTotal && nTotal > 1L))
        .withColumn("bloom_pruned", lit(cand.size.toLong < nTotal))
        .withColumn("n_bloom_rows_found", lit(found))
        .withColumn("feed_empty_across_optimize", lit(feedEmpty))
        .select($"n_rows", $"sum_price", $"range_pruned",
          $"bloom_pruned", $"n_bloom_rows_found",
          $"feed_empty_across_optimize")
    },
    Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS range_pruned,
             true AS bloom_pruned,
             (SELECT CAST(count(*) AS BIGINT) FROM orders
              WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
                AND o_orderkey = (SELECT min(o_orderkey) FROM orders
                  WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'))
               AS n_bloom_rows_found,
             true AS feed_empty_across_optimize
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        AND o_custkey BETWEEN 100 AND 150"""),
    covers = Seq("TD-layout-zorder", "TD-data-skipping",
      "TD-committed-stats"))

  /** SCOPED DML off the committed stats (round-11 VERDICT ask #3):
    * DELETE and UPDATE rewrite ONLY the files whose committed x-range
    * intersects the predicate's range conjunct; every other file rides
    * into the new version BY REFERENCE (path identity spec-pinned in
    * `ZTableSpec`; `reused_refs` asserts it in-band — true iff the
    * final version still references files written by EARLIER
    * versions). The feeds across both DML commits are counted against
    * the oracle (`n_del_feed` = exact retraction rows, `n_upd_feed` =
    * postimage rows), and the final aggregate proves end-state
    * equivalence with the declarative DML. At 100 TB: a DELETE
    * touching 0.1% of the key space rewrites 0.1% of the files. */
  val q225 = Q(
    "q225_scoped_dml",
    (s, dir) => {
      import s.implicits._
      import graft.ops.{ManifestTable, ZTable}
      val cut = lit("1999-01-01").cast("timestamp")
      val target = Tables(s, dir, "orders")
        .filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice",
          // 32-slot date bucket as the SECONDARY cluster dim: the
          // z-curve then spends its high bits on o_custkey — the
          // dimension the predicates prune on — at EVERY scale factor
          // (a full-width day offset out-bits custkey at small SFs and
          // starves the custkey ranges of their clustering)
          (datediff($"o_orderdate".cast("date"), lit("1995-01-01")) % 32)
            .cast("long").as("o_day_slot"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q225_").toString + "/orders_tbl"
      ManifestTable.commit(target, root)                            // v1
      ZTable.optimizeZOrder(s, root, "o_custkey", "o_day_slot",
        "o_orderkey", nFiles = 16)                                  // v2
      ZTable.deleteWhereScoped(s, root, 20L, 40L,
        extra = $"o_orderstatus" === "F")                           // v3
      ZTable.updateWhereScoped(s, root, 60L, 90L,
        Map("o_orderstatus" -> lit("U"),
          "o_totalprice" -> ($"o_totalprice" * 1.1)))               // v4
      val nDel = ManifestTable.changes(s, root, 2L, 3L, Seq("o_orderkey"))
        .filter($"_change_type" === "delete").count()
      val nUpd = ManifestTable.changes(s, root, 3L, 4L, Seq("o_orderkey"))
        .filter($"_change_type" === "update_postimage").count()
      // reference reuse, observable in the committed metadata: the
      // current version still points at files of OLDER version dirs
      val reused = ZTable.stats(s, root, 4L).select($"path")
        .as[String].collect().exists(!_.startsWith("d4-"))
      ManifestTable.read(s, root).get
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("n_del_feed", lit(nDel))
        .withColumn("n_upd_feed", lit(nUpd))
        .withColumn("reused_refs", lit(reused))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      surv AS (
        SELECT * FROM target
        WHERE NOT (o_custkey BETWEEN 20 AND 40 AND o_orderstatus = 'F')),
      upd AS (
        SELECT o_orderkey,
               CASE WHEN o_custkey BETWEEN 60 AND 90
                    THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_custkey BETWEEN 60 AND 90
                    THEN o_totalprice * 1.1 ELSE o_totalprice END
                 AS o_totalprice
        FROM surv)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             (SELECT CAST(count(*) AS BIGINT) FROM target
              WHERE o_custkey BETWEEN 20 AND 40 AND o_orderstatus = 'F')
               AS n_del_feed,
             (SELECT CAST(count(*) AS BIGINT) FROM surv
              WHERE o_custkey BETWEEN 60 AND 90) AS n_upd_feed,
             true AS reused_refs
      FROM upd GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-data-skipping", "TD-dml-delete-update",
      "TD-scoped-dml"))

  /** CHAINED CDF consumers — sink-of-a-sink (round-11 VERDICT ask
    * #4's correctness row): the first [[graft.ops.ChangeFeed.sync]]
    * hop maintains a (status, bucket) aggregate of the source table
    * from its change feeds; the SECOND hop consumes the CHANGE FEED OF
    * THE FIRST SINK (sync is table-generic — the sink is itself a
    * ManifestTable) into a per-status rollup. Both hops run after
    * EVERY source commit (bootstrap, then incremental), so the final
    * second-hop state was built purely from two levels of deltas —
    * and the oracle recomputes it from scratch off the final merged
    * table: "incremental-of-incremental ≡ full recompute". The
    * STREAMING wiring of the same step function is
    * [[graft.streaming.CdfStream]] (lifecycle + checkpoint-loss specs
    * in `CdfStreamSpec`). At 100 TB this is the fan-out story: each
    * downstream layer pays change-set-sized work, and layers COMPOSE
    * because every sink is itself a versioned, feed-emitting table. */
  val q226 = Q(
    "q226_cdf_chained_consumer",
    (s, dir) => {
      import s.implicits._
      import graft.ops.{ChangeFeed, ManifestTable}
      val D = "decimal(18,6)"
      val cut = lit("1999-01-01").cast("timestamp")
      val orders = Tables(s, dir, "orders")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice", ($"o_custkey" % 10).as("o_bucket"))
      val target = shaped(orders.filter($"o_orderdate" < cut))
      val source1 = shaped(orders
        .filter(($"o_orderdate" < cut && $"o_custkey" % 10 === 0) ||
                $"o_orderdate" >= cut))
        .withColumn("o_totalprice",
          when($"o_bucket" === 0, $"o_totalprice" * 2)
            .otherwise($"o_totalprice"))
      val source2 = shaped(orders.filter($"o_custkey" % 7 === 0))
        .withColumn("o_totalprice", $"o_totalprice" * 3)
      val base = java.nio.file.Files
        .createTempDirectory("graft_q226_").toString
      val (src, sink1, sink2) =
        (s"$base/src", s"$base/hop1", s"$base/hop2")
      def syncBoth(): Unit = {
        ChangeFeed.sync(s, src, sink1, keys = Seq("o_orderkey"),
          groupCols = Seq("o_orderstatus", "o_bucket"),
          value = $"o_totalprice".cast(D), valueAlias = "sum_price")
        ChangeFeed.sync(s, sink1, sink2,
          keys = Seq("o_orderstatus", "o_bucket"),
          groupCols = Seq("o_orderstatus"),
          value = $"sum_price", valueAlias = "sum_price_total"): Unit
      }
      ManifestTable.commit(target, src); syncBoth()           // src v1
      ManifestTable.merge(s, src, source1, Seq("o_orderkey"))
      syncBoth()                                              // src v2
      ManifestTable.merge(s, src, source2, Seq("o_orderkey"))
      syncBoth()                                              // src v3
      ManifestTable.read(s, sink2).get
        .select($"o_orderstatus", $"n_rows".as("n_buckets"),
          $"sum_price_total".cast("double").as("sum_price_total"))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      source1 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_custkey % 10 = 0
                    THEN o_totalprice * 2 ELSE o_totalprice END
                 AS o_totalprice
        FROM orders
        WHERE (o_orderdate < TIMESTAMP '1999-01-01 00:00:00' AND o_custkey % 10 = 0)
           OR o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
      merged AS (
        SELECT t.* FROM target t WHERE NOT EXISTS
          (SELECT 1 FROM source1 s WHERE s.o_orderkey = t.o_orderkey)
        UNION ALL
        SELECT s.* FROM target t JOIN source1 s ON t.o_orderkey = s.o_orderkey
        UNION ALL
        SELECT s.* FROM source1 s WHERE NOT EXISTS
          (SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey)),
      source2 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * 3 AS o_totalprice
        FROM orders WHERE o_custkey % 7 = 0),
      merged2 AS (
        SELECT m.* FROM merged m WHERE NOT EXISTS
          (SELECT 1 FROM source2 s WHERE s.o_orderkey = m.o_orderkey)
        UNION ALL
        SELECT s.* FROM merged m JOIN source2 s ON m.o_orderkey = s.o_orderkey
        UNION ALL
        SELECT s.* FROM source2 s WHERE NOT EXISTS
          (SELECT 1 FROM merged m WHERE m.o_orderkey = s.o_orderkey))
      SELECT o_orderstatus,
             CAST(count(DISTINCT o_custkey % 10) AS BIGINT) AS n_buckets,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price_total
      FROM merged2 GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-change-feed", "TD-cdc-consumer", "TD-cdc-chained"))

  /** RESTORE as a committed version ([[graft.ops.ManifestTable
    * .restore]] — Delta's `RESTORE TABLE … VERSION AS OF`): after a
    * scoped DELETE, restoring the pre-DML version makes its content
    * current AGAIN as a new version — by REFERENCE (`zero_copy`
    * asserts every data path of the restored version lives in a
    * PRE-restore dir: zero data bytes moved, at any table size, the
    * file-list model's payoff), with history preserved (the deleted
    * state stays time-travelable) and the feed across the restore
    * being exactly the DML's inverse (`n_restore_inserts`
    * hash-checked against the delete's row count). The final
    * aggregate equals the pre-DML table — which IS the oracle. */
  val q227 = Q(
    "q227_restore_feed",
    (s, dir) => {
      import s.implicits._
      import graft.ops.{ManifestTable, ZTable}
      val cut = lit("1999-01-01").cast("timestamp")
      val target = Tables(s, dir, "orders")
        .filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice",
          (datediff($"o_orderdate".cast("date"), lit("1995-01-01")) % 32)
            .cast("long").as("o_day_slot"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q227_").toString + "/orders_tbl"
      ManifestTable.commit(target, root)                            // v1
      ZTable.optimizeZOrder(s, root, "o_custkey", "o_day_slot",
        "o_orderkey", nFiles = 16)                                  // v2
      ZTable.deleteWhereScoped(s, root, 20L, 40L,
        extra = $"o_orderstatus" === "F")                           // v3
      ManifestTable.restore(s, root, 2L)                            // v4
      val nIns = ManifestTable.changes(s, root, 3L, 4L, Seq("o_orderkey"))
        .filter($"_change_type" === "insert").count()
      val zeroCopy = ZTable.stats(s, root, 4L).select($"path")
        .as[String].collect().forall(!_.startsWith("d4-"))
      ManifestTable.read(s, root).get
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("n_restore_inserts", lit(nIns))
        .withColumn("zero_copy", lit(zeroCopy))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00')
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             (SELECT CAST(count(*) AS BIGINT) FROM target
              WHERE o_custkey BETWEEN 20 AND 40 AND o_orderstatus = 'F')
               AS n_restore_inserts,
             true AS zero_copy
      FROM target GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-time-travel", "TD-restore", "TD-change-feed"))

  /** SHALLOW CLONE + divergence ([[graft.ops.ManifestTable
    * .cloneShallow]] — Delta's `SHALLOW CLONE`): the clone's v1
    * references the source's files by absolute path (`zero_copy`
    * asserts every stats path of clone v1 points OUTSIDE the clone
    * root — zero data bytes copied at any table size), then the two
    * histories diverge independently: a scoped UPDATE + a MERGE land
    * on the clone (the scoped DML rewrites only intersecting files
    * and carries still-external refs forward), a scoped DELETE lands
    * on the source — and neither table sees the other's commits. The
    * oracle computes both final states relationally. */
  val q228 = Q(
    "q228_clone_divergence",
    (s, dir) => {
      import s.implicits._
      import graft.ops.{ManifestTable, ZTable}
      val cut = lit("1999-01-01").cast("timestamp")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice",
          (datediff($"o_orderdate".cast("date"), lit("1995-01-01")) % 32)
            .cast("long").as("o_day_slot"))
      val orders = Tables(s, dir, "orders")
      val target = shaped(orders.filter($"o_orderdate" < cut))
      val source1 = shaped(orders.filter($"o_orderdate" >= cut))
      val base = java.nio.file.Files
        .createTempDirectory("graft_q228_").toString
      val (src, cl) = (s"$base/src_tbl", s"$base/clone_tbl")
      ManifestTable.commit(target, src)                         // src v1
      ZTable.optimizeZOrder(s, src, "o_custkey", "o_day_slot",
        "o_orderkey", nFiles = 16)                              // src v2
      ManifestTable.cloneShallow(s, src, cl)                    // clone v1
      val zeroCopy = ZTable.stats(s, cl, 1L).select($"path")
        .as[String].collect()
        .forall(p => p.startsWith("/") || p.contains("://"))
      ZTable.updateWhereScoped(s, cl, 20L, 40L,
        Map("o_totalprice" -> ($"o_totalprice" * 2)),
        extra = $"o_orderstatus" === "O")                       // clone v2
      ManifestTable.merge(s, cl, source1, Seq("o_orderkey"))    // clone v3
      ZTable.deleteWhereScoped(s, src, 50L, 80L)                // src v3
      def aggOf(root: String, tag: String) =
        ManifestTable.read(s, root).get
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n_rows"),
            sum($"o_totalprice".cast("decimal(18,6)"))
              .cast("double").as("sum_price"))
          .withColumn("tbl", lit(tag))
      aggOf(src, "source").unionByName(aggOf(cl, "clone"))
        .withColumn("zero_copy", lit(zeroCopy))
        .select($"tbl", $"o_orderstatus", $"n_rows", $"sum_price",
          $"zero_copy")
        .orderBy($"tbl", $"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      src_final AS (
        SELECT * FROM target WHERE NOT (o_custkey BETWEEN 50 AND 80)),
      clone_upd AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_custkey BETWEEN 20 AND 40
                         AND o_orderstatus = 'O'
                    THEN o_totalprice * 2 ELSE o_totalprice END
                 AS o_totalprice
        FROM target),
      source1 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
      clone_final AS (
        SELECT * FROM clone_upd UNION ALL SELECT * FROM source1),
      both_tbls AS (
        SELECT 'source' AS tbl, o_orderstatus, o_totalprice FROM src_final
        UNION ALL
        SELECT 'clone' AS tbl, o_orderstatus, o_totalprice
        FROM clone_final)
      SELECT tbl, o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS zero_copy
      FROM both_tbls GROUP BY 1, 2 ORDER BY 1, 2"""),
    covers = Seq("TD-clone", "TD-time-travel", "TD-scoped-dml"))

  /** DESCRIBE HISTORY ([[graft.ops.ManifestTable.history]] — Delta's
    * `DESCRIBE HISTORY`): a six-commit lifecycle (WRITE, keyed MERGE,
    * UPDATE, DELETE, OPTIMIZE, RESTORE) read back as the table's
    * audit log — version, the operation that produced it, the batch
    * key it carried, whether it is a file-list version — each joined
    * with that version's actual time-travel row count. Everything
    * here is O(versions) metadata plus one count per version (audit
    * grain); the oracle pins the exact expected log as VALUES with
    * relationally-computed counts. */
  val q229 = Q(
    "q229_table_history",
    (s, dir) => {
      import s.implicits._
      import graft.ops.ManifestTable
      val cut = lit("1999-01-01").cast("timestamp")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val orders = Tables(s, dir, "orders")
      val target = shaped(orders.filter($"o_orderdate" < cut))
      val source = shaped(orders.filter($"o_orderdate" >= cut))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q229_").toString + "/orders_tbl"
      ManifestTable.commit(target, root)                          // v1
      ManifestTable.mergeBatch(s, root, source, Seq("o_orderkey"),
        batchKey = "demo-1")                                      // v2
      ManifestTable.updateWhere(s, root, $"o_custkey" % 5 === 0,
        Map("o_totalprice" -> ($"o_totalprice" * 2)))             // v3
      ManifestTable.deleteWhere(s, root, $"o_custkey" % 7 === 3)  // v4
      ManifestTable.optimize(s, root, targetFiles = 4)            // v5
      ManifestTable.restore(s, root, 3L)                          // v6
      val rows = ManifestTable.history(s, root).collect().toIndexedSeq
        .map { r =>
          val v = r.getLong(r.fieldIndex("version"))
          (v, r.getString(r.fieldIndex("operation")),
            r.getString(r.fieldIndex("batch_key")),
            r.getBoolean(r.fieldIndex("is_filelist")),
            // exact metadata count (== readVersion(v).count(),
            // spec-pinned) — a 2-job Spark count per version probe
            // was the query's dominant cost
            ManifestTable.countVersion(s, root, v))
        }
      s.createDataFrame(rows)
        .toDF("version", "operation", "batch_key", "is_filelist",
          "n_rows")
        .orderBy($"version")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      source AS (
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
      merged AS (SELECT * FROM target UNION ALL SELECT * FROM source),
      after_delete AS (
        SELECT * FROM merged WHERE NOT (o_custkey % 7 = 3))
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'WRITE', CAST(NULL AS VARCHAR), false,
         (SELECT count(*) FROM target)),
        (CAST(2 AS BIGINT), 'MERGE', 'demo-1', false,
         (SELECT count(*) FROM merged)),
        (CAST(3 AS BIGINT), 'UPDATE', CAST(NULL AS VARCHAR), false,
         (SELECT count(*) FROM merged)),
        (CAST(4 AS BIGINT), 'DELETE', CAST(NULL AS VARCHAR), false,
         (SELECT count(*) FROM after_delete)),
        (CAST(5 AS BIGINT), 'OPTIMIZE', CAST(NULL AS VARCHAR), false,
         (SELECT count(*) FROM after_delete)),
        (CAST(6 AS BIGINT), 'RESTORE', CAST(NULL AS VARCHAR), true,
         (SELECT count(*) FROM merged))
      ) AS t(version, operation, batch_key, is_filelist, n_rows)
      ORDER BY version"""),
    covers = Seq("TD-history", "TD-time-travel"))

  /** CHECK constraints ([[graft.ops.Checks]] — Delta's `ADD
    * CONSTRAINT … CHECK`): two named constraints registered on the
    * root; valid WRITE and MERGE commit normally; a MERGE whose
    * source violates one and an UPDATE whose post-image violates the
    * other are both REJECTED before any data lands (`table_version`
    * pins that the table never advanced past the valid commits);
    * [[graft.ops.Checks.validate]] certifies the surviving state
    * clean with one aggregate scan. The final content equals the two
    * valid commits — which is the oracle. */
  val q230 = Q(
    "q230_check_constraints",
    (s, dir) => {
      import s.implicits._
      import graft.ops.{CheckViolationException, Checks, ManifestTable}
      val cut = lit("1999-01-01").cast("timestamp")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val orders = Tables(s, dir, "orders")
      val target = shaped(orders.filter($"o_orderdate" < cut))
      val source = shaped(orders.filter($"o_orderdate" >= cut))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q230_").toString + "/orders_tbl"
      Checks.setCheck(s, root, "price_positive", "o_totalprice > 0")
      Checks.setCheck(s, root, "status_known",
        "o_orderstatus IN ('O', 'F', 'P')")
      ManifestTable.commit(target, root)                          // v1
      ManifestTable.merge(s, root, source, Seq("o_orderkey"))     // v2
      val rejectedMerge =
        try {
          ManifestTable.merge(s, root,
            source.withColumn("o_totalprice", -$"o_totalprice"),
            Seq("o_orderkey"))
          false
        } catch { case _: CheckViolationException => true }
      val rejectedUpdate =
        try {
          ManifestTable.updateWhere(s, root, $"o_custkey" % 3 === 0,
            Map("o_orderstatus" -> lit("X")))
          false
        } catch { case _: CheckViolationException => true }
      val certified = Checks.validate(s, root).values.forall(_ == 0L)
      val vNow = ManifestTable.currentVersion(s, root).get
      ManifestTable.read(s, root).get
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("rejected_merge", lit(rejectedMerge))
        .withColumn("rejected_update", lit(rejectedUpdate))
        .withColumn("table_version", lit(vNow))
        .withColumn("certified", lit(certified))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      source AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
      final AS (SELECT * FROM target UNION ALL SELECT * FROM source)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS rejected_merge, true AS rejected_update,
             CAST(2 AS BIGINT) AS table_version, true AS certified
      FROM final GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-constraints", "TD-quality"))

  /** CONVERT TO manifest table IN PLACE ([[graft.ops.ManifestTable
    * .convertInPlace]] — Delta's `CONVERT TO DELTA`): a plain parquet
    * landing directory becomes v1 of a transactional table by
    * REFERENCE (`zero_copy` asserts every v1 entry points into the
    * legacy `raw/` dir — zero bytes moved at any table size, the
    * whole point of converting a 100 TB landing zone), then the full
    * surface applies on top: a MERGE (v2, whose change feed against
    * the converted v1 is exactly the inserted batch — `n_feed_inserts`
    * hash-checked), a DELETE (v3), and the audit log records
    * CONVERT/MERGE/DELETE. Final content = the declarative
    * equivalent, which is the oracle. */
  val q231 = Q(
    "q231_convert_in_place",
    (s, dir) => {
      import s.implicits._
      import graft.ops.ManifestTable
      val cut = lit("1999-01-01").cast("timestamp")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val orders = Tables(s, dir, "orders")
      val target = shaped(orders.filter($"o_orderdate" < cut))
      val source = shaped(orders.filter($"o_orderdate" >= cut))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q231_").toString + "/orders_tbl"
      // the legacy landing dir a real deployment already has
      target.write.parquet(s"$root/raw")
      ManifestTable.convertInPlace(s, root, "raw")              // v1
      val zeroCopy = ManifestTable.versionFileRefs(s, root, 1L).get
        .forall(_.startsWith("raw/"))
      ManifestTable.merge(s, root, source, Seq("o_orderkey"))   // v2
      ManifestTable.deleteWhere(s, root, $"o_custkey" % 7 === 3) // v3
      val nIns = ManifestTable.changes(s, root, 1L, 2L,
        Seq("o_orderkey"))
        .filter($"_change_type" === "insert").count()
      val ops = ManifestTable.history(s, root)
        .orderBy($"version").select($"operation").as[String]
        .collect().mkString(",")
      ManifestTable.read(s, root).get
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("zero_copy", lit(zeroCopy))
        .withColumn("n_feed_inserts", lit(nIns))
        .withColumn("op_log", lit(ops))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      source AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
      merged AS (SELECT * FROM target UNION ALL SELECT * FROM source),
      final AS (SELECT * FROM merged WHERE NOT (o_custkey % 7 = 3))
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS zero_copy,
             (SELECT CAST(count(*) AS BIGINT) FROM source)
               AS n_feed_inserts,
             'CONVERT,MERGE,DELETE' AS op_log
      FROM final GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-convert", "TD-history", "TD-change-feed"))

  /** GENERATED ALWAYS AS columns ([[graft.ops.Generated]] — Delta's
    * generated-column semantic): `o_price_band` is registered as
    * `FLOOR(o_totalprice / 50000)`; the initial WRITE and the first
    * MERGE provide NO such column and get it computed inside the
    * write plan; a second MERGE provides WRONG values and is rejected
    * whole before anything lands (`table_version` pins no advance); a
    * third provides correct values and commits. The final per-band
    * aggregate — grouped BY the generated column — equals the oracle
    * computing the band relationally. */
  val q232 = Q(
    "q232_generated_columns",
    (s, dir) => {
      import s.implicits._
      import graft.ops.{Generated, GeneratedColumnViolation, ManifestTable}
      val cut = lit("1999-01-01").cast("timestamp")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val orders = Tables(s, dir, "orders")
      val target = shaped(orders.filter($"o_orderdate" < cut))
      val post = orders.filter($"o_orderdate" >= cut)
      val source1 = shaped(post.filter($"o_custkey" % 2 === 0))
      val source2 = shaped(post.filter($"o_custkey" % 2 === 1))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q232_").toString + "/orders_tbl"
      Generated.setGenerated(s, root, "o_price_band",
        "CAST(FLOOR(o_totalprice / 50000) AS BIGINT)")
      ManifestTable.commit(target, root)                          // v1
      ManifestTable.merge(s, root, source1, Seq("o_orderkey"))    // v2
      val rejected =
        try {
          ManifestTable.merge(s, root,
            source2.withColumn("o_price_band", lit(-999L)),
            Seq("o_orderkey"))
          false
        } catch { case _: GeneratedColumnViolation => true }
      ManifestTable.merge(s, root,                                // v3
        source2.withColumn("o_price_band",
          floor($"o_totalprice" / 50000).cast("long")),
        Seq("o_orderkey"))
      val vNow = ManifestTable.currentVersion(s, root).get
      ManifestTable.read(s, root).get
        .groupBy($"o_price_band")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("rejected_bad_values", lit(rejected))
        .withColumn("table_version", lit(vNow))
        .orderBy($"o_price_band")
    },
    Some("""
      WITH final AS (
        SELECT o_totalprice FROM orders)
      SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS o_price_band,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS rejected_bad_values,
             CAST(3 AS BIGINT) AS table_version
      FROM final GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-generated-columns", "TD-constraints"))

  /** DELETION VECTORS — merge-on-read DELETE ([[graft.ops
    * .ManifestTable.deleteWhereDV]] — Delta's deletion vectors /
    * Iceberg v2 position deletes): two successive DELETEs commit ONLY
    * (file key, row index) position vectors — `zero_copy` asserts
    * both versions reference exactly the v1 data files (zero bytes
    * rewritten; at 100 TB a DELETE costs one scan to find positions
    * and O(deleted) metadata to commit); readers pay one anti-join.
    * The feed across each DV commit is exactly its delete set
    * (`n_dv1_deletes`/`n_dv2_deletes` hash-checked), and the closing
    * MERGE materializes the vector. The final aggregate equals the
    * declarative equivalent — the oracle. */
  val q233 = Q(
    "q233_deletion_vectors",
    (s, dir) => {
      import s.implicits._
      import graft.ops.ManifestTable
      val cut = lit("1995-07-01").cast("timestamp")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val orders = Tables(s, dir, "orders")
      val hi = lit("2001-01-01").cast("timestamp")
      val target = shaped(orders.filter($"o_orderdate" < cut))
      val source = shaped(orders.filter($"o_orderdate" >= hi))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q233_").toString + "/orders_tbl"
      ManifestTable.commit(target, root)                          // v1
      ManifestTable.deleteWhereDV(s, root,
        $"o_custkey" % 7 === 3)                                   // v2
      ManifestTable.deleteWhereDV(s, root,
        $"o_orderstatus" === "F" && $"o_custkey" % 5 === 0)       // v3
      val zeroCopy = Seq(2L, 3L).forall(v =>
        ManifestTable.versionFileRefs(s, root, v).exists(refs =>
          refs.nonEmpty && refs.forall(_.startsWith("d1-"))))
      val nDv1 = ManifestTable.changes(s, root, 1L, 2L,
        Seq("o_orderkey"))
        .filter($"_change_type" === "delete").count()
      val nDv2 = ManifestTable.changes(s, root, 2L, 3L,
        Seq("o_orderkey"))
        .filter($"_change_type" === "delete").count()
      ManifestTable.merge(s, root, source, Seq("o_orderkey"))     // v4
      val materialized =
        ManifestTable.versionFileRefs(s, root, 4L).isEmpty
      ManifestTable.read(s, root).get
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("zero_copy", lit(zeroCopy))
        .withColumn("n_dv1_deletes", lit(nDv1))
        .withColumn("n_dv2_deletes", lit(nDv2))
        .withColumn("merge_materialized", lit(materialized))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01 00:00:00'),
      after_dv1 AS (
        SELECT * FROM target WHERE NOT (o_custkey % 7 = 3)),
      after_dv2 AS (
        SELECT * FROM after_dv1
        WHERE NOT (o_orderstatus = 'F' AND o_custkey % 5 = 0)),
      source AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'),
      final AS (SELECT * FROM after_dv2 UNION ALL SELECT * FROM source)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS zero_copy,
             (SELECT CAST(count(*) AS BIGINT) FROM target
              WHERE o_custkey % 7 = 3) AS n_dv1_deletes,
             (SELECT CAST(count(*) AS BIGINT) FROM after_dv1
              WHERE o_orderstatus = 'F' AND o_custkey % 5 = 0)
               AS n_dv2_deletes,
             true AS merge_materialized
      FROM final GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-deletion-vectors", "TD-dml-delete-update",
      "TD-change-feed"))

  /** Merge-on-read UPDATE ([[graft.ops.ManifestTable.updateWhereDV]]
    * — Iceberg v2's position-delete-plus-append shape): matched rows'
    * OLD images disappear via the cumulative deletion vector and
    * their POST-images land as a small appended file; every unmatched
    * byte is carried by reference (`zero_copy` asserts every v1 file
    * is referenced verbatim in v2 — zero rewrites; successive-update
    * cumulativity is spec-pinned in `DeletionVectorSpec`). The feed
    * across the update is exactly its pre/post pairs (`n_upd_pairs`);
    * a closing DV DELETE then a MERGE materializes everything.
    * Oracle = the declarative UPDATE/DELETE/MERGE pipeline. */
  val q234 = Q(
    "q234_mor_update",
    (s, dir) => {
      import s.implicits._
      import graft.ops.ManifestTable
      val cut = lit("1995-07-01").cast("timestamp")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val orders = Tables(s, dir, "orders")
      val hi = lit("2001-01-01").cast("timestamp")
      val target = shaped(orders.filter($"o_orderdate" < cut))
      val source = shaped(orders.filter($"o_orderdate" >= hi))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q234_").toString + "/orders_tbl"
      ManifestTable.commit(target, root)                          // v1
      ManifestTable.updateWhereDV(s, root, $"o_custkey" % 10 === 0,
        Map("o_totalprice" -> ($"o_totalprice" * 2)))             // v2
      val zeroCopy = {
        val v1 = ManifestTable.readVersion(s, root, 1L)
          .inputFiles.length
        ManifestTable.versionFileRefs(s, root, 2L).exists(
          _.count(_.startsWith("d1-")) == v1)
      }
      val nU1 = ManifestTable.changes(s, root, 1L, 2L,
        Seq("o_orderkey"))
        .filter($"_change_type" === "update_postimage").count()
      ManifestTable.deleteWhereDV(s, root, $"o_custkey" % 9 === 2) // v3
      ManifestTable.merge(s, root, source, Seq("o_orderkey"))      // v4
      ManifestTable.read(s, root).get
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("zero_copy", lit(zeroCopy))
        .withColumn("n_upd_pairs", lit(nU1))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01 00:00:00'),
      upd1 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_custkey % 10 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice
        FROM target),
      after_del AS (
        SELECT * FROM upd1 WHERE NOT (o_custkey % 9 = 2)),
      source AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'),
      final AS (SELECT * FROM after_del UNION ALL SELECT * FROM source)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS zero_copy,
             (SELECT CAST(count(*) AS BIGINT) FROM target
              WHERE o_custkey % 10 = 0) AS n_upd_pairs
      FROM final GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-deletion-vectors", "TD-dml-delete-update",
      "TD-change-feed"))

  /** Merge-on-read MERGE ([[graft.ops.ManifestTable.mergeDV]] — the
    * last O(table) write path made O(delta)): matched target rows'
    * old images disappear via the cumulative deletion vector, the
    * post-images (updates + inserts, the upsert kernel on the matched
    * slice) land as appended files, every unmatched target byte is
    * carried by reference (`zero_copy`). Two successive DV merges
    * compose — the second's vector is cumulative over the first's —
    * and the feed across each is its exact update-pair/insert set
    * (`n_upd1`/`n_ins1`). At 100 TB a MERGE touching 0.1% of rows
    * costs one find-positions scan + an O(delta) write, never the
    * [[graft.ops.ManifestTable.merge]] full-version rewrite. Oracle =
    * the declarative two-step upsert pipeline. */
  val q235 = Q(
    "q235_mor_merge",
    (s, dir) => {
      import s.implicits._
      import graft.ops.ManifestTable
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val orders = Tables(s, dir, "orders")
      val cut = lit("1995-07-01").cast("timestamp")
      val lo = lit("1995-04-01").cast("timestamp")
      val hi = lit("1995-10-01").cast("timestamp")
      val target = shaped(orders.filter($"o_orderdate" < cut))
      // straddles the target boundary: the early half UPDATES
      // (tripled price), the late half INSERTS
      val src1 = shaped(orders
        .filter($"o_orderdate" >= lo && $"o_orderdate" < hi))
        .withColumn("o_totalprice", $"o_totalprice" * 3)
      val src2 = shaped(orders
        .filter($"o_custkey" % 13 === 1 && $"o_orderdate" < lo))
        .withColumn("o_totalprice", $"o_totalprice" + 1000)
      val root = java.nio.file.Files
        .createTempDirectory("graft_q235_").toString + "/orders_tbl"
      ManifestTable.commit(target, root)                         // v1
      val v1Files = ManifestTable.readVersion(s, root, 1L)
        .inputFiles.length
      ManifestTable.mergeDV(s, root, src1, Seq("o_orderkey"))    // v2
      val zeroCopy = ManifestTable.versionFileRefs(s, root, 2L)
        .exists(refs => refs.count(_.startsWith("d1-")) == v1Files &&
          refs.exists(_.startsWith("d2-")))
      val f12 = ManifestTable.changes(s, root, 1L, 2L,
        Seq("o_orderkey"))
      val nUpd1 = f12.filter($"_change_type" === "update_postimage")
        .count()
      val nIns1 = f12.filter($"_change_type" === "insert").count()
      ManifestTable.mergeDV(s, root, src2, Seq("o_orderkey"))    // v3
      ManifestTable.read(s, root).get
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("zero_copy", lit(zeroCopy))
        .withColumn("n_upd1", lit(nUpd1))
        .withColumn("n_ins1", lit(nIns1))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01 00:00:00'),
      src1 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * 3 AS o_totalprice
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'),
      m1 AS (
        SELECT * FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src1)
        UNION ALL SELECT * FROM src1),
      src2 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 1000 AS o_totalprice
        FROM orders
        WHERE o_custkey % 13 = 1
          AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'),
      m2 AS (
        SELECT * FROM m1
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src2)
        UNION ALL SELECT * FROM src2)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS zero_copy,
             (SELECT CAST(count(*) AS BIGINT) FROM target
              WHERE o_orderkey IN (SELECT o_orderkey FROM src1))
               AS n_upd1,
             (SELECT CAST(count(*) AS BIGINT) FROM src1
              WHERE o_orderkey NOT IN
                (SELECT o_orderkey FROM target)) AS n_ins1
      FROM m2 GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-deletion-vectors", "TD-dml-delete-update",
      "TD-change-feed"))

  /** REORG … APPLY (PURGE) ([[graft.ops.ManifestTable.reorg]] —
    * Delta's DV materialization): after a range-scoped DV delete on a
    * range-partitioned table, the purge rewrites ONLY the files the
    * vector touches (dirty set = one O(files) planning collect over
    * the vector's distinct file keys), carries every clean file by
    * REFERENCE (`carried` asserts verbatim ref reuse + fresh d3-
    * rewrites), drops the vector (`purged`, via DESCRIBE DETAIL's
    * `has_dv`), and changes NOTHING observable — the feed across the
    * reorg is EMPTY (`feed_empty`), the dataChange-false semantic.
    * Readers stop paying the DV anti-join from this version on. */
  val q236 = Q(
    "q236_reorg_purge",
    (s, dir) => {
      import s.implicits._
      import graft.ops.ManifestTable
      val orders = Tables(s, dir, "orders")
      val cut = lit("1997-01-01").cast("timestamp")
      val target = orders.filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val maxKey = target.agg(max($"o_orderkey")).head.getLong(0)
      val root = java.nio.file.Files
        .createTempDirectory("graft_q236_").toString + "/orders_tbl"
      // range-partitioned so the low-key delete dirties a SUBSET
      ManifestTable.commit(
        target.repartitionByRange(8, $"o_orderkey"), root)       // v1
      ManifestTable.deleteWhereDV(s, root,
        $"o_orderkey" * 4 <= maxKey)                             // v2
      val hadDv = ManifestTable.detail(s, root)
        .select($"has_dv").head.getBoolean(0)
      val v2Refs = ManifestTable.versionFileRefs(s, root, 2L).get
      ManifestTable.reorg(s, root)                               // v3
      val purged = hadDv && !ManifestTable.detail(s, root)
        .select($"has_dv").head.getBoolean(0)
      val v3Refs = ManifestTable.versionFileRefs(s, root, 3L).get
      val carried = v3Refs.exists(v2Refs.contains) &&
        v3Refs.exists(_.startsWith("d3-")) &&
        v3Refs.count(v2Refs.contains) < v2Refs.size
      val feedEmpty = ManifestTable.changes(s, root, 2L, 3L,
        Seq("o_orderkey")).count() == 0L
      ManifestTable.read(s, root).get
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("purged", lit(purged))
        .withColumn("carried", lit(carried))
        .withColumn("feed_empty", lit(feedEmpty))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
      kept AS (
        SELECT * FROM target
        WHERE NOT (o_orderkey * 4 <=
          (SELECT max(o_orderkey) FROM target)))
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS purged, true AS carried, true AS feed_empty
      FROM kept GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-deletion-vectors", "TD-optimize-compaction",
      "TD-change-feed"))

  /** Column mapping ([[graft.ops.ManifestTable.renameColumn]] /
    * [[graft.ops.ManifestTable.dropColumn]] — Delta's column-mapping
    * mode): RENAME and DROP are metadata-only commits carrying the
    * base's files verbatim (`zero_copy` asserts both versions
    * reference exactly the v1 files — zero bytes rewritten at any
    * table size); the feed across BOTH is EMPTY (`feed_empty` —
    * physically nothing moved; the diff aligns on physical identity
    * through the mapping); then merge-on-read DML runs against the
    * NEW logical schema — a DV DELETE predicated on the renamed
    * column and a DV MERGE whose appended files are translated back
    * to the carried files' physical names (one mixed read, no tear).
    * Oracle = the declarative projection + delete + upsert pipeline. */
  val q237 = Q(
    "q237_column_mapping",
    (s, dir) => {
      import s.implicits._
      import graft.ops.ManifestTable
      val orders = Tables(s, dir, "orders")
      val cut = lit("1995-07-01").cast("timestamp")
      val target = orders.filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val source = orders.filter($"o_orderdate" >= lit("2001-01-01")
          .cast("timestamp"))
        .select($"o_orderkey", $"o_orderstatus",
          ($"o_totalprice" * 2).as("price"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q237_").toString + "/orders_tbl"
      ManifestTable.commit(target, root)                        // v1
      val v1Files = ManifestTable.readVersion(s, root, 1L)
        .inputFiles.length
      ManifestTable.renameColumn(s, root, "o_totalprice", "price") // v2
      ManifestTable.dropColumn(s, root, "o_custkey")            // v3
      val zeroCopy = Seq(2L, 3L).forall(v =>
        ManifestTable.versionFileRefs(s, root, v).exists(refs =>
          refs.count(_.startsWith("d1-")) == v1Files))
      val feedEmpty = ManifestTable.changes(s, root, 1L, 3L,
        Seq("o_orderkey")).count() == 0L
      ManifestTable.deleteWhereDV(s, root,
        $"price" < 50000 && $"o_orderstatus" === "F")           // v4
      ManifestTable.mergeDV(s, root, source, Seq("o_orderkey")) // v5
      ManifestTable.read(s, root).get
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"price".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("zero_copy", lit(zeroCopy))
        .withColumn("feed_empty", lit(feedEmpty))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice AS price
        FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01 00:00:00'),
      after_del AS (
        SELECT * FROM target
        WHERE NOT (price < 50000 AND o_orderstatus = 'F')),
      src AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'),
      final AS (
        SELECT * FROM after_del
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
        UNION ALL SELECT * FROM src)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(price AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS zero_copy, true AS feed_empty
      FROM final GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-column-mapping", "TD-deletion-vectors",
      "TD-change-feed"))

  /** Incremental bin-pack OPTIMIZE
    * ([[graft.ops.ManifestTable.optimizeBinPack]] — Delta's actual
    * OPTIMIZE semantic: only files under the size floor compact):
    * after a streaming run of three exactly-once DV merges (each
    * appending a small post-image fragment) and a DV delete, one
    * binPack folds the fragments at O(fragments) cost — the large
    * base file is carried by REFERENCE (`carried`), its surviving
    * deletion-vector rows ride along (`dv_kept`), file count drops
    * (`packed`), and content is IDENTICAL — the feed across the
    * binPack is EMPTY (`feed_empty`, dataChange-false). At 100 TB
    * this is the file-count hygiene pass a streaming MoR sink needs,
    * at fragment cost instead of table cost. */
  val q238 = Q(
    "q238_binpack_optimize",
    (s, dir) => {
      import s.implicits._
      import graft.ops.ManifestTable
      val orders = Tables(s, dir, "orders")
      val cut = lit("1995-04-01").cast("timestamp")
      val hi = lit("1995-10-01").cast("timestamp")
      val target = orders.filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice").coalesce(1)
      val root = java.nio.file.Files
        .createTempDirectory("graft_q238_").toString + "/orders_tbl"
      ManifestTable.commit(target, root)                        // v1
      // three streaming micro-batches, merge-on-read: each appends a
      // small fragment + grows the vector with its matched pre-images
      (0 until 3).foreach { i =>
        val batch = orders
          .filter($"o_orderdate" >= cut && $"o_orderdate" < hi &&
            $"o_custkey" % 3 === i)
          .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
            $"o_totalprice")
        ManifestTable.mergeBatchDV(s, root, batch,
          Seq("o_orderkey"), batchKey = s"run1-b$i")          // v2..v4
      }
      ManifestTable.deleteWhereDV(s, root,
        $"o_custkey" % 11 === 5)                               // v5
      val before = ManifestTable.versionFileRefs(s, root, 5L).get
      val big = before.filter(_.startsWith("d1-"))
      // size floor = the largest file's size (strict <): the base
      // file is never "small" at any SF, the fragments always are
      val fsq = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val maxLen = before.map(r => fsq.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$root/$r")).getLen).max
      val v6 = ManifestTable.optimizeBinPack(s, root,
        minFileBytes = maxLen)
      val after = ManifestTable.versionFileRefs(s, root, 6L).get
      val carried = big.nonEmpty && big.forall(after.contains)
      val packed = after.size < before.size
      val dvKept = ManifestTable.detail(s, root)
        .select($"has_dv").head.getBoolean(0)
      val feedEmpty = v6 == 6L && ManifestTable.changes(s, root,
        5L, 6L, Seq("o_orderkey")).count() == 0L
      ManifestTable.read(s, root).get
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("carried", lit(carried))
        .withColumn("packed", lit(packed))
        .withColumn("dv_kept", lit(dvKept))
        .withColumn("feed_empty", lit(feedEmpty))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1995-04-01 00:00:00'),
      src AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'),
      merged AS (
        SELECT * FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
        UNION ALL SELECT * FROM src),
      final AS (
        SELECT * FROM merged WHERE NOT (o_custkey % 11 = 5))
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS carried, true AS packed, true AS dv_kept,
             true AS feed_empty
      FROM final GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-deletion-vectors", "TD-optimize-compaction",
      "TD-change-feed"))

  /** Metadata-only ADD COLUMN ([[graft.ops.ManifestTable.addColumn]]
    * — completes the ALTER TABLE triple with rename/drop): the new
    * column exists only as a typed unbacked mapping entry
    * (`zero_copy` — v2 references exactly the v1 files), reads as
    * typed NULL, the feed across the add is EMPTY (`feed_empty`,
    * widening); a DV DELETE still runs merge-on-read (writes no data
    * files), and the closing CoW MERGE materializes the column with
    * real values — nulls on pre-existing rows, source values on
    * inserts (`n_disc_null`/`sum_disc` pin both). Oracle = the
    * declarative NULL-projection + delete + upsert pipeline. */
  val q239 = Q(
    "q239_add_column",
    (s, dir) => {
      import s.implicits._
      import graft.ops.ManifestTable
      val orders = Tables(s, dir, "orders")
      val cut = lit("1995-07-01").cast("timestamp")
      val target = orders.filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      val source = orders.filter($"o_orderdate" >= lit("2001-01-01")
          .cast("timestamp"))
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
          ($"o_totalprice" * 0.9).as("o_discounted"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q239_").toString + "/orders_tbl"
      ManifestTable.commit(target, root)                        // v1
      val v1Files = ManifestTable.readVersion(s, root, 1L)
        .inputFiles.length
      ManifestTable.addColumn(s, root, "o_discounted", "double") // v2
      val zeroCopy = ManifestTable.versionFileRefs(s, root, 2L)
        .exists(refs => refs.count(_.startsWith("d1-")) == v1Files)
      val feedEmpty = ManifestTable.changes(s, root, 1L, 2L,
        Seq("o_orderkey")).count() == 0L
      ManifestTable.deleteWhereDV(s, root,
        $"o_totalprice" < 30000 && $"o_orderstatus" === "F")    // v3
      ManifestTable.merge(s, root, source, Seq("o_orderkey"))   // v4
      ManifestTable.read(s, root).get
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"),
          count(when($"o_discounted".isNull, lit(1)))
            .as("n_disc_null"),
          sum(coalesce($"o_discounted", lit(0.0))
            .cast("decimal(18,6)")).cast("double").as("sum_disc"))
        .withColumn("zero_copy", lit(zeroCopy))
        .withColumn("feed_empty", lit(feedEmpty))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               CAST(NULL AS DOUBLE) AS o_discounted
        FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01 00:00:00'),
      after_del AS (
        SELECT * FROM target
        WHERE NOT (o_totalprice < 30000 AND o_orderstatus = 'F')),
      src AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               o_totalprice * 0.9 AS o_discounted
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'),
      final AS (
        SELECT * FROM after_del
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
        UNION ALL SELECT * FROM src)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             CAST(count(CASE WHEN o_discounted IS NULL THEN 1 END)
               AS BIGINT) AS n_disc_null,
             CAST(CAST(sum(CAST(COALESCE(o_discounted, 0.0)
               AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc,
             true AS zero_copy, true AS feed_empty
      FROM final GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-column-mapping", "TD-deletion-vectors",
      "TD-change-feed"))

  /** Committed skipping stats SURVIVE merge-on-read commits
    * ([[graft.ops.ZTable.extendStats]], wired into
    * [[graft.ops.ManifestTable.mergeBatchDV]]/[[graft.ops
    * .ManifestTable.updateWhereDV]]/[[graft.ops.ManifestTable
    * .optimizeBinPack]] — round-13 headline): a z-ordered base takes
    * three streaming MoR merges and a MoR UPDATE, and the pruned
    * key-range scan still plans off COMMITTED stats with NO
    * re-optimize — carried files keep their rows, every appended
    * fragment got a fresh read-back row at write time (`covered`:
    * stats paths == the version's file list EXACTLY), the scan opens
    * a strict subset of files (`pruned` — the numFiles proof), the
    * extended Bloom registers still find point keys (`bloom_ok`),
    * and the frames survive a binPack compaction (`packed_covered`).
    * This is the Snowflake posture — micro-partition metadata stamped
    * on EVERY write (each reference MERGE lands with pruning intact,
    * `dags/logistics-airbyte-sql.py:25-49`) — where round 12 dropped
    * the frames until the next OPTIMIZE ZORDER. The aggregate the
    * oracle gates is computed FROM the pruned post-binPack scan. */
  val q240 = Q(
    "q240_mor_skipping",
    (s, dir) => {
      import s.implicits._
      import graft.ops.{ManifestTable, ZTable}
      val orders = Tables(s, dir, "orders")
      val cut = lit("1995-04-01").cast("timestamp")
      val hi = lit("1995-06-01").cast("timestamp")
      def slice(df: org.apache.spark.sql.DataFrame) =
        df.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice",
          // a high-cardinality string for the Bloom register (the
          // testdata orders table carries no clerk column); never in
          // the gated output
          $"o_orderkey".cast("string").as("o_key_s"))
      val target = slice(orders.filter($"o_orderdate" < cut))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q240_").toString + "/orders_tbl"
      ManifestTable.commit(target.coalesce(1), root)            // v1
      ZTable.optimizeZOrder(s, root, "o_orderkey", "o_custkey",
        "o_orderkey", nFiles = 8, bloomCol = Some("o_key_s"))   // v2
      // two streaming micro-batches, merge-on-read: each appends a
      // fragment that must land WITH its stats/Bloom rows (the split
      // keeps the oracle identical — both batches union to the slice)
      (0 until 2).foreach { i =>
        val batch = slice(orders.filter(
          $"o_orderdate" >= cut && $"o_orderdate" < hi &&
            $"o_custkey" % 2 === i))
        ManifestTable.mergeBatchDV(s, root, batch,
          Seq("o_orderkey"), batchKey = s"run1-b$i")          // v3..v4
      }
      ManifestTable.updateWhereDV(s, root, $"o_custkey" % 7 === 0,
        Map("o_totalprice" -> $"o_totalprice" * 2))             // v5
      def statsCover(v: Long): Boolean =
        ZTable.stats(s, root, v).select($"path").as[String]
          .collect().toSet ==
          ManifestTable.versionFileRefs(s, root, v).get.toSet
      val covered = (4L to 5L).forall(statsCover)
      val refs5 = ManifestTable.versionFileRefs(s, root, 5L).get
      val maxKey = ManifestTable.read(s, root).get
        .agg(max($"o_orderkey")).head.getLong(0)
      val scan5 = ZTable.scanXRange(s, root, 0L, maxKey / 4)
      // numFiles proof: the pruned scan opens a strict subset
      val pruned = scan5.inputFiles.length < refs5.size
      // extended Bloom registers: a point key present only in an
      // appended fragment is still findable, candidates stay a subset
      val ck = ManifestTable.read(s, root).get
        .agg(max($"o_key_s")).head.getString(0)
      val cands = ZTable.bloomCandidateFiles(s, root, lit(ck))
      val bloomOk = cands.nonEmpty && cands.size <= refs5.size
      // the frames survive fragment compaction
      val fsq = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val maxLen = refs5.map(r => fsq.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$root/$r")).getLen).max
      val v6 = ManifestTable.optimizeBinPack(s, root,
        minFileBytes = maxLen)
      val packedCovered = v6 == 6L && statsCover(6L) &&
        ManifestTable.versionFileRefs(s, root, 6L).get.size < refs5.size
      // the gated aggregate runs FROM the pruned post-binPack scan
      ZTable.scanXRange(s, root, 0L, maxKey / 4)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("covered", lit(covered))
        .withColumn("pruned", lit(pruned))
        .withColumn("bloom_ok", lit(bloomOk))
        .withColumn("packed_covered", lit(packedCovered))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1995-04-01 00:00:00'),
      src AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1995-06-01 00:00:00'),
      merged AS (
        SELECT * FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
        UNION ALL SELECT * FROM src),
      updated AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_custkey % 7 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice
        FROM merged),
      scanned AS (
        SELECT * FROM updated
        WHERE o_orderkey * 4 <= (SELECT max(o_orderkey) FROM updated))
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS covered, true AS pruned, true AS bloom_ok,
             true AS packed_covered
      FROM scanned GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-committed-skipping", "TD-deletion-vectors",
      "TD-optimize-compaction"))

  /** First-class PARTITION COLUMNS in the manifest store
    * ([[graft.ops.PartitionedTable]] — round-13 headline #3; SURVEY
    * §4 "partition silver facts by date"): a month-partitioned fact
    * commits with its partition values in version metadata, a pruned
    * read opens EXACTLY one month's files (`pruned` — the
    * O(one-partition) proof), a daily append carries every existing
    * file by reference (`append_carry`), retiring two months is
    * ZERO-COPY (`drop_zero_copy` — no file rewritten anywhere), and a
    * partition-scoped DELETE rewrites only the named month while
    * every other month rides by PATH IDENTITY (`scoped_carry`). At
    * 100 TB partition pruning is the FIRST knob, before z-order —
    * this is the Snowflake/Delta partitioned-fact posture the
    * reference's silver models assume. Oracle = the declarative
    * union + filters. */
  val q242 = Q(
    "q242_partitioned_fact",
    (s, dir) => {
      import s.implicits._
      import graft.ops.{ManifestTable, PartitionedTable}
      val orders = Tables(s, dir, "orders")
      def slice(lo: String, hi: String) = orders
        .filter($"o_orderdate" >= lit(lo).cast("timestamp") &&
          $"o_orderdate" < lit(hi).cast("timestamp"))
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice",
          date_format($"o_orderdate", "yyyy-MM").as("o_month"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q242_").toString + "/orders_tbl"
      PartitionedTable.commitPartitioned(s, root,
        slice("1995-01-01", "1996-01-01"), "o_month")           // v1
      def partRows(v: Long) = PartitionedTable.parts(s, root, v)
        .select($"path", $"value").as[(String, String)].collect()
      val p1 = partRows(1L)
      // O(one-partition) proof: the pruned read opens exactly the
      // month's files — a strict subset of the table
      val scan = PartitionedTable.readPartitions(s, root,
        Seq("1995-06"))
      val pruned = scan.inputFiles.length == p1.count(_._2 == "1995-06") &&
        scan.inputFiles.length < p1.length &&
        scan.filter($"o_month" =!= "1995-06").count() == 0L
      PartitionedTable.appendPartitioned(s, root,
        slice("1996-01-01", "1996-07-01"))                      // v2
      val p2 = partRows(2L)
      val appendCarry = p1.map(_._1).toSet.subsetOf(p2.map(_._1).toSet)
      PartitionedTable.dropPartitions(s, root,
        Seq("1995-01", "1995-02"))                              // v3
      val refs3 = ManifestTable.versionFileRefs(s, root, 3L).get
      val dropZeroCopy = refs3.toSet.subsetOf(p2.map(_._1).toSet)
      PartitionedTable.deleteWhereInPartitions(s, root,
        Seq("1995-03"), $"o_custkey" % 3 === 0)                 // v4
      val p4 = partRows(4L)
      val scopedCarry = partRows(3L).filter(_._2 != "1995-03")
        .map(_._1).toSet.subsetOf(p4.map(_._1).toSet)
      ManifestTable.read(s, root).get
        .groupBy($"o_month")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("pruned", lit(pruned))
        .withColumn("append_carry", lit(appendCarry))
        .withColumn("drop_zero_copy", lit(dropZeroCopy))
        .withColumn("scoped_carry", lit(scopedCarry))
        .orderBy($"o_month")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS o_month
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
      appended AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS o_month
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'),
      unioned AS (
        SELECT * FROM base UNION ALL SELECT * FROM appended),
      after_drop AS (
        SELECT * FROM unioned
        WHERE o_month NOT IN ('1995-01', '1995-02')),
      final AS (
        SELECT * FROM after_drop
        WHERE NOT (o_month = '1995-03' AND o_custkey % 3 = 0))
      SELECT o_month, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS pruned, true AS append_carry,
             true AS drop_zero_copy, true AS scoped_carry
      FROM final GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-partitioned-store", "TD-optimize-compaction"))

  /** PREDICATE-DRIVEN PRUNING from plain SQL text (round-13 VERDICT
    * ask #1): the same `spark.sql` statement over `graft_table('/p')`
    * — no `graft_partition`, no `scanXRange`, no API opt-in — opens
    * exactly the files the committed `_parts` (partition cut),
    * `_stats` (z-range cut), and `_bloom` (point key) frames prove
    * necessary, via the injected optimizer rule
    * ([[graft.plans.GraftPruneScans]]). Snowflake's
    * prune-on-every-query posture, which the reference's gold date
    * cuts silently assume (`dags/logistics-gold-metrics-sql.py:33,105`).
    * In-band proofs (q242's `pruned` pattern, each oracle-gated):
    * `pruned_part`  — the partition-cut SQL scans exactly the named
    *                  month's files, a strict subset;
    * `pruned_range` — the custkey-range SQL scans exactly the files
    *                  whose committed [min,max] intersects the cut;
    * `pruned_bloom` — the point-key SQL scans a strict subset and
    *                  still finds exactly its row;
    * `pruned_combo` — partition AND range TOGETHER scan exactly the
    *                  intersection of both file sets;
    * `full_unpruned`— the knob off (`spark.graft.prune.enabled=false`)
    *                  restores the full scan (the A/B control). */
  val q243 = Q(
    "q243_sql_auto_prune",
    (s, dir) => {
      import s.implicits._
      import graft.ops.{PartitionedTable, ZTable}
      import graft.plans.GraftPruneScans.scannedFiles
      val base = Tables(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-01-01").cast("timestamp"))
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          date_format($"o_orderdate", "yyyy-MM").as("o_month"),
          $"o_orderkey".cast("string").as("o_okey"))
        // range-partition by custkey BEFORE the partition flatten: each
        // output file is month-pure (the flatten) AND custkey-tight
        // (one range task) — partition-major layout with usable
        // in-partition ranges, the SURVEY §4 two-knob stack
        .repartitionByRange(8, $"o_custkey")
      val root = java.nio.file.Files
        .createTempDirectory("graft_q243_").toString + "/orders_tbl"
      PartitionedTable.commitPartitioned(s, root, base, "o_month",
        statsCols = Some(("o_custkey", "o_orderkey", Some("o_okey"))))
      val parts = PartitionedTable.parts(s, root, 1L)
        .select($"path", $"value").as[(String, String)].collect()
      val total = parts.length.toLong
      val st = ZTable.stats(s, root, 1L)
        .select($"path", $"min_x", $"max_x").collect()
      def agg(where: String) = s.sql(
        s"""SELECT o_month, count(*) AS n_rows,
           |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
           |    AS STRING) AS DOUBLE) AS sum_price
           |FROM graft_table('$root') WHERE $where
           |GROUP BY o_month ORDER BY o_month""".stripMargin)
      // 1) partition cut from the WHERE text alone
      val pScan = agg("o_month = '1995-06'")
      val pExpect = parts.count(_._2 == "1995-06").toLong
      val prunedPart = scannedFiles(pScan) == pExpect && pExpect < total
      // 2) z-range cut: exactly the stat-intersecting files
      val (lo, hi) = (100L, 220L)
      val rScan = agg(s"o_custkey BETWEEN $lo AND $hi")
      val rExpect = st.count(r => r.isNullAt(1) || r.isNullAt(2) ||
        !(r.getLong(2) < lo || r.getLong(1) > hi)).toLong
      val prunedRange = scannedFiles(rScan) == rExpect && rExpect < total
      // 3) Bloom point key (a key guaranteed IN the slice): strict
      // subset, exact row
      val key = s.sql(s"SELECT min(o_orderkey) FROM graft_table('$root')")
        .as[Long].head()
      val bScan = s.sql(s"SELECT o_orderkey FROM graft_table('$root') " +
        s"WHERE o_okey = '$key'")
      val prunedBloom = scannedFiles(bScan) < total &&
        bScan.as[Long].collect().toSeq == Seq(key)
      // 4) both knobs stacked: the intersection, file-exact
      val cScan = agg(
        s"o_month = '1995-06' AND o_custkey BETWEEN $lo AND $hi")
      val juneKeys = parts.filter(_._2 == "1995-06").map(_._1).toSet
      val cExpect = st.count(r =>
        juneKeys.contains(r.getString(0)) &&
          (r.isNullAt(1) || r.isNullAt(2) ||
            !(r.getLong(2) < lo || r.getLong(1) > hi))).toLong
      val prunedCombo = scannedFiles(cScan) == cExpect &&
        cExpect < total
      // 5) the A/B control — in an ISOLATED session (same context,
      // own SQLConf): toggling the shared session's knob would race
      // the OTHER pruning queries Verify runs concurrently on it
      val offS = s.newSession()
      offS.sql(s"SET ${graft.ops.GraftPruning.enabledKey}=false")
      val off = offS.sql(
        s"""SELECT o_month, count(*) AS n_rows,
           |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
           |    AS STRING) AS DOUBLE) AS sum_price
           |FROM graft_table('$root') WHERE o_month = '1995-06'
           |GROUP BY o_month ORDER BY o_month""".stripMargin)
      val fullUnpruned = scannedFiles(off) == total
      val sameRows = off.collect().toSeq == pScan.collect().toSeq
      agg("o_month IN ('1995-06', '1995-07') " +
          s"AND o_custkey BETWEEN $lo AND $hi")
        .withColumn("pruned_part", lit(prunedPart))
        .withColumn("pruned_range", lit(prunedRange))
        .withColumn("pruned_bloom", lit(prunedBloom))
        .withColumn("pruned_combo", lit(prunedCombo))
        .withColumn("full_unpruned", lit(fullUnpruned && sameRows))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS o_month
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
      SELECT o_month, count(*) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             true AS pruned_part, true AS pruned_range,
             true AS pruned_bloom, true AS pruned_combo,
             true AS full_unpruned
      FROM base
      WHERE o_month IN ('1995-06', '1995-07')
        AND o_custkey BETWEEN 100 AND 220
      GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-partitioned-store", "TD-zorder-skipping",
      "TD-bloom-skipping"))

  /** PARTITION PRUNING SURVIVES APPENDING MoR DML (round-13 VERDICT
    * ask #2 — the reference's daily silver shape: MERGE into a
    * date-partitioned fact, `dags/logistics-airbyte-sql.py:25-49`):
    * MoR MERGE/UPDATE fragments land PARTITION-PURE through the same
    * flatten `commitPartitioned` uses and extend `_parts`; a DV
    * DELETE carries the frame verbatim. In-band proofs (the q240
    * `covered` pattern, oracle-gated):
    * `covered`   — `_parts` paths == the version's file list EXACTLY
    *               after the MERGE, the UPDATE, and the DELETE;
    * `pruned`    — `readPartitions` of one month opens exactly that
    *               month's files INCLUDING its MoR fragments, a
    *               strict subset, with the deletion vector applied;
    * `frag_pure` — every fragment's `_parts` row names the partition
    *               its rows actually carry (spot-checked by content). */
  val q244 = Q(
    "q244_partitioned_mor_dml",
    (s, dir) => {
      import s.implicits._
      import graft.ops.{ManifestTable, PartitionedTable}
      def slice(lo: String, hi: String) = Tables(s, dir, "orders")
        .filter($"o_orderdate" >= lit(lo).cast("timestamp") &&
          $"o_orderdate" < lit(hi).cast("timestamp"))
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice",
          date_format($"o_orderdate", "yyyy-MM").as("o_month"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q244_").toString + "/orders_tbl"
      PartitionedTable.commitPartitioned(s, root,
        slice("1995-01-01", "1996-01-01"), "o_month")           // v1
      def partRows(v: Long) = PartitionedTable.parts(s, root, v)
        .select($"path", $"value").as[(String, String)].collect()
      def covered(v: Long) = partRows(v).map(_._1).sorted.toSeq ==
        ManifestTable.versionFileRefs(s, root, v).get.sorted
      // MoR MERGE: June rows re-priced + July-96 rows inserted —
      // O(delta) append, carried base untouched
      val src = slice("1995-06-01", "1995-07-01")
        .withColumn("o_totalprice", $"o_totalprice" * 2)
        .unionByName(slice("1996-07-01", "1996-08-01"))
      ManifestTable.mergeDV(s, root, src, Seq("o_orderkey"))    // v2
      val c2 = covered(2L)
      // MoR UPDATE: March rows flagged — fragments land in 1995-03
      ManifestTable.updateWhereDV(s, root, $"o_month" === "1995-03",
        Map("o_orderstatus" -> lit("X")))                       // v3
      val c3 = covered(3L)
      // DV DELETE: positions-only commit, _parts carried verbatim
      ManifestTable.deleteWhereDV(s, root, $"o_custkey" % 7 === 0) // v4
      val c4 = covered(4L) && partRows(4L).toSet == partRows(3L).toSet
      // pruned read of the MERGEd month: its original files PLUS its
      // fragments, nothing else, vector applied
      val p4 = partRows(4L)
      val june = PartitionedTable.readPartitions(s, root,
        Seq("1995-06"))
      val juneKeys = p4.filter(_._2 == "1995-06").map(r =>
        ManifestTable.fileKeyOf(r._1)).toSet
      val gotKeys = june.inputFiles
        .map(ManifestTable.fileKeyOf)
        // the deletion-vector anti-join's own `_dv` scan is part of
        // the plan's inputFiles — metadata, not a data file
        .filterNot(_.split('/').exists(_.startsWith("_"))).toSet
      val pruned = gotKeys == juneKeys && juneKeys.size < p4.length &&
        june.filter($"o_month" =!= "1995-06").count() == 0L
      // fragment purity by content: each fragment file's rows carry
      // exactly the partition value its _parts row names
      val v1Paths = partRows(1L).map(_._1).toSet
      val frags = p4.filterNot(r => v1Paths.contains(r._1))
      val fragPure = frags.nonEmpty && frags.groupBy(_._2).forall {
        case (month, rows) =>
          graft.ops.MetaIO.readParquet(s, rows.map(r =>
              s"$root/${r._1}"))
            .filter($"o_month" =!= month).count() == 0L
      }
      ManifestTable.read(s, root).get
        .groupBy($"o_month")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"),
          count(when($"o_orderstatus" === "X", 1)).as("n_flagged"))
        .withColumn("covered", lit(c2 && c3 && c4))
        .withColumn("pruned", lit(pruned))
        .withColumn("frag_pure", lit(fragPure))
        .orderBy($"o_month")
    },
    Some("""
      WITH y95 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS o_month
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
      merged AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_month = '1995-06' THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice,
               o_month
        FROM y95
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS o_month
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-08-01 00:00:00'),
      updated AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_month = '1995-03' THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               o_totalprice, o_month
        FROM merged),
      final AS (
        SELECT * FROM updated WHERE o_custkey % 7 <> 0)
      SELECT o_month, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             CAST(count(CASE WHEN o_orderstatus = 'X' THEN 1 END)
               AS BIGINT) AS n_flagged,
             true AS covered, true AS pruned, true AS frag_pure
      FROM final GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-partitioned-store", "M1"))

  /** THE WHOLE PIPELINE AS STATEMENT TEXT, ADDRESSED BY NAME (round-13
    * VERDICT ask #3 — EP1's last gaps): `GRAFT CATALOG SET BASE` maps
    * dotted names to table roots (Snowflake's
    * `LOGISTICS_DEMO_1.SILVER.FACT_SHIPMENTS` addressing,
    * `dags/logistics-airbyte-sql.py:25`), then CREATE TABLE …
    * PARTITIONED BY … AS SELECT (S12,
    * `dags/snowflake-EDW-ETL-dag.py:482-530`), INSERT INTO … SELECT
    * (the EDW load, `:147-173`), MERGE / UPDATE / DELETE — every
    * statement pure SQL text with NO path and NO Scala API, reading
    * back through `graft_table('<name>')`. INSERT routes to the
    * O(batch) [[graft.ops.ManifestTable.append]] (base files carried
    * by reference; `_parts` extended — proof in-band), not a rewrite.
    * `by_name` proves the name→root indirection (the path-form read
    * of the resolved root sees the same bytes); `append_carry` proves
    * INSERT carried every pre-INSERT file. */
  val q245 = Q(
    "q245_sql_named_pipeline",
    (s, dir) => {
      import s.implicits._
      import graft.ops.ManifestTable
      val base = java.nio.file.Files
        .createTempDirectory("graft_q245_").toString
      // explicit per-name registration (the SET BASE form is
      // spec-covered; a JVM-global base must not leak into the
      // concurrently-running verify queries). Each run binds the name
      // to a FRESH temp root, so the prior binding is dropped first —
      // re-POINTING a live name is a loud conflict by design.
      s.sql("GRAFT CATALOG UNREGISTER edw.silver.fact_orders")
      s.sql("GRAFT CATALOG REGISTER edw.silver.fact_orders " +
        s"AT '$base/edw/silver/fact_orders'")
      Tables(s, dir, "orders").createOrReplaceTempView("q245_orders")
      // CREATE: 1995 slice, month-partitioned, by name
      s.sql("""CREATE TABLE edw.silver.fact_orders
        PARTITIONED BY (o_month) AS
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               date_format(o_orderdate, 'yyyy-MM') AS o_month
        FROM q245_orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'""")
      val root = s"$base/edw/silver/fact_orders"
      val preInsert = ManifestTable.versionFileRefs(s, root, 1L)
        .isEmpty // v1 is a whole-dir partitioned commit
      val p1 = graft.ops.PartitionedTable.parts(s, root, 1L)
        .select("path").as[String].collect().toSet
      // INSERT: H1-1996, by name — O(batch) append
      s.sql("""INSERT INTO edw.silver.fact_orders
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               date_format(o_orderdate, 'yyyy-MM') AS o_month
        FROM q245_orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'""")
      val refs2 = ManifestTable.versionFileRefs(s, root, 2L).get
      val appendCarry = p1.subsetOf(refs2.toSet) &&
        graft.ops.PartitionedTable.parts(s, root, 2L).count() ==
          refs2.length.toLong
      // MERGE: re-price June-95, by name (the reference's shape)
      s.sql("""MERGE INTO edw.silver.fact_orders AS tgt
        USING (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice * 2 AS o_totalprice,
                 date_format(o_orderdate, 'yyyy-MM') AS o_month
          FROM q245_orders
          WHERE o_orderdate >= TIMESTAMP '1995-06-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
        ) AS src
        ON tgt.o_orderkey = src.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      // UPDATE + DELETE, by name
      s.sql("""UPDATE edw.silver.fact_orders
        SET o_orderstatus = 'X' WHERE o_month = '1995-03'""")
      s.sql("""DELETE FROM edw.silver.fact_orders
        WHERE o_custkey % 7 = 0""")
      // read back BY NAME; prove the indirection against the path form
      val byName = s.sql(
        "SELECT * FROM graft_table('edw.silver.fact_orders')")
      val byPath = s.sql(s"SELECT * FROM graft_table('$root')")
      val sameBytes = byName.count() == byPath.count()
      byName
        .groupBy($"o_month")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,6)"))
            .cast("double").as("sum_price"),
          count(when($"o_orderstatus" === "X", 1)).as("n_flagged"))
        .withColumn("by_name", lit(sameBytes && preInsert))
        .withColumn("append_carry", lit(appendCarry))
        .orderBy($"o_month")
    },
    Some("""
      WITH y95 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS o_month
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
      inserted AS (
        SELECT * FROM y95
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS o_month
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'),
      merged AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_month = '1995-06' THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice,
               o_month
        FROM inserted),
      updated AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_month = '1995-03' THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               o_totalprice, o_month
        FROM merged),
      final AS (
        SELECT * FROM updated WHERE o_custkey % 7 <> 0)
      SELECT o_month, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS sum_price,
             CAST(count(CASE WHEN o_orderstatus = 'X' THEN 1 END)
               AS BIGINT) AS n_flagged,
             true AS by_name, true AS append_carry
      FROM final GROUP BY 1 ORDER BY 1"""),
    covers = Seq("S12", "M1", "TD-partitioned-store"))

  /** THE REFERENCE'S GOLD DATE-CUT SHAPE, AUTO-PRUNED END TO END
    * (round 14): the gold revenue queries cut by date, never by named
    * partitions (`dags/logistics-gold-metrics-sql.py:33,105` —
    * `WHERE order_ts >= …`); here the SAME cut shape — a month-range
    * predicate and a `LIKE 'yyyy-%'` year cut, plain statement text —
    * runs against a month-partitioned fact that has ALREADY taken a
    * MoR MERGE (fragments live in `_parts`), and the planner prunes
    * both cuts from the string partition frame EXACTLY (string-order
    * range + prefix, new in round 14's rule). In-band proofs:
    * `pruned_range` — the range cut opens exactly the in-range
    * months' files (fragments included), a strict subset;
    * `pruned_like` — the year cut likewise. The merge's repricing
    * flows through the pruned read (oracle-gated), proving pruned
    * reads see merge-on-read truth. */
  val q246 = Q(
    "q246_gold_datecut_pruned",
    (s, dir) => {
      import s.implicits._
      import graft.ops.{ManifestTable, PartitionedTable}
      import graft.plans.GraftPruneScans.scannedFiles
      def slice(lo: String, hi: String) = Tables(s, dir, "orders")
        .filter($"o_orderdate" >= lit(lo).cast("timestamp") &&
          $"o_orderdate" < lit(hi).cast("timestamp"))
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          date_format($"o_orderdate", "yyyy-MM").as("o_month"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q246_").toString + "/fact"
      PartitionedTable.commitPartitioned(s, root,
        slice("1995-01-01", "1996-07-01"), "o_month")           // v1
      // the daily-silver MERGE: September re-priced (MoR fragments)
      ManifestTable.mergeDV(s, root,
        slice("1995-09-01", "1995-10-01")
          .withColumn("o_totalprice", $"o_totalprice" * 2),
        Seq("o_orderkey"))                                      // v2
      val parts = PartitionedTable.parts(s, root, 2L)
        .select($"path", $"value").as[(String, String)].collect()
      val total = parts.length.toLong
      def agg(where: String) = s.sql(
        s"""SELECT o_month, count(*) AS n_orders,
           |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
           |    AS STRING) AS DOUBLE) AS revenue
           |FROM graft_table('$root') WHERE $where
           |GROUP BY o_month ORDER BY o_month""".stripMargin)
      val range = agg("o_month >= '1995-07' AND o_month < '1996-04'")
      val rExpect = parts.count(r =>
        r._2 >= "1995-07" && r._2 < "1996-04").toLong
      val prunedRange = scannedFiles(range) == rExpect &&
        rExpect < total
      val like = agg("o_month LIKE '1996-%'")
      val lExpect = parts.count(_._2.startsWith("1996-")).toLong
      val prunedLike = scannedFiles(like) == lExpect &&
        lExpect < total
      range
        .withColumn("pruned_range", lit(prunedRange))
        .withColumn("pruned_like", lit(prunedLike))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN strftime(o_orderdate, '%Y-%m') = '1995-09'
                    THEN o_totalprice * 2 ELSE o_totalprice
               END AS o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS o_month
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00')
      SELECT o_month, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) AS revenue,
             true AS pruned_range, true AS pruned_like
      FROM base
      WHERE o_month >= '1995-07' AND o_month < '1996-04'
      GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TD-partitioned-store", "P10", "A1"))

  /** RUNTIME-PREDICATE FILE PRUNING (round-14 VERDICT top ask): two
    * cut shapes whose value is NOT an optimize-time literal now prune
    * the graft fact's files —
    * (1) the WATERMARK scalar subquery, the reference's incremental
    * spine as statement text (`WHERE extracted_at > (SELECT MAX(…)
    * FROM target)`, `dags/logistics-airbyte-sql.py:35-38`, 7×): the
    * subquery's value is evaluated and PINNED at plan time
    * ([[graft.plans.GraftPruneScans]] `substituteWatermarks`), so
    * pruning and the row filter use the SAME literal;
    * (2) the star-join dim filter reaching the fact through an
    * equi-join on the partition column
    * (`dags/logistics-gold-metrics-sql.py:195` pincode join): a
    * broadcast-small dim side's distinct keys intersect `_parts` —
    * the dynamic-partition-pruning analog Spark's own rule cannot
    * apply to a graft `InMemoryFileIndex`.
    * In-band proofs (the q243 pattern, oracle-gated):
    * `pruned_wm`  — the watermark SQL opens exactly the files of
    *                months after the subquery's value, strict subset;
    * `pruned_dpp` — the dim-filtered join opens exactly the dim's
    *                months' files, strict subset;
    * `full_unpruned` — knob off restores both full scans, same rows. */
  val q247 = Q(
    "q247_runtime_pruning",
    (s, dir) => {
      import s.implicits._
      import graft.ops.PartitionedTable
      import graft.plans.GraftPruneScans.scannedFiles
      val base = Tables(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-01-01").cast("timestamp"))
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          date_format($"o_orderdate", "yyyy-MM").as("o_month"))
        .repartitionByRange(4, $"o_custkey")
      val root = java.nio.file.Files
        .createTempDirectory("graft_q247_").toString + "/orders_tbl"
      PartitionedTable.commitPartitioned(s, root, base, "o_month")
      val parts = PartitionedTable.parts(s, root, 1L)
        .select($"path", $"value").as[(String, String)].collect()
      val total = parts.length.toLong
      // (1) the watermark source — the reference's `target` table; a
      // 1-row aggregate whatever its size, evaluated once at plan
      // time. Views register per session (the off-control below runs
      // in its own).
      def mkViews(ss: org.apache.spark.sql.SparkSession): Unit = {
        import ss.implicits._
        Seq("1995-09").toDF("wm")
          .createOrReplaceTempView("q247_wm")
        Seq(("1995-03", "hot"), ("1995-07", "hot"),
          ("1995-11", "cold")).toDF("mth", "tier")
          .createOrReplaceTempView("q247_dim")
      }
      mkViews(s)
      def wmAgg(ss: org.apache.spark.sql.SparkSession) = ss.sql(
        s"""SELECT 'wm' AS src, o_month, count(*) AS n_rows,
           |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
           |    AS STRING) AS DOUBLE) AS sum_price
           |FROM graft_table('$root')
           |WHERE o_month > (SELECT max(wm) FROM q247_wm)
           |GROUP BY o_month""".stripMargin)
      val wmScan = wmAgg(s)
      val wmExpect = parts.count(_._2 > "1995-09").toLong
      val prunedWm = scannedFiles(wmScan) == wmExpect &&
        wmExpect < total
      // (2) the dim-filtered star join on the partition column
      def dppAgg(ss: org.apache.spark.sql.SparkSession) = ss.sql(
        s"""SELECT 'dpp' AS src, f.o_month, count(*) AS n_rows,
           |  CAST(CAST(sum(CAST(f.o_totalprice AS DECIMAL(18,6)))
           |    AS STRING) AS DOUBLE) AS sum_price
           |FROM graft_table('$root') f
           |JOIN q247_dim d ON f.o_month = d.mth
           |WHERE d.tier = 'hot'
           |GROUP BY f.o_month""".stripMargin)
      val dppScan = dppAgg(s)
      val dppExpect = parts.count(r =>
        r._2 == "1995-03" || r._2 == "1995-07").toLong
      val prunedDpp = scannedFiles(dppScan) == dppExpect &&
        dppExpect < total
      // the A/B control — in an ISOLATED session (same context, own
      // SQLConf): toggling the shared session's knob would race the
      // other pruning queries Verify runs concurrently on it
      val offS = s.newSession()
      mkViews(offS)
      offS.sql(s"SET ${graft.ops.GraftPruning.enabledKey}=false")
      val wmOff = wmAgg(offS)
      val dppOff = dppAgg(offS)
      val fullUnpruned = scannedFiles(wmOff) == total &&
        scannedFiles(dppOff) == total &&
        wmOff.orderBy($"o_month").collect().toSeq ==
          wmScan.orderBy($"o_month").collect().toSeq &&
        dppOff.orderBy($"o_month").collect().toSeq ==
          dppScan.orderBy($"o_month").collect().toSeq
      wmScan.unionByName(dppScan)
        .withColumn("pruned_wm", lit(prunedWm))
        .withColumn("pruned_dpp", lit(prunedDpp))
        .withColumn("full_unpruned", lit(fullUnpruned))
        .orderBy($"src", $"o_month")
    },
    Some("""
      WITH base AS (
        SELECT o_custkey, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS o_month
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
      wm AS (
        SELECT 'wm' AS src, o_month, count(*) AS n_rows,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                 AS VARCHAR) AS DOUBLE) AS sum_price
        FROM base WHERE o_month > '1995-09' GROUP BY o_month),
      dpp AS (
        SELECT 'dpp' AS src, o_month, count(*) AS n_rows,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                 AS VARCHAR) AS DOUBLE) AS sum_price
        FROM base WHERE o_month IN ('1995-03', '1995-07')
        GROUP BY o_month)
      SELECT src, o_month, CAST(n_rows AS BIGINT) AS n_rows, sum_price,
             true AS pruned_wm, true AS pruned_dpp,
             true AS full_unpruned
      FROM (SELECT * FROM wm UNION ALL SELECT * FROM dpp)
      ORDER BY src, o_month"""),
    covers = Seq("TD-partitioned-store", "P12", "J7"))

  override def queries: Seq[Q] =
    Seq(q13, q14, q15, q16, q17, q72, q104, q207, q218, q219, q222,
      q223, q224, q225, q226, q227, q228, q229, q230, q231, q232, q233,
      q234, q235, q236, q237, q238, q239, q240, q242, q243, q244, q245,
      q246, q247)
}
