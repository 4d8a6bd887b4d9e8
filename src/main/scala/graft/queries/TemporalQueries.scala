package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.AsofJoin

/** Temporal operators beyond the reference's surface: as-of
  * (point-in-time) join and session windows — the two time-series
  * primitives a logistics/training-data platform reaches for next.
  * Both oracle-checked (DuckDB has native ASOF JOIN; sessions via
  * gaps-and-islands SQL). */
object TemporalQueries extends QueryPack {

  /** As-of join: for sampled probe times (event ts + 30 min), the most
    * recent event at-or-before the probe per user. Events pre-deduped
    * to one row per (user, ts) so the as-of match is unique — the
    * contract a production PIT-join enforces upstream. */
  val q54 = Q(
    "q54_asof_join",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"ts")
        .orderBy($"event_id".desc)
      val events = Tables(s, dir, "events")
        .withColumn("__rn", row_number().over(w))
        .filter($"__rn" === 1).drop("__rn")
        .select($"user_id", $"ts", $"event_id", $"event_type", $"value")
      val probes = events
        .filter($"event_id" % 37 === 0)
        .select($"user_id", $"event_id".as("probe_id"),
          ($"ts" + expr("INTERVAL 30 MINUTES")).as("probe_ts"))
      AsofJoin.asofJoin(probes, events,
          keys = Seq("user_id"), probeTs = "probe_ts", eventTs = "ts",
          eventValueCols = Seq("event_id", "event_type"))
        .select($"user_id", $"probe_id", $"probe_ts",
          $"evt_event_id".as("matched_event_id"),
          $"evt_event_type".as("matched_event_type"))
        .orderBy($"user_id", $"probe_id")
    },
    Some("""
      WITH dedup AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, value
        FROM (SELECT *, row_number() OVER
                (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
              FROM events)
        WHERE rn = 1),
      probes AS (
        SELECT user_id, event_id AS probe_id,
               ts + INTERVAL 30 MINUTE AS probe_ts
        FROM dedup WHERE event_id % 37 = 0)
      SELECT p.user_id, p.probe_id, p.probe_ts,
             e.event_id AS matched_event_id,
             e.event_type AS matched_event_type
      FROM probes p ASOF LEFT JOIN dedup e
        ON p.user_id = e.user_id AND e.ts <= p.probe_ts
      ORDER BY p.user_id, p.probe_id"""),
    covers = Seq("T-asof-join"))

  /** Session windows (30-minute inactivity gap) via Spark's native
    * `session_window`; oracle = gaps-and-islands. Session end is
    * last-event + gap, per Spark's definition. */
  val q55 = Q(
    "q55_session_windows",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
        .agg(
          count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(18,6)")).cast("double").as("sum_value"))
        .select($"user_id", $"sw.start".as("session_start"),
          $"sw.end".as("session_end"), $"n_events", $"sum_value")
        .orderBy($"user_id", $"session_start")
    },
    Some("""
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP))
                      OVER (PARTITION BY user_id ORDER BY ts)
                    <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
        FROM events),
      v AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM e)
      SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end,
             count(*) AS n_events,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
      FROM v GROUP BY user_id, sid
      ORDER BY user_id, session_start"""),
    covers = Seq("ST-session-window"))

  /** Range (interval) join: facts matched to a small dim of date
    * ranges via BETWEEN — broadcast nested-loop with a tiny build side
    * here; the scale path for REGULAR ranges is the equi-join rewrite
    * on a truncated key (here both: the oracle proves the BETWEEN
    * semantics, the implementation uses the equi rewrite since
    * quarters are calendar-regular — zero nested-loop at any size). */
  val q57 = Q(
    "q57_range_join",
    (s, dir) => {
      import s.implicits._
      // quarter dim 1992..1998 (the data's span)
      val quarters = s.range(7 * 4).select(
        (lit(1992) + ($"id" / 4)).cast("int").as("q_year"),
        (($"id" % 4) + 1).cast("int").as("q_num"))
        .select($"q_year", $"q_num",
          concat($"q_year", lit("Q"), $"q_num").as("quarter"))
      val li = Tables(s, dir, "lineitem")
        .select($"l_extendedprice", $"l_shipdate",
          year($"l_shipdate").as("q_year"), quarter($"l_shipdate").as("q_num"))
      li.join(broadcast(quarters), Seq("q_year", "q_num"))
        .groupBy($"quarter")
        .agg(
          count(lit(1)).as("n_lines"),
          sum($"l_extendedprice".cast("decimal(18,6)")).cast("double")
            .as("revenue"))
        .orderBy($"quarter")
    },
    Some("""
      WITH quarters AS (
        SELECT 1992 + (i // 4) AS q_year, (i % 4) + 1 AS q_num,
               CAST(1992 + (i // 4) AS VARCHAR) || 'Q' ||
                 CAST((i % 4) + 1 AS VARCHAR) AS quarter,
               make_date(CAST(1992 + (i // 4) AS INT),
                         CAST((i % 4) * 3 + 1 AS INT), 1) AS q_start
        FROM range(0, 28) t(i))
      SELECT quarter, count(*) AS n_lines,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
      FROM lineitem JOIN quarters
        ON CAST(l_shipdate AS DATE) >= q_start
       AND CAST(l_shipdate AS DATE) < q_start + INTERVAL 3 MONTH
      GROUP BY quarter ORDER BY quarter"""),
    covers = Seq("T-range-join"))

  /** P11 over STORED semi-structured data (events.props is a real JSON
    * column in the source, unlike q32's self-built strings): path
    * extraction + cast + aggregation — the exact `col:path::type` +
    * GROUP BY shape of the shipment silver queries. */
  val q58 = Q(
    "q58_json_props",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .select($"event_type",
          get_json_object($"props", "$.k").cast("int").as("k"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          count($"k").as("n_with_k"),
          sum($"k".cast("long")).as("sum_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type,
             count(*) AS n_events,
             count(CAST(json_extract_string(props, '$.k') AS INT)) AS n_with_k,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
      FROM events GROUP BY 1 ORDER BY event_type"""),
    covers = Seq("P11", "S3"))

  /** §2.7 set operations — absent from the reference (SURVEY notes
    * Spark's built-ins cover them for free); exercised here so the
    * claim is verified, not asserted: customers present in '97 vs '98
    * order years via UNION / INTERSECT / EXCEPT. */
  val q59 = Q(
    "q59_set_ops",
    (s, dir) => {
      import s.implicits._
      def buyers(yr: Int) = Tables(s, dir, "orders")
        .filter(year($"o_orderdate") === yr)
        .select($"o_custkey")
      val a = buyers(1997)
      val b = buyers(1998)
      a.union(b).distinct().select(lit("union").as("op"), $"o_custkey")
        .unionByName(a.intersect(b).select(lit("intersect").as("op"), $"o_custkey"))
        .unionByName(a.distinct().except(b).select(lit("except").as("op"), $"o_custkey"))
        .orderBy($"op", $"o_custkey")
    },
    Some("""
      WITH a AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
           b AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
      SELECT 'union' AS op, o_custkey FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)
      UNION ALL
      SELECT 'intersect', o_custkey FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
      UNION ALL
      SELECT 'except', o_custkey FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
      ORDER BY op, o_custkey"""),
    covers = Seq("SET-union", "SET-intersect", "SET-except"))

  override def queries: Seq[Q] = Seq(q54, q55, q57, q58, q59)
}

/** Text quality-scoring completions (builder brief: "token counting
  * (whitespace + a BPE-ish regex)", "quality scoring
  * (length/punct/stopword ratios)"). */
object TextScoring extends QueryPack {

  /** BPE-ish subword pieces: letter runs, digit runs, and single
    * non-alphanumeric marks — the pre-tokenization regex family GPT-2
    * style BPE applies before merges. Same pattern semantics in Java
    * regex (Spark) and RE2-ish (DuckDB) for this character class set. */
  private val piece = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  val q56 = Q(
    "q56_token_stats",
    (s, dir) => {
      import s.implicits._
      val nChars = length($"text").cast("double")
      Tables(s, dir, "documents")
        .select(
          $"doc_id",
          size(split($"text", " ")).cast("long").as("n_tokens_ws"),
          size(expr(s"regexp_extract_all(text, '$piece', 0)")).cast("long")
            .as("n_tokens_bpe"),
          (length(regexp_replace($"text", "[^.,;:!?'\"-]", "")).cast("double")
            / nChars).as("punct_ratio"),
          (length(regexp_replace($"text", "[^A-Z]", "")).cast("double")
            / nChars).as("upper_ratio"),
          (length(regexp_replace($"text", "[^0-9]", "")).cast("double")
            / nChars).as("digit_ratio"))
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws,
             CAST(len(regexp_extract_all(text, '$piece')) AS BIGINT) AS n_tokens_bpe,
             CAST(length(regexp_replace(text, '[^.,;:!?''"-]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE) AS punct_ratio,
             CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE) AS upper_ratio,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE) AS digit_ratio
      FROM documents ORDER BY doc_id"""),
    covers = Seq("TD-token-count", "TD-text-quality"))

  /** §2.11 ticket classifier through the driver contract: train on the
    * reference's 10 labeled examples
    * (`dags/4_logistics_ticket_classifier_full_dag.py:32-52`) and score
    * that same fixture set through the DISTRIBUTED `model.transform`
    * path. The fit is deterministic (single-partition 10-row corpus,
    * LBFGS with fixed tol, alphabetic label indexing, hashing
    * features), so the predictions are a constant of the library — the
    * oracle freezes them as a golden VALUES table, turning the one
    * formerly `no_oracle` query into a full rows/schema/hash check.
    * Corpus-scale distributed scoring stays covered by
    * `TicketClassifierSpec` (content of the documents table is
    * driver-owned and may drift between rounds, so the golden contract
    * deliberately depends only on in-repo fixtures). */
  val q62 = Q(
    "q62_ticket_classifier",
    (s, dir) => {
      import s.implicits._
      val model = graft.ml.TicketClassifier.defaultModel(s)
      val fixtures = graft.ml.TicketClassifier.trainingData.zipWithIndex
        .map { case ((text, label), i) => (i.toLong + 1L, text, label) }
        .toDF("ticket_id", "ticket_text", "expected_category")
      model.classify(fixtures, "ticket_text")
        .select($"ticket_id", $"expected_category",
          $"ticket_category".as("predicted_category"))
        .orderBy($"ticket_id")
    },
    Some {
      val rows = graft.ml.TicketClassifier.trainingData.zipWithIndex
        .map { case ((_, label), i) =>
          // training-set predictions == labels: 10 separable examples,
          // exact fit (asserted by TicketClassifierSpec's golden test)
          s"(CAST(${i + 1} AS BIGINT), '$label', '$label')"
        }.mkString(",\n        ")
      s"""
      SELECT * FROM (VALUES
        $rows) AS t(ticket_id, expected_category, predicted_category)
      ORDER BY ticket_id"""
    },
    covers = Seq("ML-classifier"))

  override def queries: Seq[Q] = Seq(q56, q62)
}
