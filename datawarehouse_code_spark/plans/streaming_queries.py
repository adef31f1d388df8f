"""Time-window aggregations over `events` (SURVEY.md §2.2 streaming row).

Batch-first per BASELINE.json ("Spark SQL + batch ETL"): `F.window` /
`F.session_window` share semantics with Structured Streaming, so the
same plans run under `readStream` unchanged — the thin streaming layer
lives in `datawarehouse_code_spark.streaming.jobs` and is tested for
batch/stream result equality.

Scale notes: tumbling/sliding windows are plain hash aggregates on
(window, keys) — partial-aggregated map-side, no different from any
groupBy at 100 TB.  Session windows are a merge-buffer aggregation in
Spark; the DuckDB oracle uses the classic gaps-and-islands rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_code_spark.plans.base import Query
from datawarehouse_code_spark.sources.catalog import read_table


def _events_tumbling_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows per event_type."""
    events = read_table(spark, "events", sf_dir)
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
       time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS window_end,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def _events_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 10-minute length, 5-minute slide (each event
    lands in exactly two windows)."""
    events = read_table(spark, "events", sf_dir)
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


_SLIDING_SQL = """
WITH assigned AS (
  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                 time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
                ]) AS window_start,
         value
  FROM events
)
SELECT window_start,
       window_start + INTERVAL '10 minutes' AS window_end,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM assigned
GROUP BY 1, 2
"""


def _events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user: 30-minute inactivity gap.  Spark's
    session end = last event + gap; the oracle reproduces that with
    the gaps-and-islands rewrite (lag + cumulative sum)."""
    events = read_table(spark, "events", sf_dir)
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM numbered
GROUP BY user_id, session_id
"""


def _events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit per-event session labels (gaps-and-islands), rolled up
    per (user, session): exposes the session ordinal `session_seq`
    that `session_window` hides, plus argmin/argmax aggregates
    (`min_by`/`max_by`) — first and last event_type of each session."""
    from datawarehouse_code_spark.operators.sessions import sessionize

    events = read_table(spark, "events", sf_dir)
    labelled = sessionize(
        events, ["user_id"], "ts", gap="30 minutes", tiebreak="event_id"
    )
    return labelled.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("event_type", "event_id").alias("first_event_type"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


_SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, event_id, ts, event_type, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, event_id, ts, event_type, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq
  FROM marked
)
SELECT user_id, session_seq,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       min_by(event_type, event_id) AS first_event_type,
       max_by(event_type, event_id) AS last_event_type,
       round(sum(value), 2) AS sum_value
FROM numbered
GROUP BY 1, 2
"""


def _events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click attribution: per click, the same user's views in the 10
    minutes before it.  The batch twin of the stream-stream join
    (streaming/jobs.py click_attribution_stream) plus its rollup.

    Scale shape: equi-join on user_id with the time bound as a
    residual predicate — a hash join partitioned by user, never a
    nested loop (the equi key does the heavy lifting; the BETWEEN
    only filters matched pairs)."""
    events = read_table(spark, "events", sf_dir)
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    joined = clicks.join(
        views,
        (F.col("user_id") == F.col("view_user"))
        & F.col("view_ts").between(
            F.col("click_ts") - F.expr("INTERVAL 10 minutes"), F.col("click_ts")
        ),
        "left",
    )
    return joined.groupBy("click_id", "user_id", "click_ts").agg(
        F.count("view_ts").alias("n_views"),
        F.round(F.coalesce(F.sum("view_value"), F.lit(0.0)), 2).alias("sum_view_value"),
    )


_CLICK_ATTR_SQL = """
WITH clicks AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), views AS (
  SELECT user_id AS view_user, ts AS view_ts, value AS view_value
  FROM events WHERE event_type = 'view'
)
SELECT click_id, user_id, click_ts,
       count(view_ts) AS n_views,
       round(coalesce(sum(view_value), 0), 2) AS sum_view_value
FROM clicks LEFT JOIN views
  ON view_user = user_id
 AND view_ts BETWEEN click_ts - INTERVAL '10 minutes' AND click_ts
GROUP BY 1, 2, 3
"""


def _events_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling + sliding windows, labeled (one suite row — see
    plans/warehouse_queries.py consolidation note)."""
    t = _events_tumbling_10min(spark, sf_dir).select(
        F.lit("tumbling").alias("part"),
        "window_start", "window_end", "event_type", "n_events", "sum_value",
    )
    s = _events_sliding_10m_5m(spark, sf_dir).select(
        F.lit("sliding").alias("part"),
        "window_start", "window_end",
        F.lit(None).cast("string").alias("event_type"),
        "n_events", "sum_value",
    )
    return t.unionByName(s)


_TIME_WINDOWS_SQL = """
SELECT 'tumbling' AS part,
       time_bucket(INTERVAL '10 minutes', ts) AS window_start,
       time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS window_end,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 2, 3, 4
UNION ALL
SELECT 'sliding', window_start, window_start + INTERVAL '10 minutes',
       CAST(NULL AS VARCHAR), count(*), round(sum(value), 2)
FROM (
  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                 time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
                ]) AS window_start,
         value
  FROM events
)
GROUP BY 1, 2
"""


def _events_session_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both session surfaces as one labeled driver row (frees a
    50-row-window slot for round-6 surface): part='window' is the
    native session_window aggregation (session end = last event +
    gap), part='label' the explicit gaps-and-islands sessionize with
    session ordinals and first/last event types.  Constituents stay
    in STREAMING_SUPPLEMENTARY under their original names."""
    ns = F.lit(None).cast("string")
    w = _events_session_window(spark, sf_dir).select(
        F.lit("window").alias("part"), "user_id",
        F.lit(None).cast("bigint").alias("session_seq"),
        "session_start", "session_end", "n_events", "sum_value",
        ns.alias("first_event_type"), ns.alias("last_event_type"),
    )
    s = _events_sessionize(spark, sf_dir).select(
        F.lit("label").alias("part"), "user_id",
        F.col("session_seq").cast("bigint").alias("session_seq"),
        "session_start", "session_end", "n_events", "sum_value",
        "first_event_type", "last_event_type",
    )
    return w.unionByName(s)


_SESSION_SUITE_SQL = f"""
SELECT 'window' AS part, user_id, CAST(NULL AS BIGINT) AS session_seq,
       session_start, session_end, n_events, sum_value,
       CAST(NULL AS VARCHAR) AS first_event_type,
       CAST(NULL AS VARCHAR) AS last_event_type
FROM ({_SESSION_SQL}) w
UNION ALL
SELECT 'label', user_id, session_seq, session_start, session_end,
       n_events, sum_value, first_event_type, last_event_type
FROM ({_SESSIONIZE_SQL}) s
"""


def _events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel view → click → signup →
    purchase over the first week of events
    (operators/sessions.py funnel_counts): per step, the users who
    performed every prior step in strict timestamp order, plus the
    exact integer sum of microsecond lags from funnel entry — the
    oracle's iterated-min CTE cascade must agree on WHICH event
    completed each step, not just the counts.  The week cutoff keeps
    the funnel discriminative (completion declines per step) instead
    of saturated."""
    from datawarehouse_code_spark.operators.sessions import funnel_counts

    events = read_table(spark, "events", sf_dir).filter(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp")
    )
    return funnel_counts(events, ["view", "click", "signup", "purchase"])


_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, event_type, ts FROM events
  WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
), s1 AS (
  SELECT user_id, min(ts) AS t FROM e WHERE event_type = 'view' GROUP BY 1
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM e JOIN s2 USING (user_id)
  WHERE e.event_type = 'signup' AND e.ts > s2.t GROUP BY 1
), s4 AS (
  SELECT e.user_id, min(e.ts) AS t FROM e JOIN s3 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1
)
SELECT 1 AS step, 'view' AS step_name, count(*) AS n_users,
       CAST(0 AS BIGINT) AS sum_lag_us
FROM s1 GROUP BY 1, 2
UNION ALL
SELECT 2, 'click', count(*),
       CAST(sum(epoch_us(s2.t) - epoch_us(s1.t)) AS BIGINT)
FROM s2 JOIN s1 USING (user_id) GROUP BY 1, 2
UNION ALL
SELECT 3, 'signup', count(*),
       CAST(sum(epoch_us(s3.t) - epoch_us(s1.t)) AS BIGINT)
FROM s3 JOIN s1 USING (user_id) GROUP BY 1, 2
UNION ALL
SELECT 4, 'purchase', count(*),
       CAST(sum(epoch_us(s4.t) - epoch_us(s1.t)) AS BIGINT)
FROM s4 JOIN s1 USING (user_id) GROUP BY 1, 2
"""


def _events_funnel_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel with a completion time-horizon (operators/sessions.py
    funnel_counts_horizon): view → click → purchase, where each step
    must land within 8 hours of the funnel ENTRY.  Unlike the strict
    funnel, a user's earliest entry can expire and a LATER view can
    complete — the oracle retries every entry (per-entry min-cascade)
    and credits the deepest attempt, earliest entry on ties, exactly
    like the Spark fold.  At sf0.01: 110/150 users are credited to a
    non-first entry, so the retry path is what's being checked.  The
    per-user cap (100k step events) is the loud anti-bot guard — it
    never trips on organic data."""
    from datawarehouse_code_spark.operators.sessions import (
        funnel_counts_horizon,
    )

    events = read_table(spark, "events", sf_dir)
    return funnel_counts_horizon(
        events,
        ["view", "click", "purchase"],
        "8 hours",
        max_events_per_user=100_000,
    )


_FUNNEL_HORIZON_SQL = """
WITH e AS (
  SELECT user_id, event_type, ts FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
    AND ts IS NOT NULL
), ent AS (
  SELECT user_id, ts AS t1 FROM e WHERE event_type = 'view'
), c2 AS (
  SELECT ent.user_id, ent.t1, min(x.ts) AS t2
  FROM ent LEFT JOIN e x
    ON x.user_id = ent.user_id AND x.event_type = 'click'
   AND x.ts > ent.t1 AND x.ts <= ent.t1 + INTERVAL '8 hours'
  GROUP BY 1, 2
), c3 AS (
  SELECT c2.user_id, c2.t1, c2.t2, min(x.ts) AS t3
  FROM c2 LEFT JOIN e x
    ON x.user_id = c2.user_id AND x.event_type = 'purchase'
   AND x.ts > c2.t2 AND x.ts <= c2.t1 + INTERVAL '8 hours'
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT user_id, t1, t2, t3,
         CASE WHEN t3 IS NOT NULL THEN 3
              WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS stage,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY (CASE WHEN t3 IS NOT NULL THEN 3
                          WHEN t2 IS NOT NULL THEN 2 ELSE 1 END) DESC,
                    t1 ASC) AS rn
  FROM c3
), best AS (
  SELECT * FROM ranked WHERE rn = 1
)
SELECT 1 AS step, 'view' AS step_name, count(*) AS n_users,
       CAST(0 AS BIGINT) AS sum_lag_us
FROM best GROUP BY 1, 2
UNION ALL
SELECT 2, 'click', count(*),
       CAST(sum(epoch_us(t2) - epoch_us(t1)) AS BIGINT)
FROM best WHERE stage >= 2 GROUP BY 1, 2
UNION ALL
SELECT 3, 'purchase', count(*),
       CAST(sum(epoch_us(t3) - epoch_us(t1)) AS BIGINT)
FROM best WHERE stage >= 3 GROUP BY 1, 2
"""


def _events_funnel_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver suite row: the strict-order funnel and the
    time-horizon funnel, labeled — one oracle row covers both funnel
    semantics (the constituents stay supplementary so their frozen
    bench rows remain like-for-like)."""
    strict = _events_funnel(spark, sf_dir)
    horizon = _events_funnel_horizon(spark, sf_dir)
    return strict.select(F.lit("strict").alias("variant"), "*").unionByName(
        horizon.select(F.lit("horizon").alias("variant"), "*")
    )


_FUNNEL_SUITE_SQL = f"""
SELECT 'strict' AS variant, * FROM ({_FUNNEL_SQL})
UNION ALL
SELECT 'horizon' AS variant, * FROM ({_FUNNEL_HORIZON_SQL})
"""


def _events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase-cohort retention (operators/sessions.py
    cohort_retention): users cohorted by their first purchase DAY,
    counted as retained on each later day they purchased again.
    Day granularity over the sparser purchase stream keeps the table
    discriminative (per-cell counts vary and decay) instead of the
    saturated all-events weekly view.  All-integer output — the
    consumer derives the retention fraction."""
    from datawarehouse_code_spark.operators.sessions import cohort_retention

    purchases = read_table(spark, "events", sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    return cohort_retention(purchases, period="day")


_COHORT_SQL = """
WITH p AS (
  -- CAST: DuckDB date_trunc('day') yields DATE, Spark's a TIMESTAMP
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d FROM events
  WHERE event_type = 'purchase'
), firsts AS (
  SELECT user_id, min(d) AS cohort_week FROM p GROUP BY 1
), activity AS (
  SELECT DISTINCT user_id, d AS week FROM p
), per_cell AS (
  SELECT cohort_week,
         CAST(date_diff('day', cohort_week, week) AS INT) AS week_offset,
         count(*) AS n_users
  FROM activity JOIN firsts USING (user_id)
  GROUP BY 1, 2
), sizes AS (
  SELECT cohort_week, count(*) AS n_cohort FROM firsts GROUP BY 1
)
SELECT cohort_week, week_offset, n_users, n_cohort
FROM per_cell JOIN sizes USING (cohort_week)
"""


def _orders_cohort_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-grain cohort retention over ORDERS (operators/sessions.py
    cohort_retention, period="month"): customers cohorted by their
    first-order month (o_orderdate spans 1995-2001, ~80 months of
    cells), retained in each later month they ordered again.  Months
    are not fixed-width, so this exercises the months_between offset
    path the day/week grains cannot (the Jan-31 → Feb-1 boundary is
    pinned in tests/test_sessions.py)."""
    from datawarehouse_code_spark.operators.sessions import cohort_retention

    orders = read_table(spark, "orders", sf_dir)
    return cohort_retention(
        orders, user_col="o_custkey", ts_col="o_orderdate", period="month"
    )


_COHORT_MONTH_SQL = """
WITH p AS (
  SELECT o_custkey AS user_id,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS d
  FROM orders
), firsts AS (
  SELECT user_id, min(d) AS cohort_week FROM p GROUP BY 1
), activity AS (
  SELECT DISTINCT user_id, d AS week FROM p
), per_cell AS (
  SELECT cohort_week,
         CAST(date_diff('month', cohort_week, week) AS INT) AS week_offset,
         count(*) AS n_users
  FROM activity JOIN firsts USING (user_id)
  GROUP BY 1, 2
), sizes AS (
  SELECT cohort_week, count(*) AS n_cohort FROM firsts GROUP BY 1
)
SELECT cohort_week, week_offset, n_users, n_cohort
FROM per_cell JOIN sizes USING (cohort_week)
"""


def _events_cohort_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver suite row: daily purchase-cohort retention (events) and
    month-grain customer-cohort retention (orders), labeled — one
    oracle row covers both grains; constituents stay supplementary so
    the frozen events_cohort_retention bench row is like-for-like."""
    day = _events_cohort_retention(spark, sf_dir)
    month = _orders_cohort_month(spark, sf_dir)
    return day.select(F.lit("day").alias("variant"), "*").unionByName(
        month.select(F.lit("month").alias("variant"), "*")
    )


_COHORT_SUITE_SQL = f"""
SELECT 'day' AS variant, * FROM ({_COHORT_SQL})
UNION ALL
SELECT 'month' AS variant, * FROM ({_COHORT_MONTH_SQL})
"""


def _session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel WITHIN sessions — operator composition: sessionize
    (gaps-and-islands labels) feeds funnel_counts with the composite
    session key as its grouping column, so conversion is credited
    only when view→click→purchase happen inside one 30-minute
    session, not across a user's whole history.  Same fold, same
    oracle cascade, different grain."""
    from datawarehouse_code_spark.operators.sessions import (
        funnel_counts,
        sessionize,
    )

    events = read_table(spark, "events", sf_dir)
    labelled = sessionize(
        events, ["user_id"], "ts", gap="30 minutes", tiebreak="event_id"
    ).withColumn(
        "sess_key",
        F.col("user_id") * F.lit(1_000_000) + F.col("session_seq"),
    )
    return funnel_counts(
        labelled, ["view", "click", "purchase"], user_col="sess_key"
    )


_SESSION_FUNNEL_SQL = """
WITH marked AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_type,
         user_id * 1000000 + CAST(sum(is_new) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_key
  FROM marked
), s1 AS (
  SELECT sess_key, min(ts) AS t FROM numbered
  WHERE event_type = 'view' GROUP BY 1
), s2 AS (
  SELECT n.sess_key, min(n.ts) AS t FROM numbered n JOIN s1 USING (sess_key)
  WHERE n.event_type = 'click' AND n.ts > s1.t GROUP BY 1
), s3 AS (
  SELECT n.sess_key, min(n.ts) AS t FROM numbered n JOIN s2 USING (sess_key)
  WHERE n.event_type = 'purchase' AND n.ts > s2.t GROUP BY 1
)
SELECT 1 AS step, 'view' AS step_name, count(*) AS n_users,
       CAST(0 AS BIGINT) AS sum_lag_us
FROM s1 GROUP BY 1, 2
UNION ALL
SELECT 2, 'click', count(*),
       CAST(sum(epoch_us(s2.t) - epoch_us(s1.t)) AS BIGINT)
FROM s2 JOIN s1 USING (sess_key) GROUP BY 1, 2
UNION ALL
SELECT 3, 'purchase', count(*),
       CAST(sum(epoch_us(s3.t) - epoch_us(s1.t)) AS BIGINT)
FROM s3 JOIN s1 USING (sess_key) GROUP BY 1, 2
"""


def _events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical next-event transition table over the events stream
    (operators/sessions.py event_transitions): counts + integer
    basis-point shares of each prev type's outgoing edges.  25 rows
    at most (5 event types), all integers."""
    from datawarehouse_code_spark.operators.sessions import event_transitions

    events = read_table(spark, "events", sf_dir)
    return event_transitions(events, tiebreak="event_id")


_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events WHERE ts IS NOT NULL
), counts AS (
  SELECT prev_type, next_type, count(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n_transitions,
       (n_transitions * 10000) //
         sum(n_transitions) OVER (PARTITION BY prev_type) AS p_bp
FROM counts
"""


def _events_time_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click attribution (the stream-stream-join batch twin) +
    tumbling/sliding windows as ONE labeled driver row (consolidated
    round 10 to free oracle-window slots).  Normalized columns: k1/k2
    carry the attribution keys (click_id/user_id), t1/t2 the window
    or click timestamps, s1 the event type, n1/v the counts and
    value sums."""
    attribution = _events_click_attribution(spark, sf_dir).select(
        F.lit("attribution").alias("part"),
        F.col("click_id").alias("k1"),
        F.col("user_id").alias("k2"),
        F.col("click_ts").alias("t1"),
        F.lit(None).cast("timestamp_ntz").alias("t2"),
        F.lit(None).cast("string").alias("s1"),
        F.col("n_views").alias("n1"),
        F.col("sum_view_value").alias("v"),
    )
    windows = _events_time_windows(spark, sf_dir).select(
        F.concat(F.lit("win:"), F.col("part")).alias("part"),
        F.lit(None).cast("bigint").alias("k1"),
        F.lit(None).cast("bigint").alias("k2"),
        F.col("window_start").alias("t1"),
        F.col("window_end").alias("t2"),
        F.col("event_type").alias("s1"),
        F.col("n_events").alias("n1"),
        F.col("sum_value").alias("v"),
    )
    return attribution.unionByName(windows)


_EVENTS_TIME_SUITE_SQL = f"""
SELECT 'attribution' AS part, click_id AS k1, user_id AS k2,
       click_ts AS t1, CAST(NULL AS TIMESTAMP) AS t2,
       CAST(NULL AS VARCHAR) AS s1, n_views AS n1, sum_view_value AS v
FROM ({_CLICK_ATTR_SQL})
UNION ALL
SELECT 'win:' || part, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       window_start, window_end, event_type, n_events, sum_value
FROM ({_TIME_WINDOWS_SQL})
"""


STREAMING_QUERIES: list[Query] = [
    Query("events_time_suite", _events_time_suite, _EVENTS_TIME_SUITE_SQL,
          "§2.2 streaming: click attribution (stream-stream-join twin) "
          "+ tumbling/sliding windows, labeled (consolidated round 10)"),
    Query("events_session_suite", _events_session_suite, _SESSION_SUITE_SQL,
          "§2.2 streaming: session window + explicit sessionization, labeled"),
    Query("events_funnel_suite", _events_funnel_suite, _FUNNEL_SUITE_SQL,
          "§2.2 analytics: strict-order + time-horizon funnels, labeled "
          "(single-pass folds; horizon = per-entry retry, integer-exact "
          "step lags)"),
    Query("events_cohort_suite", _events_cohort_suite, _COHORT_SUITE_SQL,
          "§2.2 analytics: daily purchase-cohort (events) + month-grain "
          "customer-cohort (orders) retention, labeled"),
]

# Suite constituents (benchable, not separate driver rows).
STREAMING_SUPPLEMENTARY: list[Query] = [
    Query("events_click_attribution", _events_click_attribution, _CLICK_ATTR_SQL,
          "§2.2 streaming: stream-stream join batch twin (in "
          "events_time_suite since round 10)"),
    Query("events_time_windows", _events_time_windows, _TIME_WINDOWS_SQL,
          "§2.2 streaming: tumbling + sliding windows (in "
          "events_time_suite since round 10)"),
    Query("events_tumbling_10min", _events_tumbling_10min, _TUMBLING_SQL,
          "§2.2 streaming: tumbling window (in events_time_windows)"),
    Query("events_sliding_10m_5m", _events_sliding_10m_5m, _SLIDING_SQL,
          "§2.2 streaming: sliding window (in events_time_windows)"),
    Query("events_session_window", _events_session_window, _SESSION_SQL,
          "§2.2 streaming: session window (in events_session_suite)"),
    Query("events_sessionize", _events_sessionize, _SESSIONIZE_SQL,
          "§2.2 streaming: explicit sessionization (in events_session_suite)"),
    Query("session_funnel", _session_funnel, _SESSION_FUNNEL_SQL,
          "§2.2 analytics: funnel within 30-min sessions (sessionize ∘ "
          "funnel composition; supplementary, differential-tested)"),
    Query("events_funnel", _events_funnel, _FUNNEL_SQL,
          "§2.2 analytics: strict-order funnel (in events_funnel_suite)"),
    Query("events_funnel_horizon", _events_funnel_horizon, _FUNNEL_HORIZON_SQL,
          "§2.2 analytics: time-horizon funnel (in events_funnel_suite)"),
    Query("events_cohort_retention", _events_cohort_retention, _COHORT_SQL,
          "§2.2 analytics: daily purchase-cohort retention "
          "(in events_cohort_suite)"),
    Query("orders_cohort_month", _orders_cohort_month, _COHORT_MONTH_SQL,
          "§2.2 analytics: month-grain customer-cohort retention "
          "(in events_cohort_suite)"),
    Query("events_transitions", _events_transitions, _TRANSITIONS_SQL,
          "§2.2 analytics: first-order event-transition (Markov) table "
          "— one lag window + tiny rollup (supplementary, "
          "differential-tested)"),
]
