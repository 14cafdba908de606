"""Tier 2 — streaming-shaped temporal operators, batch-first over
``events`` (SURVEY.md §2.2). The same window expressions wire directly
into Structured Streaming (see ``etl_tool_rep_spark.streaming``); the
batch forms here are what the DuckDB oracle can check.

Windows in Spark are epoch-aligned (UTC session timezone), so the
oracles reconstruct the identical bucketing with date_trunc
arithmetic. Session windows follow Spark's semantics: a new session
starts when the gap to the previous event is >= the gap duration, and
``session_end = last_event_ts + gap``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.asof import asof_join
from .registry import query


@query(
    "tumbling_window_agg",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR
               AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 1-hour windows. In streaming mode the identical expression
    runs under a watermark; 1-hour tumbling windows are epoch-aligned
    so date_trunc('hour') reproduces the bucket exactly."""
    e = load(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (e.groupBy(win, "event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                   .alias("total_value"))
             .select(F.col("window.start").alias("window_start"),
                     F.col("window.end").alias("window_end"),
                     "event_type", "n_events", "total_value"))


@query(
    "sliding_window_agg",
    oracle="""
    WITH shifts(i) AS (VALUES (0), (1), (2), (3)),
    b AS (
      SELECT event_type, value,
             date_trunc('minute', ts)
               - (CAST(minute(ts) AS INTEGER) % 15) * INTERVAL 1 MINUTE
               AS bucket
      FROM events
    )
    SELECT CAST(b.bucket - s.i * INTERVAL 15 MINUTE AS TIMESTAMP)
               AS window_start,
           CAST(b.bucket - s.i * INTERVAL 15 MINUTE AS TIMESTAMP)
               + INTERVAL 1 HOUR AS window_end,
           b.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(b.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM b CROSS JOIN shifts s
    GROUP BY 1, 2, 3
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes: each event lands in 4
    overlapping windows. The oracle reconstructs Spark's epoch-aligned
    window set by shifting each event's 15-minute bucket back 0..3
    slides."""
    e = load(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return (e.groupBy(win, "event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                   .alias("total_value"))
             .select(F.col("window.start").alias("window_start"),
                     F.col("window.end").alias("window_end"),
                     "event_type", "n_events", "total_value"))


@query(
    "session_window_agg",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 8 HOUR
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    ), numbered AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 8 HOUR AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (8h gap): Spark ``session_window``
    merges events closer than the gap; session_end is last event + gap.
    The oracle is the classic gaps-and-islands rewrite with the SAME
    boundary rule (new session when diff >= gap)."""
    e = load(spark, sf_dir, "events")
    return (e.groupBy(F.session_window("ts", "8 hours"), "user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                   .alias("total_value"))
             .select("user_id",
                     F.col("session_window.start").alias("session_start"),
                     F.col("session_window.end").alias("session_end"),
                     "n_events", "total_value"))


@query(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    )
    SELECT CAST(date_trunc('week', f.first_ts) AS TIMESTAMP)
               AS cohort_week,
           CAST(floor(datediff('day', CAST(f.first_ts AS DATE),
                               CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
               AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, activity
    counted at weekly offsets — first-touch via one aggregation, then
    a key-co-partitioned self-join (both sides shuffle once on
    user_id; AQE turns the tiny firsts side into a broadcast)."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    return (e.join(firsts, "user_id")
             .select(F.date_trunc("week", "first_ts").alias("cohort_week"),
                     F.floor(F.datediff(F.col("ts").cast("date"),
                                        F.col("first_ts").cast("date"))
                             / 7.0).cast("bigint").alias("week_offset"),
                     "user_id")
             .groupBy("cohort_week", "week_offset")
             .agg(F.countDistinct("user_id").alias("n_active")))


@query(
    "funnel_conversion",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view') AS t_view,
             min(ts) FILTER (WHERE event_type = 'click') AS t_click,
             min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(t_view) AS BIGINT) AS n_viewed,
           CAST(COUNT(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT)
               AS n_clicked_after_view,
           CAST(COUNT(CASE WHEN t_purchase > t_click
                            AND t_click > t_view THEN 1 END) AS BIGINT)
               AS n_full_funnel
    FROM stages
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel analytics (view -> click -> purchase ordering per
    user): conditional-min stage timestamps in one aggregation pass —
    no self-joins, one shuffle by user."""
    e = load(spark, sf_dir, "events")
    stage = (e.groupBy("user_id")
             .agg(F.min(F.when(F.col("event_type") == "view",
                               F.col("ts"))).alias("t_view"),
                  F.min(F.when(F.col("event_type") == "click",
                               F.col("ts"))).alias("t_click"),
                  F.min(F.when(F.col("event_type") == "purchase",
                               F.col("ts"))).alias("t_purchase")))
    return stage.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_viewed"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1))
         .alias("n_clicked_after_view"),
        F.count(F.when((F.col("t_purchase") > F.col("t_click"))
                       & (F.col("t_click") > F.col("t_view")), 1))
         .alias("n_full_funnel"))


@query(
    "asof_join",
    oracle="""
    WITH b AS (
      SELECT o_custkey, o_orderdate + INTERVAL 29 YEAR AS eff_ts,
             o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey, o_orderdate
               ORDER BY o_orderkey DESC, o_totalprice DESC) AS rn
      FROM orders
    ), bd AS (
      SELECT o_custkey, eff_ts, o_orderkey, o_totalprice
      FROM b WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts,
           bd.o_orderkey AS last_order_key,
           bd.o_totalprice AS last_order_total
    FROM events e
    ASOF LEFT JOIN bd
      ON e.user_id = bd.o_custkey AND bd.eff_ts <= e.ts
    """,
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-order-at-or-before-event join (orders shifted +29y onto
    the events clock so the as-of actually selects). Implemented with
    the union-marker single-shuffle pattern (operators/asof.py) —
    checked against DuckDB's native ASOF LEFT JOIN."""
    e = load(spark, sf_dir, "events")
    o = (load(spark, sf_dir, "orders")
         .withColumn("eff_ts",
                     F.col("o_orderdate") + F.expr("INTERVAL 29 YEARS")))
    out = asof_join(
        probe=e.select("event_id", "user_id", "ts"),
        build=o,
        probe_key="user_id", build_key="o_custkey",
        probe_ts="ts", build_ts="eff_ts",
        payload=["o_orderkey", "o_totalprice"])
    return out.select(
        "event_id", "user_id", "ts",
        F.col("o_orderkey").alias("last_order_key"),
        F.col("o_totalprice").alias("last_order_total"))
