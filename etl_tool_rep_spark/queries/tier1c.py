"""Tier 1c — reshaping, higher-order collections, time-series gap
fill, CDC snapshot diff, PII redaction, range-frame windows, stratified
sampling, and mergeable sketches.

These extend the SURVEY.md §2.2 addendum. Scale notes per query live
in the docstrings; the common theme is that every shape here stays in
whole-stage codegen (no Python in the hot path) and shuffles at most
once on its natural key.

Cross-engine hash rules (registry.py docstring) apply: decimal-routed
float aggregates, explicit casts where DuckDB widens (SUM(int) ->
HUGEINT, generate_series -> TIMESTAMP), md5-on-binary for the
deterministic samplers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query


# ---------------------------------------------------------------------------
# reshaping
# ---------------------------------------------------------------------------

@query(
    "unpivot_op",
    oracle="""
    SELECT p_partkey AS pkey, 'retailprice' AS metric,
           CAST(p_retailprice AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey AS pkey, 'size' AS metric,
           CAST(p_size AS DOUBLE) AS val FROM part
    """,
)
def unpivot_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt (`DataFrame.unpivot`, the inverse of pivot_op).
    Narrow transform: no shuffle, output is |cols| x rows — at scale
    this is a flat map inside one codegen stage."""
    p = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pkey"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"))
    return p.unpivot("pkey", ["retailprice", "size"], "metric", "val")


# ---------------------------------------------------------------------------
# higher-order collection functions
# ---------------------------------------------------------------------------

@query(
    "higher_order_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, t -> length(t) > 5)) AS BIGINT)
               AS n_long,
           CAST(list_sum(list_transform(toks, t -> length(t)))
                AS BIGINT) AS total_chars,
           list_count(list_filter(toks, t -> length(t) >= 10)) > 0
               AS has_very_long,
           array_to_string(list_transform(toks[1:3], t -> upper(t)),
                           '|') AS head_upper
    FROM t
    """,
)
def higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas (transform/filter/exists/aggregate):
    JVM-side per-row loops — the built-in alternative to a Python UDF
    for collection logic, so the hot path stays in codegen."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5))
         .cast("bigint").alias("n_long"),
        F.aggregate(toks, F.lit(0).cast("bigint"),
                    lambda acc, t: acc + F.length(t))
         .alias("total_chars"),
        F.exists(toks, lambda t: F.length(t) >= 10)
         .alias("has_very_long"),
        F.array_join(F.transform(F.slice(toks, 1, 3),
                                 lambda t: F.upper(t)), "|")
         .alias("head_upper"))


@query(
    "map_funcs",
    oracle="""
    SELECT o_orderkey AS okey,
           o_orderstatus AS status_v,
           o_orderpriority AS priority_v,
           'priority,status' AS keys_sorted,
           CAST(2 AS INTEGER) AS n_keys
    FROM orders
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construct/access (create_map, element_at, map_keys): builds
    the map Spark-side and extracts back to scalars so the oracle is
    engine-neutral. Maps stay inside the row — no shuffle."""
    o = load(spark, sf_dir, "orders")
    m = F.create_map(F.lit("status"), F.col("o_orderstatus"),
                     F.lit("priority"), F.col("o_orderpriority"))
    return o.select(
        F.col("o_orderkey").alias("okey"),
        m.getItem("status").alias("status_v"),
        F.element_at(m, "priority").alias("priority_v"),
        F.array_join(F.array_sort(F.map_keys(m)), ",")
         .alias("keys_sorted"),
        F.size(m).alias("n_keys"))


# ---------------------------------------------------------------------------
# time series: gap fill + last-observation-carried-forward
# ---------------------------------------------------------------------------

@query(
    "time_series_fill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                 AS day_total
      FROM events WHERE user_id < 40 GROUP BY user_id, CAST(ts AS DATE)
    ), bounds AS (
      SELECT user_id, min(d) AS lo, max(d) AS hi FROM daily
      GROUP BY user_id
    ), scaffold AS (
      SELECT user_id,
             CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ), j AS (
      SELECT s.user_id, s.d, daily.day_total
      FROM scaffold s LEFT JOIN daily
        ON s.user_id = daily.user_id AND s.d = daily.d
    )
    SELECT user_id, d, day_total,
           last_value(day_total IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled
    FROM j
    """,
)
def time_series_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap fill + LOCF: per-user daily scaffold via
    sequence()+explode, left join the observed aggregate, forward-fill
    with last(ignoreNulls) over an ordered window.

    Scale: the scaffold explodes from per-user (min,max) bounds — rows
    generated distributed, proportional to span, never collected; the
    join and the fill window share the user_id partitioning so AQE
    coalesces to one effective shuffle."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    daily = (ev.groupBy("user_id", F.to_date("ts").alias("d"))
               .agg(F.sum(F.col("value").cast("decimal(18,4)"))
                     .cast("double").alias("day_total")))
    bounds = daily.groupBy("user_id").agg(F.min("d").alias("lo"),
                                          F.max("d").alias("hi"))
    scaffold = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day")))
         .alias("d"))
    j = scaffold.join(daily, ["user_id", "d"], "left")
    w = (Window.partitionBy("user_id").orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return j.select("user_id", "d", "day_total",
                    F.last("day_total", ignorenulls=True).over(w)
                     .alias("filled"))


# ---------------------------------------------------------------------------
# CDC: snapshot diff
# ---------------------------------------------------------------------------

@query(
    "snapshot_diff",
    oracle="""
    WITH old_snap AS (
      SELECT o_orderkey AS k, o_totalprice AS price FROM orders
      WHERE o_orderkey % 7 <> 0
    ), new_snap AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 11 <> 0
    )
    SELECT COALESCE(o.k, n.k) AS okey,
           CASE WHEN o.k IS NULL THEN 'insert'
                WHEN n.k IS NULL THEN 'delete'
                WHEN o.price <> n.price THEN 'update'
                ELSE 'unchanged' END AS change_type,
           o.price AS old_price, n.price AS new_price
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.k = n.k
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two table snapshots: full-outer join on the key,
    classify insert/delete/update/unchanged. The batch complement to
    merge_upsert (same plan shape reversed). Scale: one co-partitioned
    sort-merge join; at 100 TB both snapshots would be bucketed on the
    key so the diff is shuffle-free. Price perturbations are
    deterministic IEEE ops — bit-identical across engines."""
    o = load(spark, sf_dir, "orders")
    old_snap = (o.filter(F.col("o_orderkey") % 7 != 0)
                 .select(F.col("o_orderkey").alias("k_o"),
                         F.col("o_totalprice").alias("old_price")))
    new_snap = (o.filter(F.col("o_orderkey") % 11 != 0)
                 .select(F.col("o_orderkey").alias("k_n"),
                         F.when(F.col("o_orderkey") % 5 == 0,
                                F.col("o_totalprice") * 1.1)
                          .otherwise(F.col("o_totalprice"))
                          .alias("new_price")))
    j = old_snap.join(new_snap, old_snap.k_o == new_snap.k_n, "full")
    return j.select(
        F.coalesce("k_o", "k_n").alias("okey"),
        F.when(F.col("k_o").isNull(), "insert")
         .when(F.col("k_n").isNull(), "delete")
         .when(F.col("old_price") != F.col("new_price"), "update")
         .otherwise("unchanged").alias("change_type"),
        "old_price", "new_price")


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

@query(
    "pii_redact",
    oracle="""
    SELECT doc_id,
           substr(regexp_replace(text, '[0-9]+', '<NUM>', 'g'), 1, 120)
               AS red_prefix,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER)
               AS n_masked
    FROM documents
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style masking: regex scrub of digit runs (the shape used
    for emails/phones/SSNs in a real corpus) plus a mask count for
    audit. All-JVM regexp — the LLM-corpus cleaning primitive that
    must never fall back to per-row Python. DuckDB needs the 'g' flag
    to match Spark's replace-all default.

    Group index 0 is EXPLICIT: PySpark's regexp_extract_all defaults
    to capture group 1, and '[0-9]+' has no groups — Spark validates
    the index only when a row actually matches, so on the digit-free
    small fixtures the bug was latent and the sf1 rehearsal (whose
    tiled text contains digits) was what surfaced it."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring(F.regexp_replace("text", "[0-9]+", "<NUM>"),
                    1, 120).alias("red_prefix"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0))
         .alias("n_masked"))


# ---------------------------------------------------------------------------
# range-frame window (interval-bounded moving aggregate)
# ---------------------------------------------------------------------------

@query(
    "range_frame_window",
    oracle="""
    WITH t AS (
      SELECT user_id, date_trunc('second', ts) AS tsec, value
      FROM events WHERE user_id < 100
    )
    SELECT user_id, tsec,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id
             ORDER BY CAST(epoch(tsec) AS BIGINT)
             RANGE BETWEEN 259200 PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS sum_3d,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id
             ORDER BY CAST(epoch(tsec) AS BIGINT)
             RANGE BETWEEN 259200 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_3d
    FROM t
    """,
)
def range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame moving aggregate: trailing 3-day sum/count per user,
    bounded by the ORDER-BY value (epoch seconds), not row counts —
    robust to irregular event spacing. Unlike a self-join
    implementation this is one sort within the user partition.
    Seconds-truncated on both engines so the epoch is integral (DuckDB
    CAST(double) rounds, Spark truncates — only exact values are
    safe)."""
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("user_id") < 100)
          .select("user_id",
                  F.date_trunc("second", "ts").alias("tsec"), "value"))
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_timestamp("tsec"))
         .rangeBetween(-259200, Window.currentRow))
    return ev.select(
        "user_id", "tsec",
        F.sum(F.col("value").cast("decimal(18,4)")).over(w)
         .cast("double").alias("sum_3d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_3d"))


# ---------------------------------------------------------------------------
# stratified deterministic sampling
# ---------------------------------------------------------------------------

@query(
    "stratified_sample",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE CASE WHEN lang = 'en'
               THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                    IN ('0', '1', '2', '3')
               ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
          END
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: 4/16 of 'en' docs, 1/16 of
    every other language, by md5-of-key prefix — the reproducible
    alternative to sampleBy(fractions, seed) whose output depends on
    partitioning. Pure filter: pushes to the scan, no shuffle, and the
    same doc is always in/out regardless of cluster layout."""
    d = load(spark, sf_dir, "documents")
    hx = F.substring(F.md5(F.col("doc_id").cast("string")
                            .cast("binary")), 1, 1)
    keep = (F.when(F.col("lang") == "en",
                   hx.isin("0", "1", "2", "3"))
             .otherwise(hx == "0"))
    return d.filter(keep).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# mergeable sketches (HLL) — the 100 TB count-distinct pattern
# ---------------------------------------------------------------------------

@query("hll_sketch_merge")  # rows-only: sketch binary is engine-specific
def hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog sketches (Spark 4 hll_sketch_agg /
    hll_union_agg): per-source partial sketches unioned to a global
    distinct-user estimate — the two-level pattern that replaces exact
    COUNT(DISTINCT) at 100 TB (partials computed map-side per
    partition/day, merged without re-reading data). Accuracy vs exact
    is asserted in tests/test_sketches.py."""
    ev = load(spark, sf_dir, "events")
    per_type = (ev.groupBy("event_type")
                  .agg(F.hll_sketch_agg("user_id").alias("sketch"),
                       F.countDistinct("user_id").alias("exact_nd")))
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
         .alias("global_estimate"))
    return (per_type.select(
                "event_type",
                F.hll_sketch_estimate("sketch").alias("estimate_nd"),
                "exact_nd")
            .crossJoin(F.broadcast(merged)))
