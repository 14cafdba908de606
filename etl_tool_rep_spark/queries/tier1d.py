"""Tier 1d — arg/boolean/bitwise aggregates, extended calendar
functions, windowed percentiles, event-path transitions, array set
algebra, struct construction, the SQL/CTE interface, and a generated
date dimension.

Cross-engine notes (see registry.py for the general rules):
* Spark ``dayofweek`` is 1=Sunday; DuckDB ``dayofweek`` is 0=Sunday —
  oracles add 1.
* Spark array_union/intersect/except deduplicate; DuckDB list_* do
  not — oracles spell out list_distinct + list_filter, and both sides
  sort + join to a string so element order can't drift.
* arg aggregates (min_by/max_by) are only deterministic when the
  ordering column is unique (o_orderkey here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.rank import grouped_prefix_sum
from .registry import query


@query(
    "agg_misc",
    oracle="""
    SELECT o_orderstatus AS status,
           arg_max(o_orderpriority, o_orderkey) AS last_priority,
           arg_min(o_orderpriority, o_orderkey) AS first_priority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           bit_and(o_orderkey) AS key_bit_and,
           bit_or(o_orderkey) AS key_bit_or,
           bit_xor(o_orderkey) AS key_bit_xor,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
               AS n_big
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg aggregates (min_by/max_by on a unique ordering key),
    boolean aggregates, bitwise aggregates, count_if. All map-side
    combinable — one shuffle of tiny partial states at any scale."""
    o = load(spark, sf_dir, "orders")
    return (o.groupBy(F.col("o_orderstatus").alias("status"))
             .agg(F.max_by("o_orderpriority", "o_orderkey")
                   .alias("last_priority"),
                  F.min_by("o_orderpriority", "o_orderkey")
                   .alias("first_priority"),
                  F.bool_and(F.col("o_totalprice") > 1000)
                   .alias("all_over_1k"),
                  F.bool_or(F.col("o_totalprice") > 400000)
                   .alias("any_over_400k"),
                  F.bit_and("o_orderkey").alias("key_bit_and"),
                  F.bit_or("o_orderkey").alias("key_bit_or"),
                  F.bit_xor("o_orderkey").alias("key_bit_xor"),
                  F.count_if(F.col("o_totalprice") > 200000)
                   .cast("bigint").alias("n_big")))


@query(
    "date_funcs2",
    oracle="""
    SELECT o_orderkey AS okey,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
               AS plus_3m,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
)
def date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar function surface beyond date_funcs: ISO week,
    day-of-week/year, quarter, month-end, clamped month arithmetic,
    pattern formatting. Spark dayofweek is 1=Sunday = DuckDB + 1."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        F.col("o_orderkey").alias("okey"),
        F.weekofyear(d).cast("bigint").alias("iso_week"),
        F.dayofweek(d).cast("bigint").alias("dow"),
        F.dayofyear(d).cast("bigint").alias("doy"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).alias("plus_3m"),
        F.date_format(d, "yyyy-MM").alias("ym"))


def _exact_qcont(li, col: str, q: float, out: str, ns=None):
    """Exact linear-interpolated quantile per l_returnflag WITHOUT
    buffering a group in memory: a (rf, value)-census collapses ties,
    the bucketed two-phase prefix sum ranks the support, and the two
    order statistics around position q*(n-1) are picked by cumulative
    range and interpolated with the textbook lo*(ceil-pos) +
    hi*(pos-floor) formula — the same doubles Spark's `percentile`
    and DuckDB's `quantile_cont` produce. Returns |groups| rows."""
    per = li.groupBy("l_returnflag", col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt"))
    # pin=True: the census+bucket-window subtree otherwise plans once
    # per consumer — the r13-open percentile_window plan held 82
    # Exchanges from exactly this (2 quantiles x lo/hi branches x
    # offsets/join twins); with the one-pass agg below + pin it is a
    # single census per quantile
    cum = grouped_prefix_sum(per, ["l_returnflag"], [F.asc(col)],
                             lead=col, sums={"_cum": "_cnt"}, pin=True)
    if ns is None:
        ns = li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"))
    j = cum.join(F.broadcast(ns), "l_returnflag")
    pos = (F.col("_n") - 1).cast("double") * F.lit(q)
    ilo = F.floor(pos).cast("bigint")
    ihi = F.ceil(pos).cast("bigint")
    v = F.col(col).cast("double")
    covers_lo = ((F.col("_cum") - F.col("_cnt") <= ilo)
                 & (ilo < F.col("_cum")))
    covers_hi = ((F.col("_cum") - F.col("_cnt") <= ihi)
                 & (ihi < F.col("_cum")))
    # one conditional-aggregation pass picks BOTH order statistics
    # (at most one census row covers each index; pos/ilo/ihi are
    # per-group constants, max() just carries them) — replacing the
    # old two-filter-branches + join, which re-planned the whole
    # census tree per branch. Identical interpolation arithmetic.
    agg = (j.groupBy("l_returnflag")
           .agg(F.max(F.when(covers_lo, v)).alias("_vlo"),
                F.max(F.when(covers_hi, v)).alias("_vhi"),
                F.max(pos).alias("_pos"),
                F.max(ilo).alias("_ilo"),
                F.max(ihi).alias("_ihi")))
    res = agg.select(
        "l_returnflag",
        F.when(F.col("_ilo") == F.col("_ihi"), F.col("_vlo"))
        .otherwise(F.col("_vlo")
                   * (F.col("_ihi").cast("double") - F.col("_pos"))
                   + F.col("_vhi")
                   * (F.col("_pos") - F.col("_ilo").cast("double")))
        .alias(out))
    return res


@query(
    "percentile_window",
    oracle="""
    SELECT l_orderkey AS okey, l_linenumber AS lnum,
           l_returnflag AS rf,
           round(median(l_quantity) OVER (PARTITION BY l_returnflag),
                 6) AS median_qty,
           round(quantile_cont(l_extendedprice, 0.9) OVER (
                 PARTITION BY l_returnflag), 6) AS p90_price
    FROM lineitem
    """,
)
def percentile_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median/p90 annotated onto every row. Round 7:
    no whole-partition percentile window (that buffers n/|groups|
    rows in ONE task per group at 100 TB) — the exact interpolated
    quantiles come from a distinct-value census + two-phase prefix
    sum (`_exact_qcont`), then a 3-row broadcast join attaches them
    to every row. Same values as `percentile(...) OVER (PARTITION
    BY rf)` for continuous interpolation on the total group."""
    li = load(spark, sf_dir, "lineitem")
    # group counts are column-independent — compute once, share
    # across both quantiles (was two identical lineitem counts)
    ns = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"))
    med = _exact_qcont(li, "l_quantity", 0.5, "_med", ns=ns)
    p90 = _exact_qcont(li, "l_extendedprice", 0.9, "_p90", ns=ns)
    # 3-row frames: broadcast instead of the default sort-merge
    stats = med.join(F.broadcast(p90), "l_returnflag")
    return (li.join(F.broadcast(stats), "l_returnflag")
            .select(
                F.col("l_orderkey").alias("okey"),
                F.col("l_linenumber").alias("lnum"),
                F.col("l_returnflag").alias("rf"),
                F.round(F.col("_med"), 6).alias("median_qty"),
                F.round(F.col("_p90"), 6).alias("p90_price")))


@query(
    "path_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey transition matrix: lead() within the user's
    ts-ordered event sequence, then count (from, to) pairs — the
    Markov-chain / Sankey input. event_id breaks ts ties so the
    sequence is total-ordered. One shuffle on user_id for the window,
    then a partial-agg count on the pair."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.select("event_type",
                      F.lead("event_type").over(w).alias("next_type"))
              .filter(F.col("next_type").isNotNull())
              .groupBy(F.col("event_type").alias("from_type"),
                       F.col("next_type").alias("to_type"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("n")))


@query(
    "array_set_ops",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), s AS (
      SELECT doc_id, toks[1:8] AS a1, toks[5:12] AS a2 FROM t
    )
    SELECT doc_id,
           COALESCE(array_to_string(list_sort(list_distinct(
               list_concat(a1, a2))), '|'), '') AS u,
           COALESCE(array_to_string(list_sort(list_distinct(
               list_filter(a1, x -> list_contains(a2, x)))), '|'), '')
               AS i,
           COALESCE(array_to_string(list_sort(list_distinct(
               list_filter(a1, x -> NOT list_contains(a2, x)))), '|'),
               '') AS e,
           list_has_any(a1, a2) AS overlaps
    FROM s
    """,
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (union/intersect/except/overlap) on token
    slices. Spark's operators deduplicate; the oracle spells that out
    with list_distinct. Both sides sort+join to strings so element
    order can't drift between engines."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    a1, a2 = F.slice(toks, 1, 8), F.slice(toks, 5, 8)
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_union(a1, a2)), "|")
         .alias("u"),
        F.array_join(F.array_sort(F.array_intersect(a1, a2)), "|")
         .alias("i"),
        F.array_join(F.array_sort(F.array_except(a1, a2)), "|")
         .alias("e"),
        F.arrays_overlap(a1, a2).alias("overlaps"))


@query(
    "struct_funcs",
    oracle="""
    SELECT s_suppkey AS skey,
           s_name AS name_v,
           CAST(s_nationkey AS INTEGER) AS nk_v,
           to_json(struct_pack(name := s_name, nk := s_nationkey))
               AS packed_json
    FROM supplier
    """,
)
def struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construct + field access + JSON serialization (string
    and int fields only — float JSON formatting differs between
    engines). Structs are Tungsten-inlined; no boxing, no shuffle."""
    s = load(spark, sf_dir, "supplier")
    packed = F.struct(F.col("s_name").alias("name"),
                      F.col("s_nationkey").alias("nk"))
    return s.select(
        F.col("s_suppkey").alias("skey"),
        packed.getField("name").alias("name_v"),
        packed.getField("nk").alias("nk_v"),
        F.to_json(packed).alias("packed_json"))


@query(
    "cte_query",
    oracle="""
    WITH cust_rev AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders GROUP BY o_custkey
    ), nation_rev AS (
      SELECT c.c_nationkey, r.rev
      FROM customer c JOIN cust_rev r ON c.c_custkey = r.o_custkey
    )
    SELECT n.n_name AS nation,
           CAST(SUM(nr.rev) AS DOUBLE) AS total_rev,
           CAST(COUNT(*) AS BIGINT) AS n_cust
    FROM nation_rev nr JOIN nation n
      ON nr.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def cte_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL interface end-to-end: temp views + a multi-CTE
    spark.sql query (same text modulo dialect as the oracle). Catalyst
    treats CTEs as inline subplans — same physical plan as the
    DataFrame chain, broadcast of nation included."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    return spark.sql("""
        WITH cust_rev AS (
          SELECT o_custkey,
                 SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
          FROM orders_v GROUP BY o_custkey
        ), nation_rev AS (
          SELECT c.c_nationkey, r.rev
          FROM customer_v c JOIN cust_rev r ON c.c_custkey = r.o_custkey
        )
        SELECT n.n_name AS nation,
               CAST(SUM(nr.rev) AS DOUBLE) AS total_rev,
               CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM nation_rev nr JOIN nation_v n
          ON nr.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """)


@query(
    "calendar_dim",
    oracle="""
    SELECT CAST(d AS DATE) AS d,
           CAST(year(d) AS BIGINT) AS yr,
           CAST(month(d) AS BIGINT) AS mo,
           CAST(day(d) AS BIGINT) AS dom,
           CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
           CAST(weekofyear(d) AS BIGINT) AS iso_week,
           dayofweek(d) IN (0, 6) AS is_weekend,
           strftime(d, '%B') AS month_name
    FROM (SELECT unnest(generate_series(TIMESTAMP '1996-01-01',
                                        TIMESTAMP '1997-12-31',
                                        INTERVAL 1 DAY)) AS d)
    """,
)
def calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated date dimension (no input table): sequence + explode
    -> calendar attributes. The standard scaffold dim for time-series
    joins; tiny, always broadcast-able."""
    start, stop = F.lit("1996-01-01"), F.lit("1997-12-31")
    days = F.sequence(start.cast("date"), stop.cast("date"),
                      F.expr("interval 1 day"))
    base = spark.range(1).select(F.explode(days).alias("d"))
    d = F.col("d")
    return base.select(
        d,
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
        F.dayofweek(d).cast("bigint").alias("dow"),
        F.weekofyear(d).cast("bigint").alias("iso_week"),
        F.dayofweek(d).isin(1, 7).alias("is_weekend"),
        F.date_format(d, "MMMM").alias("month_name"))
