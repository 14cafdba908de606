"""Tier 1e — data-quality validation, distribution analytics, and
the gaps-and-islands idiom.

validate_constraints is the dbt-test / Deequ-shaped surface: each
constraint is one aggregate (or anti-join) over the table, results
union to a compact report. At 100 TB every check is a single
map-side-combinable pass — no constraint materializes row-level
violations unless asked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query


@query(
    "validate_constraints",
    oracle="""
    SELECT 'orders.custkey_not_null' AS constraint_name,
           CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'orders.orderkey_unique',
           CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey)
                 FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'orders.totalprice_positive',
           CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
                AS BIGINT)
    UNION ALL
    SELECT 'orders.status_accepted_values',
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
                AS BIGINT)
    UNION ALL
    SELECT 'orders.custkey_ref_integrity',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    """,
)
def validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over orders: not-null, uniqueness, range,
    accepted values, referential integrity. ALL FIVE checks fuse into
    ONE aggregation over ONE orders scan (r14): the RI check rides the
    same pass as a broadcast LEFT join against the DISTINCT customer
    keys (distinct build side => row multiplicity preserved => the
    four scalar aggregates are unchanged; a missing match shows as a
    NULL c_custkey to count). Output: one row per constraint.

    r14 plan fix: the previous 5-way union re-planned the aggregate
    subtree once per output row — 10 column-pruned orders scans in the
    r13 plan. The report rows now come from exploding a 5-element
    struct array over the single 1-row aggregate, so the plan scans
    orders ONCE (guide §6 scan reduction / §2.3 shared subtrees).
    Interleaved A/B at sf0.1 is flat (0.96-1.0x — ten PRUNED scans of
    a 2.7 MB table are nearly free locally, the r13 skew_profile
    lesson), so the change is kept for the scan-count win, which is
    what matters at 100 TB: one pass over the fact table instead of
    ten. Row values and order are byte-identical to the union form."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    keys = c.select("c_custkey").distinct()
    agg = (o.join(F.broadcast(keys), o.o_custkey == keys.c_custkey,
                  "left")
           .agg(F.count_if(F.col("o_custkey").isNull()).alias("nn"),
                (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
                .alias("uq"),
                F.count_if(F.col("o_totalprice") <= 0).alias("rng"),
                F.count_if(~F.col("o_orderstatus").isin("O", "F", "P"))
                .alias("av"),
                F.count_if(F.col("c_custkey").isNull()).alias("ri")))
    report = [("orders.custkey_not_null", "nn"),
              ("orders.orderkey_unique", "uq"),
              ("orders.totalprice_positive", "rng"),
              ("orders.status_accepted_values", "av"),
              ("orders.custkey_ref_integrity", "ri")]
    return (agg.select(F.explode(F.array(*[
        F.struct(F.lit(name).alias("constraint_name"),
                 F.col(col).cast("bigint").alias("n_violations"))
        for name, col in report])).alias("r"))
        .select("r.constraint_name", "r.n_violations"))


@query(
    "histogram_bins",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT)
               AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(min(o_totalprice), 6) AS lo,
           round(max(o_totalprice), 6) AS hi
    FROM orders GROUP BY 1
    """,
)
def histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (50k-wide bins, top bin open-ended): the
    profiling companion to approx_quantiles. Pure groupBy — one
    shuffle of 10 partial states regardless of table size."""
    o = load(spark, sf_dir, "orders")
    bin_ = F.least(F.floor(F.col("o_totalprice") / 50000),
                   F.lit(9)).cast("bigint")
    return (o.groupBy(bin_.alias("bin"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                  F.round(F.min("o_totalprice"), 6).alias("lo"),
                  F.round(F.max("o_totalprice"), 6).alias("hi")))


@query(
    "ratio_to_report",
    oracle="""
    WITH per_nation AS (
      SELECT c_nationkey AS nk,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                 AS bal
      FROM customer GROUP BY c_nationkey
    ),
    tot AS (
      SELECT CAST(SUM(CAST(bal AS DECIMAL(24,4))) AS DOUBLE) AS t
      FROM per_nation
    )
    SELECT x.nk, x.bal,
           round(x.bal / tot.t, 6) AS share,
           CAST(1 + (SELECT COUNT(*) FROM per_nation y
                     WHERE y.bal > x.bal
                        OR (y.bal = x.bal AND y.nk < x.nk)) AS BIGINT)
               AS bal_rank
    FROM per_nation x, tot
    """,
)
def ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each group's share of the global total, with
    the total attached as a broadcast 1-row aggregate (summed in
    DECIMAL so partial-aggregation order is exact) and the rank as a
    broadcast triangular self-join count over the |groups|-row
    relation — no unpartitioned window anywhere, so the plan emits
    zero single-partition stages even though the aggregated relation
    is tiny. (bal desc, nk asc) is a total order, so the
    count-strictly-before rank equals RANK() exactly."""
    c = load(spark, sf_dir, "customer")
    per_nation = (c.groupBy(F.col("c_nationkey").alias("nk"))
                   .agg(F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
                         .cast("double").alias("bal")))
    tot = per_nation.agg(
        F.sum(F.col("bal").cast("decimal(24,4)")).cast("double")
         .alias("_t"))
    x, y = per_nation.alias("x"), per_nation.alias("y")
    before = (F.col("y.bal") > F.col("x.bal")) \
        | ((F.col("y.bal") == F.col("x.bal"))
           & (F.col("y.nk") < F.col("x.nk")))
    ranked = (x.join(F.broadcast(y), before, "left")
               .groupBy(F.col("x.nk").alias("nk"),
                        F.col("x.bal").alias("bal"))
               .agg((F.count(F.col("y.nk")) + 1).cast("bigint")
                    .alias("bal_rank")))
    return (ranked.crossJoin(F.broadcast(tot))
            .select("nk", "bal",
                    F.round(F.col("bal") / F.col("_t"), 6).alias("share"),
                    "bal_rank"))


@query(
    "gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
      WHERE user_id < 60
    ), marked AS (
      SELECT user_id, d,
             CAST(d - INTERVAL (ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY d)) DAY AS DATE) AS grp
      FROM days
    )
    SELECT user_id, min(d) AS streak_start, max(d) AS streak_end,
           CAST(COUNT(*) AS BIGINT) AS streak_days
    FROM marked GROUP BY user_id, grp
    """,
)
def gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-active-day streaks per user via
    the date-minus-row_number constant-group trick — the SQL-idiom
    complement to session_window (which keys on time gaps, not
    calendar days). One shuffle on user_id shared by the window and
    the final aggregation."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    marked = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w)))
    return (marked.groupBy("user_id", "grp")
                  .agg(F.min("d").alias("streak_start"),
                       F.max("d").alias("streak_end"),
                       F.count(F.lit(1)).cast("bigint")
                        .alias("streak_days"))
                  .drop("grp"))
