"""TPC-H-shaped analytical queries over the driver corpus — the
multi-join "query capabilities" proof points (Q3/Q5/Q10 shapes,
adapted to the corpus's columns).

Plan shapes these exercise at scale:
* star joins with dimension broadcast (nation/region) and fact-fact
  sort-merge (orders⋈lineitem) — Catalyst/AQE pick per side;
* aggregation after join with decimal-routed revenue sums;
* deterministic top-k on an exact (decimal-derived) sort key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query

def _REV():
    # Lazy: building a Column requires a live SparkContext, and this
    # module must stay importable before the driver creates one.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_DEC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


@query(
    "tpch_q3_shipping",
    oracle=f"""
    SELECT l.l_orderkey AS okey,
           CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue,
           o.o_orderdate AS orderdate, o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, okey ASC
    LIMIT 10
    """,
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: segment-filtered customer x unshipped orders, top-10
    by revenue (exact decimal sort key -> deterministic)."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .groupBy(li.l_orderkey.alias("okey"),
                       o.o_orderdate.alias("orderdate"),
                       o.o_orderpriority.alias("priority"))
              .agg(F.sum(_REV().cast("decimal(18,4)")).cast("double")
                    .alias("revenue"))
              .select("okey", "revenue", "orderdate", "priority")
              .orderBy(F.col("revenue").desc(), F.col("okey").asc())
              .limit(10))


@query(
    "tpch_q5_local_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 6-table star join (region/nation broadcast, fact-fact
    sort-merge), same-nation customer+supplier correlation."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(F.broadcast(s),
                    (li.l_suppkey == s.s_suppkey)
                    & (c.c_nationkey == s.s_nationkey))
              .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
              .groupBy(n.n_name.alias("nation"))
              .agg(F.sum(_REV().cast("decimal(18,4)")).cast("double")
                    .alias("revenue")))


@query(
    "tpch_q10_returns",
    oracle=f"""
    SELECT c.c_custkey AS ckey, c.c_name AS cname,
           CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue,
           c.c_acctbal AS acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, ckey ASC
    LIMIT 20
    """,
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-item revenue per customer, top-20."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .groupBy(c.c_custkey.alias("ckey"),
                       c.c_name.alias("cname"),
                       c.c_acctbal.alias("acctbal"),
                       n.n_name.alias("nation"))
              .agg(F.sum(_REV().cast("decimal(18,4)")).cast("double")
                    .alias("revenue"))
              .select("ckey", "cname", "revenue", "acctbal", "nation")
              .orderBy(F.col("revenue").desc(), F.col("ckey").asc())
              .limit(20))
