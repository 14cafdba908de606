"""r13: tpch_q1_pricing moved its aggregates to salted two-level sums
(long partials per (group, salt), decimal finals). The DuckDB oracle
certifies it cross-engine; this test locks the INTERNAL equivalence —
the salted form must be BIT-identical (not approximately equal) to
the direct decimal-sum reference on the same fixture, so a future
salt/rescale edit that perturbs any of the 8 aggregates by even one
ulp fails here before it reaches the oracle gate.
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from etl_tool_rep_spark.catalog import load
from etl_tool_rep_spark.queries.registry import QUERIES


def _bits(x: float) -> bytes:
    return struct.pack("<d", float(x))


def test_q1_salted_sums_bit_identical_to_decimal_reference(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))

    def _dec(c):
        c = F.col(c) if isinstance(c, str) else c
        return c.cast("decimal(18,4)")

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cnt = F.count(F.lit(1))
    sum_qty = F.sum(_dec("l_quantity")).cast("double")
    sum_price = F.sum(_dec("l_extendedprice")).cast("double")
    ref = (li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty.alias("sum_qty"),
        sum_price.alias("sum_base_price"),
        F.sum(_dec(rev)).cast("double").alias("sum_disc_price"),
        (F.sum(F.floor(rev * (1 + F.col("l_tax")) * 1e6 + 0.5)
               .cast("long")).cast("double") / 1e6).alias("sum_charge"),
        (sum_qty / cnt).alias("avg_qty"),
        (sum_price / cnt).alias("avg_price"),
        (F.sum(_dec("l_discount")).cast("double") / cnt).alias("avg_disc"),
        cnt.cast("bigint").alias("count_order")))

    got = QUERIES["tpch_q1_pricing"](spark, sf_dir)
    r = {tuple(row[:2]): row[2:] for row in ref.collect()}
    g = {tuple(row[:2]): row[2:] for row in got.collect()}
    assert set(r) == set(g)
    for key in r:
        for want, have in zip(r[key][:-1], g[key][:-1]):
            assert _bits(want) == _bits(have), (key, want, have)
        assert r[key][-1] == g[key][-1]  # count_order, exact long
