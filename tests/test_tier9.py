"""Tier-9 tests: entropy bounds, PMI sanity, bloom-filter guarantees,
count-min sketch properties (overestimate, error bound, merge)."""

import math

from pyspark.sql import functions as F

from etl_tool_rep_spark.operators.sketches import (
    cms_build, cms_estimate, cms_merge)
from etl_tool_rep_spark.queries.registry import QUERIES


def test_char_entropy_bounds(spark, sf_dir):
    rows = QUERIES["char_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 0 <= H <= ln(26) for a 26-symbol alphabet
        assert -1e-9 <= r["entropy"] <= math.log(26) + 1e-9, r
        assert 0 < r["n_used"] <= 200


def test_bigram_pmi_shape(spark, sf_dir):
    rows = QUERIES["bigram_pmi"](spark, sf_dir).collect()
    langs = {r["lang"] for r in rows}
    for lang in langs:
        grp = [r for r in rows if r["lang"] == lang]
        assert len(grp) <= 20
        counts = [r["n_ab"] for r in grp]
        assert counts == sorted(counts, reverse=True)


def test_bloom_prefilter_exact_and_effective(spark, sf_dir):
    out = QUERIES["bloom_prefilter_join"](spark, sf_dir)
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = (c.join(o.filter(F.col("o_totalprice") > 495000)
                        .select("o_custkey").distinct(),
                       F.col("c_custkey") == F.col("o_custkey"),
                       "left_semi").count())
    assert out.count() == expected


def test_cms_never_underestimates(spark, sf_dir):
    rows = QUERIES["cms_freq"](spark, sf_dir).collect()
    assert rows
    n_total = sum(r["exact_cnt"] for r in rows)
    for r in rows:
        assert r["never_under"], r
    # CM error bound: est - exact <= eps*N w.h.p., eps = e/width
    eps = math.e / 2048
    bad = [r for r in rows
           if r["cms_est"] - r["exact_cnt"] > eps * n_total]
    assert len(bad) <= max(1, 0.02 * len(rows)), bad[:5]


def test_cms_merge_equals_whole(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    h1 = li.filter(F.col("l_orderkey") % 2 == 0)
    h2 = li.filter(F.col("l_orderkey") % 2 == 1)
    whole = cms_build(li, "l_partkey")
    merged = cms_merge(cms_build(h1, "l_partkey"),
                       cms_build(h2, "l_partkey"))
    keys = li.select("l_partkey").distinct()
    est_w = {r["l_partkey"]: r["cms_est"] for r in
             cms_estimate(whole, keys, "l_partkey").collect()}
    est_m = {r["l_partkey"]: r["cms_est"] for r in
             cms_estimate(merged, keys, "l_partkey").collect()}
    assert est_w == est_m
