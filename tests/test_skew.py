"""Salted-join/agg correctness: results must equal the unsalted plans
on skewed data (one key holding ~90% of rows)."""

import pytest
from pyspark.sql import functions as F

from etl_tool_rep_spark.operators.skew import (
    blocked_copair_count, salted_agg_count, salted_join)


@pytest.fixture(scope="module")
def skewed(spark):
    hot = spark.range(9000).select(F.lit(1).alias("k"),
                                   F.col("id").alias("v"))
    cold = spark.range(1000).select(
        (F.col("id") % 50 + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(60).select(F.col("id").alias("k"),
                                  F.concat(F.lit("dim_"), F.col("id"))
                                  .alias("name"))


def test_salted_join_matches_plain(skewed, dim):
    plain = skewed.join(dim, "k").groupBy("k").count()
    salted = salted_join(skewed, dim, "k").groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_join_left(skewed, dim):
    missing = dim.filter(F.col("k") > 100)  # no matches
    out = salted_join(skewed, missing, "k", how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("name").isNull()).count() == skewed.count()


def test_blocked_copair_matches_naive(spark):
    """Round-8 hub expansion: with a block size small enough that
    the hub key splits into many blocks, the blocked pair counts
    must equal the naive a.m < b.m self-join exactly — every cross-
    block pair once (min-block side left), every same-block pair
    deduped on the diagonal."""
    rows = [("hub", m) for m in range(40)]          # C(40,2) pairs
    rows += [("k%d" % (i % 7), 100 + i) for i in range(30)]
    e = spark.createDataFrame(rows, "p string, s int")
    naive = (e.alias("a").join(
        e.alias("b"), (F.col("a.p") == F.col("b.p"))
        & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("m1"), F.col("b.s").alias("m2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared")))
    for bs in (4, 7, 64):  # hub → 10 / 6 / 1 blocks
        got = blocked_copair_count(e, "p", "s", block_size=bs)
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, naive.collect())), bs


def test_salted_agg_matches_plain(skewed):
    plain = {r["k"]: r["cnt"] for r in
             skewed.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
             .collect()}
    salted = {r["k"]: r["cnt"] for r in salted_agg_count(skewed, "k")
              .collect()}
    assert plain == salted
    assert salted[1] == 9000


def test_blocked_copair_random_differential(spark):
    """Seeded random edge sets x random block sizes vs the naive
    self-join — the operator's exactness must not depend on the
    fixture's shape (hub sizes, key counts, member ranges)."""
    import random
    rng = random.Random(20260815)
    for trial in range(4):
        nkeys = rng.randint(1, 6)
        rows = set()
        for _ in range(rng.randint(10, 120)):
            rows.add(("k%d" % rng.randint(0, nkeys - 1),
                      rng.randint(0, 60)))
        e = spark.createDataFrame(sorted(rows), "p string, s int")
        naive = (e.alias("a").join(
            e.alias("b"), (F.col("a.p") == F.col("b.p"))
            & (F.col("a.s") < F.col("b.s")))
            .groupBy(F.col("a.s").alias("m1"),
                     F.col("b.s").alias("m2"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("shared")))
        bs = rng.choice([1, 2, 3, 8, 1024])
        got = blocked_copair_count(e, "p", "s", block_size=bs)
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, naive.collect())), (trial, bs)
