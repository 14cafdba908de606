"""Salted-join/agg correctness: results must equal the unsalted plans
on skewed data (one key holding ~90% of rows)."""

import pytest
from pyspark.sql import functions as F

from etl_tool_rep_spark.operators.skew import salted_agg_count, salted_join


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


def test_salted_agg_matches_plain(skewed):
    plain = {r["k"]: r["cnt"] for r in
             skewed.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
             .collect()}
    salted = {r["k"]: r["cnt"] for r in salted_agg_count(skewed, "k")
              .collect()}
    assert plain == salted
    assert salted[1] == 9000
