"""Sketch-based estimates vs exact values (accuracy contracts for the
rows-only approximate queries)."""

from pyspark.sql import functions as F

from etl_tool_rep_spark.catalog import load


def test_approx_count_distinct_rsd(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact")).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_approx_percentile_close_to_exact(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("approx"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("exact")) \
        .collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01