"""Bucketed-join test: two tables bucketed on the join key must join
with NO shuffle exchange on either side."""

import pytest
from pyspark.sql import functions as F

from etl_tool_rep_spark.catalog import load
from etl_tool_rep_spark.sinks import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # warehouse dir is a static conf, set in the session factory
    write_bucketed(load(spark, sf_dir, "orders"), "b_orders",
                   ["o_custkey"], n_buckets=8)
    write_bucketed(
        load(spark, sf_dir, "customer")
        .withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", ["o_custkey"], n_buckets=8)
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_no_shuffle(spark, sf_dir, bucketed_tables):
    t1, t2 = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table(t1).join(spark.table(t2), "o_custkey")
                  .groupBy("o_custkey")
                  .agg(F.count(F.lit(1)).alias("n")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: the join itself requires no exchange
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 0, plan
        # and the result is still correct
        plain = (load(spark, sf_dir, "orders").join(
            load(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")))
        assert sorted(map(tuple, joined.collect())) == \
            sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
