"""Tier-8 tests: drift/concurrency/temporal-state/experiment analytics
properties the oracle hash can't express, plus hand-computed sweep-line
and SCD2 fixtures."""

import datetime as dt
import math

from pyspark.sql import Row

from etl_tool_rep_spark.queries.registry import QUERIES
from etl_tool_rep_spark.queries.tier8 import max_concurrency, scd2_range_lookup


def test_psi_drift_nonnegative_and_identity(spark, sf_dir):
    rows = QUERIES["psi_drift"](spark, sf_dir).collect()
    assert rows
    # PSI is a symmetrized KL-style divergence: always >= 0
    for r in rows:
        assert r["psi"] >= 0.0, r
    # identical distributions -> psi == 0 (smoothing keeps it finite)
    # self-check on a synthetic constant stream
    ev = spark.createDataFrame(
        [Row(event_type="x", value=10.0,
             ts=dt.datetime(2024, 1, d, 12)) for d in range(1, 31)])
    ev.write.mode("overwrite").parquet("/tmp/psi_ident/events.parquet")
    # same bin occupied in both halves -> contributions cancel
    out = {r["event_type"]: r["psi"]
           for r in QUERIES["psi_drift"](spark, "/tmp/psi_ident").collect()}
    assert abs(out["x"]) < 1e-6


def test_max_concurrency_hand_fixture(spark, tmp_path):
    # intervals (30-min): A:[0,30) B:[10,40) C:[20,50) -> peak 3
    # D:[120,150) alone -> peak stays 3; half-open: E starts exactly
    # when A ends (t=30) -> A's -1 applies first, no phantom overlap
    base = dt.datetime(2024, 1, 1)
    rows = [Row(event_type="t", ts=base + dt.timedelta(minutes=m),
                value=1.0, user_id=1, event_id=i, props="{}")
            for i, m in enumerate([0, 10, 20, 120, 30])]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    out = max_concurrency(spark, str(tmp_path)).collect()
    assert out[0]["max_concurrent"] == 3


def test_scd2_lookup_hand_fixture(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: state 5 at t0, state 9 at t20
        Row(event_id=1, user_id=1, event_type="click",
            ts=base, value=0.0, props='{"k": 5}'),
        Row(event_id=2, user_id=1, event_type="click",
            ts=base + dt.timedelta(minutes=20), value=0.0,
            props='{"k": 9}'),
        # purchases: t10 -> state 5; t20 (boundary) -> state 9;
        # t30 -> state 9 (open-ended last version)
        Row(event_id=3, user_id=1, event_type="purchase",
            ts=base + dt.timedelta(minutes=10), value=1.0, props="{}"),
        Row(event_id=4, user_id=1, event_type="purchase",
            ts=base + dt.timedelta(minutes=20), value=1.0, props="{}"),
        Row(event_id=5, user_id=1, event_type="purchase",
            ts=base + dt.timedelta(minutes=30), value=1.0, props="{}"),
        # user 2: purchase before any click -> dropped (inner join)
        Row(event_id=6, user_id=2, event_type="purchase",
            ts=base, value=1.0, props="{}"),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    out = {r["event_id"]: r["state_k"]
           for r in scd2_range_lookup(spark, str(tmp_path)).collect()}
    assert out == {3: 5, 4: 9, 5: 9}


def test_scd2_no_fanout(spark, sf_dir):
    out = QUERIES["scd2_range_lookup"](spark, sf_dir)
    # half-open version ranges: each purchase matches <= 1 version
    assert out.count() == out.select("event_id").distinct().count()


def test_winsorized_std_leq_raw(spark, sf_dir):
    import pyspark.sql.functions as F
    out = {r["c_mktsegment"]: r for r in
           QUERIES["winsorized_stats"](spark, sf_dir).collect()}
    raw = {r["c_mktsegment"]: r["std"] for r in
           spark.read.parquet(f"{sf_dir}/customer.parquet")
           .groupBy("c_mktsegment")
           .agg(F.stddev_samp("c_acctbal").alias("std")).collect()}
    for seg, r in out.items():
        # clipping tails can only shrink (or hold) the spread
        assert r["win_std"] <= raw[seg] + 1e-9
        assert r["n"] > 0


def test_abtest_ztest_matches_scipy_free_formula(spark, sf_dir):
    r = QUERIES["abtest_ztest"](spark, sf_dir).collect()[0]
    n_a, n_b, c_a, c_b = r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]
    pool = (c_a + c_b) / (n_a + n_b)
    z = ((c_b / n_b - c_a / n_a)
         / math.sqrt(pool * (1 - pool) * (1 / n_a + 1 / n_b)))
    assert abs(r["z_stat"] - round(z, 6)) < 1e-9
    assert 0 < pool < 1
