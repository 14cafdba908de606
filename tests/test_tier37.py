"""Unit semantics for the tier-37 additions, on hand-built frames
where the expected answer is computable by eye — complementing the
DuckDB oracle gate (engine parity, not intent).

* markov_stationary_exact: a 2-state chain with known stationary
  distribution (p(a->b)=1, p(b->a)=1/2, p(b->b)=1/2 -> pi = (1/3,
  2/3)) converges to it; a deterministic cycle has entropy rate 0.
* token_dispersion: a token appearing once in every doc has VMR ~ 0
  (constant counts); one concentrated in a single doc has
  VMR = tf - tf/n (maximal for its frequency).
"""

import datetime

import pytest

from etl_tool_rep_spark.queries import QUERIES


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")


def test_markov_two_state_stationary(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier37 as t37
    # one user, long alternating-with-self-loop walk realizing
    # p(a->b)=1, p(b->b)=1/2, p(b->a)=1/2 exactly:
    # repeat the block a b b  ->  transitions a->b, b->b, b->a ...
    t0 = datetime.datetime(2024, 1, 1)
    walk = ("a", "b", "b") * 40
    rows = [(i, t0 + datetime.timedelta(seconds=i), 1, s, 0.0, "{}")
            for i, s in enumerate(walk)]
    monkeypatch.setattr(t37, "load",
                        lambda s, d, n: _events(spark, rows))
    got = {r["state"]: r
           for r in QUERIES["markov_stationary_exact"](spark, "x")
           .collect()}
    assert abs(got["a"]["stationary"] - 1 / 3) < 0.01
    assert abs(got["b"]["stationary"] - 2 / 3) < 0.01
    # entropy rate = pi_b * ln 2 (only b branches)
    import math
    assert abs(got["b"]["entropy_rate"]
               - (2 / 3) * math.log(2)) < 0.02


def test_markov_cycle_entropy_zero(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier37 as t37
    t0 = datetime.datetime(2024, 1, 1)
    walk = ("x", "y", "z") * 30
    rows = [(i, t0 + datetime.timedelta(seconds=i), 1, s, 0.0, "{}")
            for i, s in enumerate(walk)]
    monkeypatch.setattr(t37, "load",
                        lambda s, d, n: _events(spark, rows))
    got = QUERIES["markov_stationary_exact"](spark, "x").collect()
    assert all(r["entropy_rate"] == 0.0 for r in got)
    for r in got:
        assert abs(r["stationary"] - 1 / 3) < 0.01


def test_token_dispersion_shapes(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier37 as t37
    # 10 docs: "even" once per doc (VMR 0); "burst" 10 times in one
    # doc only (VMR = (100 - 100/10)/10 = 9)
    rows = []
    for i in range(10):
        text = "even" + (" burst" * 10 if i == 0 else "")
        rows.append((i, text, "en", "s", len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    monkeypatch.setattr(t37, "load", lambda s, d, n: docs)
    got = {r["token"]: r
           for r in QUERIES["token_dispersion"](spark, "x").collect()}
    assert got["even"]["vmr"] == 0.0
    assert got["even"]["doc_coverage"] == 1.0
    assert got["burst"]["vmr"] == 9.0
    assert got["burst"]["doc_coverage"] == 0.1
    assert got["burst"]["df"] == 1 and got["burst"]["tf"] == 10
