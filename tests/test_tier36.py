"""Unit semantics for the tier-36 additions, on hand-built frames
where the expected answer is computable by eye — complementing the
DuckDB oracle gate (engine parity, not intent).

* negative_sampling: positives share the anchor's language,
  negatives never do, and the two negatives are distinct; the
  construction is reproducible (two runs agree).
* tail_index_hill: an exact Pareto(alpha=2) sample recovers
  alpha ~ 2 at every k.
* decile_lift: a perfectly score-separated response puts all
  positives in the top deciles — top-decile lift = n/pos, bottom
  response 0.
"""

import math

import pytest

from etl_tool_rep_spark.queries import QUERIES


def test_negative_sampling_contract(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier36 as t36
    rows = []
    for i in range(300):
        lang = ["en", "fr", "de"][i % 3]
        rows.append((i, f"doc {i}", lang, "s", 8))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    monkeypatch.setattr(t36, "load", lambda s, d, n: docs)
    got = QUERIES["negative_sampling"](spark, "x").collect()
    assert got, "expected anchors"
    lang_of = {i: ["en", "fr", "de"][i % 3] for i in range(300)}
    for r in got:
        assert lang_of[r["anchor_id"]] == r["lang"]
        assert lang_of[r["positive_id"]] == r["lang"]
        assert r["positive_id"] != r["anchor_id"]
        assert lang_of[r["neg1_id"]] != r["lang"]
        assert lang_of[r["neg2_id"]] != r["lang"]
        assert r["neg1_id"] != r["neg2_id"]
    again = QUERIES["negative_sampling"](spark, "x").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_negative_sampling_starved_fallback_exact(spark, monkeypatch):
    """Round-8 re-plan: shrinking the hash-range cut until anchors
    starve must not change a single output row — the all-bucket
    fallback re-derives the exact uncut top-2 for starved anchors."""
    import etl_tool_rep_spark.queries.tier36 as t36
    rows = [(i, f"doc {i}", ["en", "fr", "de"][i % 3], "s", 8)
            for i in range(300)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    monkeypatch.setattr(t36, "load", lambda s, d, n: docs)
    want = sorted(map(tuple,
                      QUERIES["negative_sampling"](spark, "x").collect()))
    # target 0 pins tw at its 4/2^20 minimum: essentially every
    # anchor is starved and flows through the fallback join
    monkeypatch.setattr(t36, "_NEG_TARGET", 0)
    got = sorted(map(tuple,
                     QUERIES["negative_sampling"](spark, "x").collect()))
    assert got == want


def test_hill_recovers_pareto_alpha(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier36 as t36
    # exact Pareto(alpha=2) quantiles: x_i = (n/i)^(1/2) dollars for
    # i = 1..n -> the Hill estimator over the top k approaches 2
    n = 2000
    rows = [(i, "P", "F", math.sqrt(n / i)) for i in range(1, n + 1)]
    od = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string,"
              " o_orderstatus string, o_totalprice double")
    monkeypatch.setattr(t36, "load", lambda s, d, n_: od)
    got = {r["k"]: r
           for r in QUERIES["tail_index_hill"](spark, "x").collect()}
    assert set(got) == {100, 200, 400}
    for k, r in got.items():
        assert abs(r["hill_alpha"] - 2.0) < 0.25, (k, r["hill_alpha"])


def test_decile_lift_separated(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier36 as t36
    # 100 rows: top-20 scores are ALL the positives
    rows = []
    for i in range(100):
        y = "F" if i < 20 else "O"
        rows.append((i, y, 1000.0 - i))
    od = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string,"
              " o_totalprice double")
    monkeypatch.setattr(t36, "load", lambda s, d, n: od)
    got = {r["decile"]: r
           for r in QUERIES["decile_lift"](spark, "x").collect()}
    assert len(got) == 10
    assert got[1]["response_rate"] == 1.0
    assert got[2]["response_rate"] == 1.0
    assert got[3]["response_rate"] == 0.0
    # cumulative lift at decile 1 = 1.0 / 0.2 = 5
    assert got[1]["cum_lift"] == 5.0
    # by decile 10 the lift is back to 1
    assert got[10]["cum_lift"] == 1.0
