"""Unit semantics for the tier-35 additions, on hand-built frames
where the expected answer is computable by eye — complementing the
DuckDB oracle gate (engine parity, not intent).

* chi2_feature_select: a token exclusive to one class tops that
  class's ranking; a uniformly-distributed token scores ~0.
* changepoint_detect: a series with one clean level shift finds the
  shift day and the two segment means exactly.
* session_entropy: a single-type user has entropy 0; a perfectly
  2-way-split user has entropy ln 2.
"""

import datetime
import math

import pytest

from etl_tool_rep_spark.queries import QUERIES


def test_chi2_feature_select_exclusive_token(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier35 as t35
    # 25 'en' docs contain "hello common"; 25 'fr' docs contain
    # "bonjour common": each exclusive token should top its class,
    # "common" (uniform) should score 0 for both
    # "common" must be ABSENT from some docs: a token in every doc
    # has a zero contingency margin and is (correctly) excluded
    rows = []
    for i in range(25):
        en = "hello common" if i < 20 else "hello"
        fr = "bonjour common" if i < 20 else "bonjour"
        rows.append((i, en, "en", "s", len(en)))
        rows.append((100 + i, fr, "fr", "s", len(fr)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    monkeypatch.setattr(t35, "load", lambda s, d, n: docs)
    got = QUERIES["chi2_feature_select"](spark, "x").collect()
    by = {}
    for r in got:
        by.setdefault(r["lang"], {})[r["token"]] = r
    assert by["en"]["hello"]["chi2"] == 50.0   # perfect association
    assert by["fr"]["bonjour"]["chi2"] == 50.0
    assert by["en"]["common"]["chi2"] == 0.0
    assert by["en"]["hello"]["rk"] < by["en"]["common"]["rk"]
    assert by["en"]["hello"]["in_class_df"] == 25


def test_changepoint_level_shift(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier35 as t35
    # 10 days at $10.00/day then 10 days at $50.00/day: the split
    # lands on the last low day, means are exact
    base = datetime.date(1995, 1, 1)
    rows = []
    k = 0
    for i in range(20):
        price = 10.0 if i < 10 else 50.0
        rows.append((k, "P", base + datetime.timedelta(days=i),
                     price))
        k += 1
    od = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string,"
              " o_orderdate date, o_totalprice double")
    monkeypatch.setattr(t35, "load", lambda s, d, n: od)
    got = QUERIES["changepoint_detect"](spark, "x").collect()
    assert len(got) == 1
    r = got[0]
    epoch = datetime.date(1970, 1, 1)
    assert r["split_day"] == (base - epoch).days + 9
    assert r["n_days"] == 20
    assert r["mean_before_cents"] == 1000
    assert r["mean_after_cents"] == 5000
    assert r["gain"] > 0


def test_session_entropy_extremes(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier35 as t35
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: 8 identical events -> entropy 0
    for i in range(8):
        rows.append((i, t0, 1, "click", 0.0, "{}"))
    # user 2: 4 clicks + 4 views -> entropy ln 2
    for i in range(4):
        rows.append((100 + i, t0, 2, "click", 0.0, "{}"))
        rows.append((200 + i, t0, 2, "view", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    monkeypatch.setattr(t35, "load", lambda s, d, n: ev)
    got = {r["user_id"]: r
           for r in QUERIES["session_entropy"](spark, "x").collect()}
    assert got[1]["entropy"] == 0.0 and got[1]["n_types"] == 1
    assert abs(got[2]["entropy"] - math.log(2)) < 2e-6
    assert got[2]["n_events"] == 8 and got[2]["n_types"] == 2
