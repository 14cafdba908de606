"""Unit semantics for the tier-29 additions, on hand-built frames
where the expected answer is computable by eye — complementing the
DuckDB oracle gate (which proves engine parity, not intent).

* kcore_decomposition: a 4-clique plus a pendant chain — the clique
  is the 3-core, the chain peels in order, round numbers match the
  hand peel.
* attribution_linear: one user, two touches then a purchase — first
  and last touch land on the right channels and linear credit is
  0.5 each; a touch outside the 7-day window is excluded.
* conformal_interval: calibration scores 0..9 -> qhat is the
  ceil(0.9 * 11) = 10th smallest; coverage counts test rows within
  mu +/- qhat.
* holt_linear_smooth: a perfectly linear series is tracked exactly —
  level = last value, trend = the step, forecast extrapolates.
"""

import datetime

import pytest

from etl_tool_rep_spark.queries import QUERIES


def test_kcore_semantics(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier29 as t29
    # orders as hyperedges: order 1 joins suppliers 1-4 (a 4-clique
    # after pair expansion -> every node has degree 3 -> 3-core);
    # chain orders attach 5 to the clique and 6 to 5:
    # deg(5)=2, deg(6)=1 -> both peel in round 1.
    rows = []
    for s in (1, 2, 3, 4):
        rows.append((1, s))
    rows += [(2, 4), (2, 5), (3, 5), (3, 6)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")
    monkeypatch.setattr(t29, "load", lambda s, d, n: li)
    got = {r["suppkey"]: r
           for r in QUERIES["kcore_decomposition"](spark, "x").collect()}
    for s in (1, 2, 3):
        assert got[s]["in_core"] and got[s]["peel_round"] is None
    assert got[4]["in_core"]  # degree 4 (clique + node 5)
    assert not got[5]["in_core"] and got[5]["peel_round"] == 1
    assert not got[6]["in_core"] and got[6]["peel_round"] == 1
    assert got[4]["degree0"] == 4 and got[6]["degree0"] == 1


def test_attribution_semantics(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier29 as t29
    t0 = datetime.datetime(2024, 1, 10, 12, 0, 0)
    day = datetime.timedelta(days=1)
    rows = [
        # in-window path: view (t-3d) -> click (t-1d) -> purchase
        (1, t0 - 3 * day, 7, "view", 1.0, "{}"),
        (2, t0 - 1 * day, 7, "click", 1.0, "{}"),
        (3, t0, 7, "purchase", 9.0, "{}"),
        # out-of-window touch (8 days before) must not count
        (4, t0 - 8 * day, 7, "view", 1.0, "{}"),
        # other user's touch must not count
        (5, t0 - 1 * day, 8, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    monkeypatch.setattr(t29, "load", lambda s, d, n: ev)
    got = {r["channel"]: r
           for r in QUERIES["attribution_linear"](spark, "x").collect()}
    assert got["view"]["first_touch"] == 1
    assert got["view"]["last_touch"] == 0
    assert got["click"]["first_touch"] == 0
    assert got["click"]["last_touch"] == 1
    assert got["view"]["linear_credit"] == 0.5
    assert got["click"]["linear_credit"] == 0.5
    assert got["view"]["n_touches"] == 1  # the 8-day-old view is out


def test_conformal_semantics(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier29 as t29
    # calibration (even keys): prices mu + {0..9} dollars around a
    # flat base, so scores are 0,100,...,900 cents. n_cal = 10 ->
    # qhat index = ceil(0.9 * 11) = 10 -> qhat = max score 900.
    # mu = base + 4.50 (mean of 0..9) -> mu_cents = base*100 + 450.
    base = 100.0
    rows = []
    for i in range(10):
        rows.append((2 * i, "P", base + i))          # cal
    # test (odd keys): one inside (mu), one outside (mu + 10.00)
    rows.append((1, "P", base + 4.5))
    rows.append((3, "P", base + 4.5 + 10.0))
    od = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string,"
              " o_totalprice double")
    monkeypatch.setattr(t29, "load", lambda s, d, n: od)
    got = QUERIES["conformal_interval"](spark, "x").collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_cal"] == 10 and r["n_test"] == 2
    assert r["q_cents"] == 450  # scores are |price - mu|: 450..450
    # scores around the mean 104.50: |100+i - 104.5| = 450,350,...
    # max = 450 -> both test rows: |0| <= 450 in, |1000| > 450 out
    assert r["covered"] == 1
    assert r["coverage"] == 0.5


def test_holt_linear_exact_tracking(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier29 as t29
    # y_t = 1000 + 200*t cents: Holt with l0=y0, b0=y1-y0 tracks a
    # perfect line exactly -> level = last y, trend = step.
    base = datetime.date(1995, 1, 1)
    rows = [(t, "P", base + datetime.timedelta(days=t),
             (1000 + 200 * t) / 100.0) for t in range(10)]
    od = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string,"
              " o_orderdate date, o_totalprice double")
    monkeypatch.setattr(t29, "load", lambda s, d, n: od)
    got = QUERIES["holt_linear_smooth"](spark, "x").collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_days"] == 10
    assert r["level_cents"] == 1000 + 200 * 9
    assert r["trend_cents"] == 200
    assert r["forecast7_cents"] == 1000 + 200 * 16
