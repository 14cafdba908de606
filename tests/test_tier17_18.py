"""Unit semantics for the tier-17/18 additions, on hand-built frames
where the expected answer is computable by eye — complementing the
DuckDB oracle gate (which proves engine parity, not intent).

* cdc_apply semantics: last-writer-wins + tombstone filter on a
  4-op log, replay determinism on ts ties via event_id.
* BFS: exact hop distances on a hand-drawn path+branch graph,
  unreachable nodes absent, hop cap honored.
* KS statistic: identical samples give D = 0; disjoint ranges give
  D = 1 (the two analytic anchors of the statistic).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from etl_tool_rep_spark.queries import QUERIES


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


@pytest.fixture()
def cdc_log(spark):
    # user 1: signup -> click (last wins, survives)
    # user 2: click -> error (tombstoned)
    # user 3: error -> signup (revived after delete)
    # user 4: two ops at the SAME ts — event_id must break the tie
    return spark.createDataFrame(
        [(1, _ts(0), 1, "signup", 10.0, None),
         (2, _ts(1), 1, "click", 20.0, None),
         (3, _ts(0), 2, "click", 30.0, None),
         (4, _ts(1), 2, "error", 0.0, None),
         (5, _ts(0), 3, "error", 0.0, None),
         (6, _ts(1), 3, "signup", 40.0, None),
         (7, _ts(2), 4, "view", 50.0, None),
         (8, _ts(2), 4, "purchase", 60.0, None)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string")


def test_cdc_apply_semantics(spark, cdc_log, tmp_path, monkeypatch):
    import etl_tool_rep_spark.queries.tier17 as t17
    monkeypatch.setattr(t17, "load", lambda s, d, n: cdc_log)
    got = {r["user_id"]: (r["final_type"], r["final_value"], r["n_ops"])
           for r in QUERIES["cdc_apply"](spark, "ignored").collect()}
    assert got == {
        1: ("click", 20.0, 2),      # last writer wins
        3: ("signup", 40.0, 2),     # delete then re-insert survives
        4: ("purchase", 60.0, 2),   # ts tie -> higher event_id wins
    }                               # user 2 tombstoned -> absent


def test_bfs_distances_hand_graph(spark, monkeypatch):
    # orders as cliques: {1,2} {2,3} {3,4} {4,5} {5,6} -> a 6-node
    # path from supplier 1; supplier 9 shares no order (isolated pair
    # {9,10} unreachable from 1)
    rows = []
    for ok, members in enumerate(
            [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (9, 10)]):
        for s in members:
            rows.append((ok, s))
    li = spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")
    import etl_tool_rep_spark.queries.tier18 as t18
    monkeypatch.setattr(t18, "load", lambda s, d, n: li)
    got = {r["id"]: r["dist"]
           for r in QUERIES["bfs_distances"](spark, "ignored").collect()}
    # hop cap is 4: supplier 6 (distance 5) and the 9-10 island are out
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_ks_test_anchors(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier17 as t17

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
                  " event_type string, value double, props string")

    # identical samples -> D = 0
    same = mk([(i, _ts(0), 1, t, float(v), None)
               for i, (t, v) in enumerate(
                   [(t, v) for v in (1, 2, 3, 4)
                    for t in ("click", "view")])])
    monkeypatch.setattr(t17, "load", lambda s, d, n: same)
    row = QUERIES["ks_test"](spark, "ignored").collect()[0]
    assert row["ks_d"] == 0.0 and row["n1"] == row["n2"] == 4

    # disjoint ranges -> D = 1 at the boundary value
    apart = mk([(1, _ts(0), 1, "click", 1.0, None),
                (2, _ts(0), 1, "click", 2.0, None),
                (3, _ts(0), 1, "view", 10.0, None),
                (4, _ts(0), 1, "view", 20.0, None)])
    monkeypatch.setattr(t17, "load", lambda s, d, n: apart)
    row = QUERIES["ks_test"](spark, "ignored").collect()[0]
    assert row["ks_d"] == 1.0 and row["at_value"] == 2.0
