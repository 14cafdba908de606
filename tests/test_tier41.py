"""Hand-fixture semantics for the tier-41 keys (round 9).

`incremental_dedup_retire`: the defining property is that RETIRED
documents stop influencing dedup — a new doc whose only duplicate was
retired must be KEPT, while a new doc duplicating a remaining
standing doc still drops; the index row count certifies the delete
actually removed the retired band rows (and compaction lost none).
`lakehouse_zorder_typed`: the (date, string) z-layout must answer a
2-D rectangle exactly and open under half the files. Cross-engine
equality is tools/check_oracle.py.
"""

from __future__ import annotations

import datetime

from etl_tool_rep_spark.queries import QUERIES
import etl_tool_rep_spark.queries.tier41 as t41


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")


_TEXT_X = ("the quick brown fox jumps over the lazy dog "
           "near the quiet river bank today")
_TEXT_Y = ("completely different words describe another story "
           "about mountains and weather patterns")
_TEXT_Z = ("a third unrelated passage mentions databases engines "
           "and distributed execution plans")


def test_retired_doc_no_longer_causes_drops(spark, monkeypatch):
    # ids: 1 -> standing, kept (1%5!=0, 1%7!=3)
    #      3 -> standing, RETIRED (3%7==3)
    #      5 -> new, duplicates standing 1       => must DROP
    #     10 -> new, duplicates retired 3 only   => must be KEPT
    rows = [(1, _TEXT_X), (3, _TEXT_Y), (5, _TEXT_X), (10, _TEXT_Y)]
    monkeypatch.setattr(t41, "load",
                        lambda s, d, n: _docs(spark, rows))
    got = {r["source"]: r for r in
           QUERIES["incremental_dedup_retire"](spark, "x").collect()}
    r = got["s"]
    assert r["n_new"] == 2
    assert r["n_dup_docs"] == 1, \
        "doc 10's only duplicate was retired — it must be kept"
    assert r["dup_id_sum"] == 5
    # index holds docs {1, 5, 10} x 4 bands: the retired doc's band
    # rows are gone, nothing else was lost in compaction
    assert r["n_index_rows"] == 12
    # create + delete + compact + append (replays advanced nothing)
    assert r["n_versions"] == 4


def test_new_vs_new_keep_first_still_applies(spark, monkeypatch):
    # two identical NEW docs (5, 10): keep-first drops the larger id
    rows = [(1, _TEXT_Z), (5, _TEXT_X), (10, _TEXT_X)]
    monkeypatch.setattr(t41, "load",
                        lambda s, d, n: _docs(spark, rows))
    got = {r["source"]: r for r in
           QUERIES["incremental_dedup_retire"](spark, "x").collect()}
    r = got["s"]
    assert r["n_new"] == 2
    assert r["n_dup_docs"] == 1 and r["dup_id_sum"] == 10


def _orders(spark, n=400):
    base = datetime.datetime(1995, 1, 1)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"]
    rows = [(i, 1, "O", 100.0 + i,
             base + datetime.timedelta(days=(i * 7) % 2400),
             prios[i % 5]) for i in range(n)]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string,"
              " o_totalprice double, o_orderdate timestamp,"
              " o_orderpriority string")


def test_zorder_typed_rectangle_exact_and_pruned(spark, monkeypatch):
    monkeypatch.setattr(t41, "load",
                        lambda s, d, n: _orders(spark))
    row = QUERIES["lakehouse_zorder_typed"](spark, "x").collect()[0]
    # hand-computed expectation over the same fixture
    base = datetime.date(1995, 1, 1)
    lo, hi = datetime.date(1996, 1, 1), datetime.date(1996, 3, 31)
    match = [i for i in range(400)
             if lo <= base + datetime.timedelta(days=(i * 7) % 2400)
             <= hi and i % 5 == 0]
    assert row["n_rows"] == len(match)
    assert row["sum_cents"] == sum(round((100.0 + i) * 100)
                                   for i in match)
    assert row["pruned"], "2-D (date, string) skipping did not bite"
