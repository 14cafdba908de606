"""Unit semantics for the tier-26 additions, on hand-built frames
where the expected answer is computable by eye — complementing the
DuckDB oracle gate (which proves engine parity, not intent).

* prefix_filter_jaccard: two documents sharing most shingles are
  found (prefix filter does NOT lose the pair); an unrelated pair is
  absent; the Jaccard value is the exact set ratio.
* record_linkage_sorted: near-identical heads adjacent in sort order
  link; a far-away edit distance does not; pairs never cross langs.
* moving_median: hand series where the trailing-7 median at each
  step is computable by eye, including the even-window average.
* acf_lags: a constant-increment series has lag-1 ACF driven by the
  known deviation products; output rows are (prio x 3 lags).
* pr_at_k: 10 ranked rows with known positives — precision at the
  k=1..9 cutoffs matches the hand count.
* schema_drift_report: two halves built with a deliberate category
  shift produce the hand-computed total-variation distance.
"""

import datetime

import pytest

from etl_tool_rep_spark.queries import QUERIES


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, "s", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")


def test_prefix_filter_jaccard_semantics(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier26 as t26
    # doc0/doc1: 6-word texts differing in the last word ->
    # shingles {w1..w4} vs {w1..w3, w4'} -> jaccard 3/5 >= 0.5.
    # doc2 shares nothing.
    a = "alpha beta gamma delta epsilon zeta"
    b = "alpha beta gamma delta epsilon theta"
    c = "one two three four five six"
    docs = _docs(spark, [(a, "en"), (b, "en"), (c, "en")])
    monkeypatch.setattr(t26, "load", lambda s, d, n: docs)
    got = QUERIES["prefix_filter_jaccard"](spark, "x").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["a_id"], r["b_id"]) == (0, 1)
    assert r["inter_sh"] == 3 and r["union_sh"] == 5
    assert r["jaccard"] == 0.6


def test_record_linkage_sorted_semantics(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier26 as t26
    # Same-length near-duplicates sort adjacently; lev("aaaa x",
    # "aaaa y") small. The "zzzz" doc is within the 3-neighbor
    # window but beyond lev 15 from the others only if its head
    # differs in >15 positions.
    near1 = "the quick brown fox jumps over the lazy dog today"
    near2 = "the quick brown fox jumps over the lazy cat today"
    far = "zzz qqq vvv kkk xxx www uuu mmm nnn ppp rrr sss ttt"
    other_lang = "the quick brown fox jumps over the lazy dog today"
    docs = _docs(spark, [(near1, "en"), (near2, "en"), (far, "en"),
                         (other_lang, "fr")])
    monkeypatch.setattr(t26, "load", lambda s, d, n: docs)
    got = QUERIES["record_linkage_sorted"](spark, "x").collect()
    pairs = {(r["a_id"], r["b_id"]): r["lev"] for r in got}
    # near1/near2 same n_chars -> adjacent -> linked at lev 3
    assert any({a, b} == {0, 1} for (a, b) in pairs)
    lev = next(v for (a, b), v in pairs.items() if {a, b} == {0, 1})
    assert lev == 3
    # no pair involves the fr doc (different partition, no neighbor)
    assert all(3 not in {a, b} for (a, b) in pairs)
    # the far doc never links (head differs in ~all 49 positions)
    assert all(2 not in {a, b} for (a, b) in pairs)


def _orders(spark, rows):
    return spark.createDataFrame(
        [(i, 1 + i % 3, "O", price,
          datetime.datetime(1995, 1, day), prio)
         for i, (prio, day, price) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string")


def test_moving_median_semantics(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier26 as t26
    # one priority, 4 days with daily revenue 10, 30, 20, 40 dollars
    rows = [("P", 1, 10.0), ("P", 2, 30.0), ("P", 3, 20.0),
            ("P", 4, 40.0)]
    od = _orders(spark, rows)
    monkeypatch.setattr(t26, "load", lambda s, d, n: od)
    got = {r["day"].isoformat(): r["med7_cents"]
           for r in QUERIES["moving_median"](spark, "x").collect()}
    # trailing medians over cents: [1000] -> 1000; [1000,3000] ->
    # 2000; [1000,3000,2000] -> 2000; [1000..4000] -> 2500
    assert got["1995-01-01"] == 1000.0
    assert got["1995-01-02"] == 2000.0
    assert got["1995-01-03"] == 2000.0
    assert got["1995-01-04"] == 2500.0


def test_acf_lags_semantics(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier26 as t26
    # revenue 1, 2, 3, 4, 5 dollars on days 1..5: deviations
    # -2,-1,0,1,2 -> den = 4+1+0+1+4 = 10; lag1 num = (-1*-2)+
    # (0*-1)+(1*0)+(2*1) = 4 -> acf1 = 0.4; lag2 num = (0*-2)+
    # (1*-1)+(2*0) = -1 -> acf2 = -0.1; lag3 num = (1*-2)+(2*-1)
    # = -4 -> acf3 = -0.4
    rows = [("P", d, float(d)) for d in range(1, 6)]
    od = _orders(spark, rows)
    monkeypatch.setattr(t26, "load", lambda s, d, n: od)
    got = {r["lag"]: r for r in
           QUERIES["acf_lags"](spark, "x").collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_days"] == 5
    assert got[1]["acf"] == pytest.approx(0.4, abs=1e-6)
    assert got[2]["acf"] == pytest.approx(-0.1, abs=1e-6)
    assert got[3]["acf"] == pytest.approx(-0.4, abs=1e-6)


def test_pr_at_k_semantics(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier26 as t26
    # 40 vectors -> folds 0..3 of 10 each (vec_id % 4). Scores
    # descend with vec_id so rank order inside a fold is vec_id
    # ascending. In fold 0 (vec_ids 0,4,...,36) make the first 3
    # ranked positive (label 9), rest negative (label 0).
    rows = []
    for vid in range(40):
        pos = vid % 4 == 0 and vid < 12
        rows.append((vid, [float(1000 - vid)], 9 if pos else 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(t26, "load", lambda s, d, n: emb)
    got = [r for r in QUERIES["pr_at_k"](spark, "x").collect()
           if r["fold"] == 0]
    by_k = {r["k"]: r for r in got}
    # nf = 10 -> deciles at k = 1..9; tp at k: 1,2,3,3,3,...
    assert set(by_k) == set(range(1, 10))
    assert by_k[1]["precision_at_k"] == 1.0
    assert by_k[3]["precision_at_k"] == 1.0
    assert by_k[3]["recall_at_k"] == 1.0
    assert by_k[6]["precision_at_k"] == 0.5
    assert by_k[9]["tp"] == 3
    # f1 at k=3: 2*3/(3+3) = 1.0
    assert by_k[3]["f1_at_k"] == 1.0


def test_schema_drift_report_semantics(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier26 as t26
    # 8 orders on days 1..8: pivot_day = floor((d1+d8)/2) = d1+3,
    # so the old half is days 1-3 (ed < pivot), new is days 4-8.
    # Priority flips exactly at that boundary -> TV distance 1.0.
    rows = [("A", d, 10.0) for d in range(1, 4)] + \
           [("B", d, 10.0) for d in range(4, 9)]
    od = _orders(spark, rows)
    monkeypatch.setattr(t26, "load", lambda s, d, n: od)
    got = {r["col"]: r for r in
           QUERIES["schema_drift_report"](spark, "x").collect()}
    assert set(got) == {"o_orderstatus", "o_orderpriority",
                       "o_totalprice_bucket", "o_custkey_mod97"}
    pr = got["o_orderpriority"]
    # priority flips completely between halves -> TV distance 1.0
    assert pr["tv_distance"] == pytest.approx(1.0, abs=1e-6)
    assert pr["ndv_old"] == 1 and pr["ndv_new"] == 1
    # status/price identical across halves -> zero drift
    assert got["o_orderstatus"]["tv_distance"] == 0.0
    assert got["o_totalprice_bucket"]["tv_distance"] == 0.0
    assert got["o_orderstatus"]["n_old"] + \
        got["o_orderstatus"]["n_new"] == 8
