"""Unit semantics for the tier-33 additions, on hand-built frames
where the expected answer is computable by eye — complementing the
DuckDB oracle gate (which proves engine parity, not intent).

* maximal_independent_set: the result is verified to be independent
  (no edge inside the MIS) and maximal (every non-MIS node has an
  MIS neighbor) on a small graph.
* quantile_normalization: two groups with shifted distributions map
  onto identical normalized value sets.
* kneser_ney_bigram: a corpus engineered so one continuation is
  unique gives the hand-computed KN probability; probabilities stay
  in (0, 1].
* topic_coherence: identical docs make every co-occurrence count
  equal its document frequency, so coherence = sum ln((df+1)/df).
"""

import math

import pytest

from etl_tool_rep_spark.queries import QUERIES


def test_mis_independent_and_maximal(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier33 as t33
    # two triangles sharing node 3, plus an isolated edge 7-8
    tri1 = [(1, 1), (1, 2), (1, 3)]
    tri2 = [(2, 3), (2, 4), (2, 5)]
    iso = [(3, 7), (3, 8)]
    li = spark.createDataFrame(tri1 + tri2 + iso,
                               "l_orderkey long, l_suppkey long")
    monkeypatch.setattr(t33, "load", lambda s, d, n: li)
    got = QUERIES["maximal_independent_set"](spark, "x").collect()
    mis = {r["suppkey"] for r in got if r["in_mis"]}
    # rebuild the edge set by hand
    edges = set()
    for grp in (tri1, tri2, iso):
        ks = [s for _, s in grp]
        for i in ks:
            for j in ks:
                if i != j:
                    edges.add((i, j))
    # independent: no edge within the MIS
    assert not any((a, b) in edges for a in mis for b in mis)
    # maximal: every non-MIS node is adjacent to an MIS node
    nodes = {r["suppkey"] for r in got}
    for v in nodes - mis:
        assert any((v, m) in edges for m in mis)


def test_quantile_normalization_aligns(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier33 as t33
    # group A: 1,2,3,4 dollars; group B: 101,102,103,104 -> after QN
    # both map onto the same global order statistics
    rows = [(i, "A", float(1 + i)) for i in range(4)]
    rows += [(10 + i, "B", float(101 + i)) for i in range(4)]
    od = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string,"
              " o_totalprice double")
    monkeypatch.setattr(t33, "load", lambda s, d, n: od)
    got = QUERIES["quantile_normalization"](spark, "x").collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r["prio"], []).append(r["normalized_cents"])
    assert sorted(by_grp["A"]) == sorted(by_grp["B"])
    # within a group, normalization preserves order
    a = sorted((r["cents"], r["normalized_cents"])
               for r in got if r["prio"] == "A")
    assert [x[1] for x in a] == sorted(x[1] for x in a)


def test_kneser_ney_hand_value(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier33 as t33
    # corpus: "a b" x 8 and "c b" x 2 and "a d" x 2 (as documents).
    # bigrams: (a,b) c=8; (c,b) c=2; (a,d) c=2. T = 3 types.
    # c1(a): ctot=10, ntypes=2. cont(b): ncont=2. Pkn(b|a) =
    # (4*8-3)/(4*10) + (3*2/(4*10)) * (2/3)
    docs = []
    k = 0
    for _ in range(8):
        docs.append((k, "a b", "en", "s", 3)); k += 1
    for _ in range(2):
        docs.append((k, "c b", "en", "s", 3)); k += 1
    for _ in range(2):
        docs.append((k, "a d", "en", "s", 3)); k += 1
    d = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    monkeypatch.setattr(t33, "load", lambda s, d_, n: d)
    got = {(r["w1"], r["w2"]): r
           for r in QUERIES["kneser_ney_bigram"](spark, "x").collect()}
    # only (a, b) reaches the c >= 5 cut
    assert set(got) == {("a", "b")}
    expect = (4 * 8 - 3) / 40.0 + (3 * 2 / 40.0) * (2 / 3.0)
    assert abs(got[("a", "b")]["p_kn"] - expect) < 1e-8
    assert 0 < got[("a", "b")]["p_kn"] <= 1


def test_topic_coherence_identical_docs(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier33 as t33
    # 4 identical docs: top-5 terms all have df=4 and every pair
    # co-occurs in all 4 docs -> coherence = 10 * ln(5/4)
    text = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [(i, text, "en", "s", len(text)) for i in range(4)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    monkeypatch.setattr(t33, "load", lambda s, d, n: docs)
    got = QUERIES["topic_coherence"](spark, "x").collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_pairs"] == 10
    assert abs(r["coherence"] - 10 * math.log(5 / 4)) < 1e-4
