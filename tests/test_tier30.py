"""Unit semantics for the tier-30 additions, on hand-built frames
where the expected answer is computable by eye — complementing the
DuckDB oracle gate (which proves engine parity, not intent).

* woe_encoding: a category with the global good/bad ratio has
  WoE ~ 0; a pure-good category has a large positive WoE; IV matches
  the hand sum.
* decision_stump_train: a perfectly separable label finds the
  separating threshold with the maximum gain = base Gini, flagged
  is_best exactly once.
* naive_bayes_score: two classes with disjoint vocabularies classify
  their own documents correctly.
* mann_whitney_u: hand 2x3 sample with known rank sum; a clean
  shift gives U = n1*n2 (all pairs won).
"""

import math

import pytest

from etl_tool_rep_spark.queries import QUERIES


def test_woe_encoding_semantics(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier30 as t30
    # cat A: 4 good 4 bad (global ratio -> WoE ~= 0 with smoothing);
    # cat B: 4 good 0 bad -> WoE = ln(9/1) - ln(8) + ln(4)
    rows = []
    k = 0
    for _ in range(4):
        rows.append((k, "A", "F")); k += 1
        rows.append((k, "A", "O")); k += 1
        rows.append((k, "B", "F")); k += 1
    od = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string,"
              " o_orderstatus string")
    monkeypatch.setattr(t30, "load", lambda s, d, n: od)
    got = {r["cat"]: r
           for r in QUERIES["woe_encoding"](spark, "x").collect()}
    assert got["A"]["n_good"] == 4 and got["A"]["n_bad"] == 4
    assert got["B"]["n_good"] == 4 and got["B"]["n_bad"] == 0
    # WoE(A) = ln(9) - ln(9) - ln(8) + ln(4) = -ln 2
    assert abs(got["A"]["woe"] + math.log(2)) < 1e-5
    # WoE(B) = ln(9) - ln(1) - ln(8) + ln(4) = ln(4.5)
    assert abs(got["B"]["woe"] - math.log(4.5)) < 1e-5
    assert got["A"]["information_value"] == \
        got["B"]["information_value"]


def test_decision_stump_separable(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier30 as t30
    # 10 low-price all-'F', 10 high-price all-'O': any decile
    # threshold in the low block separates partially; the boundary
    # threshold separates perfectly with gain = base Gini = 0.5
    rows = [(i, "P", "F", 10.0 + i) for i in range(10)]
    rows += [(10 + i, "P", "O", 1000.0 + i) for i in range(10)]
    od = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string,"
              " o_orderstatus string, o_totalprice double")
    monkeypatch.setattr(t30, "load", lambda s, d, n: od)
    got = QUERIES["decision_stump_train"](spark, "x").collect()
    best = [r for r in got if r["is_best"]]
    assert len(best) == 1
    b = best[0]
    # the best decile threshold is the last low-block price (19.00):
    # decile index (5*20)//10 = 10 -> the 10th cents value = 1900
    assert b["threshold_cents"] == 1900
    assert b["n_left"] == 10 and b["pos_left"] == 10
    assert b["n_right"] == 10 and b["pos_right"] == 0
    assert abs(b["gini_gain"] - 0.5) < 1e-9


def test_naive_bayes_disjoint_vocab(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier30 as t30
    docs = spark.createDataFrame(
        [(0, "apple banana apple", "en", "s", 18),
         (1, "banana apple apple", "en", "s", 18),
         (2, "chien chat chien", "fr", "s", 16),
         (3, "chat chien chat", "fr", "s", 15)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    monkeypatch.setattr(t30, "load", lambda s, d, n: docs)
    got = QUERIES["naive_bayes_score"](spark, "x").collect()
    assert len(got) == 4
    assert all(r["correct"] for r in got)
    assert all(r["pred_lang"] == r["true_lang"] for r in got)


def test_mann_whitney_clean_shift(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier30 as t30
    # hi group (URGENT) all larger than lo group: U = n1*n2 = 9
    rows = [(0, "1-URGENT", 100.0), (1, "1-URGENT", 101.0),
            (2, "2-HIGH", 102.0),
            (3, "3-MEDIUM", 1.0), (4, "4-LOW", 2.0),
            (5, "5-LOW", 3.0)]
    od = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string,"
              " o_totalprice double")
    monkeypatch.setattr(t30, "load", lambda s, d, n: od)
    got = QUERIES["mann_whitney_u"](spark, "x").collect()[0]
    assert got["n1"] == 3 and got["n2"] == 3
    assert got["u_stat"] == 9.0
    # z = (9 - 4.5) / sqrt(9 * 7 / 12)
    assert abs(got["z_score"]
               - 4.5 / math.sqrt(63.0 / 12.0)) < 1e-6


def test_mann_whitney_ties_midrank(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier30 as t30
    # all equal -> every midrank = (n+1)/2, U = n1*n2/2, z = 0
    rows = [(0, "1-URGENT", 5.0), (1, "2-HIGH", 5.0),
            (2, "4-LOW", 5.0), (3, "5-LOW", 5.0)]
    od = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string,"
              " o_totalprice double")
    monkeypatch.setattr(t30, "load", lambda s, d, n: od)
    got = QUERIES["mann_whitney_u"](spark, "x").collect()[0]
    assert got["u_stat"] == 2.0  # n1*n2/2 = 2
    assert got["z_score"] == 0.0
