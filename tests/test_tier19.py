"""Unit semantics for the tier-19 additions, on hand-built frames
where the expected answer is computable by eye — complementing the
DuckDB oracle gate (which proves engine parity, not intent).

* gopher_rules: each rule verdict checked on documents constructed
  to fail exactly one rule.
* containment_dedup: a short doc fully embedded in a longer one gets
  containment 1.0 in that direction only; Jaccard-symmetric pairs
  appear in both directions.
* benford_digits: digit extraction from cents, shares sum to 1,
  a perfectly Benford-free (uniform-digit) input yields nonzero
  chi-square terms against the literal expectations.
* neighbor_jaccard: exact Jaccard and ranking on a 3-supplier
  hand graph; top-k cutoff honored.
* readability: monosyllabic short sentences score "easy" (higher
  flesch) vs vowel-dense long sentences (lower).
"""

import pytest
from pyspark.sql import functions as F

from etl_tool_rep_spark.queries import QUERIES


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")


@pytest.fixture()
def gopher_docs(spark):
    base = ("the cat of and is to " + "word " * 60).strip()  # passes all
    no_stop = ("wordy " * 66).strip()                        # no stopwords
    short = "the of tiny"                                    # < 50 words
    symbols = ("the of and is " + "@#$ " * 62).strip()       # symbol-heavy
    return spark.createDataFrame(
        [(0, base, "en", "s", len(base)),
         (1, no_stop, "en", "s", len(no_stop)),
         (2, short, "en", "s", len(short)),
         (3, symbols, "en", "s", len(symbols))],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")


def test_gopher_rules_semantics(spark, gopher_docs, monkeypatch):
    import etl_tool_rep_spark.queries.tier19 as t19
    monkeypatch.setattr(t19, "load", lambda s, d, n: gopher_docs)
    got = {r["doc_id"]: r for r in
           QUERIES["gopher_rules"](spark, "ignored").collect()}
    assert got[0]["pass_gopher"]
    assert not got[1]["ok_stopwords"] and not got[1]["pass_gopher"]
    assert not got[2]["ok_word_count"] and not got[2]["pass_gopher"]
    assert not got[3]["ok_symbol_ratio"] and not got[3]["pass_gopher"]
    # the word-count rule fired for doc 2 but its OTHER rules that
    # depend only on ratios still evaluate (no nulls anywhere)
    assert all(v is not None for v in got[2].asDict().values())


def test_containment_is_asymmetric(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier19 as t19
    short = "alpha beta gamma delta"                  # 2 3-grams
    longer = short + " epsilon zeta eta theta iota"   # contains both
    docs = _docs(spark, [short, longer, "unrelated words here now"])
    monkeypatch.setattr(t19, "load", lambda s, d, n: docs)
    rows = {(r["id_src"], r["id_dst"]): r["containment"]
            for r in QUERIES["containment_dedup"](spark, "ignored")
                     .collect()}
    # doc 0 fully contained in doc 1
    assert rows[(0, 1)] == 1.0
    # reverse direction: 2 of 7 grams shared -> below the 0.5 floor
    assert (1, 0) not in rows
    assert not any(2 in k for k in rows)


def test_benford_digits_shares_and_digits(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier19 as t19
    # prices with leading digits 1,1,2,9 (from cents: 199.99 -> 19999)
    orders = spark.createDataFrame(
        [(1, 105.50), (2, 199.99), (3, 25.00), (4, 900.01)],
        "o_orderkey long, o_totalprice double")
    monkeypatch.setattr(t19, "load", lambda s, d, n: orders)
    rows = {r["digit"]: r for r in
            QUERIES["benford_digits"](spark, "ignored").collect()}
    assert sorted(rows) == list(range(1, 10))  # always 9 rows
    assert rows[1]["n"] == 2 and rows[2]["n"] == 1 and rows[9]["n"] == 1
    assert rows[3]["n"] == 0
    assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 1e-6
    # digit 3 absent -> chi term is exactly its expected probability
    assert rows[3]["chi2_term"] == pytest.approx(
        rows[3]["benford_p"], abs=1e-6)


def test_neighbor_jaccard_hand_graph(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier19 as t19
    # supplier 1: parts {1,2,3,4}; supplier 2: {1,2,3,5};
    # supplier 3: {1,2,9,10}  -> J(1,2)=3/5, J(1,3)=J(2,3)=2/6
    rows = [(s, p) for s, parts in
            [(1, [1, 2, 3, 4]), (2, [1, 2, 3, 5]), (3, [1, 2, 9, 10])]
            for p in parts]
    li = spark.createDataFrame(rows, "l_suppkey long, l_partkey long")
    monkeypatch.setattr(t19, "load", lambda s, d, n: li)
    got = {(r["src"], r["dst"]): (r["jaccard"], r["rk"]) for r in
           QUERIES["neighbor_jaccard"](spark, "ignored").collect()}
    assert got[(1, 2)] == (0.6, 1)
    assert got[(1, 3)] == (pytest.approx(2 / 6, abs=1e-6), 2)
    assert got[(2, 1)][1] == 1 and got[(3, 1)][1] == 1
    # symmetric scores
    assert got[(2, 3)][0] == got[(3, 2)][0]


def test_readability_orders_easy_before_dense(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier19 as t19
    easy = "The cat sat. The dog ran. It is fun."
    dense = ("Extraordinarily onomatopoeia aficionados "
             "enthusiastically reevaluate bioluminescent "
             "oceanographic euphoria")
    docs = _docs(spark, [easy, dense])
    monkeypatch.setattr(t19, "load", lambda s, d, n: docs)
    got = {r["doc_id"]: r for r in
           QUERIES["readability_score"](spark, "ignored").collect()}
    assert got[0]["n_sentences"] == 3 and got[1]["n_sentences"] == 1
    assert got[0]["flesch_ease"] > got[1]["flesch_ease"]
    assert got[0]["fk_grade"] < got[1]["fk_grade"]


def test_dsir_weights_prefers_target_like_docs(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier19 as t19
    # target slice (lang=en) uses short words; the fr doc drawn from
    # the SAME distribution should outscore the fr doc that isn't
    en_text = "aa bb cc dd " * 10
    docs = spark.createDataFrame(
        [(0, en_text.strip(), "en", "s", 1),
         (1, en_text.strip(), "fr", "s", 1),
         (2, "zzzzzzz yyyyyyy xxxxxxx wwwwwww " * 10, "fr", "s", 1)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    monkeypatch.setattr(t19, "load", lambda s, d, n: docs)
    got = {r["doc_id"]: r["dsir_logweight"] for r in
           QUERIES["dsir_weights"](spark, "ignored").collect()}
    assert got[1] > got[2]
    assert got[0] == got[1]  # same text, weight independent of label
