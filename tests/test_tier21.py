"""Unit semantics for the tier-21 portable-hash sketch queries on
hand-built frames (the cross-engine gate is tools/check_oracle.py;
these pin the ALGORITHM semantics independent of the fixtures).

* minhash_lsh_exact: an exact copy shares every permutation minimum,
  so candidacy is guaranteed (not probabilistic); disjoint docs never
  pair; the verify stage reports exact intersection/union counts.
* cms_exact: estimates never undercount, and with a near-empty sketch
  (few keys, 4x128 cells) they are exactly the true counts.
* hll_exact: matches an independent pure-Python re-implementation of
  the same registers/rank/harmonic-sum arithmetic, register for
  register.
* simhash_exact: identical word sets -> identical signatures ->
  mutual neighbor counts; an all-different doc stays at zero.
"""

import pytest

from etl_tool_rep_spark.queries import QUERIES
import etl_tool_rep_spark.queries.tier21 as t21


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, t, src in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")


def test_minhash_copy_is_guaranteed_candidate(spark, monkeypatch):
    a = "the quick brown fox jumps over the lazy dog tonight"
    c = "completely unrelated words appear in this other document"
    rows = [(1, a, "s"), (2, a, "s"), (9, c, "s")]
    monkeypatch.setattr(t21, "load", lambda s, d, n: _docs(spark, rows))
    got = {(r["id_1"], r["id_2"]): r for r in
           QUERIES["minhash_lsh_exact"](spark, "x").collect()}
    assert (1, 2) in got            # identical shingles -> same bands
    pair = got[(1, 2)]
    assert pair["inter_sh"] == pair["union_sh"] > 0
    assert pair["is_dup"]
    assert not any(9 in k for k in got)   # disjoint never a candidate


def test_cms_small_sketch_is_exact_and_overcounts_never(spark,
                                                        monkeypatch):
    events = spark.createDataFrame(
        [(i, None, u, "t", 1.0, None)
         for i, u in enumerate([7, 7, 7, 42, 42, 99])],
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string")
    monkeypatch.setattr(t21, "load", lambda s, d, n: events)
    got = {r["user_id"]: r for r in
           QUERIES["cms_exact"](spark, "x").collect()}
    assert set(got) == {7, 42, 99}
    for uid, true_cnt in [(7, 3), (42, 2), (99, 1)]:
        assert got[uid]["true_cnt"] == true_cnt
        assert got[uid]["over_ok"]
        # 3 keys in 4x128 cells: collisions essentially impossible
        assert got[uid]["cms_cnt"] == true_cnt


def _hll_model(users):
    """Independent re-implementation of the hll_exact arithmetic."""
    P, M = t21._P, t21._HLL_M
    a, b = t21._HLL_A, t21._HLL_B
    regs = {}
    for u in set(users):
        h = (a * (u % P) + b) % P
        v = h // M
        rho = 25 if v == 0 else ((v & -v).bit_length() - 1) + 1
        reg = h % M
        regs[reg] = max(regs.get(reg, 0), rho)
    s = sum(1 << (45 - regs.get(j, 0)) for j in range(M))
    import math
    raw = float(t21._HLL_NUM) / float(s)
    return math.floor(raw * 1e6 + 0.5) / 1e6


def test_hll_matches_python_model(spark, monkeypatch):
    users = [3, 5, 8, 13, 21, 34, 55, 89, 3, 5]
    events = spark.createDataFrame(
        [(i, None, u, "t", 1.0, None) for i, u in enumerate(users)],
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string")
    monkeypatch.setattr(t21, "load", lambda s, d, n: events)
    [row] = QUERIES["hll_exact"](spark, "x").collect()
    assert row["n_true"] == 8
    assert row["hll_est"] == _hll_model(users)


def test_simhash_identical_word_sets_are_neighbors(spark,
                                                   monkeypatch):
    a = "alpha beta gamma delta epsilon"
    b = "beta alpha epsilon delta gamma beta"   # same SET of words
    c = "zork quux fnord blarg wibble"
    rows = [(1, a, "s"), (2, b, "s"), (3, c, "s")]
    monkeypatch.setattr(t21, "load", lambda s, d, n: _docs(spark, rows))
    got = {r["doc_id"]: r for r in
           QUERIES["simhash_exact"](spark, "x").collect()}
    assert got[1]["sig"] == got[2]["sig"]      # set-based signature
    assert got[1]["n_near"] >= 1 and got[2]["n_near"] >= 1
    if got[3]["sig"] != got[1]["sig"]:         # hash-dependent, true
        assert got[3]["n_near"] == 0           # for these literals


def test_hyperplane_identical_vectors_are_neighbors(spark,
                                                    monkeypatch):
    base = [0.1 * ((i % 7) - 3) for i in range(64)]
    opp = [-x for x in base]
    vecs = [(1, base, 0), (2, list(base), 0), (9, opp, 0)]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(t21, "load", lambda s, d, n: emb)
    got = {r["vec_id"]: r for r in
           QUERIES["hyperplane_lsh_exact"](spark, "x").collect()}
    # identical vectors: identical signatures, mutual neighbors
    assert got[1]["sig"] == got[2]["sig"]
    assert got[1]["n_near"] >= 1 and got[2]["n_near"] >= 1
    # the antipodal vector flips every nonzero-dot sign: different
    # signature and cos = -1 can never verify
    assert got[9]["sig"] != got[1]["sig"]
    assert got[9]["n_near"] == 0


# ---------------------------------------------------------------------------
# property: the JVM shingle kernel == a pure-Python model on random text
# ---------------------------------------------------------------------------

def _shingle_model(text):
    """Pure-Python re-implementation of _with_shingles' arithmetic."""
    P, CB, WB = t21._P, t21._CHAR_BASE, t21._WORD_BASE
    import re
    words = [w for w in re.split(r"\s+", text) if w != ""]
    if len(words) < 3:
        return None
    wh = []
    for w in words:
        h = 0
        for ch in w:
            h = (h * CB + ord(ch)) % P
        wh.append(h)
    out = []
    for i in range(len(wh) - 2):
        out.append(((wh[i] * WB + wh[i + 1]) % P * WB + wh[i + 2]) % P)
    return sorted(set(out))


def test_shingle_kernel_matches_python_model_property(spark):
    from hypothesis import given, settings, HealthCheck
    from hypothesis import strategies as st

    word = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1, max_size=8)
    texts = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(texts, min_size=1, max_size=4))
    def check(samples):
        docs = spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(samples)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long")
        got = {r["doc_id"]: sorted(r["_sh"]) for r in
               t21._with_shingles(docs).collect()}
        for i, t in enumerate(samples):
            want = _shingle_model(t)
            if want is None:
                assert i not in got
            else:
                assert got[i] == want, (i, t)

    check()
