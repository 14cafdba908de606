"""Tier-45 tests: curation-stage properties the oracle hash can't
express (cut-text reconstruction, contamination ground truth,
budget monotonicity, repetition bounds)."""

import pyspark.sql.functions as F

from etl_tool_rep_spark.queries.registry import QUERIES


def test_gopher_repetition_bounds(spark, sf_dir):
    rows = QUERIES["gopher_repetition"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["top2_cnt"] >= 1
        assert 0 <= r["top2_bp"] <= 10000
        assert 0 <= r["dup5_bp"] <= 10000
        assert " " in r["top2_gram"]          # it is a 2-gram
    # the synthetic corpus repeats words heavily: some doc must show
    # a repeated 2-gram (duplicated 5-grams are too rare at sf0.001
    # to assert corpus-wide; test_gopher_handbuilt covers that path)
    assert any(r["top2_cnt"] >= 2 for r in rows)


def test_gopher_handbuilt(spark, tmp_path):
    """Hand-built doc: 'a b c d e a b c d e f' has top 2-gram 'a b'
    (x2, 3 chars each = 6/21 chars -> 2857 bp) and one duplicated
    5-gram 'a b c d e' (x2, 9 chars each = 18/21 -> 8571 bp)."""
    from etl_tool_rep_spark.queries import tier45

    text = "a b c d e a b c d e f"
    sdf = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    sdf.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = tier45.gopher_repetition(spark, str(tmp_path)).collect()[0]
    assert r["top2_gram"] == "a b" and r["top2_cnt"] == 2
    assert r["top2_bp"] == (10000 * 2 * 3) // 21
    assert r["dup5_bp"] == (10000 * 2 * 9) // 21


def test_gopher_single_word_doc(spark, tmp_path):
    """A 1-word doc has no 2-gram: Spark must EXCLUDE it (matching
    the oracle's empty range(len-1)) rather than crash on the
    descending sequence(0,-1) slice (round-11 advice fix)."""
    from etl_tool_rep_spark.queries import tier45

    rows = [(1, "solo", "en", "s", 4),
            (2, "a b a b", "en", "s", 7)]
    sdf = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long")
    sdf.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in
           tier45.gopher_repetition(spark, str(tmp_path)).collect()}
    assert set(out) == {2}                    # 1-word doc excluded
    assert out[2]["top2_gram"] == "a b" and out[2]["top2_cnt"] == 2


def test_decontaminate_ground_truth(spark, sf_dir):
    """Recompute contamination for a handful of docs directly."""
    from etl_tool_rep_spark.queries.tier45 import _DC_K, _DC_MOD

    out = {r["doc_id"]: r for r in
           QUERIES["decontaminate_ngrams"](spark, sf_dir).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .collect()}
    assert all(did % _DC_MOD != 0 for did in out)  # eval docs excluded

    def shingles(text):
        ws = text.split(" ")
        return {" ".join(ws[i:i + _DC_K])
                for i in range(len(ws) - _DC_K + 1)}

    ev = set()
    for did, text in docs.items():
        if did % _DC_MOD == 0:
            ev |= shingles(text)
    for did in sorted(out)[:50]:
        shared = shingles(docs[did]) & ev
        assert out[did]["n_shared"] == len(shared), did
        assert out[did]["contaminated"] == bool(shared), did


def test_mixture_sample_budget_and_determinism(spark, sf_dir):
    from etl_tool_rep_spark.queries.tier45 import _MS_BUDGET

    rows = QUERIES["mixture_sample"](spark, sf_dir).collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
    for src, rs in per_source.items():
        assert max(r["cum_tokens"] for r in rs) <= _MS_BUDGET, src
        # cum is a proper running sum of the kept docs
        assert sum(r["n_tokens"] for r in rs) == max(
            r["cum_tokens"] for r in rs), src
    # rerun is bit-identical (no rand() anywhere)
    again = QUERIES["mixture_sample"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_cut_reconstruction(spark, sf_dir):
    """clean_text must equal the original with exactly the span
    characters removed: kept + span_chars == n_chars, clean is a
    subsequence of text, and docs without spans pass through."""
    cuts = {r["doc_id"]: r for r in
            QUERIES["exact_substring_cut"](spark, sf_dir).collect()}
    spans = {r["doc_id"]: r for r in
             QUERIES["exact_substring_spans"](spark, sf_dir).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .collect()}
    assert set(cuts) == set(docs)
    changed = 0
    for did, c in cuts.items():
        text, sp = docs[did], spans[did]
        assert c["kept_chars"] + sp["span_chars"] == len(text), did
        if sp["n_spans"] == 0:
            assert c["clean_text"] == text, did
        else:
            changed += 1
            # subsequence check (kept chars appear in order)
            it = iter(text)
            assert all(ch in it for ch in c["clean_text"]), did
    assert changed > 0
