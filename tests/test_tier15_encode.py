"""bpe_encode semantics on a hand corpus: the learned merges must
actually compress the token stream, and encoding distributes over
word multiplicity (encode once per distinct word, count per
occurrence)."""

import pytest

from etl_tool_rep_spark.queries import QUERIES
import etl_tool_rep_spark.queries.tier15 as t15


def test_bpe_encode_hand_corpus(spark, monkeypatch):
    # 'ababab'-style corpus: merges learn 'a b'->'ab' etc.; every
    # word is fully mergeable so token counts drop below char counts
    rows = [(1, "abab abab cd"), (2, "abab cd cd")]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    monkeypatch.setattr(t15, "load", lambda s, d, n: docs)
    got = {r["doc_id"]: r for r in
           QUERIES["bpe_encode"](spark, "x").collect()}
    assert got[1]["n_words"] == 3 and got[2]["n_words"] == 3
    # chars+</w> per word without merges: abab->5, cd->3; 3 merges
    # must strictly compress the dominant 'abab' pattern
    assert got[1]["n_bpe_tokens"] < 5 * 2 + 3
    # identical word multisets across docs 1/2 differ only in mix;
    # both compress
    assert got[2]["n_bpe_tokens"] < 5 + 3 * 2
