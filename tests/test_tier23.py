"""Unit semantics for cdc_chunk_dedup: the defining property of
content-defined chunking is boundary REALIGNMENT — prepending text to
a document shifts every character position, yet chunks of the shared
suffix still fingerprint identically (a fixed-width grid would lose
every downstream chunk). Cross-engine equality is tools/check_oracle.
"""

import pytest

from etl_tool_rep_spark.queries import QUERIES
import etl_tool_rep_spark.queries.tier23 as t23


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")


def _body(n=8):
    # varied deterministic text, long enough for several ~64-char
    # expected chunks
    return " ".join(f"sentence number {i} carries words like "
                    f"alpha{i} beta{i} gamma{i}" for i in range(n))


def test_cdc_chunks_realign_after_prefix_insert(spark, monkeypatch):
    body = _body()
    rows = [(1, body), (2, "COMPLETELY NEW LEADING HEADER !! " + body)]
    monkeypatch.setattr(t23, "load", lambda s, d, n: _docs(spark, rows))
    got = QUERIES["cdc_chunk_dedup"](spark, "x").collect()
    shared = [r for r in got if r["n_docs"] == 2]
    # the shared suffix must contribute at least one realigned chunk
    # despite every absolute position differing between the two docs
    assert shared, "no realigned shared chunks found"
    assert all(r["n_occ"] >= r["n_docs"] for r in got)


def test_cdc_exact_copy_shares_every_chunk(spark, monkeypatch):
    body = _body()
    rows = [(1, body), (2, body), (3, "unrelated tiny text")]
    monkeypatch.setattr(t23, "load", lambda s, d, n: _docs(spark, rows))
    got = QUERIES["cdc_chunk_dedup"](spark, "x").collect()
    # every reported duplicate chunk comes from the copied pair and
    # covers the full body: sum of shared chunk lengths == len(body)
    assert all(r["n_docs"] == 2 and r["n_occ"] == 2 for r in got)
    assert sum(r["chunk_len"] for r in got) == len(body)


# ---------------------------------------------------------------------------
# r13: the boundary/fingerprint kernel moved to a vectorized numpy
# mapInArrow pass — pin it against an independent pure-Python Horner
# reference (the arithmetic the old JVM fold and the DuckDB oracle
# both express) on adversarial shapes: below/at/just-over the window
# width, boundary-free, non-ASCII codepoints, and a long document.
# ---------------------------------------------------------------------------

def _ref_chunks(text: str):
    P, B, W, MASK = t23._P, t23._B, t23._W, t23._MASK
    cs = [ord(c) for c in text]
    n = len(cs)
    cuts = []
    for i in range(W, n):          # 1-based i in [W, n-1]
        acc = 0
        for c in cs[i - W:i]:
            acc = (acc * B + c) % P
        if acc % MASK == 0:
            cuts.append(i)
    bs = [0] + cuts + [n]
    out = []
    for s, e in zip(bs[:-1], bs[1:]):
        acc = 0
        for c in cs[s:e]:
            acc = (acc * B + c) % P
        out.append((acc, e - s))
    return sorted(out)


@pytest.mark.parametrize("text", [
    "a",                                   # n < W: single chunk
    "abcdefgh",                            # n == W: no boundary slots
    "abcdefghi",                           # n == W + 1: one slot
    "é漢字 mixed unicode \U0001f600 text",  # codepoints
    "zzzzzzzzzzzzzzzzzzzzzzzzzzzz",        # uniform, likely no cuts
    _body(40),                             # long doc, many chunks
])
def test_cdc_numpy_kernel_matches_horner_reference(text):
    import pyarrow as pa

    batch = pa.RecordBatch.from_arrays(
        [pa.array([7], pa.int64()), pa.array([text], pa.string())],
        names=["doc_id", "text"])
    got = []
    for out in t23._cdc_chunks_arrow(iter([batch])):
        got.extend(zip(out.column("fp").to_pylist(),
                       out.column("ln").to_pylist()))
    assert sorted(got) == _ref_chunks(text)
    assert sum(ln for _, ln in got) == len(text)
