"""Tier-6 corpus-hygiene and relational-extension query tests.

The oracle gate (tools/check_oracle.py) hash-checks these against
DuckDB; here we assert the properties the hash can't express:
closed-form regression agrees with Spark's native regr_*, dedup
verdicts are internally consistent, and the classifier splits the
corpus non-trivially.
"""

import pyspark.sql.functions as F

from etl_tool_rep_spark.queries.registry import QUERIES


def test_regression_matches_native(spark, sf_dir):
    ours = {r["rflag"]: r for r in
            QUERIES["regression_agg"](spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    native = {r["rflag"]: r for r in li.groupBy(
        F.col("l_returnflag").alias("rflag")).agg(
        F.regr_slope("l_extendedprice", "l_quantity").alias("slope"),
        F.regr_intercept("l_extendedprice", "l_quantity")
         .alias("intercept"),
        F.regr_r2("l_extendedprice", "l_quantity").alias("r2")).collect()}
    assert set(ours) == set(native)
    for flag, row in ours.items():
        for col in ("slope", "intercept", "r2"):
            assert abs(row[col] - native[flag][col]) < 1e-4, (flag, col)


def test_semantic_dedup_consistent(spark, sf_dir):
    rows = QUERIES["semantic_dedup"](spark, sf_dir).collect()
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert len(rows) == em.count()
    # the lowest-id vector of every cluster can never be a duplicate
    first_per_label = {}
    for r in sorted(rows, key=lambda r: r["vec_id"]):
        first_per_label.setdefault(r["label"], r)
    for r in first_per_label.values():
        assert not r["is_dup"]


def test_passage_dedup_invariants(spark, sf_dir):
    rows = QUERIES["passage_dedup"](spark, sf_dir).collect()
    assert all(0 <= r["n_kept"] <= r["n_total"] for r in rows)
    # kept passages reassemble into a prefix-consistent word stream
    for r in rows:
        words = r["clean_text"].split(" ") if r["clean_text"] else []
        assert len(words) <= r["n_total"] * 10
    # corpus-wide at least one duplicate passage must have been dropped
    assert any(r["n_kept"] < r["n_total"] for r in rows)


def test_domain_cap_bounds(spark, sf_dir):
    rows = QUERIES["domain_cap"](spark, sf_dir).collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r["rk"])
    for src, rks in per_source.items():
        assert len(rks) <= 20
        assert sorted(rks) == list(range(1, len(rks) + 1)), src


def test_quality_classifier_splits(spark, sf_dir):
    rows = QUERIES["quality_classifier"](spark, sf_dir).collect()
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)
    assert all(0.0 <= r["prob"] <= 1.0 for r in rows)


def test_semantic_dedup_borderline_cosine_stable(spark):
    """Cosines within a few ulp of the 0.4 threshold must not flip
    is_dup with summation order: the kernel rounds to 9dp before the
    compare (as does the oracle SQL). Vectors are built so the exact
    cosine is 0.4 up to float representation."""
    import numpy as np

    from etl_tool_rep_spark.queries.tier6 import semantic_dedup  # noqa: F401

    # pair with cosine exactly 0.4: a=(1,0), b=(0.4, sqrt(1-0.16))
    b2 = float(np.sqrt(1 - 0.16))
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.4, b2], 0),           # cos(a, b) == 0.4 exactly-ish
        (3, [0.0, 1.0], 1),          # different label: never compared
    ]
    import pandas as pd
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    np_cos = np.dot(pdf.embedding[0], pdf.embedding[1])
    assert abs(np_cos - 0.4) < 1e-12

    sdf = spark.createDataFrame(pdf)
    # drive the same applyInPandas kernel the query uses, via a temp
    # parquet dir shaped like the embeddings table
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        sdf.write.mode("overwrite").parquet(f"{td}/embeddings.parquet")
        out = {r["vec_id"]: r["is_dup"]
               for r in QUERIES["semantic_dedup"](spark, td).collect()}
    # rounded cosine 0.4 >= 0.4 -> vec 2 is a dup of vec 1
    assert out == {1: False, 2: True, 3: False}


def test_semantic_dedup_hot_cluster_tiling(spark, monkeypatch):
    """A hot cluster (one label holding >50% of vectors) must split
    into bounded triangle tiles WITHOUT changing a single verdict:
    with the cap forced below the block size (m > 1 sub-groups) the
    output must equal both the uncapped run and an independent numpy
    brute force."""
    import numpy as np
    import pandas as pd

    from etl_tool_rep_spark.queries import tier6

    rng = np.random.default_rng(42)
    n_hot, n_cold = 60, 20
    rows = []
    for i in range(n_hot):          # hot label 0: 75% of the corpus
        rows.append((i, rng.normal(size=8).tolist(), 0))
    for i in range(n_cold):
        rows.append((1000 + i, rng.normal(size=8).tolist(), 1))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])

    # independent brute force (same formula as the oracle)
    def brute(pdf):
        out = {}
        for lbl, grp in pdf.groupby("label"):
            g = grp.sort_values("vec_id")
            x = np.array([np.asarray(v, float) for v in g.embedding])
            nrm = np.sqrt((x * x).sum(axis=1))
            sim = np.round((x @ x.T) / np.outer(nrm, nrm), 9)
            ids = g.vec_id.to_numpy()
            for r in range(len(ids)):
                dup = any(sim[r, c] >= 0.4 for c in range(len(ids))
                          if ids[c] < ids[r])
                out[int(ids[r])] = dup
        return out

    expected = brute(pdf)

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            f"{td}/embeddings.parquet")

        def run():
            return {r["vec_id"]: r["is_dup"] for r in
                    tier6.semantic_dedup(spark, td).collect()}

        uncapped = run()                     # m = 1 everywhere
        monkeypatch.setattr(tier6, "_SD_CAP", 16)   # hot label: m = 4
        monkeypatch.setattr(tier6, "_SD_CHUNK", 7)  # odd chunk edges
        capped = run()

    assert uncapped == expected
    assert capped == expected
    # sanity: the fixture actually exercises dup AND non-dup paths
    assert any(expected.values())
    assert not all(expected.values())
