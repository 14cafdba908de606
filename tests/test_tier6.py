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
