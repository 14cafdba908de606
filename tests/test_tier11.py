"""Tier-11 tests: Heaps-curve monotonicity, funnel-latency ordering,
seasonal z-score moments, skew-profile identities, bootstrap CI
coverage of the true mean."""

from pyspark.sql import functions as F

from etl_tool_rep_spark.queries.registry import QUERIES


def test_vocab_growth_monotone_and_conserves(spark, sf_dir):
    rows = sorted(QUERIES["vocab_growth"](spark, sf_dir).collect(),
                  key=lambda r: r["doc_id"])
    assert rows
    prev_v = prev_t = 0
    total_new = 0
    for r in rows:
        assert r["vocab_size"] == prev_v + r["new_words"]
        assert r["cum_tok"] == prev_t + r["n_tok"]
        assert 0 <= r["new_words"] <= r["n_tok"]
        prev_v, prev_t = r["vocab_size"], r["cum_tok"]
        total_new += r["new_words"]
    # final vocab == distinct words in the whole corpus
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_words = (d.select(F.explode(F.regexp_extract_all(
        F.lower("text"), F.lit("[a-z]+"), F.lit(0))).alias("w"))
        .select("w").distinct().count())
    assert prev_v == total_new == n_words


def test_funnel_latency_nonnegative_and_consistent(spark, sf_dir):
    rows = QUERIES["funnel_latency"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["latency_sec"] >= 0
        assert r["first_purchase"] >= r["first_view"]
    # no user appears twice
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users))


def test_seasonal_baseline_zscore_moments(spark, sf_dir):
    rows = QUERIES["seasonal_baseline"](spark, sf_dir).collect()
    assert rows
    # per weekday, z-scores have ~zero mean and ~unit variance
    by_dw = {}
    for r in rows:
        by_dw.setdefault(r["dw"], []).append(r["zscore"])
    for dw, zs in by_dw.items():
        if len(zs) < 10:
            continue
        m = sum(zs) / len(zs)
        v = sum(z * z for z in zs) / len(zs) - m * m
        assert abs(m) < 1e-3, (dw, m)
        assert abs(v - 1.0) < 1e-2, (dw, v)


def test_skew_profile_identities(spark, sf_dir):
    rows = {r["key_col"]: r
            for r in QUERIES["skew_profile"](spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    assert set(rows) == {"l_orderkey", "l_partkey", "l_suppkey"}
    for kc, r in rows.items():
        assert r["n_rows"] == n
        assert r["n_keys"] == li.select(kc).distinct().count()
        assert r["max_count"] >= n / r["n_keys"]  # max >= mean
        assert r["skew_factor"] >= 1.0 - 1e-6
        assert 0 < r["collision_prob"] <= 1
        assert abs(r["top_share"] - r["max_count"] / n) < 1e-6


def test_bootstrap_ci_brackets_true_mean(spark, sf_dir):
    rows = QUERIES["bootstrap_ci"](spark, sf_dir).collect()
    assert rows
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    true_means = {r["event_type"]: r["m"] for r in
                  e.groupBy("event_type")
                   .agg(F.avg("value").alias("m")).collect()}
    for r in rows:
        assert r["n_reps"] >= 95  # a few replicates may draw all-zero
        assert r["ci_lo"] < r["ci_hi"]
        # 95% CI should bracket the true mean for these sample sizes
        assert r["ci_lo"] <= true_means[r["event_type"]] <= r["ci_hi"], r
