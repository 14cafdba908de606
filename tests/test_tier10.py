"""Tier-10 tests: AUC rank-formula equivalence, calibration bin
conservation, packing manifest contiguity, split determinism,
equi-depth balance, correlation symmetry bounds, basket lift math,
interpolation exactness on a hand-computed series."""

import math

from pyspark.sql import functions as F

from etl_tool_rep_spark.queries.registry import QUERIES


def test_auc_in_bounds_and_matches_bruteforce(spark, sf_dir):
    rows = QUERIES["auc_metric"](spark, sf_dir).collect()
    assert len(rows) == 4
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    data = e.select(
        (F.col("vec_id") % 4).alias("fold"),
        F.element_at("embedding", 1).cast("double").alias("s"),
        (F.col("label") >= 5).cast("int").alias("y")).collect()
    for r in rows:
        assert 0.0 <= r["auc"] <= 1.0
        pos = [d["s"] for d in data if d["fold"] == r["fold"] and d["y"]]
        neg = [d["s"] for d in data if d["fold"] == r["fold"] and not d["y"]]
        assert (r["npos"], r["nneg"]) == (len(pos), len(neg))
        # brute-force Mann-Whitney: P(s+ > s-) + 0.5 P(tie)
        wins = sum((p > q) + 0.5 * (p == q) for p in pos for q in neg)
        assert abs(r["auc"] - wins / (len(pos) * len(neg))) < 1e-6


def test_calibration_bins_conserve_counts(spark, sf_dir):
    rows = QUERIES["calibration_bins"](spark, sf_dir).collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r["n"] for r in rows) == d.count()
    for r in rows:
        assert 0.0 <= r["mean_pred"] <= 1.0
        assert 0.0 <= r["pos_rate"] <= 1.0
        assert abs(r["gap"] - abs(r["mean_pred"] - r["pos_rate"])) < 2e-6
        # bin b contains predictions in [b/10, (b+1)/10)
        assert r["bin"] - 1e-6 <= r["mean_pred"] * 10 <= r["bin"] + 1 + 1e-6


def test_sequence_pack_offsets_contiguous(spark, sf_dir):
    rows = QUERIES["sequence_pack"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, grp in by_src.items():
        grp.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in grp:
            assert r["start_off"] == off, (src, r)
            assert r["first_chunk"] == off // 512
            assert r["n_chunks"] == r["last_chunk"] - r["first_chunk"] + 1
            assert r["n_chunks"] >= 1
            off += r["n_tok"]


def test_dataset_split_deterministic_and_partitioned(spark, sf_dir):
    a = {(r["split"], r["lang"]): r["n_docs"]
         for r in QUERIES["dataset_split"](spark, sf_dir).collect()}
    b = {(r["split"], r["lang"]): r["n_docs"]
         for r in QUERIES["dataset_split"](spark, sf_dir).collect()}
    assert a == b  # content-addressed: identical across runs
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(a.values()) == d.count()
    # train dominates every language
    langs = {k[1] for k in a}
    for lang in langs:
        tr = a.get(("train", lang), 0)
        assert tr >= a.get(("val", lang), 0)
        assert tr >= a.get(("test", lang), 0)


def test_equidepth_bins_balanced(spark, sf_dir):
    rows = sorted(QUERIES["equidepth_bins"](spark, sf_dir).collect(),
                  key=lambda r: r["bin"])
    assert [r["bin"] for r in rows] == list(range(1, 11))
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # NTILE guarantee
    # bins are ordered, non-overlapping ranges
    for lo_r, hi_r in zip(rows, rows[1:]):
        assert lo_r["hi"] <= hi_r["lo"]
        assert lo_r["lo"] <= lo_r["hi"]


def test_corr_matrix_bounds_and_self_consistency(spark, sf_dir):
    rows = QUERIES["corr_matrix"](spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 - 1e-9 <= r["r"] <= 1.0 + 1e-9
    # all six upper-triangle pairs present exactly once
    qp = {(r["x"], r["y"]) for r in rows}
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    assert qp == {(cols[i], cols[j])
                  for i in range(4) for j in range(i + 1, 4)}


def test_market_basket_lift_math(spark, sf_dir):
    rows = QUERIES["market_basket"](spark, sf_dir).collect()
    assert rows
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = items.select("l_orderkey").distinct().count()
    counts = {r["l_partkey"]: r["c"] for r in
              items.groupBy("l_partkey").agg(
                  F.count(F.lit(1)).alias("c")).collect()}
    top = rows[0]
    assert top["pa"] < top["pb"]
    assert abs(top["support"] - top["n_ab"] / n) < 1e-6
    expect_lift = top["n_ab"] * n / (counts[top["pa"]] * counts[top["pb"]])
    assert abs(top["lift"] - expect_lift) < 1e-4
    ns = [r["n_ab"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_linear_interpolate_hand_series(spark, sf_dir):
    rows = QUERIES["linear_interpolate"](spark, sf_dir).collect()
    by_key = {(r["prio"], str(r["day"])): r for r in rows}
    # reconstruct one priority's series and check a straddled gap
    prios = sorted({r["prio"] for r in rows})
    grp = sorted((r for r in rows if r["prio"] == prios[0]),
                 key=lambda r: str(r["day"]))
    assert any(r["observed"] == 0 for r in grp)
    obs_idx = [i for i, r in enumerate(grp) if r["observed"] == 1]
    # between two consecutive observed points, est is monotone between
    # the endpoint values (linearity) and exact at the endpoints
    for i, j in zip(obs_idx, obs_idx[1:]):
        lo = min(grp[i]["est"], grp[j]["est"]) - 0.011
        hi = max(grp[i]["est"], grp[j]["est"]) + 0.011
        for k in range(i + 1, j):
            assert lo <= grp[k]["est"] <= hi, grp[k]
    assert by_key  # sanity


def test_equidepth_ntile_arithmetic_small_n(spark, tmp_path):
    """The two-level prefix-sum rank + NTILE bucket arithmetic must
    reproduce ntile() exactly, including the n<10 degenerate path
    (base=0: each row its own bucket) and the n%10 fat-bucket split."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from etl_tool_rep_spark.queries.registry import QUERIES

    for n in (7, 23, 40):
        rows = [(float(1000 - i), i) for i in range(n)]
        df = spark.createDataFrame(rows, ["o_totalprice", "o_orderkey"])
        sf = str(tmp_path / f"sf_{n}")
        df.write.mode("overwrite").parquet(f"{sf}/orders.parquet")
        got = {r["bin"]: (r["n"], r["lo"], r["hi"])
               for r in QUERIES["equidepth_bins"](spark, sf).collect()}
        w = Window.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
        exp_rows = (df.select("o_totalprice",
                              F.ntile(10).over(w).alias("bin"))
                    .groupBy("bin")
                    .agg(F.count(F.lit(1)).alias("n"),
                         F.min("o_totalprice").alias("lo"),
                         F.max("o_totalprice").alias("hi")).collect())
        exp = {r["bin"]: (r["n"], r["lo"], r["hi"]) for r in exp_rows}
        assert got == exp, (n, got, exp)
