"""Tier-7 analytic-extension tests: properties the oracle hash can't
express (skyline correctness vs brute force, sampling invariants)."""

from etl_tool_rep_spark.queries.registry import QUERIES


def test_skyline_is_undominated(spark, sf_dir):
    frontier = QUERIES["skyline_pareto"](spark, sf_dir).collect()
    all_pts = [(r["o_orderdate"], r["o_totalprice"]) for r in
               spark.read.parquet(f"{sf_dir}/orders.parquet").collect()]
    fr = [(r["odate"], r["price"]) for r in frontier]
    assert fr
    # brute-force check: no frontier point is dominated by any point
    for d, p in fr:
        for d2, p2 in all_pts:
            dominated = (d2 <= d and p2 >= p) and (d2 < d or p2 > p)
            assert not dominated, ((d, p), (d2, p2))


def test_weighted_sample_props(spark, sf_dir):
    rows = QUERIES["weighted_sample"](spark, sf_dir).collect()
    assert len(rows) == 100
    keys = [r["es_key"] for r in rows]
    assert keys == sorted(keys, reverse=True)
    assert all(0.0 < k <= 1.0 for k in keys)
    # deterministic across runs
    again = QUERIES["weighted_sample"](spark, sf_dir).collect()
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in again]


def test_mad_outliers_sane(spark, sf_dir):
    rows = QUERIES["mad_outliers"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    n_out = sum(r["is_outlier"] for r in rows)
    # robust cutoff flags a small minority, never the bulk
    assert n_out < 0.2 * n_docs
