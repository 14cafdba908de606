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


def test_skyline_tiebreak_lowest_okey(spark):
    """Exact (date, price) ties are deterministic: the lowest okey
    survives; and the parallel two-level prefix max agrees with a
    serial reference on a crafted fixture."""
    import datetime

    from etl_tool_rep_spark.queries.tier7 import pareto_frontier

    d = datetime.date
    rows = [
        # day 1: two exact ties at 100.0 plus a dominated 50.0
        (3, d(2024, 1, 1), 100.0),
        (7, d(2024, 1, 1), 100.0),
        (9, d(2024, 1, 1), 50.0),
        # day 2: tie at a new high; lower okey listed second on purpose
        (12, d(2024, 1, 2), 120.0),
        (11, d(2024, 1, 2), 120.0),
        # day 3: not above the running max -> dominated
        (20, d(2024, 1, 3), 120.0),
        # day 4: strict new high
        (30, d(2024, 1, 4), 121.0),
    ]
    s = spark.createDataFrame(rows, ["okey", "odate", "price"])
    got = sorted((r["okey"], r["price"])
                 for r in pareto_frontier(s).collect())
    assert got == [(3, 100.0), (11, 120.0), (30, 121.0)]
    # stable across repeated runs (tie order must not drift)
    again = sorted((r["okey"], r["price"])
                   for r in pareto_frontier(s).collect())
    assert got == again
