"""HLL sketch merge accuracy + mergeability contracts (the rows-only
hll_sketch_merge query's correctness backing)."""

from pyspark.sql import functions as F

from etl_tool_rep_spark.catalog import load
from etl_tool_rep_spark.queries.tier1c import hll_sketch_merge


def test_hll_per_group_estimates_close(spark, sf_dir):
    rows = hll_sketch_merge(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r["estimate_nd"] - r["exact_nd"]) \
            / max(r["exact_nd"], 1) < 0.05


def test_hll_union_matches_direct_global_sketch(spark, sf_dir):
    """Merging per-group sketches must equal sketching the whole
    column directly — the property that makes partial sketches safe
    to precompute per partition/day at 100 TB."""
    ev = load(spark, sf_dir, "events")
    merged = (ev.groupBy("event_type")
                .agg(F.hll_sketch_agg("user_id").alias("sk"))
                .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                      .alias("est")).collect()[0]["est"])
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
         .alias("est")).collect()[0]["est"]
    assert merged == direct
