#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], timing full plan
execution via the noop sink (no driver-side collect cost), and prints:

    {"metric": "total_headline_sec", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Hygiene (round-3): each headline query runs $SPARK_GRAFT_BENCH_ITERS
times (default 4); the first iteration is discarded as warm-up
(JIT/codegen/shuffle-file cache) and the reported number is the median
of the rest.  Every remaining registered query is also timed once and
recorded in BENCH_SWEEP.json (a file, NOT the stdout line) so
regressions outside the headline set are visible round-over-round.
Set SPARK_GRAFT_BENCH_FULL=0 to skip the full sweep (fast local
iteration).

The stdout contract line stays compact on purpose: the driver captures
only the tail of stdout, and round 3 proved that inlining the
180-query sweep pushes the line past that capture window (the driver
recorded parsed=null).  Headline dict only on stdout; sweep to disk.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_tool_rep_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "4")))
FULL = os.environ.get("SPARK_GRAFT_BENCH_FULL", "1") != "0"

HEADLINE = [
    # reference-faithful flagship
    "multi_rule_pipeline",
    # relational core
    "groupby_agg", "broadcast_join", "inner_join", "window_running",
    "topk_limit", "grouping_rollup", "pivot_op",
    # temporal
    "tumbling_window_agg", "session_window_agg", "asof_join",
    # multi-join analytics
    "tpch_q3_shipping", "tpch_q5_local_volume", "tpch_q10_returns",
    "tpch_q9_profit", "tpch_q18_large_orders", "tpch_q1_pricing",
    "tpch_q8_market_share", "tpch_q21_waiting_supplier",
    # LLM-pipeline
    "exact_dedup", "near_dedup_minhash", "embedding_knn",
    "token_count", "quality_score", "passage_dedup", "semantic_dedup",
    # retrieval + quality + time series
    "bm25_search", "chunk_documents", "validate_constraints",
    "time_series_fill", "snapshot_diff",
    # eval metrics + corpus assembly + diagnostics
    "auc_metric", "sequence_pack", "market_basket",
    "vocab_growth", "bootstrap_ci", "skew_profile",
]


def _time_one(spark, fn) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _occupancy() -> dict:
    """Host-occupancy marker (round-7 verdict ask #8): loadavg and
    cumulative CPU-steal ticks, sampled around the headline passes so
    an upward driver reading is classifiable from the artifact alone
    (shared-host dilation vs plan regression)."""
    occ = {"load1": round(os.getloadavg()[0], 2)}
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        # cpu user nice system idle iowait irq softirq steal ...
        occ["steal"] = int(parts[8]) if len(parts) > 8 else 0
    except (OSError, ValueError, IndexError):
        pass
    return occ


def main() -> None:
    spark = get_spark("bench")
    from etl_tool_rep_spark.queries import QUERIES

    # JIT/IO + Python-worker warmup outside the timings
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    from pyspark.sql import functions as F
    from etl_tool_rep_spark.functions import sigmoid_score
    (spark.range(1000).select(sigmoid_score(F.col("id").cast("double")))
     .write.format("noop").mode("overwrite").save())

    # n iterations per query, interleaved by pass so GC/compilation noise
    # is spread evenly; first pass discarded, median of the rest reported.
    occ_before = _occupancy()
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(ITERS):
        for name in HEADLINE:
            samples[name].append(_time_one(spark, QUERIES[name]))
    occ_after = _occupancy()
    timings = {
        name: round(statistics.median(vals[1:]), 3)
        for name, vals in samples.items()
    }

    # sweep of every other registered query (regression tripwire);
    # anything slow on pass 1 gets a confirming second run (min) so a
    # one-off GC/codegen hiccup can't masquerade as a regression
    all_queries: dict[str, float] = {}
    if FULL:
        for name, fn in QUERIES.items():
            if name in samples:
                all_queries[name] = timings[name]
                continue
            try:
                dt = _time_one(spark, fn)
                # confirm a slow-ish reading with a second run (min) so
                # a one-off GC/codegen hiccup can't masquerade as a
                # regression; >10s queries are structurally slow
                # (iterative/streaming machinery), not hiccup victims —
                # re-running them only doubles the sweep's tail cost
                if 2.0 < dt <= 10.0:
                    dt = min(dt, _time_one(spark, fn))
                all_queries[name] = dt
            except Exception:
                all_queries[name] = -1.0  # failed; correctness gate will say why

    if all_queries:
        sweep_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_SWEEP.json")
        with open(sweep_path, "w") as fh:
            json.dump({"sf": _sf(), "all_queries": all_queries}, fh, indent=1)

    out = {
        "metric": "total_headline_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf(),
        "iters": ITERS,
        "stat": "median_after_warmup_discard",
        # occupancy markers: loadavg(1m) at start/end of the headline
        # passes + cumulative steal-tick delta (0 on a quiet host)
        "load1": [occ_before["load1"], occ_after["load1"]],
        "steal_d": occ_after.get("steal", 0) - occ_before.get("steal", 0),
        "ncpu": os.cpu_count(),
    }
    line = json.dumps(out)
    # Hard guard on the driver-tail capture window (2000 chars observed):
    # degrade by dropping per-query detail before ever exceeding it.
    if len(line) > 1900:
        out["queries"] = {k: v for k, v in sorted(
            timings.items(), key=lambda kv: -kv[1])[:20]}
        out["queries_truncated_to_top"] = 20
        line = json.dumps(out)
    print(line)


def _sf():
    try:
        return float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        return None


if __name__ == "__main__":
    main()
