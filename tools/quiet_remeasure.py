#!/usr/bin/env python
"""Quiet-host re-measure: the BENCH_r12_note.md protocol as a tool.

Runs a list of registered query keys N times INTERLEAVED (round-robin
over keys, so slow drift in the host hits every key equally instead of
whichever key ran last), recording per-run wall time, the JVM GC-time
delta across the run (GarbageCollectorMXBeans via py4j), and load1
sampled immediately before the run. Prints a median/min/max table and
writes one JSON line per run to --out.

This is the instrument that separated "real regression" from
"AQE-race bimodality" in round 12 (blocking_recall) and is the round-13
verdict's required evidence for the iterative-family sweep drift
(dedup_components_exact +53%, pagerank +51%, ... r11->r12 same-code).

    python tools/quiet_remeasure.py --runs 6 \
        --out artifacts/remeasure_iterative_r13.jsonl \
        dedup_components_exact pagerank pagerank_exact \
        rolling_active_users kmeans_exact
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_tool_rep_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def jvm_gc_millis(spark) -> int:
    """Total collection time across all JVM collectors, in ms."""
    beans = (spark._jvm.java.lang.management.ManagementFactory
             .getGarbageCollectorMXBeans())
    return sum(b.getCollectionTime() for b in beans)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--runs", type=int, default=6,
                    help="interleaved rounds per key (default 6)")
    ap.add_argument("--sf", default=SF_DIR)
    ap.add_argument("--out", default=None, help="JSONL output path")
    ap.add_argument("--warmup", action="store_true", default=True)
    args = ap.parse_args()

    from etl_tool_rep_spark.queries import QUERIES
    for k in args.keys:
        if k not in QUERIES:
            print(f"unknown key: {k}", file=sys.stderr)
            return 2

    spark = get_spark()
    out = open(args.out, "a") if args.out else None

    # one unrecorded warmup pass so JIT/codegen caches and the parquet
    # footer cache don't load the first recorded round
    if args.warmup:
        for k in args.keys:
            QUERIES[k](spark, args.sf).write.format("noop") \
                .mode("overwrite").save()

    results: dict[str, list[dict]] = {k: [] for k in args.keys}
    for rnd in range(args.runs):
        for k in args.keys:
            load1 = os.getloadavg()[0]
            gc0 = jvm_gc_millis(spark)
            t0 = time.monotonic()
            QUERIES[k](spark, args.sf).write.format("noop") \
                .mode("overwrite").save()
            wall = time.monotonic() - t0
            gc_ms = jvm_gc_millis(spark) - gc0
            rec = {"key": k, "round": rnd, "wall_s": round(wall, 3),
                   "gc_ms": gc_ms, "load1": round(load1, 2),
                   "sf": args.sf}
            results[k].append(rec)
            if out:
                out.write(json.dumps(rec) + "\n")
                out.flush()
            print(f"  run {rnd} {k}: {wall:.2f}s gc={gc_ms}ms "
                  f"load1={load1:.1f}")

    print(f"\n{'key':30s} {'median':>8s} {'min':>8s} {'max':>8s} "
          f"{'spread':>8s} {'gc_med':>7s}")
    for k in args.keys:
        walls = [r["wall_s"] for r in results[k]]
        gcs = [r["gc_ms"] for r in results[k]]
        med = statistics.median(walls)
        print(f"{k:30s} {med:8.2f} {min(walls):8.2f} {max(walls):8.2f} "
              f"{max(walls) - min(walls):8.2f} "
              f"{statistics.median(gcs):6.0f}ms")
    if out:
        out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
