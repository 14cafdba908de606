#!/usr/bin/env python
"""Optimization-round profiler: for each named query, capture the
formatted physical plan to plans/<tag>/<name>_<suffix>.txt and time
the noop-sink execution (median of N runs after one discarded
warm-up), printing one line per query.

    python tools/opt_profile.py --tag r13 --suffix before [--iters 3]
        [--sf /root/testdata/sf0.1] [--no-plan] names...

Timing methodology matches bench.py (noop sink, perf_counter,
median after warm-up) so numbers are comparable.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_tool_rep_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("opt_profile")
    from etl_tool_rep_spark.queries import QUERIES

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(plan_dir, exist_ok=True)

    # warm the JVM/python workers once, outside any timing
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()

    for name in args.names:
        fn = QUERIES[name]
        if not args.no_plan:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    plan_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        samples = []
        for i in range(args.iters + 1):
            spark.sparkContext.setJobDescription(
                f"{name} [{args.suffix} {i}]")
            t0 = time.perf_counter()
            (fn(spark, args.sf).write.format("noop")
             .mode("overwrite").save())
            samples.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        med = statistics.median(samples[1:])
        print(f"{name}: median {med:.3f}s  runs "
              f"{' '.join(f'{s:.2f}' for s in samples)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
