#!/usr/bin/env python
"""Scale rehearsal: time the headline set plus the named scale-risk
queries at sf0.1 and at the tiled sf1 (tools/gen_sfn.py), and report
the per-query scaling exponent  e = log10(t_sf1 / t_sf0.1)  (data
grows 10x, so e ~ 1.0 is linear, e < 1 amortizes fixed overhead,
e > 1.3 flags super-linear growth worth a look).

    python tools/scale_rehearsal.py [--sf1 /root/repo/.scratch/sf1]

One Spark session for both scales; each query runs twice per scale
(warm-up discarded) at sf0.1 and twice at sf1 (max kept — noise at
multi-second runtimes is small relative to the decade we measure).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_tool_rep_spark.session import get_spark  # noqa: E402

WEAK = ["string_distance", "pagerank", "triangle_count"]


def time_query(spark, fn, sf_dir: str, iters: int = 2) -> float:
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/root/repo/.scratch/sf1")
    ap.add_argument("--dirs", default=None,
                    help="colon-separated ORDERED fixture dirs, each "
                         "10x the previous (overrides --sf1); per-"
                         "decade exponents are reported for each "
                         "adjacent pair — e.g. "
                         "/root/testdata/sf0.1:.scratch/sf1:.scratch/sf10")
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--ratios", default=None,
                    help="comma-separated data-growth factor for each "
                         "adjacent --dirs pair (default: 10 per pair); "
                         "e.g. --ratios 10,3 for sf1:sf10:sf30. "
                         "Exponents are log(t_b/t_a)/log(ratio).")
    ap.add_argument("--iters", type=int, default=2,
                    help="runs per (query, scale); 1 for wall-hour "
                         "keys where a warm-up pass costs more than "
                         "the noise it removes")
    args = ap.parse_args()

    import bench
    from etl_tool_rep_spark.queries import QUERIES
    names = args.names or (bench.HEADLINE + WEAK)
    dirs = (args.dirs.split(":") if args.dirs
            else ["/root/testdata/sf0.1", args.sf1])
    labels = [os.path.basename(os.path.normpath(d)) for d in dirs]
    ratios = ([float(r) for r in args.ratios.split(",")]
              if args.ratios else [10.0] * (len(dirs) - 1))
    assert len(ratios) == len(dirs) - 1, "--ratios: one per dir pair"

    def exp(ta: float, tb: float, ratio: float) -> float:
        return round(math.log(max(tb, 1e-3) / max(ta, 1e-3))
                     / math.log(ratio), 2)

    spark = get_spark("scale_rehearsal")
    out = {}
    for name in names:
        fn = QUERIES[name]
        times = [time_query(spark, fn, d, iters=args.iters)
                 for d in dirs]
        exps = [exp(ta, tb, r)
                for (ta, tb), r in zip(zip(times, times[1:]), ratios)]
        rec = {labels[i] + "_s": times[i] for i in range(len(dirs))}
        rec["exponents"] = exps
        out[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
    totals = {labels[i] + "_total_s":
              round(sum(out[n][labels[i] + "_s"] for n in out), 1)
              for i in range(len(dirs))}
    tvals = list(totals.values())
    totals["overall_exponents"] = [
        exp(ta, tb, r) for (ta, tb), r in zip(zip(tvals, tvals[1:]),
                                              ratios)]
    print(json.dumps(totals))


if __name__ == "__main__":
    main()
