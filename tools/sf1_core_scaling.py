#!/usr/bin/env python
"""sf1 core-count scaling evidence (round-14, verdict r13 ask #8).

The driver's low/high-core ratio at sf0.1 reads ~1.0 everywhere
because sub-second walls are fixed-overhead-bound. This runner times
the top headline keys at sf1 (one decade up) under the CURRENT
`SPARK_GRAFT_CPUS`, driver methodology (noop sink, median after
warmup discard), with steal/load markers. Run it once per core count:

    SPARK_GRAFT_CPUS=32 python tools/sf1_core_scaling.py --out f32.json
    SPARK_GRAFT_CPUS=8  python tools/sf1_core_scaling.py --out f8.json
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

KEYS = [
    "market_basket", "tpch_q18_large_orders", "tpch_q1_pricing",
    "near_dedup_minhash", "asof_join", "groupby_agg",
    "tpch_q21_waiting_supplier", "skew_profile", "tpch_q8_market_share",
    "bootstrap_ci",
]


def _occ():
    occ = {"load1": round(os.getloadavg()[0], 2)}
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        occ["steal"] = int(parts[8]) if len(parts) > 8 else 0
    except (OSError, ValueError, IndexError):
        pass
    return occ


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/root/repo/.scratch/sf1")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    spark = get_spark("sf1_scaling")
    from etl_tool_rep_spark.queries import QUERIES

    spark.read.parquet(os.path.join(args.sf1, "lineitem.parquet")).count()
    occ0 = _occ()
    samples: dict[str, list[float]] = {k: [] for k in KEYS}
    for _ in range(args.iters + 1):          # +1 warmup pass
        for k in KEYS:
            t0 = time.perf_counter()
            (QUERIES[k](spark, args.sf1)
             .write.format("noop").mode("overwrite").save())
            samples[k].append(round(time.perf_counter() - t0, 3))
    occ1 = _occ()
    out = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "sf_dir": args.sf1,
        "iters": args.iters,
        "stat": "median_after_warmup_discard",
        "queries": {k: round(statistics.median(v[1:]), 3)
                    for k, v in samples.items()},
        "runs": samples,
        "load1": [occ0["load1"], occ1["load1"]],
        "steal_d": occ1.get("steal", 0) - occ0.get("steal", 0),
        "ncpu": os.cpu_count(),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out["queries"][k] for k in KEYS}))


if __name__ == "__main__":
    main()
