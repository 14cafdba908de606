#!/usr/bin/env python
"""Per-key bench budget tripwire (round-11 verdict ask #8).

BENCH_SWEEP.json times all registered keys at sf0.1, but only the 37
headline queries gate a round — a non-headline key could silently
triple without failing anything. This tool maintains a COMMITTED
budget file (BENCH_BUDGET.json: per-key ceiling = 2x a clean close
sweep, floored at 1 s so micro-queries don't trip on scheduler
noise) and diffs the current sweep against it.

Usage:
    python tools/bench_budget.py            # check sweep vs budget
    python tools/bench_budget.py --rebase   # reset budget = 2x sweep
                                            # (run on a quiet host
                                            # after a clean close)

Exit 0 = all keys within budget; exit 1 = violations (listed).
New keys absent from the budget are reported but don't fail — they
get a ceiling at the next --rebase. The close checklist runs the
check right after bench.py and commits the log.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(REPO, "BENCH_SWEEP.json")
BUDGET = os.path.join(REPO, "BENCH_BUDGET.json")

# ceilings below this are noise at 32-thread parallelism: a 0.2 s
# query doubling to 0.5 s is scheduler jitter, not a regression
_FLOOR_SEC = 1.0
_FACTOR = 2.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rebase", action="store_true",
                    help="write BENCH_BUDGET.json = 2x current sweep")
    args = ap.parse_args()

    with open(SWEEP) as fh:
        sweep = json.load(fh)
    times = sweep["all_queries"]

    if args.rebase:
        budget = {
            "sf": sweep.get("sf"),
            "factor": _FACTOR,
            "floor_sec": _FLOOR_SEC,
            "ceilings": {k: round(max(_FACTOR * v, _FLOOR_SEC), 3)
                         for k, v in sorted(times.items())},
        }
        with open(BUDGET, "w") as fh:
            json.dump(budget, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"rebased: {len(times)} ceilings -> {BUDGET}")
        return 0

    if not os.path.exists(BUDGET):
        print("no BENCH_BUDGET.json — run with --rebase first",
              file=sys.stderr)
        return 1
    with open(BUDGET) as fh:
        budget = json.load(fh)
    ceil = budget["ceilings"]

    over = {k: (v, ceil[k]) for k, v in times.items()
            if k in ceil and v > ceil[k]}
    new = sorted(k for k in times if k not in ceil)
    gone = sorted(k for k in ceil if k not in times)

    for k in new:
        print(f"NEW (no ceiling yet): {k} = {times[k]}s")
    for k in gone:
        print(f"GONE (in budget, not in sweep): {k}")
    if over:
        for k, (v, c) in sorted(over.items(), key=lambda x: -x[1][0]):
            print(f"OVER BUDGET: {k} = {v}s > ceiling {c}s")
        print(f"\n{len(over)} key(s) over budget "
              f"(ceiling = {budget['factor']}x close sweep, "
              f"floor {budget['floor_sec']}s)")
        return 1
    print(f"all {len(times) - len(new)} budgeted keys within ceiling"
          + (f" ({len(new)} new unbudgeted)" if new else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
