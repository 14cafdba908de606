#!/usr/bin/env python
"""Skew-adversarial rehearsal (round-11 verdict ask #4): run a key on
a uniform fixture and on its hot-key twin (tools/gen_skew_fixtures)
and report, per stage, whether a SINGLE TASK dominates — max task
duration / median task duration and the same ratio for shuffle-read
bytes, pulled from the Spark UI REST API (within-run ratios, so host
load doesn't pollute the verdict the way wall-clock would).

    python tools/skew_rehearsal.py --pairs \
        exact_substring_dedup:/root/testdata/sf0.1:.scratch/hotgram_sf0.1 \
        incremental_ann_index:/root/testdata/sf0.1:.scratch/hotcell_sf0.1

Writes one JSON line per (key, fixture) to stdout; redirect to the
round's rehearsal JSONL.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_tool_rep_spark.session import get_spark  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=30) as r:
        return json.load(r)


def stage_skew(spark, base: str, since_stage: int) -> list[dict]:
    """max/median task duration + shuffle-read per completed stage
    newer than ``since_stage``; only stages with >= 4 tasks (a
    1-task stage trivially has ratio 1)."""
    app = _api(base, "/api/v1/applications")[0]["id"]
    out = []
    for st in _api(base, f"/api/v1/applications/{app}/stages"
                         "?status=complete"):
        sid, att = st["stageId"], st["attemptId"]
        if sid <= since_stage or st["numCompleteTasks"] < 4:
            continue
        q = _api(base,
                 f"/api/v1/applications/{app}/stages/{sid}/{att}/"
                 "taskSummary?quantiles=0.5,1.0")
        med_d, max_d = q["executorRunTime"]
        med_s, max_s = q.get("shuffleReadMetrics",
                             {}).get("readBytes", [0, 0])
        out.append({
            "stage": sid, "tasks": st["numCompleteTasks"],
            "med_ms": med_d, "max_ms": max_d,
            "dur_ratio": round(max_d / med_d, 2) if med_d else None,
            "med_shuffle_b": med_s, "max_shuffle_b": max_s,
            "shuffle_ratio": (round(max_s / med_s, 2)
                              if med_s else None),
        })
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", nargs="+", required=True,
                    help="key:uniform_dir:hot_dir triples")
    args = ap.parse_args()

    spark = get_spark("skew_rehearsal",
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": "4099"})
    base = "http://localhost:4099"
    from etl_tool_rep_spark.queries.registry import QUERIES

    last_stage = -1
    for trip in args.pairs:
        key, uni, hot = trip.split(":")
        for tag, d in (("uniform", uni), ("hot", hot)):
            t0 = time.perf_counter()
            QUERIES[key](spark, d).write.format("noop") \
                .mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 2)
            stages = stage_skew(spark, base, last_stage)
            if stages:
                last_stage = max(s["stage"] for s in stages)
            worst = max((s for s in stages if s["dur_ratio"]),
                        key=lambda s: s["dur_ratio"], default=None)
            print(json.dumps({
                "key": key, "fixture": tag, "dir": d, "wall_s": wall,
                "worst_stage": worst, "stages": stages,
            }), flush=True)


if __name__ == "__main__":
    main()
