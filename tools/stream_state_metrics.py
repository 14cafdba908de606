#!/usr/bin/env python
"""Peak state/heap capture for the sf10 streaming hash runs
(round-12 verdict ask #1).

Runs the given streaming-family keys at --sf with a
StreamingQueryListener recording, per progress event, the state
operators' numRowsTotal / memoryUsedBytes / RocksDB custom metrics,
and samples JVM heap via the MemoryMXBean. Prints one JSON line per
key with the peaks; the value-correctness itself comes from the
separate tools/check_oracle.py run — this tool only answers "how big
did the state get".

    python tools/stream_state_metrics.py --sf .scratch/sf10 \
        streaming_lakehouse_ingest streaming_interval_join
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_tool_rep_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("stream_state_metrics")
    from pyspark.sql.streaming import StreamingQueryListener

    peaks: dict[str, dict] = {}

    class Peaks(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            p = json.loads(event.progress.json)
            for op in p.get("stateOperators", []):
                cur = peaks.setdefault(p.get("name") or p["id"], {
                    "state_rows_peak": 0, "state_bytes_peak": 0,
                    "rocksdb_total_mem_peak": 0})
                cur["state_rows_peak"] = max(
                    cur["state_rows_peak"], op.get("numRowsTotal", 0))
                cur["state_bytes_peak"] = max(
                    cur["state_bytes_peak"],
                    op.get("memoryUsedBytes", 0))
                cm = op.get("customMetrics", {})
                rocks = sum(v for k, v in cm.items()
                            if "memoryusage" in k.lower()
                            or "pinnedblocks" in k.lower())
                cur["rocksdb_total_mem_peak"] = max(
                    cur["rocksdb_total_mem_peak"], rocks)

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    spark.streams.addListener(Peaks())
    mem = spark._jvm.java.lang.management.ManagementFactory \
        .getMemoryMXBean()

    def quiesce(timeout_s: float = 60.0) -> None:
        # progress events arrive on an async listener-bus thread (a
        # py4j callback for Python listeners): reading/clearing peaks
        # right after the job returns can miss late events or charge
        # one key's final progress to the next key's record. Wait for
        # the streams to deregister, drain the JVM listener bus, then
        # give the py4j callback thread a beat.
        deadline = time.time() + timeout_s
        while spark.streams.active and time.time() < deadline:
            time.sleep(0.5)
        bus = spark.sparkContext._jsc.sc().listenerBus()
        try:
            bus.waitUntilEmpty(10_000)
        except Exception:
            try:
                bus.waitUntilEmpty()
            except Exception:
                pass
        time.sleep(1.0)

    from etl_tool_rep_spark.queries import QUERIES
    for key in args.keys:
        t0 = time.perf_counter()
        QUERIES[key](spark, args.sf).write.format("noop") \
            .mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 1)
        quiesce()
        heap = mem.getHeapMemoryUsage()
        print(json.dumps({
            "key": key, "sf_dir": args.sf, "wall_s": wall,
            "heap_used_mb": round(heap.getUsed() / 2**20),
            "heap_max_mb": round(heap.getMax() / 2**20),
            "state_peaks_by_query": peaks,
        }), flush=True)
        peaks.clear()
    spark.stop()


if __name__ == "__main__":
    main()
