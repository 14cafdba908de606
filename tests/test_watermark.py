"""Watermark late-data semantics: events arriving behind the
watermark must be dropped from already-finalized windows (append
mode), and on-time events must all land."""

import json
import os
import time

from pyspark.sql import functions as F

from etl_tool_rep_spark.streaming import read_event_stream


def _write_events(path: str, name: str, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _ev(eid, ts, val):
    return {"event_id": eid, "ts": ts, "user_id": 1,
            "event_type": "view", "value": val, "props": "{}"}


def test_late_rows_dropped_behind_watermark(spark, tmp_path):
    src = str(tmp_path / "late_src")
    # batch 1: events at 10:00-10:59 and 13:00 (advances max event
    # time to 13:00; with a 10-minute watermark the 10:00 window is
    # finalized once the watermark passes 11:00)
    _write_events(src, "b1.json", [
        _ev(1, "2024-01-01 10:05:00", 1.0),
        _ev(2, "2024-01-01 10:45:00", 2.0),
        _ev(3, "2024-01-01 13:00:00", 4.0),
    ])
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    agg = (stream
           .withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total")))
    q = (agg.writeStream.format("memory").queryName("t_late")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="1 second")
         .start())
    try:
        # let batch 1 commit, then deliver a LATE event for 10:30
        # (watermark is already at 12:50 > 11:00 window end)
        time.sleep(8)
        _write_events(src, "b2.json", [
            _ev(4, "2024-01-01 10:30:00", 100.0),   # late -> dropped
            _ev(5, "2024-01-01 14:00:00", 8.0),     # on time
        ])
        time.sleep(8)
        # advance watermark far enough to finalize every open window
        _write_events(src, "b3.json", [
            _ev(6, "2024-01-01 20:00:00", 16.0),
        ])
        deadline = time.time() + 60
        rows = {}
        while time.time() < deadline:
            rows = {r["window"].start.strftime("%H:%M"):
                    (r["n"], r["total"])
                    for r in spark.table("t_late").collect()}
            if "14:00" in rows and "10:00" in rows:
                break
            time.sleep(2)
    finally:
        q.stop()

    # 10:00 window finalized from batch 1 only — the late event (id 4,
    # value 100) must NOT be in it
    assert rows["10:00"] == (2, 3.0), rows
    assert rows["13:00"] == (1, 4.0)
    assert rows["14:00"] == (1, 8.0)
    assert all(total < 100 for _, total in rows.values())


def test_interval_join_state_plateaus(spark, tmp_path):
    """Round-9 (verdict item #4): drive the watermarked stream-stream
    interval join over a 9-hour tranche stream and assert the state
    store PLATEAUS (watermark eviction works) instead of growing with
    the stream. The committed 40-tranche artifact
    (artifacts/state_growth_r9.json) is the full-scale version of
    this gate."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.state_growth import (plateau_verdict, run_interval_join,
                                    write_tranches)
    root = str(tmp_path / "tranches")
    write_tranches(spark, root, n_tranches=9, events_per_tranche=400,
                   n_users=20)
    recs = run_interval_join(spark, root, 9)
    assert len(recs) >= 9
    v = plateau_verdict(recs)
    assert v["plateau"], v
    assert v["state_well_below_input"], v
    # watermark eviction must actually shrink state vs the no-eviction
    # counterfactual (every input row retained in the join state)
    assert v["final_state_rows"] * 2 < v["total_input_rows"], v
