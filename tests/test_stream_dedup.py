"""Streaming exact dedup (dropDuplicatesWithinWatermark): redelivered
events within the watermark horizon collapse to one row."""

import json
import os
import time

from etl_tool_rep_spark.streaming import deduped_stream, read_event_stream


def _write(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _ev(eid, ts):
    return {"event_id": eid, "ts": ts, "user_id": 1,
            "event_type": "view", "value": 1.0, "props": "{}"}


def test_redelivered_events_collapse(spark, tmp_path):
    src = str(tmp_path / "dedup_src")
    # event 1 delivered twice in-batch, event 2 redelivered in a later
    # file while still inside the 10-minute watermark horizon
    _write(src, "b1.json", [
        _ev(1, "2024-01-01 10:00:00"),
        _ev(1, "2024-01-01 10:00:00"),
        _ev(2, "2024-01-01 10:01:00"),
    ])
    _write(src, "b2.json", [
        _ev(2, "2024-01-01 10:01:00"),
        _ev(3, "2024-01-01 10:02:00"),
    ])
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = (deduped_stream(stream).writeStream
         .format("memory").queryName("t_sdedup")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    assert q.awaitTermination(120), "stream did not finish"
    got = {r["event_id"] for r in
           spark.table("t_sdedup").collect()}
    n = spark.table("t_sdedup").count()
    assert got == {1, 2, 3}
    assert n == 3, f"expected 3 deduped rows, got {n}"
