"""Subprocess target for the SIGKILL streaming-recovery proof
(tests/test_streaming_recovery.py::test_sigkill_mid_batch_recovery).

Runs a foreachBatch streaming query over a parquet file source with a
batch-id-addressed idempotent sink. In ``crash`` mode it writes batch
1's side effects, drops a marker file, then blocks — the parent test
SIGKILLs the whole process group at that exact point (side effects on
disk, checkpoint for epoch 1 NOT committed: the at-least-once replay
window). In ``finish`` mode it simply drains the source; Spark's
checkpoint makes it re-deliver the uncommitted epoch, and the
overwrite-per-epoch-directory sink must absorb the replay.

Every foreachBatch delivery appends its batch id to a log file so the
parent can assert the redelivery actually happened.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    src, out_root, ckpt, mode, marker, log = sys.argv[1:7]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from etl_tool_rep_spark.session import get_spark
    from etl_tool_rep_spark.streaming import read_event_stream

    spark = get_spark(
        f"sigkill_worker_{mode}", master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "4",
                    "spark.driver.memory": "2g"})

    def handler(batch_df, batch_id: int) -> None:
        with open(log, "a") as fh:
            fh.write(f"{batch_id}\n")
        # side effect FIRST: epoch-addressed dir + overwrite -> replay
        # of the same epoch lands in the same place, idempotently
        (batch_df.select("event_id", "user_id")
         .write.mode("overwrite")
         .parquet(os.path.join(out_root, f"batch={batch_id}")))
        if mode == "crash" and batch_id == 1:
            with open(marker, "w") as fh:
                fh.write(str(os.getpid()))
            time.sleep(600)      # parent SIGKILLs the process group here

    stream = read_event_stream(spark, src, fmt="parquet",
                               max_files_per_trigger=1)
    q = (stream.writeStream.foreachBatch(handler)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(240)
    with open(marker + ".done", "w") as fh:
        fh.write("ok")
    spark.stop()


if __name__ == "__main__":
    main()
