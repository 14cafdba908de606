"""Subprocess worker for the cross-process lakehouse contention test
(test_lakehouse_xproc.py). Each invocation is a SEPARATE Spark driver
JVM + Python process contending on one shared LakeTable root — the
filesystem-level proof that the atomic hard-link commit protocol
(sinks/lakehouse.py, "Commit protocol" steps 1-4) serializes writers
across PROCESSES, not just across threads of one JVM.

argv: <table_root> <mode> <writer_id> <go_file>

modes:
  merge  — optimistic-concurrency path: merge 5 disjoint keys through
           LakeTable.merge (retries on conflict). Exit 0 on success.
  race   — deliberate same-version race: every worker observes the
           SAME parent version, prepares its data files, waits on the
           go-file barrier, then attempts to publish parent+1
           directly. Exactly one os.link can win. Exit 0 = won,
           exit 17 = lost cleanly with CommitConflict.

The go-file barrier makes the contention window tight: workers signal
readiness via <go_file>.ready<id> AFTER Spark startup and data-file
writes, and only attempt the commit once the parent test creates
<go_file>.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_tool_rep_spark.session import get_spark  # noqa: E402
from etl_tool_rep_spark.sinks.lakehouse import (  # noqa: E402
    CommitConflict, LakeTable)


def main() -> int:
    root, mode, wid, go_file = (sys.argv[1], sys.argv[2],
                                int(sys.argv[3]), sys.argv[4])
    spark = get_spark(f"lakehouse-xproc-{mode}-{wid}", master="local[2]",
                      extra_conf={"spark.sql.shuffle.partitions": "2",
                                  "spark.driver.memory": "2g"})
    t = LakeTable(spark, root)
    df = spark.createDataFrame(
        [(1000 * wid + j, wid) for j in range(5)], "k bigint, v bigint")

    def barrier():
        with open(f"{go_file}.ready{wid}", "w") as fh:
            fh.write("ready")
        deadline = time.time() + 120
        while not os.path.exists(go_file):
            if time.time() > deadline:
                raise TimeoutError("go-file barrier never opened")
            time.sleep(0.05)

    if mode == "merge":
        barrier()
        t.merge(df, "k", batch_id=f"xp{wid}")
        return 0

    if mode == "race":
        # all workers pin the SAME parent before the barrier, so the
        # subsequent commit attempts target the same version number
        parent = t.version()
        m = t._manifest(parent)
        entries = t._write_data(df, m.get("cluster_by", []))
        barrier()
        try:
            t._commit_entries(
                list(m["files"]) + entries, schema_json=m["schema"],
                batch_id=f"race{wid}", parent=parent,
                prev_batch_ids=m["batch_ids"],
                cluster_by=m.get("cluster_by", []),
                cluster_mode=m.get("cluster_mode", "range"))
            return 0
        except CommitConflict:
            return 17

    raise ValueError(f"unknown mode {mode!r}")


if __name__ == "__main__":
    sys.exit(main())
