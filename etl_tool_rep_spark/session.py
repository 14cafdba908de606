"""SparkSession factory.

Defaults are chosen for correctness-stable, scale-ready execution:
AQE on (runtime re-planning, skew-join splitting, partition
coalescing), UTC session timezone (hash-stable timestamps vs the
DuckDB oracle), Arrow transfer for the Pandas-UDF slow path.

On a real cluster the same factory applies; only master/memory come
from the environment (spark-submit), never hardcoded here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _shuffle_width_default() -> int:
    """Shuffle width tracks the declared core count (floor 16).
    Tolerates a non-numeric SPARK_GRAFT_CPUS instead of failing every
    import with a bare ValueError (r13 ADVICE)."""
    try:
        return max(int(os.environ.get("SPARK_GRAFT_CPUS", "32") or "32"),
                   16)
    except ValueError:
        return 32


_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # r13: scale-adaptive instead of a hard-coded 32 — follow the
    # provisioned core count when the harness declares it (the
    # driver benches at several core counts; shuffle width should
    # track them), floor 16 so tiny-core runs keep AQE coalescing
    # headroom, and the 32 default stands elsewhere. On a cluster,
    # override via spark-submit --conf (partitions should then track
    # data volume, not this local heuristic).
    "spark.sql.shuffle.partitions": str(_shuffle_width_default()),
    # 64 MiB input splits keep ~100 TB scans at ~1.6M tasks w/ AQE
    # coalescing; at local SF it just avoids tiny-partition overhead.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # broadcast anything under 64 MiB — mapping/dim tables.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # corpus events.parquet carries TIMESTAMP(NANOS); read as long,
    # catalog.load converts back to TimestampType.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    # keep stage-progress bars out of captured stdout: committed
    # sweep/audit logs must contain every per-key line verbatim (the
    # \r-rewriting progress writer can swallow lines when stdout is a
    # pipe), and the driver parses bench.py's single JSON line.
    "spark.ui.showConsoleProgress": "false",
    # static conf: bucketed saveAsTable needs a warehouse; keep it out
    # of the repo working dir
    "spark.sql.warehouse.dir": os.environ.get(
        "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    # streaming state lives in RocksDB (native memory + local disk),
    # not on the JVM heap: the HDFS-backed in-memory provider held
    # the whole state map on-heap, which is what pushed the sf10
    # streaming rehearsal past a 16 g driver. Results are provider-
    # independent (oracles unchanged); artifacts/state_growth_r10
    # re-measures the watermark plateau under RocksDB. Override with
    # SPARK_GRAFT_STATE_STORE=hdfs to compare providers.
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
        if os.environ.get("SPARK_GRAFT_STATE_STORE") == "hdfs" else
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"),
}


def get_spark(app_name: str = "etl_tool_rep_spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the session. ``master`` defaults to
    ``local[$SPARK_GRAFT_CPUS]`` locally; on a cluster leave None and
    let spark-submit decide."""
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
