#!/bin/bash
# Round-12 ask #1 + #3: sf10 hash evidence for the streaming family,
# and the kcore_decomposition full-sf10 / disjoint-slice closure.
# Serial batches so Spark + fenced DuckDB never contend for RAM.
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=64g
export SPARK_GRAFT_DUCK_MEM=48GB
export SPARK_GRAFT_DUCK_TMP=/root/repo/.scratch/ducktmp_r12
export SPARK_GRAFT_DUCK_TMP_MAX=40GB
LOG=artifacts/oracle_sf10_r12.log
echo "--- batch 1: streaming family at sf10 (hash vs batch oracles) ---" >> "$LOG"
python tools/check_oracle.py --sf .scratch/sf10 \
  streaming_lakehouse_ingest streaming_interval_join >> "$LOG" 2>&1
echo "--- batch 2: state/heap peaks for the same two keys (metrics only) ---" >> "$LOG"
python tools/stream_state_metrics.py --sf .scratch/sf10 \
  streaming_lakehouse_ingest streaming_interval_join >> "$LOG" 2>&1
echo "--- done ---" >> "$LOG"
