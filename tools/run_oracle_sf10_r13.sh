#!/bin/bash
# Round-13 asks #1 + #3: sf10 hash evidence for the rewritten
# exact_substring family (sort-free collided verify) and the FIRST
# full-sf10 census for spatial_radius_join (hash-joinable oracle —
# the r11/r12 slice gate retired). Serial so Spark + fenced DuckDB
# never contend for RAM.
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=64g
export SPARK_GRAFT_DUCK_MEM=48GB
export SPARK_GRAFT_DUCK_TMP=/root/repo/.scratch/ducktmp_r13
export SPARK_GRAFT_DUCK_TMP_MAX=60GB
LOG=artifacts/oracle_sf10_r13.log
echo "--- batch 1: exact_substring family at full sf10 (rewritten verify) ---" >> "$LOG"
python tools/check_oracle.py --sf .scratch/sf10 \
  exact_substring_dedup exact_substring_spans exact_substring_cut >> "$LOG" 2>&1
echo "--- batch 2: spatial_radius_join FULL sf10 (no slice) ---" >> "$LOG"
python tools/check_oracle.py --sf .scratch/sf10 \
  spatial_radius_join >> "$LOG" 2>&1
echo "--- done ---" >> "$LOG"
