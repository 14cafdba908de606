#!/bin/bash
# Round-11 ask #1: sf10 VALUE-correctness for the scale-risky families.
# Serial batches so Spark + fenced DuckDB never contend for RAM.
#
# Two keys run on .scratch/sf10_slice (deterministic source slices,
# both engines unchanged) because their DuckDB oracles are
# sf10-intractable:
#   * kcore_decomposition — the unrolled peel MATERIALIZEs per-round
#     alive sets; at full sf10 DuckDB overflowed the 40 GB temp fence
#     (37.2 GiB used). Slice: lineitem l_orderkey % 4 = 0 (15.0 M
#     rows, 2.5x sf1).
#   * spatial_radius_join — the 9-cell candidate census is
#     ~quadratic in point density; 501 s at sf1 => O(10 h) at sf10.
#     Slice: customer c_custkey % 5 = 0 (300 k points, 2x sf1).
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=64g
export SPARK_GRAFT_DUCK_MEM=48GB
export SPARK_GRAFT_DUCK_TMP=/root/repo/.scratch/ducktmp_r11
export SPARK_GRAFT_DUCK_TMP_MAX=40GB
LOG=artifacts/oracle_sf10_r11.log
echo "--- batch 1b: basket + minhash + ANN (sf10) ---" >> "$LOG"
python tools/check_oracle.py --sf .scratch/sf10 \
  market_basket triple_basket minhash_lsh_exact \
  incremental_minhash_dedup incremental_ann_index \
  incremental_ann_retire >> "$LOG" 2>&1
echo "--- batch 1c: kcore + spatial on sf10_slice (see header) ---" >> "$LOG"
python tools/check_oracle.py --sf .scratch/sf10_slice \
  kcore_decomposition spatial_radius_join >> "$LOG" 2>&1
echo "--- batch 2: exact-substring family (sf10) ---" >> "$LOG"
python tools/check_oracle.py --sf .scratch/sf10 \
  exact_substring_dedup exact_substring_spans exact_substring_cut \
  >> "$LOG" 2>&1
echo "--- batch 3: semantic_dedup on the ksplit sf10 fixture ---" >> "$LOG"
python tools/check_oracle.py --sf .scratch/ksplit_sf10 semantic_dedup \
  >> "$LOG" 2>&1
echo "--- done ---" >> "$LOG"
